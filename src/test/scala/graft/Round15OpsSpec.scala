package graft

import graft.core.Tables
import graft.operators.Tokenize
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Unit/property coverage for the round-15 operators. Values at sf0.01
  * are pinned by the DuckDB oracle (driver t2); these specs pin the
  * SEMANTIC contracts. */
class Round15OpsSpec extends SparkSpec {

  // ---- fixed-context sequence packing ----

  test("packSequences: every pack is exactly 512 tokens except the last; " +
      "tokens and EOS are conserved") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf0)
    val packs = Tokenize.packSequences(docs).collect()
    assert(packs.nonEmpty)
    val ids = packs.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
    assert(ids.sameElements(ids.indices.map(_.toLong)), "pack ids contiguous from 0")
    // exact context length for all but the final remainder pack
    packs.dropRight(1).foreach(p =>
      assert(p.getLong(2) == 512L, s"pack ${p.getLong(0)} not full: ${p.getLong(2)}"))
    assert(packs.last.getLong(2) <= 512L && packs.last.getLong(2) > 0L)
    // conservation: sum over packs of n_tokens == sum over docs of (bpe + 1)
    val totalToks = docs
      .select((GraftFunctions.bpeCount(col("text")) + lit(1L)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(packs.map(_.getLong(2)).sum == totalToks)
    // every document ends exactly once: sum of n_eos == n_docs
    assert(packs.map(_.getLong(3)).sum == docs.count())
    // n_docs per pack >= n_eos (a doc can end here only if it appears here)
    packs.foreach(p => assert(p.getLong(1) >= p.getLong(3)))
  }

  test("packSequences: deterministic on recompute (static split, no sampling)") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf0)
    val a = Tokenize.packSequences(docs).collect().toSeq
    val b = Tokenize.packSequences(docs.repartition(7)).collect().toSeq
    assert(a == b, "packing must not depend on input partitioning")
  }

  test("pack content twin agrees with the counting operator pack-by-pack, " +
      "and the assembled stream is the concatenation it claims") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf0)
    val counts = Tokenize.packSequences(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val content = Tokenize.all("q_pack_content").fn(spark, sf0).collect()
    assert(content.map(r => r.getLong(0) -> r.getLong(1)).toMap == counts,
      "content twin must see the identical pack boundaries")
    // independent replay: rebuild the global stream on the driver from the
    // same hash-ranked order and hash each 512-chunk
    import graft.functions.TextBpe
    import org.apache.spark.unsafe.types.UTF8String
    val ordered = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, _) =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"pk_$id".getBytes("UTF-8"))
        (java.lang.Long.parseLong(
          h.take(8).map("%02x".format(_)).mkString.take(15), 16), id)
      }
    val stream = ordered.flatMap { case (_, txt) =>
      val t = TextBpe.bpe(UTF8String.fromString(txt))
      (0 until t.numElements()).map(t.getUTF8String(_).toString) :+ "</s>"
    }
    val fps = stream.grouped(512).zipWithIndex.map { case (chunk, i) =>
      i.toLong -> java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toMap
    content.foreach { r =>
      assert(r.getString(2) == fps(r.getLong(0)),
        s"pack ${r.getLong(0)} fingerprint mismatch vs driver replay")
    }
  }

  // ---- iterative BPE merge training ----

  test("bpeTrain: hand-checkable corpus learns the obvious merges in order") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // "ababab" x3 docs: pair (a,b) dominates (count 9); after merging to
    // 'ab', pair (ab,ab) appears 3 times (LTR non-overlap within each doc
    // counts (ab,ab) at positions 0-1 and 1-2 -> 2 per doc, 6 total);
    // "xy" x2 contributes (x,y) = 2
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "ababab"), Row(1L, "ababab"), Row(2L, "ababab"), Row(3L, "xy"),
        Row(4L, "xy"))),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    val learned = Tokenize.bpeTrain(docs, k = 3).collect()
    assert(learned.length == 3)
    assert(learned(0).getString(3) == "ab" && learned(0).getLong(4) == 9L)
    assert(learned(1).getString(3) == "abab" && learned(1).getLong(4) == 6L)
    // after abab: docs are [abab, ab] -> pair (abab, ab) x3; (x,y) only 2
    assert(learned(2).getString(1) == "abab" && learned(2).getString(2) == "ab")
    assert(learned(2).getLong(4) == 3L)
  }

  test("bpeTrain: distributed loop equals a local reference trainer on sf0.001") {
    import graft.functions.TextBpe
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Tables.documents(spark, sf0)
    val k = 8
    val distributed = Tokenize.bpeTrain(docs, k).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // local reference: same kernel, driver-side counting
    val texts = docs.select("text").collect().map(_.getString(0))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    while (merges.length < k) {
      val spec = merges.map { case (a, b, _) => s"$a $b" }.mkString(",")
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      texts.foreach { txt =>
        val t = TextBpe.bpeWith(
          UTF8String.fromString(txt), UTF8String.fromString(spec))
        var i = 0
        while (i < t.numElements() - 1) {
          val key = (t.getUTF8String(i).toString, t.getUTF8String(i + 1).toString)
          counts(key) = counts.getOrElse(key, 0L) + 1
          i += 1
        }
      }
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }
      merges += ((best._1._1, best._1._2, best._2))
    }
    assert(distributed.toSeq == merges.toSeq,
      s"distributed $distributed != local $merges")
  }

  // ---- 128-bit dHash (wide-signature scale path) ----

  test("dhash128: u32 words, in-group tight, cross-group far, declines junk") {
    import graft.functions.PerceptualHash
    def h128(id: Long): Array[Long] = {
      val a = PerceptualHash.dhash128(PerceptualHash.synthPatternPng(id))
      assert(a.numElements() == 4)
      a.toLongArray()
    }
    def ham(a: Array[Long], b: Array[Long]): Int =
      (0 to 3).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum
    for (g <- 0L until 40L) {
      val base = h128(3 * g)
      base.foreach(w => assert(w >= 0L && w < (1L << 32), "u32 words"))
      assert(ham(base, h128(3 * g + 1)) <= 4, s"group $g variant 1")
      assert(ham(base, h128(3 * g + 2)) <= 4, s"group $g variant 2")
      if (g > 0) assert(ham(base, h128(0L)) > 20, s"group $g vs group 0")
    }
    assert(PerceptualHash.dhash128("junk".getBytes).numElements() == 0)
    // deterministic and independent of the 64-bit kernel's grid
    assert(h128(7L).toSeq == h128(7L).toSeq)
  }

  // ---- video near-dedup ----

  test("synthAviGroup: valid AVI of 4 losslessly-decodable PNG frames") {
    import graft.functions.{PerceptualHash, VideoCodec}
    for (id <- Seq(0L, 1L, 2L, 3L, 100L, 4409L)) {
      val avi = VideoCodec.synthAviGroup(id)
      assert(VideoCodec.aviField(avi, 0) == 36)
      assert(VideoCodec.aviField(avi, 1) == 32)
      assert(VideoCodec.aviField(avi, 3) == VideoCodec.GroupVideoFrames)
      val frames = VideoCodec.splitFrames(avi)
      assert(frames.length == VideoCodec.GroupVideoFrames)
      // frame-replay: every frame decodes on the strict PNG fast path and
      // its luminance plane matches the synthesis formula exactly
      frames.zipWithIndex.foreach { case (f, fi) =>
        val dec = PerceptualHash.pngLuma(f)
        assert(dec != null, s"frame $fi of id=$id must decode")
        val (w, h, lum) = dec
        assert(w == 36 && h == 32)
        val g = id / 3; val v = (id % 3).toInt
        for (y <- 0 until 32; x <- 0 until 36) {
          val t = (g * 73856093L) ^ (x * 19349663L) ^ (y * 83492791L) ^
            (fi * 15485863L)
          var e = (((t & 0x7FFFFFFFL) * 2654435761L >> 21) & 0xFF).toInt
          if (v > 0 && fi == v && x / 4 == v && y / 4 == v) e = (e + 8) % 256
          assert(lum(y * 36 + x) == 3 * e, s"id=$id f=$fi px($x,$y)")
        }
      }
    }
  }

  test("hammingFramePairs: in-group video variants pair, groups separate") {
    import graft.functions.{GraftFunctions => GFF}
    import graft.operators.Dedup
    GFF.register(spark)
    val vids = Tables.documents(spark, sf0)
      .select(col("doc_id"), GFF.synthAviGroup(col("doc_id")).as("payload"))
    val sigs = vids
      .select(col("doc_id"), posexplode(GFF.aviFrames(col("payload"))))
      .select(col("doc_id"), col("pos").as("frame_ix"), GFF.dhash(col("col")).as("fh"))
      .where(size(col("fh")) === 2)
      .select(col("doc_id"), col("frame_ix"),
        element_at(col("fh"), 1).as("lo"), element_at(col("fh"), 2).as("hi"))
    val pairs = Dedup.hammingFramePairs(sigs).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
    // every pair is within one triple-group (base + two one-frame edits)
    assert(pairs.forall(r => r.getAs[Long]("da") / 3 == r.getAs[Long]("db") / 3))
    // recall: base<->variant pairs are Hamming <= 3 by construction, so a
    // large majority of groups must surface
    val nGroups = pairs.map(_.getAs[Long]("da") / 3).distinct.length
    val total = Tables.documents(spark, sf0).count() / 3
    assert(nGroups >= total * 9 / 10, s"$nGroups of $total groups paired")
  }

  test("packSequences plan: the prefix-sum window is pid-partitioned, " +
      "never a single global partition") {
    GraftFunctions.register(spark)
    val df = Tokenize.packSequences(Tables.documents(spark, sf0))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), s"expected a window operator:\n$p")
    // a global-order window plans as SinglePartition distribution
    assert(!p.contains("SinglePartition"),
      s"prefix sum must not serialize onto one partition:\n$p")
  }

  // ---- Unicode NFC normalization ----

  test("nfc kernel: composes canonical sequences, identity (same instance) " +
      "on pure ASCII, agrees with java.text.Normalizer on mixed input") {
    import graft.functions.TextHashes
    import org.apache.spark.unsafe.types.UTF8String
    val deco = UTF8String.fromString("café résumé")
    assert(TextHashes.nfc(deco).toString == "café résumé")
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(TextHashes.nfc(ascii) eq ascii, "ASCII fast path must not allocate")
    // already-composed non-ASCII is NFC-stable
    val comp = UTF8String.fromString("café")
    assert(TextHashes.nfc(comp).toString == "café")
    // differential vs the JDK normalizer on a combining-heavy string
    val s = "Ǻ ȩ́ ḍ̇ x"
    assert(TextHashes.nfc(UTF8String.fromString(s)).toString ==
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  test("q_normalize_unicode: changed rows shrink (composition), unchanged " +
      "rows keep identical hashes") {
    GraftFunctions.register(spark)
    val rows = graft.operators.PipelineQueries.all("q_normalize_unicode")
      .fn(spark, sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRaw, nNfc, changed) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      if (changed) assert(nNfc < nRaw, s"composition must shorten: $r")
      else {
        assert(nNfc == nRaw)
        assert(r.getString(4) == r.getString(5), "unchanged => same digest")
      }
    }
    assert(rows.exists(_.getBoolean(3)), "planting must produce changed rows")
    assert(rows.exists(!_.getBoolean(3)), "odd-hash docs stay unchanged")
  }

  // ---- Holt-Winters additive-seasonal smoothing ----

  test("holtWintersDaily: bit-equal to a local three-state reference fold; " +
      "warmup prefix (t <= m) degenerates to pure Holt") {
    import graft.operators.TimeSeries
    val events = Tables.events(spark, sf0)
    val hw = TimeSeries.holtWintersDaily(events).orderBy("user_id", "day").collect()
    val holt = TimeSeries.holtDaily(events).orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(3), r.getDouble(4))).toMap
    // local reference per user
    val byUser = hw.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      var l = 0.0; var b = 0.0
      val sl = scala.collection.mutable.ArrayBuffer.empty[Double]
      sorted.zipWithIndex.foreach { case (r, i) =>
        val t = i + 1; val x = r.getDouble(2)
        if (t == 1) { l = x; b = 0.0; sl += 0.0 }
        else {
          val sm = if (t > 7) sl(t - 7 - 1) else 0.0
          val lt = 0.5 * (x - sm) + 0.5 * (l + b)
          val bt = 0.5 * (lt - l) + 0.5 * b
          val st = 0.5 * (x - lt) + 0.5 * sm
          sl += st; l = lt; b = bt
        }
        val f = l + b + (if (t >= 7) sl(t + 1 - 7 - 1) else 0.0)
        assert(r.getDouble(3) == l && r.getDouble(4) == b &&
          r.getDouble(5) == sl(t - 1) && r.getDouble(6) == f,
          s"row $r != reference ($l, $b, ${sl(t - 1)}, $f)")
        // seasonal state is silent through the warmup => pure Holt
        if (t <= 7) {
          val (hl, hb) = holt((r.getLong(0), r.getString(1)))
          assert(r.getDouble(3) == hl && r.getDouble(4) == hb,
            "warmup level/trend must equal plain Holt")
        }
      }
    }
  }

  // ---- k-NN graph over embeddings ----

  test("knnGraph: ranks contiguous and cosine-ordered per node, k bounded, " +
      "edge values exact and orientation-symmetric") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0)
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", 5)
      .orderBy("src", "rank").collect()
    assert(g.nonEmpty)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bySrc = g.groupBy(_.getLong(0))
    bySrc.foreach { case (src, rows) =>
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.length <= 5 && ranks.sameElements(1L to ranks.length),
        s"node $src ranks not contiguous: ${ranks.toSeq}")
      val ordered = rows.sortBy(_.getLong(3))
      ordered.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(2) > lo.getDouble(2) ||
            (hi.getDouble(2) == lo.getDouble(2) && hi.getLong(1) < lo.getLong(1)),
            s"node $src not (cos DESC, dst ASC) ordered")
        case _ =>
      }
      ordered.foreach { r =>
        assert(r.getDouble(2) == cosRef(vecs(src), vecs(r.getLong(1))),
          s"edge $src->${r.getLong(1)} cosine not exact")
      }
    }
    // orientation symmetry: where both directed edges survive the top-k,
    // they carry the SAME scored value (computed once per undirected pair)
    val edgeCos = g.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    edgeCos.foreach { case ((a, b), c) =>
      edgeCos.get((b, a)).foreach(rc => assert(rc == c, s"asymmetric $a<->$b"))
    }
  }

  test("q_knn_clusters: labels are exactly the connected components of the " +
      "mutual cos>=0.3 edge set, label = min member") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0)
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // reference mutual edges + union-find on the driver
    val directed = g.map { case (s, d2, _) => (s, d2) }.toSet
    val edges = g.collect { case (s, d2, c)
      if s < d2 && c >= 0.3 && directed((d2, s)) => (s, d2) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap
      .groupBy(_._2).flatMap { case (_, m) =>
        val lbl = m.keys.min; m.keys.map(_ -> lbl)
      }
    val got = graft.operators.PipelineQueries.all("q_knn_clusters")
      .fn(spark, sf0).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"components differ: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "sf0.001 must produce at least one mutual cluster")
  }

  // ---- exact grouped percentiles ----

  test("q_latency_percentiles: nearest-rank element picks match a local " +
      "replay and are observed, ordered values") {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(spark, sf0)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
        col("event_id"))
      .collect().groupBy(_.getString(0))
    val got = graft.operators.EventLifecycle.all("q_latency_percentiles")
      .fn(spark, sf0).collect()
    assert(got.length == ev.size)
    got.foreach { r =>
      val xs = ev(r.getString(0)).map(x => (x.getLong(1), x.getLong(2)))
        .sortBy(identity).map(_._1)
      val n = xs.length
      def pick(num: Int, den: Int) = xs(((n.toLong * num + den - 1) / den).toInt - 1)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == pick(1, 2) && r.getLong(3) == pick(9, 10) &&
        r.getLong(4) == pick(99, 100))
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
      assert(xs.contains(r.getLong(2)) && xs.contains(r.getLong(4)),
        "percentiles must be observed values, not interpolations")
    }
  }

  // ---- rank-biased overlap ----

  test("q_retrieval_rbo: equals a local replay of the truncated RBO " +
      "formula over the two rankings; bounded by [0, 1 - p^10]") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf0)
    val q = e.where(col("vec_id") < 10)
    def rankOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(
          _.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    val ex = rankOf(Similarity.bruteTopK(e, q, "vec_id", "embedding", 10))
    val ap = rankOf(Similarity.ivfTopK(e, q, "vec_id", "embedding", "label", 10))
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val got = graft.operators.PipelineQueries.all("q_retrieval_rbo")
      .fn(spark, sf0).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (qid, ov10, rbo) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (a, b) = (ex.getOrElse(qid, Nil), ap.getOrElse(qid, Nil))
      val ts = (1 to 10).map { d2 =>
        val ov = a.take(d2).toSet.intersect(b.take(d2).toSet).size
        r9(math.pow(0.9, (d2 - 1).toDouble) * (ov.toDouble / d2.toDouble))
      }.sum
      assert(ov10 == a.toSet.intersect(b.toSet).size.toLong)
      val want = BigDecimal(0.1 * ts.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rbo == want, s"qid $qid: rbo $rbo != replay $want")
      assert(rbo >= 0.0 && rbo <= 1.0 - math.pow(0.9, 10) + 1e-9)
    }
  }

  // ---- greedy k-center coreset ----

  test("kCenterCoreset: equals a local greedy replay; selection radius " +
      "is monotone non-increasing (the k-center certificate)") {
    import graft.operators.DataSelection
    val emb = Tables.embeddings(spark, sf0)
    val got = DataSelection.kCenterCoreset(emb, "vec_id", "embedding", 8)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // local replay on the same lattice
    val V = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var ids = Seq(V.keys.min)
    val ref = scala.collection.mutable.ArrayBuffer((1L, ids.head, 0L))
    (2 to 8).foreach { step =>
      val (vid, dmin) = V.keys.toSeq
        .map(v => (v, ids.map(c => d2(V(v), V(c))).min))
        .minBy { case (v, dm) => (-dm, v) }
      ids = ids :+ vid
      ref += ((step.toLong, vid, dmin))
    }
    assert(got.toSeq == ref.toSeq, "distributed greedy must replay the reference")
    // radius certificate
    got.drop(1).sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, "cover radius must not increase")
      case _ =>
    }
    assert(got.map(_._2).distinct.length == 8, "exemplars are distinct")
  }

  // ---- curriculum ordering ----

  test("q_curriculum: seq is a contiguous permutation, stages are " +
      "difficulty-monotone, within-stage order is the hash shuffle") {
    GraftFunctions.register(spark)
    val rows = graft.operators.DataSelection.all("q_curriculum")
      .fn(spark, sf0).collect()
    val n = rows.length
    assert(rows.map(_.getLong(3)).sorted.sameElements(1L to n))
    // stage blocks are contiguous in seq and value-monotone
    val byStage = rows.groupBy(_.getLong(1))
    assert(byStage.keySet == Set(1L, 2L, 3L, 4L))
    (1L to 3L).foreach { s2 =>
      assert(byStage(s2).map(_.getLong(3)).max < byStage(s2 + 1).map(_.getLong(3)).min,
        s"stage $s2 seqs must precede stage ${s2 + 1}")
      assert(byStage(s2).map(_.getLong(2)).max <= byStage(s2 + 1).map(_.getLong(2)).min,
        s"stage $s2 lengths must not exceed stage ${s2 + 1}")
    }
    // within-stage order = (md5-60 rank hash, doc_id)
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cur_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    byStage.values.foreach { st =>
      val bySeq = st.sortBy(_.getLong(3)).map(r => (h60(r.getLong(0)), r.getLong(0)))
      assert(bySeq.sameElements(bySeq.sortBy(identity)),
        "within-stage order must be the deterministic hash shuffle")
    }
  }

  // ---- hard-negative mining ----

  test("q_mine_hard_negatives: every negative has a different label, is " +
      "the exact cosine top-5 of its label-complement, and is harder " +
      "than a random negative") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val labels = emb.map(e => e._1 -> e._3).toMap
    val vecs = emb.map(e => e._1 -> e._2).toMap
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = graft.operators.PipelineQueries.all("q_mine_hard_negatives")
      .fn(spark, sf0).collect()
    assert(got.length == 50)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      rows.foreach(r => assert(labels(r.getLong(1)) != labels(qid)))
      // exact top-5 of the label complement, ties by vid
      val want = emb.filter(e => e._1 != qid && e._3 != labels(qid))
        .map(e => (cosRef(vecs(qid), e._2), e._1))
        .sortBy(t => (-t._1, t._2)).take(5)
      val gotSorted = rows.sortBy(_.getLong(3)).map(r => (r.getDouble(2), r.getLong(1)))
      assert(gotSorted.toSeq == want.toSeq, s"qid $qid top-5 mismatch")
      // "hard": the rank-1 negative beats the label-complement median cosine
      val all = emb.filter(e => e._1 != qid && e._3 != labels(qid))
        .map(e => cosRef(vecs(qid), e._2)).sorted
      assert(gotSorted.head._1 > all(all.length / 2))
    }
  }

  // ---- incremental kNN-graph maintenance ----

  test("knnGraphIncremental: delta merge equals the full recompute " +
      "bit-for-bit; both delta and corpus sources survive") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0)
    val incr = Similarity.knnGraphIncremental(
        emb, "vec_id", "embedding", 5, col("vec_id") % 10 === 0)
      .orderBy("src", "rank").collect().map(_.toSeq)
    val full = Similarity.knnGraph(emb, "vec_id", "embedding", 5)
      .orderBy("src", "rank").collect().map(_.toSeq)
    assert(incr.length == full.length)
    assert(incr.toSeq == full.toSeq,
      "incremental merge must equal the full-graph recompute exactly")
    val srcs = incr.map(_.head.asInstanceOf[Long]).toSet
    assert(srcs.exists(_ % 10 == 0) && srcs.exists(_ % 10 != 0))
  }

  // ---- directed containment dedup ----

  test("containmentPairsFrom: catches the quote-inclusion pair Jaccard " +
      "misses, and only in the contained->container direction") {
    import graft.operators.Dedup
    val sqlc = spark
    import sqlc.implicits._
    GraftFunctions.register(spark)
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    val short = (1 to 40).map(i => s"tok$i").mkString(" ")   // prefix quote
    val other = (1000 to 1200).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val sets = Dedup.shingleSigSets(docs, "doc_id", "text", 3)
    try {
      val cont = Dedup.containmentPairsFrom(sets, 0.9).collect()
      assert(cont.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L &&
        r.getDouble(4) == 1.0), s"quote inclusion must surface: ${cont.toSeq}")
      assert(!cont.exists(_.getLong(0) == 1L),
        "the container is NOT contained in the quote")
      assert(!cont.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
      // the symmetric operator misses the same pair by construction
      assert(Dedup.ngramJaccardPairsFrom(sets, 0.8).collect().isEmpty)
    } finally { sets.unpersist(); () }
  }

  test("q_dedup_containment: every directed pair is exact (local replay)") {
    GraftFunctions.register(spark)
    val rows = graft.operators.PipelineQueries.all("q_dedup_containment")
      .fn(spark, sf0).collect()
    // local shingle sets
    val sh = Tables.documents(spark, sf0).select(col("doc_id"), col("text"))
      .collect().map { r =>
        val t = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        r.getLong(0) -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val want = (for {
      (da, sa) <- sh.toSeq; (db, sb) <- sh.toSeq
      if da != db && sa.nonEmpty
      inter = (sa & sb).size
      if inter.toDouble / sa.size >= 0.9
    } yield (da, db) -> (inter.toLong, sa.size.toLong)).toMap
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  // ---- trimmed mean ----

  test("q_trimmed_mean: matches a local exact replay; trimming is " +
      "resistant where the plain mean is not") {
    val daily = Tables.events(spark, sf0)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .groupBy(col("user_id"), col("day"))
      .agg((sum(col("v")) * 100).cast("long").as("mv"))
      .collect().groupBy(_.getLong(0))
    val got = graft.operators.QualityChecks.all("q_trimmed_mean")
      .fn(spark, sf0).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = daily(r.getLong(0)).map(x => (x.getLong(2), x.getLong(1)))
        .sortBy(identity)
      val n = xs.length; val k = n / 10
      val kept = xs.slice(k, n - k).map(_._1)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == k.toLong &&
        r.getLong(3) == kept.length.toLong)
      assert(r.getDouble(4) == kept.sum.toDouble / kept.length)
      assert(r.getDouble(5) == xs.map(_._1).sum.toDouble / n)
      // resistance: the trimmed mean never reaches past the kept extremes
      assert(r.getDouble(4) >= kept.min.toDouble &&
        r.getDouble(4) <= kept.max.toDouble)
    }
  }

  test("q_winsorized_mean: matches a local exact replay; winsorized mean " +
      "sits between the trimmed mean's clamp bounds") {
    val daily = Tables.events(spark, sf0)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .groupBy(col("user_id"), col("day"))
      .agg((sum(col("v")) * 100).cast("long").as("mv"))
      .collect().groupBy(_.getLong(0))
    val got = graft.operators.QualityChecks.all("q_winsorized_mean")
      .fn(spark, sf0).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = daily(r.getLong(0)).map(x => (x.getLong(2), x.getLong(1)))
        .sortBy(identity).map(_._1)
      val n = xs.length; val k = n / 10
      val kept = xs.slice(k, n - k)
      val vLo = xs(k); val vHi = xs(n - k - 1)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == k.toLong)
      assert(r.getLong(3) == vLo && r.getLong(4) == vHi)
      val want = (kept.sum + k.toLong * vLo + k.toLong * vHi).toDouble / n
      assert(r.getDouble(5) == want, s"user ${r.getLong(0)} winsorized mismatch")
      assert(r.getDouble(6) == xs.sum.toDouble / n)
      // clamping keeps the estimator inside the kept-value envelope
      assert(r.getDouble(5) >= vLo.toDouble && r.getDouble(5) <= vHi.toDouble)
    }
  }

  // ---- full-outer join with both-side null extension ----

  test("q_join_full: every side marker occurs, zero-defaults agree with " +
      "the marker, and counts match a local recomputation") {
    val rows = graft.operators.RelationalQueries.all("q_join_full")
      .fn(spark, sf0).collect()
    val sides = rows.map(_.getString(4)).toSet
    assert(sides == Set("both", "pur_only", "clk_only"),
      s"full outer must exercise both null paths: $sides")
    rows.foreach { r =>
      val (p, c, side) = (r.getLong(2), r.getLong(3), r.getString(4))
      side match {
        case "both"     => assert(p > 0 && c > 0)
        case "pur_only" => assert(p > 0 && c == 0)
        case "clk_only" => assert(p == 0 && c > 0)
      }
    }
    // local recomputation from raw events
    val ev = Tables.events(spark, sf0)
      .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
        col("event_type")).collect()
    def roll(t: String) = ev.filter(_.getString(2) == t)
      .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    val (pur, clk) = (roll("purchase"), roll("click"))
    val want = (pur.keySet ++ clk.keySet).map { k =>
      k -> (pur.getOrElse(k, 0L), clk.getOrElse(k, 0L))
    }.toMap
    val got = rows.map(r => (r.getLong(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
  }

  // ---- Theil-Sen robust trend ----

  test("q_theil_sen: slope is the exact lower-median pairwise slope " +
      "(local replay), pair count is n_days choose 2") {
    import graft.operators.TimeSeries
    val obs = TimeSeries.dailyObserved(Tables.events(spark, sf0))
      .collect().groupBy(_.getLong(0))
    val got = graft.operators.TimeSeries.all("q_theil_sen")
      .fn(spark, sf0).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val series = obs(r.getLong(0))
        .map(x => (x.getDate(1).toString, x.getDouble(2))).sortBy(_._1)
      val days = series.map { case (dstr, v) =>
        (java.time.LocalDate.parse(dstr).toEpochDay, v)
      }
      val slopes = (for {
        j <- days.indices; i <- 0 until j
      } yield (days(j)._2 - days(i)._2) / (days(j)._1 - days(i)._1).toDouble)
        .sorted
      assert(r.getLong(1) == days.length.toLong)
      assert(r.getLong(2) == slopes.length.toLong &&
        slopes.length == days.length * (days.length - 1) / 2)
      assert(r.getDouble(3) == slopes((slopes.length + 1) / 2 - 1),
        s"user ${r.getLong(0)}: slope must be the exact lower median")
    }
  }

  // ---- distributed batch-perceptron training ----

  test("perceptronTrain: equals a local reference loop, is partitioning-" +
      "invariant, converges and then holds the fixed point") {
    import graft.operators.Scoring
    val docs = Tables.documents(spark, sf0)
    val got = Scoring.perceptronTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    // local reference over the same features
    val stop = Set("the", "and", "of", "a", "is")
    val feats = docs.select(col("text")).collect().map { r =>
      val t = r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val y = if (t.length >= 64) 1L else -1L
      (y, Array(16L, t.length.toLong - 64L,
        t.count(stop).toLong - 4L, t.distinct.length.toLong - 44L))
    }
    var w = Array(0L, 0L, 0L, 0L)
    val ref = (1 to 24).map { r =>
      val g = Array(0L, 0L, 0L, 0L); var nErr = 0L
      feats.foreach { case (y, x) =>
        if (y * w.zip(x).map { case (a, c) => a * c }.sum <= 0) {
          nErr += 1; (0 until 4).foreach(j => g(j) += y * x(j))
        }
      }
      w = w.zip(g).map { case (a, c) => a + c }
      (r.toLong, nErr, w.toSeq)
    }
    assert(got.toSeq == ref, "distributed loop must replay the reference")
    // converged at sf0.001 and the gradient-free tail is a fixed point
    assert(got.last._2 == 0L, "training error must reach zero")
    val conv = got.indexWhere(_._2 == 0L)
    got.drop(conv).foreach { case (_, e, wv) =>
      assert(e == 0L && wv == got(conv)._3, "post-convergence rows fixed")
    }
    // partitioning invariance: int64 sums are order-free
    val re = Scoring.perceptronTrain(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(re.toSeq == got.toSeq)
  }
}
