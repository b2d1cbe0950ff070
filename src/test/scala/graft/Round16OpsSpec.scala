package graft

import graft.core.Tables
import graft.operators.{Dedup, Tokenize}
import org.apache.spark.sql.functions._

/** Operator-level behavior of the r16 additions: corpus-level overlap
  * sketches and the batching padding-waste A/B. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("corpusOverlap: identical sources sketch to exactly 1, disjoint to ~0, " +
      "estimates are errors-bounded probabilities") {
    // planted corpus: dupA ≡ dupB (identical text sets — identical shingle
    // sets give IDENTICAL sketches, so est must be exactly 1), disjoint
    // vocabularies between dupA and faraway
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "dupA"),
      (2L, "iota kappa lambda mu nu xi omicron pi", "dupA"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "dupB"),
      (4L, "iota kappa lambda mu nu xi omicron pi", "dupB"),
      (5L, "one two three four five six seven eight", "faraway"),
      (6L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", "faraway")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusOverlap(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val (exactDup, estDup, errDup) = out(("dupA", "dupB"))
    assert(exactDup == 1.0 && estDup == 1.0 && errDup == 0.0,
      s"identical sources must overlap exactly: $out")
    val (exactFar, estFar, _) = out(("dupA", "faraway"))
    assert(exactFar == 0.0, "disjoint vocabularies share no shingles")
    // disjoint sets can only 'match' a slot via a 60-bit hash collision
    assert(estFar == 0.0, s"disjoint sketch estimate should be 0, got $estFar")
    out.values.foreach { case (exact, est, err) =>
      assert(exact >= 0 && exact <= 1 && est >= 0 && est <= 1)
      assert(math.abs(err - math.abs(est - exact)) < 1e-15)
    }
  }

  test("corpusOverlap on the harness corpus: estimate tracks exact within " +
      "the 64-slot binomial error band") {
    val out = Dedup.corpusOverlap(Tables.documents(spark, sf0), "source", "text")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getDouble(4)
      val err = r.getDouble(6)
      // stderr = sqrt(J(1-J)/64) ≤ 1/16; allow 5σ + one slot of quantization
      val bound = 5.0 * math.sqrt(math.max(exact * (1 - exact), 0.25 / 64) / 64) + 1.0 / 64
      assert(err <= bound,
        s"${r.getString(0)}∩${r.getString(1)}: est err $err exceeds $bound (exact $exact)")
    }
  }

  test("paddingWaste: length-sorted batching never wastes more than shuffled; " +
      "accounting closes") {
    val out = Tokenize.paddingWaste(Tables.documents(spark, sf0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (bS, realS, padS, wasteS) = out("shuffled")
    val (bT, realT, padT, wasteT) = out("sorted")
    // the same docs in the same shards: batch counts and real totals match
    assert(bS == bT && realS == realT)
    assert(padS >= realS && padT >= realT)
    // the point of the operator: sorting within shards reduces pad waste
    assert(wasteT <= wasteS, s"sorted $wasteT must not exceed shuffled $wasteS")
    // waste recomputes from its own columns
    assert(wasteS == (padS - realS).toDouble / padS)
    assert(wasteT == (padT - realT).toDouble / padT)
  }

  test("paddingWaste: a constant-length corpus wastes nothing under either strategy") {
    val docs = (1L to 64L).map(i => (i, "a b c d e f g h")).toDF("doc_id", "text")
    Tokenize.paddingWaste(docs).collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(3), "equal lengths → no padding")
      assert(r.getDouble(4) == 0.0)
    }
  }

  test("q_mix_epochs: BIGINT plan arithmetic is self-consistent — " +
      "target = epochs·supply + rem, deficit only past the 4-epoch cap") {
    val rows = SparkEntry.queries("q_mix_epochs")(spark, sf0).collect()
    assert(rows.length === 10, "one row per recipe source")
    val supply = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, target, epochs, rem, deficit) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(target === epochs * n + rem, s"div/mod identity at $r")
      assert(rem >= 0 && rem < n)
      assert(deficit === math.max(0L, target - 4 * n))
    }
    // sixteenths recipe sums to 1 → targets sum to the 4× budget minus
    // at most one rounding unit per source
    val targetSum = rows.map(_.getLong(2)).sum
    assert(targetSum <= 4 * supply && targetSum > 4 * supply - 16)
  }

  test("q_quality_top_frac: keeps exactly floor(count/4) per source, and " +
      "kept docs dominate dropped ones under the (n_chars, doc_id) order") {
    val all = Tables.documents(spark, sf0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("q_quality_top_frac")(spark, sf0).collect()
    val bySrc = kept.groupBy(_.getString(1))
    all.foreach { case (src, cnt) =>
      val k = bySrc.get(src).map(_.length).getOrElse(0)
      assert(k === (cnt / 4).toInt, s"$src: expected floor($cnt/4), got $k")
    }
  }

  test("q_skyline: result equals the brute-force dominance definition") {
    val sky = SparkEntry.queries("q_skyline")(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val all = Tables.part(spark, sf0)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val brute = all.filter { case (_, pr, sz) =>
      !all.exists { case (_, qr, qz) =>
        (qr < pr && qz >= sz) || (qr <= pr && qz > sz)
      }
    }.toSet
    assert(sky === brute, s"skyline mismatch: extra=${sky -- brute} missing=${brute -- sky}")
    assert(sky.nonEmpty)
  }

  test("q_assoc_rules: supports bound each other, conf/lift recompute " +
      "exactly, and a sampled pair's support matches brute basket overlap") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, sf0).collect()
    assert(rows.nonEmpty)
    val baskRows = Tables.lineitem(spark, sf0)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
    val baskets = baskRows.groupBy(_.getLong(1)).map { case (pk, rs) =>
        pk -> rs.map(_.getLong(0)).toSet }
    // fractional a-priori floors (r17): minsup = ⌈nbask/2000⌉ items,
    // ⌈nbask/10000⌉ pairs — recomputed here from the data, same integer
    // arithmetic as the query
    val nbask = baskRows.map(_.getLong(0)).distinct.length.toLong
    val minsup = (nbask + 1999) / 2000
    val pairFloor = (nbask + 9999) / 10000
    rows.foreach { r =>
      val (pa, pb, nab, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pa < pb && nab >= pairFloor && na >= minsup && nb >= minsup)
      assert(nab <= math.min(na, nb))
      assert(r.getDouble(5) === nab.toDouble / na)
    }
    // brute-force one pair: co-occurrence = |orders(pa) ∩ orders(pb)|
    val r0 = rows.head
    val expect = (baskets(r0.getLong(0)) intersect baskets(r0.getLong(1))).size
    assert(r0.getLong(2) === expect.toLong)
  }

  test("q_silhouette: scores bounded in [-1, 1], every fitted cluster " +
      "reports, counts partition the corpus") {
    val rows = SparkEntry.queries("q_silhouette")(spark, sf0).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, s"mean silhouette out of range: $s")
      assert(r.getLong(1) > 0)
    }
    val total = Tables.embeddings(spark, sf0).count()
    assert(rows.map(_.getLong(1)).sum === total)
  }

  test("q_weighted_median: crossing point is correct against a local " +
      "recomputation of the weighted CDF") {
    val rows = SparkEntry.queries("q_weighted_median")(spark, sf0).collect()
    assert(rows.length === 3)
    val data = Tables.lineitem(spark, sf0)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity")).cast("long"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val (flag, med, tot) = (r.getString(0), r.getLong(1), r.getLong(2))
      val xs = data(flag).map(x => (x.getLong(1), x.getLong(2)))
      assert(xs.map(_._2).sum === tot)
      // inclusive cumulative weight by value group; median = first value
      // whose cum reaches half the total mass
      val byVal = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var acc = 0L
      val m = byVal.collectFirst { case (v, w) if { acc += w; 2 * acc >= tot } => v }
      assert(m.contains(med), s"$flag: expected $m got $med")
    }
  }

  test("plan locks: markov rides ONE user-keyed window exchange; " +
      "top-frac's two windows share ONE source exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val mk = SparkEntry.queries("q_markov_transitions")(spark, sf0)
        .queryExecution.executedPlan
      val mkEx = mk.collect { case e: ShuffleExchangeExec => e }
      assert(mkEx.count(_.outputPartitioning.toString.contains("user_id")) === 1,
        s"exactly one user-keyed exchange must feed the window:\n$mk")
      val tf = SparkEntry.queries("q_quality_top_frac")(spark, sf0)
        .queryExecution.executedPlan
      val tfEx = tf.collect { case e: ShuffleExchangeExec => e }
      assert(tfEx.count(_.outputPartitioning.toString.contains("source")) === 1,
        s"rank and count windows must share one source exchange:\n$tf")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q_event_paths: path length equals event count, conversion flag " +
      "recomputes from the emitted path, masses close") {
    val rows = SparkEntry.queries("q_event_paths")(spark, sf0).collect()
    val totalEvents = Tables.events(spark, sf0).count()
    assert(rows.map(_.getLong(1)).sum === totalEvents)
    rows.foreach { r =>
      val (n, path, conv) = (r.getLong(1), r.getString(2), r.getBoolean(3))
      // r17: the path is capped at the user's first 256 events (the
      // aggregation-state bound); n_events stays the uncapped count
      assert(path.length.toLong === math.min(n, 256L))
      assert(path.forall("vcpse".contains(_)), s"unexpected initial in $path")
      assert(conv === "v.*c.*p".r.findFirstIn(path).isDefined)
    }
  }

  test("q_interleave: positions unique, every leading block of |sources| " +
      "rotates through distinct sources") {
    val rows = SparkEntry.queries("q_interleave")(spark, sf0).collect()
    val n = rows.length
    assert(rows.map(_.getLong(0)).distinct.length === n, "positions unique")
    val nsrc = rows.map(_.getString(2)).distinct.length
    // uniform harness sources: the first full rotation must hit nsrc
    // distinct sources in position order
    val firstBlock = rows.sortBy(_.getLong(0)).take(nsrc).map(_.getString(2))
    assert(firstBlock.distinct.length === nsrc, s"block not a rotation: ${firstBlock.toSeq}")
  }

  test("firstDigit kernel: agrees with the string head at every " +
      "power-of-ten boundary and on random longs") {
    import graft.functions.TextHashes
    val probes = (0 to 17).flatMap { e =>
      val p = math.pow(10, e).toLong
      Seq(p - 1, p, p + 1)
    } ++ Seq(1L, 9L, Long.MaxValue) ++
      (1 to 200).map(i => math.abs(i * 0x9E3779B97F4A7C15L) % Long.MaxValue + 1)
    probes.filter(_ > 0).foreach { v =>
      assert(TextHashes.firstDigit(v) === v.toString.head.asDigit.toLong, s"v=$v")
    }
    assert(TextHashes.firstDigit(0L) === 0L)
    assert(TextHashes.firstDigit(-5L) === 0L)
  }

  test("q_benford: digit masses partition the rows, observed sums to 1, " +
      "expected is the Benford law table") {
    val rows = SparkEntry.queries("q_benford")(spark, sf0).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    val total = Tables.lineitem(spark, sf0)
      .where(round(col("l_extendedprice") * 100) > 0).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6,
      "Benford masses sum to ~1")
    // first digit really is the leading digit of the cents value
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
  }

  test("q_markov_transitions: rows form a stochastic matrix and transition " +
      "mass equals events minus users") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf0).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"$src rows sum to $psum")
      assert(rs.forall(_.getLong(2) > 0))
    }
    val ev = Tables.events(spark, sf0)
    val n = ev.count()
    val u = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === n - u,
      "each user with k events contributes exactly k-1 transitions")
  }

  test("q_entity_match_lev: block key and band hold on every emitted pair; " +
      "distance verified against a reference DP on a sample") {
    val rows = SparkEntry.queries("q_entity_match_lev")(spark, sf0).collect()
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b && a.head == b.head && math.abs(a.length - b.length) <= 4)
      assert(d <= 4 && d === lev(a, b).toLong, s"distance mismatch on ($a,$b)")
    }
  }
}
