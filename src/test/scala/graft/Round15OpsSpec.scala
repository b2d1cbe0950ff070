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
}
