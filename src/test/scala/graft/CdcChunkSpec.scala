package graft

import graft.functions.GraftFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Contracts of content-defined chunking: exact tiling of the token
  * stream, and the edit-stability property that is the whole point of
  * CDC — an insertion near the front must leave the suffix chunking
  * (by content hash) untouched. */
class CdcChunkSpec extends SparkSpec {

  private def words(seed: Int, n: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "julia", "kilo", "lima")
    Seq.fill(n)(vocab(r.nextInt(vocab.length)))
  }

  private def chunksOf(texts: Seq[(Long, String)]) = {
    GraftFunctions.register(spark)
    import spark.implicits._
    TextAnalysis.cdcChunk(texts.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id", "chunk_ix")
  }

  test("chunks tile the token stream exactly: no gaps, no overlaps") {
    val doc = words(7, 500).mkString(" ")
    val rows = chunksOf(Seq((1L, doc))).collect()
    assert(rows.nonEmpty)
    var expectStart = 1L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_tok") == expectStart, "gap or overlap")
      assert(r.getAs[Long]("n_toks") ==
        r.getAs[Long]("end_tok") - r.getAs[Long]("start_tok") + 1)
      expectStart = r.getAs[Long]("end_tok") + 1
    }
    assert(rows.last.getAs[Long]("end_tok") == 500L)
  }

  test("edit stability: a front insertion leaves the suffix chunk hashes intact") {
    val base = words(11, 600)
    val edited = (base.take(3) :+ "zulu") ++ base.drop(3)
    val out = chunksOf(Seq((1L, base.mkString(" ")), (2L, edited.mkString(" "))))
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val h1 = out(1L).sortBy(_.getAs[Long]("chunk_ix")).map(_.getAs[Long]("chunk_hash")).toSeq
    val h2 = out(2L).sortBy(_.getAs[Long]("chunk_ix")).map(_.getAs[Long]("chunk_hash")).toSeq
    // only chunks overlapping the first window past the edit may change:
    // everything after the first boundary ≥ edit+win re-cuts identically
    val m = math.min(h1.length, h2.length) - 2 // drop the (≤2) head chunks
    assert(m > 5, s"test doc too short to exercise the property (m=$m)")
    assert(h1.takeRight(m) == h2.takeRight(m),
      "suffix chunk hashes diverged — boundaries are not content-defined")
    // and the heads DO differ (the edit is visible somewhere)
    assert(h1 != h2)
  }

  test("fixed-stride chunking (the contrast) shifts every downstream chunk") {
    val base = words(11, 600)
    val edited = (base.take(3) :+ "zulu") ++ base.drop(3)
    import spark.implicits._
    val fixed = TextAnalysis.chunk(
      Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
        .toDF("doc_id", "text"), "doc_id", "text", 64, 64)
    val by = fixed.withColumn("h", md5(col("chunk")))
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val f1 = by(1L).sortBy(_.getAs[Long]("chunk_ix")).map(_.getAs[String]("h")).toSeq
    val f2 = by(2L).sortBy(_.getAs[Long]("chunk_ix")).map(_.getAs[String]("h")).toSeq
    // every fixed chunk from the edit onward differs — the instability CDC removes
    assert(f1.tail.intersect(f2.tail).isEmpty)
  }
}
