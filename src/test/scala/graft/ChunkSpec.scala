package graft

import graft.operators.{TextAnalysis => TA}

/** Chunking edge semantics: empty docs, sub-window docs, exact-stride
  * boundaries, overlap contract. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: empty doc yields no chunks; short doc one; boundaries exact") {
    val docs = Seq(
      (1L, ""),                                  // 0 tokens -> 0 chunks
      (2L, "a b c"),                             // 3 tokens -> 1 chunk
      (3L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, c=4 s=3 -> 3 chunks
      (4L, (1 to 7).map(i => s"t$i").mkString(" ")))  // 7 toks -> 2 chunks
      .toDF("doc_id", "text")
    val out = TA.chunk(docs, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_ix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(!out.exists(_._1 == 1L))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    val d3 = out.filter(_._1 == 3L).toSeq
    assert(d3.map(_._2) == Seq(0L, 1L, 2L))
    assert(d3.head._4 == "t1 t2 t3 t4")
    assert(d3(1)._4 == "t4 t5 t6 t7") // one-token overlap at stride 3
    assert(d3(2)._4 == "t7 t8 t9 t10")
    val d4 = out.filter(_._1 == 4L).toSeq
    assert(d4.map(c => (c._3, c._4)) == Seq((4L, "t1 t2 t3 t4"), (4L, "t4 t5 t6 t7")))
  }
}
