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
