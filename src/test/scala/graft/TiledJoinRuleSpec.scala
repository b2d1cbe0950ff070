package graft

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.operators.Dedup
import graft.plans.TiledSimilarityJoin
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The injected optimizer rule turns the NAIVE all-pairs cosine join (the
  * formulation a user actually writes) into a tiled equi-join: same rows,
  * no BroadcastNestedLoopJoin. */
class TiledJoinRuleSpec extends SparkSpec {

  private def naive(tau: Double) = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf0).select("vec_id", "embedding")
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("cos"))
      .where(col("cos") >= tau)
  }

  test("naive cosine cross join is rewritten to a tiled equi-join") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TiledSimilarityJoin
    try {
      val df = naive(0.4)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire — plan still BNLJ:\n$plan")
      val got = df.select("va", "vb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Dedup.embeddingCosinePairs(
        Tables.embeddings(spark, sf0), "vec_id", "embedding", 0.4)
        .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TiledSimilarityJoin)
    }
  }

  test("without the rule the same query is a BroadcastNestedLoopJoin (baseline)") {
    val plan = naive(0.4).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
