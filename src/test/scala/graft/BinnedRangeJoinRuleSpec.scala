package graft

import graft.plans.BinnedRangeJoin
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The injected rule turns a naive `p BETWEEN s AND e` join (the band join
  * a user actually writes, which Catalyst can only plan as a
  * BroadcastNestedLoopJoin) into a bin equi-join with the original
  * predicate as residual: same rows, no BNLJ. */
class BinnedRangeJoinRuleSpec extends SparkSpec {

  private def naive() = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val points = Seq.fill(400)(rnd.nextInt(2000).toLong).toDF("p")
    val intervals = (1 to 80).map { id =>
      val s = rnd.nextInt(2000).toLong
      (id.toLong, s, s + rnd.nextInt(90).toLong)
    }.toDF("id", "s", "e")
    points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
      .select(col("p"), col("id"))
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("band join is rewritten to a bin equi-join with identical rows") {
    val want = collectPairs(naive()) // without the rule (BNLJ baseline)
    assert(want.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoin
    try {
      val df = naive()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire — plan still BNLJ:\n$plan")
      assert(collectPairs(df) === want)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoin)
    }
  }

  test("equi-key joins with extra range conjuncts are left alone") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoin
    try {
      val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "p")
      val b = Seq((1L, 5L, 15L), (2L, 25L, 30L)).toDF("k2", "s", "e")
      val df = a.join(b, col("k") === col("k2") &&
        col("p") >= col("s") && col("p") <= col("e"))
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("__rbin_"), s"rule fired on an equi-key join:\n$plan")
      assert(df.count() == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoin)
    }
  }

  test("inverted and empty intervals survive replication and die in the residual") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoin
    try {
      val points = Seq(10L, 50L).toDF("p")
      val intervals = Seq((1L, 40L, 60L), (2L, 90L, 20L)).toDF("id", "s", "e")
      val got = points.join(intervals,
          col("p") >= col("s") && col("p") <= col("e"))
        .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((50L, 1L)))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoin)
    }
  }
}
