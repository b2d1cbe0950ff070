package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Shape + smoke tests for the round-13 relational additions (TPC-H
  * Q1/Q3/Q18 shapes, lateral explode). The plan assertions pin the scale
  * properties the queries were designed around; values are pinned by the
  * DuckDB oracle at sf0.01 (driver t2). */
class TpchShapeSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    RelationalQueries.all(name).fn(spark, sf0)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: one scan, partial aggregation, constant-size output") {
    val df = q("q_tpch_q1")
    val p = plan(df)
    // map-side combine: a partial HashAggregate must appear below the exchange
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
    val rows = df.collect()
    assert(rows.length <= 6 && rows.nonEmpty)
    // avg columns are exactly sum/count (single IEEE division)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      assert(r.getAs[Double]("avg_qty") == sumQty / n)
    }
  }

  test("q3: segment dim broadcasts; top-10 via ordered limit, no global sort") {
    val df = q("q_tpch_q3")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"customer dim does not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 is not a per-partition heap:\n$p")
    assert(df.count() <= 10)
  }

  test("q18: having-gate aggregates before joining; survivors only") {
    val df = q("q_tpch_q18")
    val rows = df.collect()
    assert(rows.forall(_.getAs[Double]("total_qty") > 300.0))
    // the qualifying-orders aggregate must run BELOW the join with orders
    val p = plan(df)
    assert(p.indexOf("HashAggregate") >= 0, s"no aggregate:\n$p")
  }

  test("explode: positions are 0..dim-1 per vector, no shuffle in the plan") {
    val df = q("q_explode")
    val p = plan(df)
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      s"explode introduced a non-sort exchange:\n$p")
    val perVec = df.groupBy("vec_id").count().collect()
    assert(perVec.nonEmpty && perVec.forall(_.getAs[Long]("count") == 64L))
  }
}
