package graft

import graft.core.Tables
import graft.operators.{HyperLogLog, IncrementalQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Contracts of the round-13 incremental-maintenance operators. */
class IncrementalSpec extends SparkSpec {

  test("q_ivm_agg: incremental merge equals full recompute (IVM identity)") {
    val ivm = IncrementalQueries.all("q_ivm_agg").fn(spark, sf0)
    // the same post-change state, computed the boring way inside Spark
    val cut = lit("1999-01-01 00:00:00").cast("timestamp")
    val direct = Tables.orders(spark, sf0)
      .where((col("o_orderdate") < cut && col("o_orderstatus") =!= "F") ||
        col("o_orderdate") >= cut)
      .groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("rev"))
      .orderBy("o_orderpriority")
    assert(ivm.collect().toSeq == direct.collect().toSeq)
    assert(ivm.count() > 0)
  }

  test("q_ivm_join: three-term delta rule equals full join recompute") {
    val ivm = IncrementalQueries.all("q_ivm_join").fn(spark, sf0)
    val direct = Tables.orders(spark, sf0)
      .join(Tables.lineitem(spark, sf0),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("rev"))
      .orderBy("o_orderpriority")
    assert(ivm.collect().toSeq == direct.collect().toSeq)
    assert(ivm.count() > 0)
  }

  test("hll rollup: merged registers equal direct global registers") {
    val ev = Tables.events(spark, sf0)
    val perType = HyperLogLog.registersBy(ev, "user_id", Seq("event_type"))
    val merged = HyperLogLog.mergeRegisters(perType, Nil)
      .orderBy("bucket").collect().toSeq
    val direct = HyperLogLog.registersBy(ev, "user_id", Nil)
      .orderBy("bucket").collect().toSeq
    assert(merged == direct, "register-wise MAX over group sketches must " +
      "equal the sketch of the union — the mergeability law")
  }

  test("hll rollup: global estimate derives from sketches with NO rescan") {
    val ev = Tables.events(spark, sf0)
    // materialized sketch state, as a deployment would store it
    val regs = HyperLogLog.registersBy(ev, "user_id", Seq("event_type"))
      .localCheckpoint()
    val global = HyperLogLog.estimateBy(HyperLogLog.mergeRegisters(regs, Nil), Nil)
    val plan = global.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"rollup from stored sketches must not rescan the base table:\n$plan")
    val est = global.collect()(0).getDouble(0)
    val exact = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    // m=256 registers on ~100 distinct users sits in the linear-counting
    // regime: tight. Allow the documented HLL error envelope regardless.
    assert(math.abs(est - exact) <= math.max(3.0, 0.15 * exact),
      s"est $est vs exact $exact")
  }
}
