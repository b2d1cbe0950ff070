package graft

import graft.core.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketing: the 100 TB lever for repeated fact-fact joins — both tables
  * pre-hash-partitioned into the same bucket count on the join key means
  * the join needs NO shuffle exchange at read time (SCALE.md). */
class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assume(wh.contains("graft"), s"temp warehouse expected, got $wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      Tables.lineitem(spark, sf0).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf0).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

      val expected = Tables.lineitem(spark, sf0)
        .join(Tables.orders(spark, sf0), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority").collect()
      assert(joined.orderBy("o_orderpriority").collect().toSeq == expected.toSeq)

      // the join itself must not introduce a shuffle on the join key: the
      // only exchange in the plan is the post-join groupBy's
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size <= 1,
        s"expected at most the aggregation exchange, got ${exchanges.size}:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
