package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan locks for the expensive non-TPCH bench rows (VERDICT r17 #6):
  * the r17 bench mystery (unchanged rows inflating 2–9×) cost a round of
  * attribution work precisely because a plan regression could not be
  * ruled out at a glance. These assertions pin the physical shapes the
  * rows were designed around — exchange counts, broadcast sides, the
  * binned-range rewrite, salt-keyed joins, the watermarked stream-stream
  * join — so a future shape change is a test failure, not a bench
  * archaeology project. Shapes were derived from ExplainProbe dumps at
  * sf0.001 (target/ladder discipline: lock the plan you audited). */
class JoinShapeSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0)

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def count(p: String, needle: String): Int =
    needle.r.findAllIn(p).length

  /** Re-plan `body` with auto-broadcast disabled — the shape every one of
    * these joins takes once the build side outgrows the 10 MB threshold
    * (sf0.1+, and always at 100 TB). Locking BOTH regimes catches a
    * regression in either the small-input or the at-scale plan. */
  private def withNoBroadcast[A](body: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, prev)
  }

  test("q_range_join: binned equi-join, never a nested loop in either regime") {
    val p = plan(q("q_range_join"))
    // the whole point of the bin rewrite: the BETWEEN predicate rides an
    // equi-join (bin key) as a residual, so no BNLJ/Cartesian can appear
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"tiny interval side should broadcast:\n$p")
    assert(p.contains("Generate"), s"bin replication (explode) missing:\n$p")
    val pNb = withNoBroadcast(plan(q("q_range_join")))
    assert(!pNb.contains("BroadcastNestedLoopJoin") && !pNb.contains("CartesianProduct"),
      s"no-broadcast regime degraded to a nested loop:\n$pNb")
    assert(pNb.contains("SortMergeJoin") || pNb.contains("ShuffledHashJoin"),
      s"no-broadcast regime lost the equi-join:\n$pNb")
  }

  test("q_join_star: all three dims broadcast; dims never hash-partition") {
    val p = plan(q("q_join_star"))
    assert(count(p, "BroadcastExchange") >= 3, s"dim broadcasts missing:\n$p")
    // r19 eager-agg shape: 1 hash exchange (the order-grain rollup, below
    // the joins) + 1 for the final (r,n) agg + 1 range (orderBy); allow
    // the fact-fact shuffle pair if stats stop auto-broadcasting orders,
    // but never a dim hash-exchange beyond that
    assert(count(p, "hashpartitioning") <= 4, s"unexpected hash exchanges:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the eager-aggregation lock (VERDICT r18 #6): the order-grain partial
    // rollup must sit BELOW the first join — the plan's innermost
    // aggregate keys on l_orderkey and no distinct-aggregate Expand
    // survives anywhere
    assert(p.contains("Keys [1]: [l_orderkey"),
      s"order-grain rollup under the joins missing:\n$p")
    assert(!p.contains("Expand"), s"distinct-aggregate Expand returned:\n$p")
  }

  test("q_join_salted_forced: 8-way replication, join keyed on the salt") {
    val p = plan(q("q_join_salted_forced"))
    assert(p.contains("Generate"), s"salt replication (explode) missing:\n$p")
    assert(p.contains("__salt"), s"join not keyed on salt:\n$p")
    // the A/B arm's scale shape: with broadcast off this MUST be a shuffle
    // join still keyed on (key, salt) — that is the skew mitigation itself
    val pNb = withNoBroadcast(plan(q("q_join_salted_forced")))
    assert(pNb.contains("SortMergeJoin") || pNb.contains("ShuffledHashJoin"),
      s"forced arm lost its shuffle join:\n$pNb")
    assert(pNb.contains("__salt"), s"shuffle join not keyed on salt:\n$pNb")
    assert(!pNb.contains("BroadcastNestedLoopJoin") && !pNb.contains("CartesianProduct"), pNb)
  }

  test("q_stream_join: one watermarked stream-stream join, both sides fenced") {
    val df = graft.streaming.EventStreams.purchaseClickJoin(spark, sf0)
    assert(df.isStreaming)
    val analyzed = df.queryExecution.analyzed
    val watermarks = analyzed.collect {
      case n if n.nodeName == "EventTimeWatermark" => n
    }
    val joins = analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(watermarks.length == 2,
      s"expected both stream sides watermarked, got ${watermarks.length}:\n$analyzed")
    assert(joins.length == 1, s"expected exactly one stream-stream join:\n$analyzed")
  }
}
