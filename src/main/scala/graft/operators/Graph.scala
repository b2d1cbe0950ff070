package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a relationally-derived graph
  * (north-star extension, round 12).
  *
  * PageRank over the nation-level shipping graph: nation A → nation B
  * when some supplier in A ships a line item to a customer in B. The
  * expensive step at scale is the EDGE DERIVATION — a fact-fact join
  * (lineitem ⋈ orders, one shuffle) with both dimension joins broadcast
  * — so it runs once and the result is checkpointed before iterating.
  * Iterations are the standard distributed PageRank shape: contributions
  * shuffle on the destination key with map-side partial sums; on the
  * 25-node harness graph the rank frame also broadcasts, and on a
  * billion-node graph the same plan degrades gracefully to a
  * hash-partitioned join (plus periodic checkpoints to cut lineage —
  * here 3 fixed iterations keep the plan shallow).
  *
  * Float-free by design: ranks are fixed-point integers (10^12 scale)
  * and the damping update is `(15·S) div 100 + (85·in) div 100` — every
  * operation is exact 64-bit integer arithmetic, associative and
  * order-free, so the DuckDB oracle (3 unrolled CTE iterations) matches
  * bit-for-bit with no float tolerance. Dangling-node mass simply decays
  * (not redistributed) — identically in both engines.
  */
object Graph {

  /** Fixed-point scale: each node starts with 10^12 rank units. */
  val scale = 1000000000000L
  val iters = 3

  private val cache = new graft.core.SessionCache[DataFrame]

  /** Distinct src→dst nation edges with out-degree attached; derived
    * once per session (the fact-fact join is the scale cost, the
    * iterations are not) and localCheckpoint'd so the 3 iterations don't
    * re-run the join. */
  private def edges(s: SparkSession, d: String): DataFrame =
    cache.getOrElseUpdate(s, s"edges:$d") {
      val e = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("dst"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("src"))),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      e.join(deg, "src").localCheckpoint()
    }

  def pageRank(s: SparkSession, d: String): DataFrame = {
    val ew = edges(s, d)
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name"))
    var ranks = nodes.select(col("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(broadcast(ranks), ew("src") === ranks("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = nodes.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(15L * scale / 100) +
            expr("(85 * coalesce(in_sum, 0L)) div 100")).as("pr"))
    }
    nodes.join(ranks, "node")
      .select(col("n_name").as("nation"), col("pr").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("nation"))
  }

  /** One unrolled oracle iteration: ranks `r{i}` from `r{i-1}`. */
  private def iterSql(i: Int): String =
    s"""c$i AS (SELECT e.dst AS node, CAST(sum(r.pr // e.outdeg) AS BIGINT) AS in_sum
       |  FROM edges e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst),
       |r$i AS (SELECT n.node,
       |    CAST(${15L * scale / 100} + (85 * COALESCE(c$i.in_sum, 0)) // 100 AS BIGINT) AS pr
       |  FROM r${i - 1} n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin

  val all: Map[String, Q] = Map(
    "q_pagerank" -> Q(
      (s, d) => pageRank(s, d),
      s"""WITH e0 AS (SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
         |    FROM lineitem l
         |    JOIN orders o ON l.l_orderkey = o.o_orderkey
         |    JOIN customer c ON o.o_custkey = c.c_custkey
         |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |    WHERE s.s_nationkey <> c.c_nationkey),
         |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e0 GROUP BY src),
         |edges AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
         |r0 AS (SELECT n_nationkey AS node, CAST($scale AS BIGINT) AS pr FROM nation),
         |${(1 to iters).map(iterSql).mkString(",\n")}
         |SELECT n.n_name AS nation, r$iters.pr AS rank_scaled
         |FROM r$iters JOIN nation n ON r$iters.node = n.n_nationkey
         |ORDER BY rank_scaled DESC, nation""".stripMargin)
  )
}
