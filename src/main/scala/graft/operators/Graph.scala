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

  /** BFS rounds — both engines unroll the SAME fixed count, so even if the
    * graph's diameter exceeded it they truncate identically. */
  val bfsIters = 4

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

  /** Single-source shortest hops (BFS) over the directed shipping graph,
    * rooted at the smallest nation key that HAS an out-edge (a fixed root
    * can be edge-less at tiny scale factors, which degenerates the query;
    * min-src is total-ordered and engine-independent). The standard
    * distributed frontier iteration: each round joins the current
    * distance frame against the edge list and folds `min(hops)` over
    * (known ∪ expanded). All-integer, so the unrolled-CTE oracle matches
    * exactly with no tolerance.
    *
    * Scale shape: the expensive term is the one-off edge derivation
    * (shared, checkpointed — see [[edges]]). Each round is one keyed
    * join + one min-aggregation; the frontier join carries NO broadcast
    * hint (a hint is honored regardless of size, and the distance frame
    * grows to the full node set) — AQE broadcasts it on the 25-node
    * harness graph and falls back to a hash-partitioned join once the
    * runtime size exceeds the threshold. A production loop would
    * iterate on the DELTA frontier (newly-settled nodes only) until it
    * empties — fixed unrolling here keeps the oracle expressible; the
    * full-frame min is idempotent past convergence, so both shapes
    * agree on every settled distance.
    *
    * Each round REFERENCES the distance frame twice (the union and the
    * frontier join), so without a materialization boundary the lineage
    * doubles per round — 2^k copies of round 0 in the executed tree.
    * The per-round localCheckpoint (frontier-sized — the standard
    * Pregel-style periodic materialization) keeps evaluation linear in
    * rounds at ANY graph size; on the 25-node harness graph it is 4
    * sub-100ms jobs. */
  def bfsHops(s: SparkSession, d: String): DataFrame = {
    val ew = edges(s, d).select(col("src"), col("dst"))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    var dist = ew.agg(min(col("src")).cast("long").as("node"))
      .select(col("node"), lit(0L).as("hops"))
    for (_ <- 1 to bfsIters) {
      val expanded = ew.join(dist, ew("src") === dist("node"))
        .select(col("dst").cast("long").as("node"),
          (col("hops") + 1L).as("hops"))
      dist = dist.union(expanded)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
        .localCheckpoint()
    }
    nodes.join(dist, Seq("node"), "left")
      .select(col("n_name").as("nation"),
        coalesce(col("hops"), lit(-1L)).as("hops"))
      .orderBy("nation")
  }

  /** One unrolled BFS oracle round: `d{i}` = min-hop over d{i-1} ∪ its
    * one-step expansion. */
  private def bfsIterSql(i: Int): String =
    s"""d$i AS (SELECT node, min(hops) AS hops FROM (
       |    SELECT node, hops FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst AS node, x.hops + 1 AS hops
       |    FROM d${i - 1} x JOIN e ON e.src = x.node
       |  ) GROUP BY node)""".stripMargin

  /** One unrolled oracle iteration: ranks `r{i}` from `r{i-1}`. */
  private def iterSql(i: Int): String =
    s"""c$i AS (SELECT e.dst AS node, CAST(sum(r.pr // e.outdeg) AS BIGINT) AS in_sum
       |  FROM edges e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst),
       |r$i AS (SELECT n.node,
       |    CAST(${15L * scale / 100} + (85 * COALESCE(c$i.in_sum, 0)) // 100 AS BIGINT) AS pr
       |  FROM r${i - 1} n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin

  /** Triangle count over the undirected nation graph, by degree-ordered
    * edge orientation (the standard distributed algorithm — Suri &
    * Vassilvitskii's "node-iterator++"): orient every undirected edge
    * from its (degree, id)-smaller endpoint to the larger, build wedges
    * by joining the oriented edge list with itself on the source, and
    * close each wedge with a semi-join back against the oriented edges.
    * Degree ordering bounds each node's out-degree by O(√|E|), which
    * caps the wedge (candidate) volume at O(|E|^1.5) REGARDLESS of skew
    * — a hub of degree d contributes d wedges, not d², because almost
    * all of its edges point INTO it. Two keyed exchanges total (wedge
    * build, closing semi-join). The count is orientation-invariant, so
    * the oracle counts id-ordered triples — same number, simpler SQL. */
  def triangleCount(s: SparkSession, d: String): DataFrame = {
    val und = edges(s, d)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.a") === col("y.a") &&
        (col("x.b") < col("y.b")))
      .select(col("x.b").as("w1"), col("y.b").as("w2"))
    // the closing edge may be oriented either way between w1 and w2
    val closed = wedges.join(oriented,
      (col("a") === col("w1") && col("b") === col("w2")) ||
        (col("a") === col("w2") && col("b") === col("w1")), "left_semi")
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  val all: Map[String, Q] = Map(

    // -- triangle count (see [[triangleCount]]): degree-ordered wedge
    //    join — the O(|E|^1.5) bound survives hubs; oracle counts
    //    id-ordered triples (orientation-invariant count) --
    "q_triangle" -> Q(
      (s, d) => triangleCount(s, d),
      """WITH e0 AS (SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        |    FROM lineitem l
        |    JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |    WHERE s.s_nationkey <> c.c_nationkey),
        |e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e0)
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM e e1
        |     JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |     JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin),

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
         |ORDER BY rank_scaled DESC, nation""".stripMargin),

    // -- single-source BFS (see [[bfsHops]]): frontier join + min fold,
    //    both engines unroll the same fixed round count; unreached → -1 --
    "q_bfs_hops" -> Q(
      (s, d) => bfsHops(s, d),
      s"""WITH e0 AS (SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
         |    FROM lineitem l
         |    JOIN orders o ON l.l_orderkey = o.o_orderkey
         |    JOIN customer c ON o.o_custkey = c.c_custkey
         |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |    WHERE s.s_nationkey <> c.c_nationkey),
         |e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM e0),
         |d0 AS (SELECT min(src) AS node, CAST(0 AS BIGINT) AS hops FROM e),
         |${(1 to bfsIters).map(bfsIterSql).mkString(",\n")}
         |SELECT n.n_name AS nation,
         |  CAST(COALESCE(d$bfsIters.hops, -1) AS BIGINT) AS hops
         |FROM nation n LEFT JOIN d$bfsIters ON n.n_nationkey = d$bfsIters.node
         |ORDER BY nation""".stripMargin)
  )
}
