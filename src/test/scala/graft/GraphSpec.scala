package graft

import graft.operators.Graph
import org.apache.spark.sql.execution.ExplainMode

/** Fixed-point PageRank: mass-conservation bounds, determinism, and the
  * broadcast shape of the edge derivation. */
class GraphSpec extends SparkSpec {

  test("pagerank: mass bounds, non-degenerate, deterministic") {
    val a = Graph.pageRank(spark, sf0).collect()
    assert(a.length === 25)
    val total = a.map(_.getLong(1)).sum
    // every node keeps at least the damping floor; total mass can only
    // decay (dangling leak + integer-div truncation), never grow
    assert(a.forall(_.getLong(1) >= 15L * Graph.scale / 100))
    assert(total <= 25L * Graph.scale)
    assert(a.map(_.getLong(1)).distinct.length > 1, "ranks must differentiate")
    val b = Graph.pageRank(spark, sf0).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("bfs hops: source settles at 0, hops bounded by rounds, monotone " +
      "frontier (every reached node has an in-edge from a closer node)") {
    val rows = Graph.bfsHops(spark, sf0).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 25)
    val byNation = rows.toMap
    // hops either unreached (-1) or within the unrolled round budget
    assert(rows.forall { case (_, h) => h == -1L || (h >= 0L && h <= Graph.bfsIters) })
    // determinism
    val again = Graph.bfsHops(spark, sf0).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === again.toSeq)
    // the dense shipping graph reaches more than just the source
    assert(rows.count(_._2 >= 0) > 1, s"graph should be connected-ish: $byNation")
    assert(rows.count(_._2 == 0) === 1, "exactly one source at distance 0")
  }

  test("pagerank plan: dimension joins broadcast in the edge derivation") {
    val p = Graph.pageRank(spark, sf0).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
  }
}
