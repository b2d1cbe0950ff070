package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** RangeJoin: the bin-replicated equi-join must equal the naive
  * cross-join-filter semantics for any data and any bin width, and must
  * not plan a BroadcastNestedLoopJoin. */
class RangeJoinSpec extends SparkSpec {

  private def brute(points: Seq[Long], intervals: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- points
      (id, s, e) <- intervals
      if p >= s && p <= e
    } yield (p, id)).toSet

  private def run(points: Seq[Long], intervals: Seq[(Long, Long, Long)],
      binWidth: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val p = points.toDF("p")
    val iv = intervals.toDF("id", "s", "e")
    RangeJoin.pointInInterval(p, "p", iv, "s", "e", binWidth)
      .select(col("p"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("randomized equivalence with brute force, several bin widths") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)(rnd.nextInt(1000).toLong)
    val intervals = (1 to 60).map { id =>
      val s = rnd.nextInt(1000).toLong
      (id.toLong, s, s + rnd.nextInt(80).toLong)
    }
    val expected = brute(points, intervals)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 32L, 1000L))
      assert(run(points, intervals, w) === expected, s"binWidth=$w")
  }

  test("inclusive bounds, zero-length intervals, bin-boundary points") {
    // interval exactly one point wide on a bin boundary; points straddling it
    val intervals = Seq((1L, 32L, 32L), (2L, 31L, 33L))
    val points = Seq(30L, 31L, 32L, 33L, 34L)
    assert(run(points, intervals, 32L) === brute(points, intervals))
  }

  test("empty candidate bins produce no rows and no NPEs") {
    assert(run(Seq(5L), Seq((1L, 100L, 200L)), 32L).isEmpty)
  }

  test("plan contains no BroadcastNestedLoopJoin") {
    import spark.implicits._
    val p = (1L to 100L).toDF("p")
    val iv = Seq((1L, 10L, 40L), (2L, 50L, 90L)).toDF("id", "s", "e")
    val plan = RangeJoin.pointInInterval(p, "p", iv, "s", "e", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---- keyed variant -------------------------------------------------

  private def bruteKeyed(points: Seq[(Long, Long)],
      intervals: Seq[(Long, Long, Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (pk, p) <- points
      (id, ik, s, e) <- intervals
      if pk == ik && p >= s && p <= e
    } yield (pk, p, id)).toSet

  private def runKeyed(points: Seq[(Long, Long)],
      intervals: Seq[(Long, Long, Long, Long)], binWidth: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val p = points.toDF("pk", "p")
    val iv = intervals.toDF("id", "ik", "s", "e")
    RangeJoin.pointInIntervalKeyed(p, "p", Seq("pk"), iv, "s", "e", Seq("ik"), binWidth)
      .select(col("pk"), col("p"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("keyed: randomized equivalence with brute force, several bin widths") {
    val rnd = new scala.util.Random(11)
    val points = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val intervals = (1 to 60).map { id =>
      val s = rnd.nextInt(1000).toLong
      (id.toLong, rnd.nextInt(8).toLong, s, s + rnd.nextInt(80).toLong)
    }
    val expected = bruteKeyed(points, intervals)
    assert(expected.nonEmpty)
    // sanity: key must actually restrict vs the unkeyed join on same data
    assert(expected.size < brute(points.map(_._2), intervals.map(t => (t._1, t._3, t._4))).size)
    for (w <- Seq(1L, 7L, 32L, 1000L))
      assert(runKeyed(points, intervals, w) === expected, s"binWidth=$w")
  }

  test("keyed with empty key list degrades to the unkeyed join") {
    import spark.implicits._
    val p = (1L to 50L).toDF("p")
    val iv = Seq((1L, 10L, 40L), (2L, 35L, 90L)).toDF("id", "s", "e")
    val keyed = RangeJoin.pointInIntervalKeyed(p, "p", Nil, iv, "s", "e", Nil, 16)
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unkeyed = RangeJoin.pointInInterval(p, "p", iv, "s", "e", 16)
      .select("p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed === unkeyed && keyed.nonEmpty)
  }

  test("keyed: join keys include the key column (not a post-filter)") {
    import spark.implicits._
    val p = Seq((1L, 5L), (2L, 6L)).toDF("pk", "p")
    val iv = Seq((1L, 1L, 0L, 10L), (2L, 2L, 0L, 10L)).toDF("id", "ik", "s", "e")
    val plan = RangeJoin.pointInIntervalKeyed(p, "p", Seq("pk"), iv, "s", "e", Seq("ik"), 8)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the equi-key list must carry pk = ik, so the shuffle spreads over
    // (key, bin) — grep the optimized join condition
    assert(plan.contains("pk") && plan.contains("ik"), plan)
  }

  test("keyed: shared lineage and same-named key columns resolve (self range join)") {
    import spark.implicits._
    // Both sides derive from ONE DataFrame and the key column has the SAME
    // name on both sides — the shape Spark's ambiguous-self-join detection
    // rejects when the condition is built as p(pk) === iv(ik). The internal
    // aliasing must make this legal without callers renaming anything.
    val base = Seq((1L, 5L, 0L, 10L), (1L, 20L, 15L, 25L), (2L, 5L, 6L, 9L))
      .toDF("k", "v", "s", "e")
    val out = RangeJoin.pointInIntervalKeyed(
      base.select("k", "v"), "v", Seq("k"),
      base.select("k", "s", "e"), "s", "e", Seq("k"), 8)
    // expected: key 1 → v=5 in [0,10], v=20 in [15,25]; key 2 → v=5 not in [6,9]
    assert(out.count() == 2L)
  }
}
