package graft

import graft.operators.CountMinSketch
import org.apache.spark.sql.functions._

/** CountMinSketch: estimates are one-sided (never undercount — the property
  * heavy-hitter pruning relies on), exact when the sketch is collision-free,
  * zero for unseen keys, and the probe broadcasts the counter table. */
class CountMinSketchSpec extends SparkSpec {

  test("one-sided error: est >= exact for every key; unseen keys estimate 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish: key k appears ~ 1000/k times
    val keys = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"term_$k"))
    val df = rnd.shuffle(keys).toDF("k")
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sketch = CountMinSketch.build(df, "k", depth = 4, width = 512)
    val probes = ((1 to 50).map(k => s"term_$k") ++ Seq("never_seen_a", "never_seen_b")).toDF("k")
    val est = CountMinSketch.estimate(probes, sketch, "k", depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k undercounted: ${est(k)} < $n")
    }
    assert(est("never_seen_a") === 0L && est("never_seen_b") === 0L)
    // total overcount is bounded in expectation; sanity-check it's not wild
    val over = exact.map { case (k, n) => est(k) - n }.sum
    assert(over < keys.size, s"total overcount $over")
  }

  test("buildWeighted over the count table equals build over raw occurrences") {
    import spark.implicits._
    val raw = (1 to 500).map(i => s"t${i % 37}").toDF("k")
    val cnt = raw.groupBy("k").agg(count(lit(1)).as("w"))
    val a = CountMinSketch.build(raw, "k", depth = 4, width = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = CountMinSketch.buildWeighted(cnt, "k", "w", depth = 4, width = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b && a.nonEmpty)
  }

  test("duplicate probe rows each keep their own output row; colliding r/c/cnt columns are safe") {
    import spark.implicits._
    val sketch = CountMinSketch.build(Seq("x", "x", "y").toDF("k"), "k", depth = 4, width = 512)
    val probe = Seq(("x", 1, 2L, 3L), ("x", 1, 2L, 3L), ("zz", 4, 5L, 6L))
      .toDF("k", "r", "c", "cnt")
    val out = CountMinSketch.estimate(probe, sketch, "k", depth = 4, width = 512)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(out.length === 3)
    assert(out.count(_ == ("x", 2L)) === 2)
    assert(out.contains(("zz", 0L)))
  }

  test("probe plan broadcasts the sketch") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"k${i % 10}").toDF("k")
    val plan = CountMinSketch.estimate(df.distinct(), CountMinSketch.build(df, "k"), "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
