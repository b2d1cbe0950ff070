package graft

import graft.operators.BloomFilter

/** BloomFilter: membership is complete (no false negatives — the property
  * the novelty gate's correctness rests on), false positives stay near the
  * analytic rate, and the probe is a broadcast join. */
class BloomFilterSpec extends SparkSpec {

  test("no false negatives; false-positive rate near analytic bound") {
    import spark.implicits._
    val seen = (1 to 500).map(i => s"key_$i").toDF("k")
    val incoming = (401 to 1400).map(i => s"key_$i").toDF("k")
    val bloom = BloomFilter.build(seen, "k", bits = 8192, k = 3)
    val res = BloomFilter.mightContain(incoming, bloom, "k", bits = 8192, k = 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(res.size === 1000)
    // every seen key MUST be flagged (mightContain=false ⇒ definitely new)
    (401 to 500).foreach(i => assert(res(s"key_$i"), s"false negative: key_$i"))
    // m=8192, n=500, k=3 → p ≈ (1 - e^(-kn/m))^k ≈ 0.4%; allow generous slack
    val fps = (501 to 1400).count(i => res(s"key_$i"))
    assert(fps < 50, s"$fps false positives out of 900")
  }

  test("duplicate probe rows each keep their own output row") {
    import spark.implicits._
    val seen = Seq("a", "b").toDF("k")
    val bloom = BloomFilter.build(seen, "k")
    // "a" appears 3×, "zzz" 2× — contract: one output row per input row
    val probe = Seq("a", "a", "a", "zzz", "zzz").toDF("k")
    val out = BloomFilter.mightContain(probe, bloom, "k").collect()
    assert(out.length === 5)
    assert(out.count(r => r.getString(0) == "a" && r.getBoolean(1)) === 3)
  }

  test("probe frame with colliding w/bits columns still probes correctly") {
    import spark.implicits._
    val seen = Seq("a", "b").toDF("k")
    val bloom = BloomFilter.build(seen, "k")
    val probe = Seq(("a", 7L, 9L), ("nope", 8L, 10L)).toDF("k", "w", "bits")
    val out = BloomFilter.mightContain(probe, bloom, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSet === Set(("a", 7L, 9L, true), ("nope", 8L, 10L, false)))
  }

  test("probe plan broadcasts the filter table (no shuffle of the probe side)") {
    import spark.implicits._
    val seen = (1 to 100).map(i => s"k$i").toDF("k")
    val plan = BloomFilter.mightContain((1 to 100).map(i => s"k$i").toDF("k"),
        BloomFilter.build(seen, "k"), "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
