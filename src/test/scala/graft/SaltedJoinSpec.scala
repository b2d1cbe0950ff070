package graft

import graft.operators.AdvancedQueries
import org.apache.spark.sql.functions._

/** The skew-adaptive salted join (r11 verdict #3): the salt count derives
  * from the MEASURED top-key share, so unskewed inputs pay zero
  * replication and an adversarial hot key pays exactly enough to level
  * its reducers. */
class SaltedJoinSpec extends SparkSpec {

  test("adaptiveSalts math: ceil(topShare * parallelism), floor 1") {
    assert(AdvancedQueries.adaptiveSalts(0.0, 32) == 1)
    assert(AdvancedQueries.adaptiveSalts(1.0 / 100000, 32) == 1)
    // a key owning half the rows on 32 reducers needs 16-way replication
    assert(AdvancedQueries.adaptiveSalts(0.5, 32) == 16)
    assert(AdvancedQueries.adaptiveSalts(1.0, 32) == 32)
    // ceil, not round: 0.1*32 = 3.2 → 4
    assert(AdvancedQueries.adaptiveSalts(0.1, 32) == 4)
  }

  test("measuredTopKeyShare: exact on a known skewed frame") {
    import spark.implicits._
    // 60 rows of key=1, 40 spread across keys 2..41 → top share 0.6
    val skewed = ((1 to 60).map(_ => 1L) ++ (2L to 41L)).toDF("k")
    val share = AdvancedQueries.measuredTopKeyShare(skewed, "k")
    assert(math.abs(share - 0.6) < 1e-12, s"share=$share")
    assert(AdvancedQueries.measuredTopKeyShare(skewed.limit(0), "k") == 0.0)
  }

  test("adaptive join salts a hot key and still returns the unsalted answer") {
    import spark.implicits._
    // hot key 7 owns ~91% of probe rows → salts = ceil(0.91*4) = 4 (test
    // session runs spark.sql.shuffle.partitions=4)
    val probe = ((1 to 500).map(_ => 7L) ++ (1L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val build = (1L to 60L).map(k => (k, s"b$k")).toDF("bk", "tag")
    val adaptive = AdvancedQueries.saltedJoinAdaptive(probe, build, "k", "bk")
    assert(adaptive.queryExecution.executedPlan.toString.contains("__salt"),
      "hot key must trigger salting")
    val plain = probe.join(build, probe("k") === build("bk"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "bk", "tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(adaptive) == canon(plain), "salting changed the join result")
  }
}
