package graft

import graft.core.Tables
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: the contract is hash-ranked selection that is
  * invariant to physical layout — the property Spark's RNG `sample(seed)`
  * does NOT have (it draws per partition). */
class SamplingSpec extends SparkSpec {

  test("sampleFraction: invariant under repartitioning; salt switches the draw") {
    val docs = Tables.documents(spark, sf0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(Sampling.sampleFraction(docs, "doc_id", 0.2))
    val b = ids(Sampling.sampleFraction(docs.repartition(7), "doc_id", 0.2))
    assert(a == b && a.nonEmpty, "sample must not depend on physical layout")
    // ~frac of rows, loose bound (md5 uniformity on 500 ids)
    val n = docs.count()
    assert(a.size > n * 0.1 && a.size < n * 0.3)
    // independent resample via salt
    val c = ids(Sampling.sampleFraction(docs, "doc_id", 0.2, salt = "resample"))
    assert(c != a)
  }

  test("plan shape: sampleFraction zero-shuffle; stratifiedSample one exchange") {
    val docs = Tables.documents(spark, sf0)
    val fracPlan = Sampling.sampleFraction(docs, "doc_id", 0.2)
      .queryExecution.executedPlan.toString
    assert(!fracPlan.contains("Exchange"),
      s"fraction sample must be a pure scan filter:\n$fracPlan")
    val stratPlan = Sampling.stratifiedSample(
        docs.select(col("doc_id"), (col("doc_id") % 7).as("bucket")),
        "bucket", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(stratPlan.linesIterator.count(_.contains("Exchange")) == 1,
      s"stratified sample must shuffle exactly once (on the stratum key):\n$stratPlan")
  }

  test("stratifiedSample: exactly min(k, |stratum|) rows per stratum, layout-invariant") {
    val docs = Tables.documents(spark, sf0)
      .select(col("doc_id"), (col("doc_id") % 7).as("bucket"))
    val s1 = Sampling.stratifiedSample(docs, "bucket", "doc_id", 5)
    val perStratum = s1.groupBy("bucket").count().collect()
    assert(perStratum.length == 7 && perStratum.forall(_.getLong(1) == 5))
    val s2 = Sampling.stratifiedSample(docs.repartition(11), "bucket", "doc_id", 5)
    assert(s1.select("bucket", "doc_id").collect().toSet ==
      s2.select("bucket", "doc_id").collect().toSet)
    // k larger than a stratum: keep the whole stratum, no padding
    val tiny = docs.where(col("doc_id") < 3)
    assert(Sampling.stratifiedSample(tiny, "bucket", "doc_id", 5).count() == 3)
  }
}
