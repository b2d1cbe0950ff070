package graft

import org.apache.spark.sql.functions._

/** Locks for the r19 optimization rewrites. */
class Round19OpsSpec extends SparkSpec {

  test("q_approx_percentile: the crossing-bucket order statistics are " +
      "BIT-identical to the removed percentile() buffer (both SFs' shapes)") {
    // The r19 rewrite replaced the exact Percentile aggregate with in-plan
    // order statistics + the replicated interpolation formula. This lock
    // compares the registry row's exact_p* values (pre-round they must be
    // the same doubles, so post-round equality is implied) against a
    // freshly evaluated percentile() over the same column — the exact
    // expression the rewrite removed.
    val ps = Seq(0.5, 0.95, 0.99)
    val delta = 0.005
    val allQs = ps.flatMap(p =>
      Seq(math.max(0.0, p - delta), p, math.min(1.0, p + delta)))
    val li = graft.core.Tables.lineitem(spark, sf0)
    val want = li.agg(percentile(col("l_extendedprice"),
        array(allQs.map(lit): _*)).as("q9"))
      .select(ps.indices.map(i =>
        round(element_at(col("q9"), 3 * i + 2), 6).as(s"e$i")): _*)
      .head()
    val got = SparkEntry.queries("q_approx_percentile")(spark, sf0).head()
    ps.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(got.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(want.getDouble(i)),
        s"exact_p${(ps(i) * 100).toInt}: got ${got.getDouble(i)}, " +
          s"percentile() says ${want.getDouble(i)}")
    }
    // the sketch booleans must all hold (the sketch's rank-error bound is
    // ~50x tighter than the +-0.005 window)
    (ps.indices.map(_ + ps.size)).foreach(i => assert(got.getBoolean(i)))
  }

  test("q_approx_percentile interpolation formula: synthetic corners " +
      "(integral position, duplicate-key run, fractional position)") {
    import spark.implicits._
    // a value column engineered so the quantile positions hit: an exact
    // integer rank (q*(n-1) integral), a duplicate run spanning lo/hi, and
    // a genuine interpolation between distinct neighbors
    val vals = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 13.0, 21.0,
      34.0, 55.0, 89.0, 144.0, 233.0, 377.0, 610.0, 987.0, 1597.0, 2584.0)
    val df = vals.toDF("l_extendedprice")
    val tmp = java.nio.file.Files.createTempDirectory("r19pct").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val ps = Seq(0.5, 0.95, 0.99)
    val delta = 0.005
    val allQs = ps.flatMap(p =>
      Seq(math.max(0.0, p - delta), p, math.min(1.0, p + delta)))
    val want = spark.read.parquet(s"$tmp/lineitem.parquet")
      .agg(percentile(col("l_extendedprice"), array(allQs.map(lit): _*)).as("q9"))
      .select(ps.indices.map(i =>
        round(element_at(col("q9"), 3 * i + 2), 6).as(s"e$i")): _*)
      .head()
    val got = SparkEntry.queries("q_approx_percentile")(spark, tmp).head()
    ps.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(got.getDouble(i)) ==
        java.lang.Double.doubleToLongBits(want.getDouble(i)),
        s"p${(ps(i) * 100).toInt}: got ${got.getDouble(i)} want ${want.getDouble(i)}")
    }
  }

  test("q_weighted_median crossing-bucket shape agrees with the RANGE-frame " +
      "formulation on the harness data") {
    import org.apache.spark.sql.expressions.Window
    // independent reference: the oracle's own RANGE-over-raw-rows shape
    val base = graft.core.Tables.lineitem(spark, sf0).select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).as("cents"),
      floor(col("l_quantity") + 0.5).as("wt"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("l_returnflag"))
    val want = base
      .withColumn("cum", sum(col("wt")).over(wCum))
      .withColumn("tot", sum(col("wt")).over(wTot))
      .groupBy(col("l_returnflag"))
      .agg(min(when(col("cum") * 2 >= col("tot"), col("cents"))).as("m"),
        max(col("tot")).as("t"))
      .orderBy("l_returnflag").collect()
    val got = SparkEntry.queries("q_weighted_median")(spark, sf0).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1), s"median mismatch for ${g.getString(0)}")
      assert(g.getLong(2) == w.getLong(2), s"total mismatch for ${g.getString(0)}")
    }
  }
}
