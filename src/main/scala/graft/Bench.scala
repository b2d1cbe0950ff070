package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: absorb JVM/classloader/codegen startup so per-query numbers
    // measure the queries, not session bootstrap (SURVEY.md §6: the real
    // risk at small SF is fixed overhead). Runs the flagship once at the
    // smallest SF, then one tiny scan of the bench dir.
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    } catch { case _: Throwable => () }

    // A failed query surfaces in "failed" (and on stderr) and is excluded
    // from the total, instead of silently skewing the benchmark.
    // Optional args restrict the run to the named queries (tuning loop).
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.collect { case (k, v, true) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
