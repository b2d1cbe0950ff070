package graft

import graft.sources.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured row-group skip from the z-order write (round 13).
  *
  * `Sinks.writeSorted` localizes only its LEADING sort column: a
  * predicate on the second column alone prunes nothing, because every
  * row group spans that column's full range. `Sinks.writeZOrder`
  * (MSB-first unequal-width Morton interleave) keeps each row group a
  * small box in BOTH dimensions. This probe writes lineitem both ways
  * — sorted by (l_partkey, l_suppkey) vs z-ordered on the same two keys
  * — and measures the parquet reader's `numOutputRows` (rows actually
  * decoded after row-group skipping, before the post-scan filter) for:
  *   - a trailing-dim probe: `l_suppkey BETWEEN 100 AND 149` (5%);
  *   - a box probe: both keys constrained.
  * Rows-decoded is the metric that extrapolates: at 100 TB the skipped
  * fraction is skipped disk, not just skipped decode.
  *
  * Usage: `runMain graft.ZOrderSkipProbe [sfDir] [runs]`
  */
object ZOrderSkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // expose the scan leaf
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$sfDir/lineitem.parquet"
    val zDir = new java.io.File("target/zorder_skip_z").getAbsolutePath
    val sDir = new java.io.File("target/zorder_skip_s").getAbsolutePath
    val df = spark.read.parquet(src)
    // sf0.1 domains: l_partkey < 2^15, l_suppkey < 2^10
    Sinks.writeZOrder(df, zDir, "l_partkey", "l_suppkey", bits1 = 15, bits2 = 10)
    Sinks.writeSorted(df, sDir, Seq("l_partkey", "l_suppkey"))

    spark.read.parquet(zDir).count(); spark.read.parquet(sDir).count() // warm

    def trailing(d: org.apache.spark.sql.DataFrame) =
      d.where(col("l_suppkey").between(100, 149))
        .agg(sum(col("l_quantity")), count(lit(1)))
    def box(d: org.apache.spark.sql.DataFrame) =
      d.where(col("l_partkey").between(4000, 5999) &&
          col("l_suppkey").between(100, 149))
        .agg(sum(col("l_quantity")), count(lit(1)))

    def scanRows(dir: String, q: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
      val d = q(spark.read.parquet(dir))
      d.collect()
      d.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value }.sum
    }
    def time(dir: String, q: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q(spark.read.parquet(dir)).collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    val out = Seq(
      ("trailing", trailing _), ("box", box _)).map { case (name, q) =>
      val zr = scanRows(zDir, q); val sr = scanRows(sDir, q)
      val zt = math.min(time(zDir, q), time(zDir, q))
      val st = math.min(time(sDir, q), time(sDir, q))
      f""""$name":{"scan_rows_zorder":$zr,"scan_rows_sorted":$sr,"t_zorder":$zt%.3f,"t_sorted":$st%.3f}"""
    }.mkString(",")
    println(s"""{"probe":"zorder_skip","sf":"$sfDir","runs":$runs,$out}""")
    spark.stop()
  }
}
