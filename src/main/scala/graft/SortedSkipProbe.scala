package graft

import graft.sources.Sinks
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Measured row-group skip from the sorted write (r12 verdict #5).
  *
  * The r12 dictionary probe proved the flagship string filter can skip
  * NOTHING on the as-shipped layout (one 600 K-row row group, value
  * uniformly present) and concluded locality is a write-time decision.
  * This probe ships the decision and measures it: same filter+aggregate
  * on (a) the original lineitem layout, (b) a `Sinks.writeSorted` copy
  * (sorted by l_returnflag, l_shipdate; 1 MiB row groups). Prints one
  * JSON line with min-of-N times for both layouts plus the footer
  * ledger (row groups total / skippable for 'R'). Results → SCALE.md.
  *
  * Usage: `runMain graft.SortedSkipProbe [sfDir] [runs]`
  */
object SortedSkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE off: its plan wrapper hides the FileSourceScanExec leaf from
      // the metrics walk, and a single-stage scan+agg gains nothing from it
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$sfDir/lineitem.parquet"
    val out = new java.io.File("target/sorted_skip_probe").getAbsolutePath
    Sinks.writeSorted(spark.read.parquet(src), out,
      Seq("l_returnflag", "l_shipdate"))

    // footer ledger for the sorted copy
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(conf)
    val stats = fs.listStatus(new Path(out)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .flatMap { p =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try r.getFooter.getBlocks.asScala.map { b =>
          val s = b.getColumns.asScala
            .find(_.getPath.toDotString == "l_returnflag").get.getStatistics
          (new String(s.getMinBytes, "UTF-8"), new String(s.getMaxBytes, "UTF-8"))
        }.toSeq
        finally r.close()
      }.toSeq
    val skippable = stats.count { case (mn, mx) => mx < "R" || mn > "R" }

    // page-cache warm: full scan of both layouts once before timing
    spark.read.parquet(src).count()
    spark.read.parquet(out).count()

    // scan-node numOutputRows = rows the parquet reader actually produced
    // AFTER row-group/page skipping, BEFORE the post-scan filter — the
    // direct measure of how much IO+decode the layout saved (wall time at
    // sf0.1 is fixed-overhead-bound, so rows-decoded is the honest metric
    // that extrapolates to 100 TB).
    def scanRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .where(col("l_returnflag") === "R")
        .agg(sum(col("l_quantity")), count(lit(1)))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value }.sum
    }

    def time(dir: String): Double = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(dir)
        .where(col("l_returnflag") === "R")
        .agg(sum(col("l_quantity")), count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    // interleave would be better but the two dirs hit disjoint files; keep
    // simple alternation to split residual JIT warm-up evenly
    val tOrig1 = time(src); val tSort1 = time(out)
    val tOrig2 = time(src); val tSort2 = time(out)
    val tOrig = math.min(tOrig1, tOrig2); val tSort = math.min(tSort1, tSort2)
    val rowsOrig = scanRows(src); val rowsSort = scanRows(out)

    println(s"""{"probe":"sorted_skip","sf":"$sfDir","runs":$runs,""" +
      s""""row_groups":${stats.size},"skippable_R":$skippable,""" +
      s""""scan_rows_original":$rowsOrig,"scan_rows_sorted":$rowsSort,""" +
      f""""t_original":$tOrig%.3f,"t_sorted":$tSort%.3f,"speedup":${tOrig / tSort}%.2f}""")
    spark.stop()
  }
}
