package graft

import graft.sources.Sinks
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Measured row-group skip from write-time parquet bloom filters (r14,
  * VERDICT item 5 — the layout-trilogy completion).
  *
  * Scenario: point lookups on `l_partkey` — high-cardinality, UNSORTED,
  * scattered across the file, so every row group's [min,max] spans the
  * whole key domain and statistics prune nothing; this is exactly the
  * access pattern ([[Sinks.writeSorted]]/z-order can't help unless you
  * re-sort by that key, which the layout owner already spent on another
  * axis). Compares the SAME point lookups on (a) a plain copy with the
  * same small row groups but no bloom filters and (b) a
  * [[Sinks.writeWithBloom]] copy — so the measured delta is the bloom
  * filters' alone, not row-group sizing. Metrics: scan-node
  * numOutputRows (rows the reader actually decoded after row-group
  * skipping — the number that extrapolates to 100 TB) and min-of-N wall
  * time, plus the footer ledger proving the filters exist.
  *
  * Usage: `runMain graft.BloomSkipProbe [sfDir] [runs]` → one JSON line.
  */
object BloomSkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // keep the scan leaf visible
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$sfDir/lineitem.parquet"
    val li = spark.read.parquet(src)
    // per-row-group ndv for filter sizing: rows-per-group ~ blockBytes /
    // in-memory row width; a point key appears ~4x per group at most, so
    // ndv/group ~ rows/group — approximate with global ndv capped
    val ndv = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    val plainDir = new java.io.File("target/bloom_probe_plain").getAbsolutePath
    val bloomDir = new java.io.File("target/bloom_probe_bloom").getAbsolutePath
    val rg = 256L << 10 // small row groups: skip resolution, as in writeSorted
    // plain copy matches the bloom copy's ENCODING (dictionary off on the
    // probe column — the dictionary-overflow regime both copies model) so
    // the measured delta is the bloom filters' alone
    li.write.mode("overwrite").option("parquet.block.size", rg)
      .option("parquet.enable.dictionary#l_partkey", "false")
      .parquet(plainDir)
    Sinks.writeWithBloom(li, bloomDir, Seq("l_partkey" -> ndv), rg)

    // footer ledger: row groups + bloom presence on the bloom copy
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.get(conf)
    def footer(dir: String): (Int, Int) = {
      var groups = 0
      var withBloom = 0
      fs.listStatus(new Path(dir)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).foreach { p =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
          try r.getFooter.getBlocks.asScala.foreach { b =>
            groups += 1
            val cm = b.getColumns.asScala
              .find(_.getPath.toDotString == "l_partkey").get
            val bf = r.getBloomFilterDataReader(b).readBloomFilter(cm)
            if (bf != null) withBloom += 1
          } finally r.close()
        }
      (groups, withBloom)
    }
    val (gPlain, bPlain) = footer(plainDir)
    val (gBloom, bBloom) = footer(bloomDir)

    // deterministic probe keys spread across the domain
    val keys = li.select(col("l_partkey")).distinct().orderBy("l_partkey")
      .collect().map(_.getLong(0))
    val probes = (1 to 5).map(i => keys((keys.length - 1) * i / 5))

    spark.read.parquet(plainDir).count() // page-cache warm
    spark.read.parquet(bloomDir).count()

    def scanRows(dir: String): Long = probes.map { k =>
      val df = spark.read.parquet(dir).where(col("l_partkey") === k)
        .agg(sum(col("l_quantity")), count(lit(1)))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value }.sum
    }.sum

    def time(dir: String): Double = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      probes.foreach { k =>
        spark.read.parquet(dir).where(col("l_partkey") === k)
          .agg(sum(col("l_quantity")), count(lit(1))).collect()
      }
      (System.nanoTime() - t0) / 1e9
    }.min

    val tPlain1 = time(plainDir); val tBloom1 = time(bloomDir)
    val tPlain2 = time(plainDir); val tBloom2 = time(bloomDir)
    val tPlain = math.min(tPlain1, tPlain2)
    val tBloom = math.min(tBloom1, tBloom2)
    val rowsPlain = scanRows(plainDir)
    val rowsBloom = scanRows(bloomDir)

    println(s"""{"probe":"bloom_skip","sf":"$sfDir","runs":$runs,""" +
      s""""row_groups_plain":$gPlain,"bloom_groups_plain":$bPlain,""" +
      s""""row_groups_bloom":$gBloom,"bloom_groups_bloom":$bBloom,""" +
      s""""probe_keys":${probes.length},""" +
      s""""scan_rows_plain":$rowsPlain,"scan_rows_bloom":$rowsBloom,""" +
      f""""t_plain":$tPlain%.3f,"t_bloom":$tBloom%.3f,"speedup":${tPlain / tBloom}%.2f}""")
    spark.stop()
  }
}
