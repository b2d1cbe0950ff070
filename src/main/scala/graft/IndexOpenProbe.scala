package graft

import graft.core.LazyFrame
import graft.operators.ParityQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the eager [[graft.core.LazyFrame.idxByRow]] stamp (VERDICT r10
  * #6): the r10 eager build wins 49 s → 0.9 s on the FIRST row-addressed
  * extraction at x64, but pays a second narrow-index persist + count at
  * open — and the open-time cost at bench scale was never measured on a
  * quiet host (r10 cold `lf_dim` first touch ~13 s vs r9's ~2.6 s is the
  * suspect signal).
  *
  * Method: one fresh JVM per mode (run this main twice — same-JVM A/B would
  * let the second mode reuse the first's codegen/classloading and the OS
  * page cache asymmetrically; the page-cache half is warmed deliberately by
  * a throwaway full scan before timing). Per mode: time (1) open =
  * `materialize()` (what `lf_dim` pays first-touch), (2) first
  * row-addressed extraction (`rowsRange`), (3) a keyed filter extraction.
  * Prints one JSON line; results → SCALE.md.
  *
  * Usage: `runMain graft.IndexOpenProbe <eager|lazy> [sfDir]`
  */
object IndexOpenProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && Set("eager", "lazy")(args(0)),
      "usage: IndexOpenProbe <eager|lazy> [sfDir]")
    val mode = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.index.eagerRowIndex", (mode == "eager").toString)

    val path = s"$sfDir/lineitem.parquet"
    // level the storage field: one throwaway scan pulls the parquet into
    // the OS page cache for both modes (JVM/codegen warmup is NOT leveled
    // — that cold cost is part of what lf_dim first-touch pays, identical
    // across modes)
    spark.read.parquet(path).count()

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // `cached()` force-builds the index (and the eager stamp when on) —
    // exactly what every registered lf_* query's constructor pays on first
    // touch (ParityQueries wraps each frame in .cached())
    var lf: LazyFrame = null
    val open = sec {
      lf = LazyFrame.parquet(spark, path, ParityQueries.rowOrderKey).cached()
      assert(lf.nrow > 0)
    }
    val rowAddr = sec { assert(lf.rowsRange(1000, 2000).count() > 0) }
    val keyed = sec { assert(lf.filter(col("l_returnflag") === "R").count() > 0) }
    val rowAddr2 = sec { assert(lf.rowsRange(500000, 500500).count() > 0) }
    println(s"""{"probe":"index_open","mode":"$mode","sf_dir":"$sfDir",""" +
      s""""open_sec":$open,"first_row_addr_sec":$rowAddr,""" +
      s""""keyed_extract_sec":$keyed,"second_row_addr_sec":$rowAddr2}""")
    spark.stop()
  }
}
