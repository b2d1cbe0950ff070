package graft

import graft.streaming.MergeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental MERGE sink's per-batch cost against snapshot
  * size (VERDICT r14 #1: the old sink rewrote the FULL snapshot every
  * micro-batch — cost ∝ |snapshot|; the bucketed sink must be
  * ∝ |delta| + |touched buckets|). Method: seed sinks with snapshots at
  * two scales (sf0.001 and sf0.01 events — 10× the rows), then apply the
  * SAME single-user delta batch to each and time it. A full-rewrite sink
  * shows the delta-batch time scaling with the snapshot; the bucketed
  * sink shows it flat (1 of 64 buckets read+written, so the 10× snapshot
  * adds only 10× of 1/64th). Also reports bytes written by the delta
  * batch vs bytes in the snapshot — write amplification, the
  * storage-side half of the claim.
  *
  * Usage: `runMain graft.MergeIncrProbe [reps]`
  */
object MergeIncrProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def dirBytes(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
    }

    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = graft.core.Tables.events(spark, s"/root/testdata/$sf")
        .select(col("user_id"), col("value")).cache()
      val nRows = ev.count()
      val oneUser = ev.select("user_id").orderBy("user_id").limit(1)
        .collect()(0).getLong(0)
      val delta = ev.where(col("user_id") === oneUser).cache()
      val dRows = delta.count()
      val times = (0 until reps).map { r =>
        val sink = java.nio.file.Files
          .createTempDirectory(s"graft_mprobe_${sf}_$r").toString
        MergeSink.applyBatch(sink)(ev, 0L) // seed
        val seedBytes = dirBytes(s"$sink/v=0")
        val t0 = System.nanoTime()
        MergeSink.applyBatch(sink)(delta, 1L)
        val sec = (System.nanoTime() - t0) / 1e9
        val deltaBytes = dirBytes(s"$sink/v=1")
        (sec, seedBytes, deltaBytes)
      }
      val best = times.map(_._1).min
      println(f"""{"probe":"merge_incr","sf":"$sf","snapshot_rows":$nRows,"delta_rows":$dRows,"delta_batch_sec_min":$best%.3f,"snapshot_bytes":${times.head._2},"delta_write_bytes":${times.head._3}}""")
      ev.unpersist(); delta.unpersist()
    }
    spark.stop()
  }
}
