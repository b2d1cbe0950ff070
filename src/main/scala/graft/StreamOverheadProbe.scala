package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Measures the streaming surface's per-micro-batch fixed overhead
  * (VERDICT r6 #7: q_stream_join carries ~2 s at sf0.1 — how much is
  * per-BATCH constant that amortizes at scale, vs per-ROW work that
  * doesn't?). Method: drive the same watermarked stream-stream interval
  * join (`EventStreams.purchaseClickJoin`) over the same events data split
  * into k files with `maxFilesPerTrigger=1`, so micro-batch count scales
  * with k while total rows stay constant. The least-squares slope of
  * wall-time over batch count IS the per-batch constant (state-store
  * load+commit across partitions × 4 join stores, file-source listing,
  * offset/commit log writes, incremental planning); the intercept is the
  * batch-count-independent cost (scan + shuffle + result write + query
  * start/stop). Results → SCALE.md streaming paragraph.
  *
  * Usage: `runMain graft.StreamOverheadProbe [sfDir] [k ...]`
  */
object StreamOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks: Seq[Int] = {
      val t = args.drop(1).map(_.toInt).toSeq
      if (t.nonEmpty) t else Seq(1, 2, 4, 8)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // streaming state width as the harness runs it (see EventStreams doc):
    // frozen from this conf at each query start
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    def deleteRec(root: String): Unit = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    def run(k: Int, tag: String): (Int, Double) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sop_$tag$k").toString
      try {
        ev.repartition(k).write.mode("overwrite").parquet(dir)
        val joined = EventStreams.purchaseClickJoin(spark, dir, "part-*.parquet", Some(1))
        val t0 = System.nanoTime()
        val q = joined.writeStream
          .outputMode("append").format("memory").queryName(s"sop_$tag$k")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val secs = (System.nanoTime() - t0) / 1e9
        (q.recentProgress.length, secs)
      } finally deleteRec(dir) // per-run temp inputs were leaking (ADVICE r7)
    }

    run(ks.head, "warm") // absorb classload/JIT once; discarded
    val pts = ks.map { k =>
      val (b, s) = run(k, "m")
      System.err.println(f"[probe] k=$k%-3d batches=$b%-3d ${s}%.2f s")
      (b.toDouble, s)
    }
    val ptsJson = pts.map(p => f"[${p._1}%.0f,${p._2}%.2f]").mkString("[", ",", "]")
    // A fit needs >=2 distinct batch counts (a single k argument, or
    // repartition collapsing to equal file counts, would divide by zero
    // and emit NaN into the JSON — ADVICE r7): degenerate runs report the
    // raw points only.
    if (pts.map(_._1).distinct.size < 2) {
      println(s"""{"metric":"stream_per_batch_sec","slope":null,"intercept":null,"points":$ptsJson,"note":"degenerate: fewer than 2 distinct batch counts","sf":"$sfDir"}""")
    } else {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      println(f"""{"metric":"stream_per_batch_sec","slope":$slope%.3f,"intercept":$icept%.3f,"points":$ptsJson,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
