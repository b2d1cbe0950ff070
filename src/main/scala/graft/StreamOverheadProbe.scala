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

  /** Per-query floor/payload decomposition (VERDICT r15 #7): run each
    * streaming registry query against (a) the real sf dir and (b) a dir of
    * EMPTY same-schema tables. The empty-input wall time IS the query's
    * fixed floor — query start/stop, source listing, offset/commit log
    * writes, state-store instance load+commit across partitions — and
    * `full − floor` is the data-proportional payload. The floor amortizes
    * at scale (it is per-QUERY-RUN, not per-row; a production stream pays
    * it once per micro-batch over arbitrarily many rows), so a bench row
    * dominated by floor is measuring Spark's streaming machinery, not this
    * engine's operators. Results → SCALE.md streaming ledger.
    *
    * Usage: `runMain graft.StreamOverheadProbe decompose [sfDir] [q ...]`
    */
  private def decompose(spark: SparkSession, sfDir: String,
      names: Seq[String]): Unit = {
    val defaults = Seq("q_stream_tumbling", "q_stream_join",
      "q_stream_join_outer", "q_stream_stateful", "q_stream_dedup_wm",
      "q_stream_anomaly", "q_stream_enrich", "q_stream_merge")
    val qs = (if (names.nonEmpty) names else defaults)
      .flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    // empty same-schema twins of every table the streaming rows read
    val floorDir = java.nio.file.Files.createTempDirectory("graft_floor_").toString
    Seq("events", "customer", "documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$floorDir/$t.parquet")
    }
    def timeIt(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // Untimed warm-up pass over the EMPTY twins before any measurement:
    // the first streaming query in a JVM pays the whole streaming stack's
    // classloader + JIT warm-up (micro-batch planner, state-store
    // providers, commit-log writers), which otherwise lands entirely on
    // the first measured row — the r18b probe run read tumbling's floor
    // at 2.7 s where a warmed JVM reads ~1.2 s. Floor runs on empty input
    // cost seconds, so warming every query is cheap and makes row order
    // irrelevant.
    qs.foreach { case (_, fn) => timeIt(fn, floorDir) }
    val measured = qs.map { case (name, fn) =>
      val floor = (1 to 3).map(_ => timeIt(fn, floorDir)).min
      val full = (1 to 3).map(_ => timeIt(fn, sfDir)).min
      System.err.println(f"[probe] $name%-22s floor=$floor%6.2f s  full=$full%6.2f s  payload=${full - floor}%6.2f s")
      (name, floor, full)
    }
    val rows = measured.map { case (name, floor, full) =>
      f""""$name":{"floor":$floor%.2f,"full":$full%.2f,"payload":${full - floor}%.2f}"""
    }
    val parts = spark.conf.get("graft.streaming.shufflePartitions", "unset")
    println(s"""{"metric":"stream_floor_payload_sec","queries":{${rows.mkString(",")}},"stream_parts":$parts,"sf":"$sfDir"}""")
    // Persist the floors as the ledger Bench reads (ADVICE r17 + VERDICT
    // r17 #2): floors are host-day- and parts-specific, so the ledger
    // carries both, and Bench refuses to stamp floors measured at a
    // different stream-partition setting. Full-registry default set only —
    // a name-restricted probe run must not shrink the ledger.
    if (names.isEmpty) {
      val path = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_STREAM_FLOORS", "target/stream_floors.tsv"))
      if (path.getParent != null) java.nio.file.Files.createDirectories(path.getParent)
      // merge-min with an existing same-parts ledger: bench minima are
      // min-merged across many legs (the best moment of the round), so a
      // single-moment floor can sit ABOVE a multi-leg full-run min on a
      // host with a 1.1-1.4× speed band (exactly the r17 tumbling
      // anomaly). Min-merging the floors across probe runs makes the two
      // sides of the floor/payload subtraction symmetric.
      val prior: Map[String, Double] =
        if (java.nio.file.Files.exists(path)) {
          import scala.jdk.CollectionConverters._
          val kv = java.nio.file.Files.readAllLines(path).asScala
            .map(_.split("\t")).collect { case Array(k, v) => k -> v }.toMap
          if (kv.get("__parts").contains(parts))
            kv.collect { case (k, v) if !k.startsWith("__") => k -> v.toDouble }
          else Map.empty
        } else Map.empty
      val merged = measured.map { case (n, f, _) =>
        n -> math.min(f, prior.getOrElse(n, Double.MaxValue)) }
      val body = (Seq(s"__parts\t$parts",
        s"__epoch_ms\t${System.currentTimeMillis()}") ++
        merged.map { case (n, f) => f"$n\t$f%.3f" }).mkString("\n")
      java.nio.file.Files.write(path, body.getBytes("UTF-8"))
      System.err.println(s"[probe] floor ledger written: $path (merged with prior: ${prior.nonEmpty})")
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption
    if (mode.contains("decompose")) {
      val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("graft.streaming.shufflePartitions",
          sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      decompose(spark, sfDir, args.drop(2).toSeq)
      spark.stop()
      return
    }
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
