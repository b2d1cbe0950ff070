package graft

import graft.core.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming/batch parity: the same declared transform must produce the
  * same result run as a Structured Streaming query (file source → memory
  * sink) and as a batch aggregation. */
class StreamingSpec extends SparkSpec {

  test("tumbling window: streaming result equals batch result") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.tumbling(EventStreams.readStream(spark, sf0), "1 day"),
      s"spec_tumbling_${System.nanoTime()}")
      .orderBy("win_start_us", "event_type").collect()

    val batch = Tables.events(spark, sf0)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start_us", "event_type").collect()

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("session windows: gap semantics (6h) — sessions partition all events") {
    val sess = EventStreams.sessions(Tables.events(spark, sf0), "6 hours")
    val total = sess.agg(sum("n")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf0).count())
    // no two sessions of a user overlap-or-touch within gap: starts are
    // strictly increasing by more than 0 per user
    val perUser = sess.orderBy("user_id", "session_start_us").collect()
      .groupBy(_.getLong(1)).values
    assert(perUser.forall { rows =>
      rows.map(_.getLong(0)).sliding(2).forall {
        case Array(a, b) => a < b
        case _ => true
      }
    })
  }

  test("novelty gate stream: admits exactly the batch anti-join set, each doc once") {
    import graft.operators.TextAnalysis
    val admitted = EventStreams.runAppendToBatch(spark,
      EventStreams.noveltyGateStream(spark, sf0), s"spec_novel_${System.nanoTime()}")
      .collect().map(r => (r.getLong(0), r.getString(2)))

    // batch ground truth: stream docs whose fingerprint is absent from seen
    val fp = Tables.documents(spark, sf0)
      .select(col("doc_id"), TextAnalysis.contentFingerprint(col("text")).as("fp"))
    val truth = fp.where(col("doc_id") >= 250)
      .join(fp.where(col("doc_id") < 250).select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(admitted.map(_._1).toSet == truth)
    assert(admitted.length == truth.size) // exactly once each
    // no false negatives: a bloom_proved doc is PROVEN novel (in truth);
    // both admission paths appear on this data
    val byVia = admitted.groupBy(_._2)
    assert(byVia("bloom_proved").forall(d => truth.contains(d._1)))
    assert(byVia.keySet == Set("bloom_proved", "exact_verified"))
  }

  test("events ns timestamps: exact nanos preserved in ts_ns, ts at us precision") {
    val e = Tables.events(spark, sf0)
    val row = e.select(col("ts_ns"), unix_micros(col("ts")).as("us")).head()
    assert(row.getLong(0) / 1000L == row.getLong(1))
  }

  test("interval join: watermark EXPIRES state across micro-batches") {
    // The scale property that makes the stream-stream join viable at
    // 100 TB: join state must be bounded by (join interval + watermark
    // delay), not by the stream's history. Split the 30-day corpus into
    // 8 time-ordered files and feed one per micro-batch, so the watermark
    // advances between batches and each batch evicts the previous ones'
    // rows; without eviction final state ≈ every click+purchase ever seen.
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_expiry_").toString
    val ev = Tables.events(spark, sf0)
    ev.drop("ts_ns") // keep storage schema simple; join only needs ts
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val joined = EventStreams.purchaseClickJoin(spark, dir, "part-*.parquet", Some(1))
    val q = joined.writeStream
      .outputMode("append").format("memory")
      .queryName(s"spec_expiry_${System.nanoTime()}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val inputRows = ev.where(col("event_type").isin("click", "purchase")).count()
    assert(stateRows > 0, "no state operator reported — join did not run as a stream")
    assert(stateRows < inputRows / 2,
      s"watermark not expiring interval-join state: $stateRows state rows " +
        s"retained of $inputRows total click+purchase inputs")
  }

  test("streaming anomaly gate: multi-batch arrival converges to the batch answer") {
    // The property the versioned re-emission exists for: split the corpus
    // into 8 time-ordered files fed one per micro-batch (so trailing
    // windows straddle batch boundaries and early judgments of a day are
    // WRONG until its window fills), then assert the highest-version
    // emissions equal the single-pass batch operator exactly.
    val dir = java.nio.file.Files.createTempDirectory("graft_anomaly_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val streamed = EventStreams
      .streamingAnomalyFinal(spark, dir, "part-*.parquet", Some(1))
      .collect().map(_.toSeq)
    val batch = graft.operators.QualityChecks.all("q_anomaly")
      .fn(spark, sf0).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming CUSUM: multi-batch arrival converges to the batch answer") {
    // The recurrence depends on EVERY earlier day AND the global target k,
    // so early emissions are doubly wrong (short prefix, drifting k) —
    // the versioned re-emission must still converge exactly once all
    // 8 time-ordered batches land.
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val streamed = EventStreams
      .streamingCusumFinal(spark, dir, "part-*.parquet", Some(1))
      .collect().map(_.toSeq)
    val batch = graft.operators.QualityChecks.all("q_cusum")
      .fn(spark, sf0).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming percentiles: multi-batch arrival is bit-identical to batch") {
    // Histogram state is a commutative monoid: not "converges", IS the
    // same counts — and hence the same nearest-rank picks — under any
    // arrival split.
    val dir = java.nio.file.Files.createTempDirectory("graft_spct_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val streamed = EventStreams
      .streamingPercentilesFinal(spark, dir, "part-*.parquet", Some(1))
      .collect().map(_.toSeq)
    val batch = graft.operators.EventLifecycle.all("q_latency_percentiles")
      .fn(spark, sf0).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming Holt: multi-batch arrival converges to the batch answer") {
    // Per-user coupled level+trend: a day's l/b depend on every earlier
    // day of that user AND on its daily MEAN (which later arrivals can
    // still move), so early emissions are wrong twice over — the
    // versioned per-user re-emission must converge bit-for-bit to
    // q_ts_holt once all 8 time-ordered batches land.
    val dir = java.nio.file.Files.createTempDirectory("graft_sholt_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val streamed = EventStreams
      .streamingHoltFinal(spark, dir, "part-*.parquet", Some(1))
      .collect().map(_.toSeq)
    val batch = graft.operators.TimeSeries.all("q_ts_holt")
      .fn(spark, sf0).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming PCA statistics: multi-batch arrival is bit-identical to batch") {
    // Integer-monoid state: not "converges", IS the same bits under any
    // split — the strongest convergence contract in the streaming family.
    val dir = java.nio.file.Files.createTempDirectory("graft_spca_").toString
    Tables.embeddings(spark, sf0)
      .repartitionByRange(8, col("vec_id")).sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite").parquet(dir)
    val streamed = EventStreams
      .streamingPcaCovFinal(spark, dir, 64, "part-*.parquet", Some(1))
      .collect().map(_.toSeq)
    val batch = graft.operators.PipelineQueries.all("q_pca_cov")
      .fn(spark, sf0).collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful streams run on the RocksDB state store (larger-than-heap state path)") {
    // The default HDFS-backed state store keeps every version on the
    // executor heap - fine at harness scale, an OOM at 100 TB key
    // cardinality. The engine's stateful operators must run unchanged on
    // the spillable RocksDB provider; assert identical results on the
    // anomaly gate (map-typed state, the heaviest state shape we carry).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = EventStreams.streamingAnomalyFinal(spark, sf0)
        .collect().map(_.toSeq)
      val batch = graft.operators.QualityChecks.all("q_anomaly")
        .fn(spark, sf0).collect().map(_.toSeq)
      assert(rocks.toSeq === batch.toSeq,
        "RocksDB-backed stream must equal the batch answer")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("throttle dedup: multi-batch arrival converges to the batch lag-window answer") {
    // Same convergence contract as the anomaly gate: 8 time-ordered files
    // fed one per micro-batch, so a key's events straddle batches and its
    // early kept-counts are WRONG until later arrivals re-judge them; the
    // highest-version emission must equal the single-pass batch window.
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft_throttle_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val gap = graft.operators.EventLifecycle.throttleUs
    val snaps = EventStreams.runUpdatesToBatch(spark,
      EventStreams.streamingThrottle(spark, dir, gap, "part-*.parquet", Some(1)))
    val wv = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ver").desc)
    val streamed = snaps.withColumn("rn", row_number().over(wv))
      .where(col("rn") === 1)
      .select("user_id", "event_type", "n_events", "n_kept")
      .orderBy("user_id", "event_type").collect().map(_.toSeq)
    val wl = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val batch = Tables.events(spark, sf0)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("kept",
        when(lag(col("ts_us"), 1).over(wl).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(wl) > gap, 1L).otherwise(0L))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("kept").as("n_kept"))
      .orderBy("user_id", "event_type").collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream-static enrich is STATELESS (no state store) and equals the batch join") {
    // The scale property of the stream-static shape: the dimension is
    // (re)broadcast per micro-batch and NOTHING is retained between
    // batches — state rows must be zero no matter how many batches run.
    import org.apache.spark.sql.streaming.Trigger
    val name = s"spec_enrich_${System.nanoTime()}"
    val q = EventStreams.streamStaticEnrich(spark, sf0).writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 0,
      s"stream-static join must keep no state, found $stateRows rows")
    val streamed = spark.table(name)
      .orderBy("event_id").collect().map(_.toSeq)
    val batch = Tables.events(spark, sf0)
      .where(col("event_type") === "purchase")
      .join(Tables.customer(spark, sf0),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_nationkey"), col("value"))
      .orderBy("event_id").collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("watermark dedup: full-span delay equals batch distinct across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wmdedup_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val out = EventStreams.runAppendToBatch(spark,
      EventStreams.dedupWithinWatermarkStream(spark, dir,
        Seq("user_id", "event_type"), "3650 days", "part-*.parquet", Some(1))
        .select("user_id", "event_type"),
      s"spec_wmdedup_${System.nanoTime()}")
    val streamed = out.groupBy("event_type").count()
      .orderBy("event_type").collect().map(_.toSeq)
    val batch = Tables.events(spark, sf0)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").count()
      .orderBy("event_type").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("watermark dedup state EXPIRES; global dedup state never does") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_wmstate_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    def stateRowsOf(src: org.apache.spark.sql.DataFrame): Long = {
      val name = s"spec_wmstate_${System.nanoTime()}"
      val q = src.select("user_id", "event_type").writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    // short delay: keys expire as the 8 time-ordered batches advance the
    // watermark — final state holds only the trailing window's keys
    val wmState = stateRowsOf(EventStreams.dedupWithinWatermarkStream(
      spark, dir, Seq("user_id", "event_type"), "1 hour",
      "part-*.parquet", Some(1)))
    // global dropDuplicates on the SAME input: one entry per distinct key,
    // forever — the unbounded-state baseline the watermarked form fixes
    val globalState = stateRowsOf(EventStreams.readStream(
        spark, dir, "part-*.parquet", Some(1))
      .dropDuplicates(Seq("user_id", "event_type")))
    val nKeys = Tables.events(spark, sf0)
      .select("user_id", "event_type").distinct().count()
    assert(globalState == nKeys,
      s"global dedup state $globalState != distinct keys $nKeys")
    assert(wmState < globalState,
      s"watermarked state $wmState did not expire below global $globalState")
  }

  test("outer interval join: multi-batch stream equals the batch LEFT JOIN, nulls included") {
    // The r14 outer-join contract: every purchase emits — clickless ones
    // null-padded once the watermark fences their interval (the planned-
    // drain fence row flushes the tail; see purchaseClickJoinOuter). Split
    // into 8 time-ordered files so unmatched emission happens INCREMENTALLY
    // as the watermark advances across micro-batches, not just at drain.
    val dir = java.nio.file.Files.createTempDirectory("graft_outerj_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource orders micro-batches by file MTIME; one write job
    // stamps all parts within the same second, so replay order — and with
    // a 2 h watermark, which rows get dropped as late — would be
    // NONDETERMINISTIC. Stamp strictly increasing mtimes in range order
    // (part-N name order == ts range order under repartitionByRange).
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(f.lastModified() - (parts.length - i) * 60000L) }
    val out = EventStreams.purchaseClickJoinOuterToBatch(
      spark, dir, "part-*.parquet", Some(1))
    val streamed = out.where(col("event_id") >= 0)
      .groupBy("event_id").agg(count(col("c_ts")).as("n_clicks"))
      .orderBy("event_id").collect().map(_.toSeq)
    val ev = Tables.events(spark, sf0)
    val batch = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts").as("pts"))
      .join(ev.where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts")),
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("cts") <= col("pts"),
        "left_outer")
      .groupBy("event_id").agg(count(col("cts")).as("n_clicks"))
      .orderBy("event_id").collect().map(_.toSeq)
    assert(streamed.length === batch.length) // unmatched purchases included
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.exists(_(1) == 0L), "fixture must contain clickless purchases")
  }

  test("stream-stream FULL OUTER interval join equals the batch full join " +
      "under an 8-way micro-batch split") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fullj_").toString
    Tables.events(spark, sf0).drop("ts_ns")
      .repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    // deterministic replay order (see the left-outer twin above)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(f.lastModified() - (parts.length - i) * 60000L) }
    val out = EventStreams.purchaseClickJoinOuterToBatch(
      spark, dir, "part-*.parquet", Some(1), joinType = "full_outer")
    val streamed = out.where(col("event_id").isNull || col("event_id") >= 0)
      .groupBy(coalesce(col("event_id"), lit(-1L)).as("event_id"))
      .agg(count(col("c_ts")).as("n_clicks"))
      .orderBy("event_id").collect().map(_.toSeq)
    val ev = Tables.events(spark, sf0)
    val batch = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts").as("pts"))
      .join(ev.where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts")),
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("cts") <= col("pts"),
        "full_outer")
      .groupBy(coalesce(col("event_id"), lit(-1L)).as("event_id"))
      .agg(count(col("cts")).as("n_clicks"))
      .orderBy("event_id").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
    // fixture must exercise BOTH unmatched tails
    assert(batch.exists(r => r(0) == -1L && r(1).asInstanceOf[Long] > 0L),
      "fixture must contain purchaseless clicks")
    assert(batch.exists(r => r(0).asInstanceOf[Long] >= 0L && r(1) == 0L),
      "fixture must contain clickless purchases")
  }
}
