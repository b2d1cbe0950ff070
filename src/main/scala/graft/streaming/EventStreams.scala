package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (north-star extension —
  * the reference has zero streaming surface, SURVEY.md §1.5).
  *
  * Design: declare transforms once, run them either as a real streaming
  * query (file source → memory sink, `Trigger.AvailableNow`) or as a batch
  * frame — Structured Streaming's core property is exactly that parity, and
  * the DuckDB oracle checks the streaming output against batch SQL.
  *
  * Scale notes: event-time windowed aggregation shuffles once on
  * (window, key); state store size is bounded by watermarking; session
  * windows hash-partition by user key, so state is distributed across
  * executors. The memory sink is test plumbing only — production sinks are
  * kafka/parquet/delta `writeStream`.
  */
object EventStreams {

  /** Optional override for the shuffle/state partition count of streaming
    * runs (`graft.streaming.shufflePartitions`). A streaming query's state
    * partition count is frozen from `spark.sql.shuffle.partitions` at start;
    * it should be sized to key cardinality and throughput, NOT inherit the
    * batch shuffle width — every state partition is a state-store instance
    * that must load + commit each micro-batch, so an oversized count turns
    * into per-batch fixed overhead (32 partitions × 4 join stores over a
    * single-file source is pure waste). Unset → leave the session conf
    * alone (cluster-sized default).
    *
    * Concurrency: this temporarily mutates the SHARED session conf around
    * stream start — correct only when streams are started sequentially on
    * the session (the harness's model). Starting two streams concurrently
    * from one session can race the save/restore; such callers should set
    * the conf once at session build (or start streams from
    * `spark.newSession()` clones) instead of relying on this override. */
  private def withStatePartitions[T](spark: SparkSession)(f: => T): T =
    spark.conf.getOption("graft.streaming.shufflePartitions") match {
      case None => f
      case Some(n) =>
        val key = "spark.sql.shuffle.partitions"
        val old = spark.conf.get(key)
        spark.conf.set(key, n)
        try f finally spark.conf.set(key, old)
    }

  /** Streaming read of the events parquet with `ts` at microsecond
    * precision (exactly what DuckDB sees natively). The read schema is
    * PROBED from the batch footer — never pinned: the harness file has been
    * TIMESTAMP(NANOS)→long in one testdata generation and
    * TIMESTAMP(MICROS, NTZ) in another, and a schema pinned to the wrong
    * encoding misreads micros as nanos, silently shrinking every event
    * timestamp 1000× (wrong answers, no error — the r10 failure mode).
    * Encoding branches live in [[graft.core.Tables.normalizeEventTs]],
    * shared with the batch loader. `glob` selects the event files within
    * `sfDir` (the harness stores one `events.parquet` file);
    * `maxFilesPerTrigger` bounds files per micro-batch — the probe main
    * (`StreamOverheadProbe`) uses it to control batch count when measuring
    * per-batch fixed overhead. */
  /** Footer-probed schema, cached per (path, fingerprint) — one batch
    * footer read per distinct source STATE, not one per query construction
    * (a bench run constructs each streaming query 3+ times). The cache key
    * carries a modification fingerprint (mtime + length via Hadoop
    * FileSystem), so a regenerated /root/testdata under a long-lived JVM
    * (an sbt session) re-probes instead of serving the stale schema — the
    * silent 1000× timestamp-misread class the probe exists to prevent
    * (ADVICE r11). */
  private val probedSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** True if `s` contains a Hadoop glob metacharacter (`*?[{`), not just
    * `*` — a '?' or character-class glob routed down the stat path would
    * reintroduce the zero-file silent-success failure. */
  private def hasGlobMeta(s: String): Boolean = s.exists("*?[{".contains(_))

  /** (isDirectory, fingerprint) of `path`, resolved through the Hadoop
    * FileSystem of the path's scheme — java.nio only sees the local FS, so
    * an hdfs:// or s3a:// sfDir would probe as "not a directory" and hit
    * the wrong read shape. Fingerprint is mtime+length (dir mtime advances
    * when children are added/replaced on HDFS and local FS). Best-effort:
    * a stat failure (path only matchable as a glob) yields (false, 0). */
  private def statSource(spark: SparkSession, path: String): (Boolean, String) =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val st = fs.getFileStatus(p)
      (st.isDirectory, s"${st.getModificationTime}:${st.getLen}")
    } catch { case _: Throwable => (false, "0") }

  def readStream(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `pathGlobFilter` matches LEAF file names: correct when the table is a
    // single file among siblings (the harness layout), but a Spark-written
    // table is a DIRECTORY of part-files whose leaves never match the table
    // name — the filter would silently select zero files and the stream
    // would "succeed" on empty input (how ladder-rung streaming numbers
    // briefly read 2× too fast in r11). Directory tables stream from the
    // directory itself, no leaf filter needed.
    // Glob sources (test/ladder paths) have no single file to fingerprint,
    // so a cached entry could serve a stale schema after regeneration —
    // the exact 1000x-timestamp-misread class the fingerprint exists to
    // prevent (r12 review). They re-probe on every construction instead;
    // single-file/dir sources keep the (path, mtime+length)-keyed cache.
    val (isDir, fingerprint) =
      if (hasGlobMeta(glob)) (false, "glob")
      else statSource(spark, s"$sfDir/$glob")
    val stored =
      if (hasGlobMeta(glob)) spark.read.parquet(s"$sfDir/$glob").schema
      else probedSchemas.computeIfAbsent(s"$sfDir/$glob|$fingerprint",
        _ => spark.read.parquet(s"$sfDir/$glob").schema)
    val rd = spark.readStream.schema(stored)
    if (!isDir) rd.option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => rd.option("maxFilesPerTrigger", n))
    graft.core.Tables.normalizeEventTs(
      rd.parquet(if (isDir) s"$sfDir/$glob" else sfDir))
  }

  /** Tumbling event-time windows: count + exact sum per (window, type). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time windows (width, slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-merged). Works identically as a batch
    * aggregation — which is how the oracle-checked query runs it; the
    * streaming path is exercised in the spec. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n"), col("sum_value"))

  /** Streaming anomaly gate — the at-ingest twin of the batch `q_anomaly`
    * operator. Per-user state is the map day → value-cents (the daily
    * rollup); whenever a batch touches a day, every day whose trailing
    * 7-day window includes a touched day is RE-JUDGED and re-emitted with
    * a per-user version counter, so keeping the highest-version emission
    * per (user, day) converges to exactly the batch answer regardless of
    * how arrivals split across micro-batches. The 2σ rule is the same
    * division-free int64-cents comparison as batch — bit-equal flags.
    *
    * State size: O(days in the retention horizon) per user — the harness
    * log spans 30 days. At 100 TB the map is pruned at the watermark
    * minus 6 days (older days can neither change nor be re-judged once
    * late data is fenced); the harness source defines no lateness, so
    * the prune is documented rather than dialed in here. */
  def streamingAnomaly(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(col("user_id"),
        expr("ts_ns div 86400000000000").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]), (Long, Long, Double, Long, Boolean, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val (ver0, m0) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          val m = scala.collection.mutable.Map.empty[Long, Long] ++= m0
          val touched = scala.collection.mutable.Set.empty[Long]
          it.foreach { case (_, day, cents) =>
            m.update(day, m.getOrElse(day, 0L) + cents)
            touched += day
          }
          val ver = ver0 + 1
          state.update((ver, m.toMap))
          val affected = m.keys
            .filter(d => touched.exists(t => t <= d && d <= t + 6)).toSeq.sorted
          affected.iterator.map { d =>
            val win = m.collect { case (k, c) if k >= d - 6 && k <= d => c }
            val n = win.size.toLong
            val sx = win.sum
            val sxx = win.map(c => c * c).sum
            val d1 = n * m(d) - sx
            val flag = n >= 4 && d1 * d1 > 4 * (n * sxx - sx * sx)
            (uid, d, m(d) / 100.0, n, flag, ver)
          }
      }
      .toDF("user_id", "day", "day_sum", "n_window", "is_anomaly", "ver")
  }

  /** Drive [[streamingAnomaly]] to completion and keep the highest-version
    * emission per (user, day) — the converged at-ingest judgment, equal to
    * the batch `q_anomaly` answer however arrivals split across batches. */
  def streamingAnomalyFinal(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snaps = runUpdatesToBatch(spark,
      streamingAnomaly(spark, sfDir, glob, maxFilesPerTrigger))
    val w = Window.partitionBy(col("user_id"), col("day")).orderBy(col("ver").desc)
    snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "day", "day_sum", "n_window", "is_anomaly")
      .orderBy("user_id", "day")
  }

  /** At-ingest CUSUM change-point detector — the streaming twin of the
    * batch `q_cusum`. State is ONE global day→cents rollup (CUSUM is an
    * inherently sequential GLOBAL statistic); every batch merges its
    * day sums, re-derives the target k = total div days, replays the
    * exact int64 recurrence S_t = max(0, S_{t-1} + (x_t − k)) over the
    * full day sequence, and re-emits every day with a version counter —
    * highest version per day ≡ the batch answer under ANY micro-batch
    * split (same convergence contract as [[streamingAnomaly]]).
    *
    * Scale note: the state is O(days), not O(events) — the corpus
    * aggregates into the map as it streams. A production deployment
    * would freeze the prefix at the watermark (keep only the fence's
    * running S) and pin k as a calibration constant; here k is
    * re-derived per batch because the BATCH operator defines it from
    * the data, and the two must agree bit-for-bit. */
  def streamingCusum(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(expr("ts_ns div 86400000000000").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[(Long, Map[Long, Long]), (Long, Long, Long, Long, Boolean, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val (ver0, m0) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          val m = scala.collection.mutable.Map.empty[Long, Long] ++= m0
          it.foreach { case (day, cents) =>
            m.update(day, m.getOrElse(day, 0L) + cents)
          }
          val ver = ver0 + 1
          state.update((ver, m.toMap))
          val days = m.keys.toVector.sorted
          val k = m.values.sum / days.size
          var s = 0L
          days.map { d =>
            s = math.max(0L, s + (m(d) - k))
            (d, m(d), k, s, s > 2 * k, ver)
          }.iterator
      }
      .toDF("day", "mv", "k", "s", "alarm", "ver")
  }

  /** Drive [[streamingCusum]] to completion; highest version per day =
    * the converged judgment, equal to batch `q_cusum`. */
  def streamingCusumFinal(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snaps = runUpdatesToBatch(spark,
      streamingCusum(spark, sfDir, glob, maxFilesPerTrigger))
    val w = Window.partitionBy(col("day")).orderBy(col("ver").desc)
    snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("day", "mv", "k", "s", "alarm")
      .orderBy("day")
  }

  /** At-ingest twin of the batch histogram-exact percentiles
    * (`q_latency_percentiles`): per event_type, the (cents → count)
    * HISTOGRAM rides the state store — the same bounded-by-value-domain
    * artifact the batch operator's cumulative window runs over, and a
    * commutative MONOID (count maps merge by addition), so the converged
    * answer is bit-identical to batch under ANY arrival split. Each batch
    * folds its arrivals into the histogram and re-emits the nearest-rank
    * picks (ceil(q·n) by the same pure-integer arithmetic) with a version
    * counter; highest version per type ≡ the batch row. State is O(value
    * domain) per type — never O(events) — which is what makes an exact
    * streaming percentile possible at all. */
  def streamingPercentiles(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]),
        (String, Long, Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (typ, it, state) =>
          val (ver0, m0) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          val m = scala.collection.mutable.Map.empty[Long, Long] ++= m0
          it.foreach { case (_, cents) =>
            m.update(cents, m.getOrElse(cents, 0L) + 1L)
          }
          val ver = ver0 + 1
          state.update((ver, m.toMap))
          val ks = m.keys.toVector.sorted
          val n = m.values.sum
          def pick(num: Long, den: Long): Long = {
            val target = (n * num + den - 1) / den
            var cum = 0L
            var i = 0
            while (i < ks.length) {
              cum += m(ks(i))
              if (cum >= target) return ks(i)
              i += 1
            }
            ks.last
          }
          Iterator.single((typ, n, pick(1, 2), pick(9, 10), pick(99, 100), ver))
      }
      .toDF("event_type", "n", "p50_cents", "p90_cents", "p99_cents", "ver")
  }

  /** Drive [[streamingPercentiles]] to completion; highest version per
    * event_type = the converged judgment, equal to batch
    * `q_latency_percentiles`. */
  def streamingPercentilesFinal(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snaps = runUpdatesToBatch(spark,
      streamingPercentiles(spark, sfDir, glob, maxFilesPerTrigger))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ver").desc)
    snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_type", "n", "p50_cents", "p90_cents", "p99_cents")
      .orderBy("event_type")
  }

  /** At-ingest twin of the batch Holt forecaster (`q_ts_holt`): per-user
    * level+trend maintained as events stream in. State per user is the
    * day→(cents, count) rollup (O(days-per-user), never O(events)): each
    * batch merges its arrivals into the rollup, re-derives every daily
    * mean EXACTLY as the batch side does — the decimal daily sum lives as
    * int64 cents, `cents.toDouble / 100.0` is the correctly-rounded double
    * of the same rational as Spark's Decimal→double cast, then ONE
    * division by the count reproduces [[graft.core.Norm.davg]] bit-for-bit
    * — and replays the coupled α = β = ½ recurrence over the sorted days,
    * re-emitting the full series with a version counter. Highest version
    * per (user, day) ≡ the batch answer under ANY micro-batch split (the
    * [[streamingCusum]] convergence contract, per user instead of global).
    * A production deployment freezes days behind the watermark (their l/b
    * prefix is immutable) and carries only the running pair; the full
    * replay here is what makes the batch-oracle equality checkable. */
  def streamingHolt(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(col("user_id"),
        expr("ts_ns div 86400000000000").as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, (Long, Long)]),
        (Long, String, Double, Double, Double, Double, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val (ver0, m0) = state.getOption.getOrElse((0L, Map.empty[Long, (Long, Long)]))
          val m = scala.collection.mutable.Map.empty[Long, (Long, Long)] ++= m0
          it.foreach { case (_, day, cents) =>
            val (c0, n0) = m.getOrElse(day, (0L, 0L))
            m.update(day, (c0 + cents, n0 + 1L))
          }
          val ver = ver0 + 1
          state.update((ver, m.toMap))
          val days = m.keys.toVector.sorted
          var l = 0.0
          var b = 0.0
          days.zipWithIndex.map { case (d, i) =>
            val (c, n) = m(d)
            val v = (c.toDouble / 100.0) / n
            if (i == 0) { l = v; b = 0.0 }
            else {
              val lt = 0.5 * v + 0.5 * (l + b)
              b = 0.5 * (lt - l) + 0.5 * b
              l = lt
            }
            (uid, java.time.LocalDate.ofEpochDay(d).toString, v, l, b, l + b, ver)
          }.iterator
      }
      .toDF("user_id", "day", "v", "level", "trend", "forecast", "ver")
  }

  /** Drive [[streamingHolt]] to completion; highest version per
    * (user, day) = the converged judgment, equal to batch `q_ts_holt`. */
  def streamingHoltFinal(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snaps = runUpdatesToBatch(spark,
      streamingHolt(spark, sfDir, glob, maxFilesPerTrigger))
    val w = Window.partitionBy(col("user_id"), col("day")).orderBy(col("ver").desc)
    snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "day", "v", "level", "trend", "forecast")
      .orderBy("user_id", "day")
  }

  /** At-ingest twin of the batch time-window event dedup
    * (`q_event_dedup_window`): per (user, event_type), an event is kept
    * iff it is the first in event time or arrives more than `gapUs`
    * after its predecessor. State holds the key's raw event-time set and
    * re-judges on every batch (versioned emissions, highest version =
    * converged answer — the same any-arrival-order convergence contract
    * as [[streamingAnomaly]]). State here is the per-key history because
    * the harness replays the finite log in arbitrary splits; a real
    * deployment bounds it with a watermark + frozen prefix counters —
    * the throttle gap makes history older than `max_ts − gap` immutable,
    * so only the trailing window must stay resident. */
  def streamingThrottle(spark: SparkSession, sfDir: String,
      gapUs: Long,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Long, Vector[Long]), (Long, String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case ((uid, etype), it, state) =>
          val (ver0, ts0) = state.getOption.getOrElse((0L, Vector.empty[Long]))
          val ts = (ts0 ++ it.map(_._3)).sorted
          val ver = ver0 + 1
          state.update((ver, ts))
          var kept = 0L
          var prev = Long.MinValue
          ts.foreach { t =>
            if (prev == Long.MinValue || t - prev > gapUs) kept += 1
            prev = t
          }
          Iterator.single((uid, etype, ts.length.toLong, kept, ver))
      }
      .toDF("user_id", "event_type", "n_events", "n_kept", "ver")
  }

  /** Custom state machine per user via `mapGroupsWithState`: exact running
    * (count, sum) totals. Sums accumulate in integer cents so the result is
    * independent of row arrival order within a batch (double addition is
    * not associative; long addition is). Emits an updated snapshot per
    * (user, batch); [[runUpdatesToBatch]] keeps the final snapshot. */
  def statefulUserTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    readStream(spark, sfDir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          var (n, cents) = state.getOption.getOrElse((0L, 0L))
          it.foreach { case (_, v) =>
            n += 1
            // HALF_UP at scale 2, matching a DECIMAL(18,2) cast (the oracle
            // semantics) — math.round is half-up toward +inf, which differs
            // for negative exact half-cents
            cents += (BigDecimal(v).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100)
              .toLongExact
          }
          state.update((n, cents))
          (uid, n, cents / 100.0)
      }
      .toDF("user_id", "n", "sum_value")
  }

  /** Drive an update-mode stateful stream to completion. Every micro-batch
    * of snapshots is APPENDED TO A TEMP PARQUET SINK by the executors —
    * the driver never collects data rows (at scale the union of snapshots
    * dwarfs driver memory); the returned frame reads the sink back.
    * Callers keep the final snapshot per key — `n` is strictly increasing
    * per key. */
  def runUpdatesToBatch(spark: SparkSession, agg: DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stateful_").toString
    withStatePartitions(spark) {
      val q = agg.writeStream
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(dir); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.schema(agg.schema).parquet(dir)
  }

  /** Streaming read of the documents corpus (file source over the shared
    * dir, schema pinned from the batch footer — no inference pass). The
    * ingest-side transforms (quality gating, scrubbing, tokenizing) are the
    * same per-row expressions as batch; Structured Streaming's
    * batch/stream parity means one definition serves both. */
  def readDocumentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    // fingerprinted cache key (readStream's scheme): a regenerated corpus
    // at the same path must not be served a stale cached schema
    val (isDir, fingerprint) = statSource(spark, s"$sfDir/documents.parquet")
    val schema = probedSchemas.computeIfAbsent(
      s"$sfDir/documents.parquet|$fingerprint",
      _ => spark.read.parquet(s"$sfDir/documents.parquet").schema)
    val rd = spark.readStream.schema(schema)
    if (!isDir) rd.option("pathGlobFilter", "documents.parquet")
    rd.parquet(if (isDir) s"$sfDir/documents.parquet" else sfDir)
  }

  /** Embedding stream (same single-file/directory split as documents;
    * glob sources re-probe every construction, the readStream rule). */
  def readEmbeddingsStream(spark: SparkSession, sfDir: String,
      glob: String = "embeddings.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema =
      if (hasGlobMeta(glob)) spark.read.parquet(s"$sfDir/$glob").schema
      else {
        val (_, fingerprint) = statSource(spark, s"$sfDir/$glob")
        probedSchemas.computeIfAbsent(s"$sfDir/$glob|$fingerprint",
          _ => spark.read.parquet(s"$sfDir/$glob").schema)
      }
    val isDir = !hasGlobMeta(glob) && java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$sfDir/$glob"))
    val rd = spark.readStream.schema(schema)
    if (!isDir) rd.option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => rd.option("maxFilesPerTrigger", n))
    rd.parquet(if (isDir) s"$sfDir/$glob" else sfDir)
  }

  /** Streaming PCA statistics — the CovAggregator buffer maintained AT
    * INGEST. The buffer is a commutative monoid of exact int64 sums, so
    * merging each micro-batch's contribution into one global state row
    * converges to the monolithic batch buffer BIT-IDENTICALLY under any
    * arrival split (the q_pca_incr two-path identity, made streaming).
    * State: ONE 2145-slot long vector. Emissions are versioned; the
    * highest version after the stream drains is the converged buffer,
    * from which [[streamingPcaCovFinal]] assembles the same (i, j, n,
    * s_i, s_j, s_ij, cov) rows as batch `q_pca_cov`. */
  def streamingPcaCov(spark: SparkSession, sfDir: String,
      dim: Int,
      glob: String = "embeddings.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val size = 1 + dim + dim * (dim + 1) / 2
    readEmbeddingsStream(spark, sfDir, glob, maxFilesPerTrigger)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * lit(1048576.0) + lit(0.5))
          .cast("long")).as("v"))
      .as[Seq[Long]]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Seq[Long])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val (ver0, buf0) = state.getOption
            .getOrElse((0L, Seq.fill(size)(0L)))
          val buf = buf0.toArray
          it.foreach { v =>
            val x = v.toArray
            buf(0) += 1L
            var i = 0
            var p = 1 + dim
            while (i < dim) {
              val xi = x(i)
              buf(1 + i) += xi
              var j = i
              while (j < dim) { buf(p) += xi * x(j); p += 1; j += 1 }
              i += 1
            }
          }
          val ver = ver0 + 1
          state.update((ver, buf.toSeq))
          Iterator.single((ver, buf.toSeq))
      }
      .toDF("ver", "buf")
  }

  /** Drive [[streamingPcaCov]] to completion and assemble the covariance
    * rows from the highest-version buffer — schema-identical to batch
    * `q_pca_cov`, value-identical by the monoid argument. */
  def streamingPcaCovFinal(spark: SparkSession, sfDir: String,
      dim: Int,
      glob: String = "embeddings.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val snaps = runUpdatesToBatch(spark,
      streamingPcaCov(spark, sfDir, dim, glob, maxFilesPerTrigger))
    val buf = snaps.orderBy(col("ver").desc).head().getSeq[Long](1)
    val n = buf(0)
    val rows = for { i <- 0 until dim; j <- i until dim } yield {
      val si = buf(1 + i); val sj = buf(1 + j)
      val sij = buf(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
      val cov = (n.toDouble * sij.toDouble - si.toDouble * sj.toDouble) /
        (n.toDouble * n.toDouble * 1048576.0 * 1048576.0)
      (i, j, n, si, sj, sij, cov)
    }
    rows.toDF("i", "j", "n", "s_i", "s_j", "s_ij", "cov").orderBy("i", "j")
  }

  /** Streaming novelty gate — the Bloom-fronted ingest pipeline: a filter
    * built from the SEEN corpus (batch side) is collected to a word map and
    * compiled into a per-row expression over the incoming document stream
    * ([[graft.operators.BloomFilter.mightContainLit]] — map-side, no state,
    * no shuffle). `mightContain = false` PROVES the document is new, so
    * those rows pass straight through; only the might-contain sliver pays
    * the exact stream-static anti-join (broadcast left join + null filter —
    * streaming supports stream-static left outer) against the seen digest
    * set. Output: one row per admitted (novel) document with its admission
    * path (`bloom_proved` / `exact_verified`). At 100 TB the sliver is
    * `FP-rate × batch + true dups`, so the expensive exact join sees a few
    * percent of the stream. */
  def noveltyGateStream(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.{BloomFilter, TextAnalysis}
    val seenDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < 250)
      .select(TextAnalysis.contentFingerprint(col("text")).as("fp"))
    val bloomWords = BloomFilter.words(BloomFilter.build(seenDocs, "fp"))
    val seenFp = seenDocs.select(col("fp").as("seen_fp")).distinct()
    val stream = readDocumentsStream(spark, sfDir)
      .where(col("doc_id") >= 250)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.contentFingerprint(col("text")).as("fp"))
    val gated = BloomFilter.mightContainLit(stream, bloomWords, "fp")
    val proved = gated.where(!col("mightContain"))
      .select(col("doc_id"), col("lang"), lit("bloom_proved").as("via"))
    val verified = gated.where(col("mightContain"))
      .join(broadcast(seenFp), col("fp") === col("seen_fp"), "left_outer")
      .where(col("seen_fp").isNull)
      .select(col("doc_id"), col("lang"), lit("exact_verified").as("via"))
    proved.unionByName(verified)
  }

  /** Streaming exact deduplication: the first-seen row per `keys` survives
    * (`dropDuplicates` keyed state). This is the streaming ingest side of
    * the dedup family: content digests (or here, key columns) dedupe
    * records AS THEY ARRIVE, so downstream training-data writes never see
    * a duplicate. State is one entry per distinct key, hash-partitioned
    * across executors. (The watermarked variant
    * `dropDuplicatesWithinWatermark` bounds state for unbounded keys but
    * intentionally forgets old keys — its result would diverge from
    * global batch dedup, so the oracle-checked query uses the global
    * form.) */
  def dedupStream(spark: SparkSession, sfDir: String, keys: Seq[String]): DataFrame =
    readStream(spark, sfDir).dropDuplicates(keys)

  /** Watermark-BOUNDED ingest dedup: `dropDuplicatesWithinWatermark` keeps
    * a key's state only until the watermark passes its event time + delay,
    * so state is bounded by the key arrival rate × delay instead of the
    * all-time distinct key count — the form an unbounded-key 100 TB ingest
    * actually deploys (the global `dedupStream` above never forgets). The
    * trade is intentional amnesia: a duplicate arriving after its
    * predecessor expired is re-emitted. With `delay` covering the whole
    * replayed span the result equals global batch dedup under ANY
    * micro-batch split (the oracle-checked configuration); StreamingSpec
    * additionally drives a SHORT delay to prove state actually expires. */
  def dedupWithinWatermarkStream(spark: SparkSession, sfDir: String,
      keys: Seq[String], delay: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding hour. Both sides are watermarked so the
    * join state is bounded by (watermark + interval); the range condition
    * lets Spark expire buffered rows as event time advances — the standard
    * attribution-join shape at scale. */
  def purchaseClickJoin(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val clicks = readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join, run to a batch
    * frame — the enrichment shape users hit right after the inner
    * attribution join: every purchase must come out, clickless ones with
    * a null click side. The null-padded row for an unmatched purchase can
    * only be emitted once the WATERMARK has passed the purchase's whole
    * candidate interval (before that a matching click could still
    * arrive), so emission is deferred, not dropped — state stays bounded
    * by (interval + delay) exactly as in the inner join, and unmatched
    * rows flush INCREMENTALLY as the watermark advances across
    * micro-batches.
    *
    * Drain semantics: a watermark only ever advances to
    * `max event time − delay`, so on a FINITE replay the last `delay` of
    * unmatched purchases would sit in state forever ("missing" rows vs
    * the batch LEFT JOIN). The deployment answer is PUNCTUATION — a
    * planned-drain heartbeat event posted PAST the tail AFTER the real
    * input drains (the pattern Kafka pipelines use for partition
    * heartbeats at shutdown). Each side unions an initially-EMPTY fence
    * file stream; once `processAllAvailable` has drained the real input,
    * one fence row (`user −1`, `ts = max+4 h`, matching nothing) is
    * written to each fence dir and processed, advancing both sides'
    * watermarks past every real interval so the no-data micro-batch
    * flushes the tail. Posting the fence up front would be WRONG under a
    * multi-batch split: it would jump the watermark over the not-yet-read
    * files and drop them all as late. The fence purchase row itself
    * cannot emit (nothing ever fences IT); consumers drop `event_id < 0`
    * batch-side. Do NOT filter it on the streaming side: Catalyst
    * correctly pushes an `event_id >= 0` predicate through the outer
    * join's left side, through the union, INTO the fence file source —
    * silently deleting the fence before the watermark operator ever sees
    * it (how this operator's tail went missing in development).
    * StreamingSpec asserts equality with the batch LEFT JOIN under an
    * 8-way micro-batch split.
    *
    * FULL OUTER (r15, `joinType = "full_outer"`): unmatched CLICKS also
    * emit, purchase side null, once the watermark proves no purchase in
    * `[c_ts, c_ts + 1 h]` can still arrive — the same deferred-emission
    * mechanics on the other store. The one fence row per side still
    * suffices: after the fence the watermark sits at `max + 2 h`, past
    * every real click's candidate window (`c_ts + 1 h ≤ max + 1 h`) and
    * every real purchase's interval, so both tails flush; the fence rows
    * themselves can never emit (the watermark never passes their OWN
    * windows at `max + 4 h`), and consumers drop negatives batch-side as
    * before. */
  def purchaseClickJoinOuterToBatch(spark: SparkSession, sfDir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      joinType: String = "left_outer"): DataFrame = {
    // batch-side read of the SAME files the stream will drain (glob form
    // covers single-file, directory-table and part-split layouts alike)
    val fence = graft.core.Tables.normalizeEventTs(
        spark.read.parquet(s"$sfDir/$glob"))
      .agg((max(col("ts")) + expr("INTERVAL 4 HOURS")).as("fence_ts"))
    val cFence = fence.select(lit(-1L).as("c_user"), col("fence_ts").as("c_ts"))
    val pFence = fence.select(lit(-1L).as("event_id"), lit(-1L).as("p_user"),
      col("fence_ts").as("p_ts"))
    val cDir = java.nio.file.Files.createTempDirectory("graft_fence_c_").toString
    val pDir = java.nio.file.Files.createTempDirectory("graft_fence_p_").toString
    val clicks = readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .unionByName(spark.readStream.schema(cFence.schema).parquet(cDir))
      .withWatermark("c_ts", "2 hours")
    val purchases = readStream(spark, sfDir, glob, maxFilesPerTrigger)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .unionByName(spark.readStream.schema(pFence.schema).parquet(pDir))
      .withWatermark("p_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      joinType)
    val name = s"ssjoinouter_${System.nanoTime()}"
    recycleSink(spark, name)
    withStatePartitions(spark) {
      val q = joined.writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime("25 milliseconds"))
        .start()
      q.processAllAvailable() // real input fully drained
      cFence.coalesce(1).write.mode("overwrite").parquet(cDir)
      pFence.coalesce(1).write.mode("overwrite").parquet(pDir)
      q.processAllAvailable() // fence batch processed, watermark advanced
      // the null-row flush happens in the watermark-change NO-DATA batch
      // right after the fence batch; processAllAvailable does not wait
      // for it, so poll the sink until it stops growing. Tight cadence
      // (VERDICT r15 #7): the old 3×200 ms stability window put ≥0.6 s of
      // pure sleep on this row's floor — 50 ms polls with a 3-poll
      // stability window keep the safety margin at a tenth of the cost.
      var last = -1L
      var stable = 0
      var tries = 0
      while (stable < 3 && tries < 600) {
        val n = spark.table(name).count()
        if (n == last) stable += 1 else { stable = 0; last = n }
        Thread.sleep(50)
        tries += 1
      }
      q.stop()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** Stream-STATIC enrichment join: purchases enriched with the customer
    * dimension at ingest. Stateless by construction — no watermark, no
    * state store; the static side is broadcast into each micro-batch
    * (the planner's stream-static rule), so at 100 TB/day of events the
    * cost is one broadcast per trigger and zero shuffle of the stream. */
  def streamStaticEnrich(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ev = readStream(spark, sfDir, "events.parquet", maxFilesPerTrigger)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = graft.core.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    ev.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_nationkey"), col("value"))
  }

  /** Previous memory-sink view per (session, name prefix), dropped when a
    * newer run of the same query registers its sink. A `format("memory")`
    * sink holds its full result rowset on the DRIVER behind the temp view
    * for the session lifetime — with per-run unique names (needed: a
    * memory sink cannot be restarted) a bench leg leaked one rowset per
    * streaming query per run, measured as steady old-gen growth (r15's
    * gc_ms regression). Recycling keeps at most ONE live sink per query
    * family. */
  private val lastSink =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Register `name` as its prefix's current sink and drop the previous
    * run's view (the prefix is everything before the last '_' — callers
    * name sinks `<family>_<nanoTime>`). */
  private def recycleSink(spark: SparkSession, name: String): Unit = {
    val cut = name.lastIndexOf('_')
    val prefix = if (cut > 0) name.substring(0, cut) else name
    val prev = lastSink.put((spark, prefix), name)
    if (prev != null && prev != name)
      try { spark.catalog.dropTempView(prev); () }
      catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Run an append-mode stream (dedup, stream-stream join) to completion
    * against the finite input (memory sink, AvailableNow). */
  def runAppendToBatch(spark: SparkSession, out: DataFrame, name: String): DataFrame = {
    recycleSink(spark, name)
    withStatePartitions(spark) {
      val q = out.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** Run a streaming aggregation to completion against the finite input and
    * return the final result (memory sink, complete mode, AvailableNow). */
  def runToBatch(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    recycleSink(spark, name)
    withStatePartitions(spark) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }
}
