package graft.streaming

import graft.core.Tables
import graft.operators.Q
import org.apache.spark.sql.functions._

/** Streaming queries with batch oracles. The tumbling/sliding queries run
  * as REAL streaming queries (file source → watermark → windowed agg →
  * memory sink); complete output mode over the finite input makes the
  * final table equal the batch answer, which DuckDB recomputes with
  * time_bucket SQL. Session windows run the same `session_window` operator
  * in batch mode here (deterministic), and as a stream in the spec. */
object StreamingQueries {

  val all: Map[String, Q] = Map(

    "q_stream_tumbling" -> Q(
      (s, d) => {
        val out = EventStreams.runToBatch(s,
          EventStreams.tumbling(EventStreams.readStream(s, d), "1 day"),
          s"tumbling_${System.nanoTime()}")
        out.orderBy("win_start_us", "event_type")
      },
      """SELECT epoch_us(time_bucket(INTERVAL 1 DAY, ts)) AS win_start_us,
        | event_type, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin),

    "q_stream_sliding" -> Q(
      (s, d) => {
        val out = EventStreams.runToBatch(s,
          EventStreams.sliding(EventStreams.readStream(s, d), "1 day", "12 hours"),
          s"sliding_${System.nanoTime()}")
        out.orderBy("win_start_us", "event_type")
      },
      """WITH slid AS (
        |  SELECT time_bucket(INTERVAL 12 HOUR, ts) - k.k * INTERVAL 12 HOUR AS win_start,
        |         event_type
        |  FROM events CROSS JOIN (VALUES (0), (1)) AS k(k))
        |SELECT epoch_us(win_start) AS win_start_us, event_type, count(*) AS n
        |FROM slid GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin),

    "q_stream_stateful" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val snaps = EventStreams.runUpdatesToBatch(s, EventStreams.statefulUserTotals(s, d))
        val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc)
        snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select("user_id", "n", "sum_value")
          .orderBy("user_id")
      },
      """SELECT user_id, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin),

    // exactly-once streaming MERGE sink (r14): the events stream drains
    // through foreachBatch into a versioned snapshot (batch-id idempotent
    // commit protocol — MergeSink); the committed snapshot must equal the
    // all-batch GROUP BY. Replay convergence (duplicated/out-of-order
    // batch re-delivery yields a byte-identical snapshot) is proven in
    // MergeSinkSpec; here the real stream runs end-to-end against the
    // harness file.
    "q_stream_merge" -> Q(
      (s, d) => MergeSink.mergedTotals(s, d).orderBy("user_id"),
      """SELECT user_id, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin),

    // streaming anomaly gate: the at-ingest twin of batch q_anomaly —
    // flatMapGroupsWithState keeps the per-user day→cents rollup and
    // re-judges every day whose trailing window a batch touches; the
    // highest-version emission per (user, day) equals the batch answer
    // exactly (division-free int64 flag), so the BATCH oracle is reused
    // verbatim
    "q_stream_anomaly" -> Q(
      (s, d) => EventStreams.streamingAnomalyFinal(s, d),
      graft.operators.QualityChecks.all("q_anomaly").oracle.get),

    // streaming CUSUM: the at-ingest change-point detector — one global
    // day-rollup state, the exact int64 recurrence replayed per batch
    // with versioned re-emission (highest version = batch answer under
    // any split, convergence spec-proven); the BATCH oracle is reused
    // verbatim
    "q_stream_cusum" -> Q(
      (s, d) => EventStreams.streamingCusumFinal(s, d),
      graft.operators.QualityChecks.all("q_cusum").oracle.get),

    // streaming exact percentiles (r15): the (cents -> count) histogram —
    // bounded by the value domain, a commutative monoid — rides the state
    // store per event_type; nearest-rank picks re-emitted per batch with
    // versions, highest version = the batch answer bit-for-bit under any
    // split; the BATCH q_latency_percentiles oracle is reused verbatim
    "q_stream_percentiles" -> Q(
      (s, d) => EventStreams.streamingPercentilesFinal(s, d),
      graft.operators.EventLifecycle.all("q_latency_percentiles").oracle.get),

    // streaming Holt forecaster (r15): per-user level+trend maintained at
    // ingest — state is the day->(cents, count) rollup per user, each
    // batch re-derives the decimal-exact daily means and replays the
    // coupled recurrence with versioned re-emission (highest version per
    // (user, day) = batch answer under any split); the BATCH q_ts_holt
    // oracle is reused verbatim
    "q_stream_holt" -> Q(
      (s, d) => EventStreams.streamingHoltFinal(s, d),
      graft.operators.TimeSeries.all("q_ts_holt").oracle.get),

    // streaming PCA statistics: the CovAggregator buffer maintained at
    // ingest — exact int64 monoid merges per micro-batch converge
    // BIT-IDENTICALLY to the monolithic covariance under any arrival
    // split (8-way convergence spec-proven); the batch q_pca_cov oracle
    // is reused verbatim
    "q_stream_pca_cov" -> Q(
      (s, d) => EventStreams.streamingPcaCovFinal(s, d, 64),
      graft.operators.PipelineQueries.all("q_pca_cov").oracle.get),

    // streaming ingest quality gate: documents stream in, the per-row
    // quality filter (>= 20 tokens AND < 20% punctuation) admits or drops
    // each AS IT ARRIVES, per-lang admission counts aggregate in complete
    // mode — the filter-at-ingest pipeline shape (same per-row expressions
    // as batch; the oracle recomputes the gate in SQL)
    "q_stream_quality" -> Q(
      (s, d) => {
        import graft.functions.GraftFunctions.tokens
        val gated = EventStreams.readDocumentsStream(s, d)
          .withColumn("n_words", size(tokens(col("text"))).cast("long"))
          .withColumn("n_punct",
            size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("long"))
          .where(col("n_words") >= 20 &&
            col("n_punct") * 5 < length(col("text")))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            sum(col("n_words")).as("sum_words"))
        val out = EventStreams.runToBatch(s, gated, s"squality_${System.nanoTime()}")
        out.orderBy("lang")
      },
      """WITH t AS (
        |  SELECT lang,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS n_words,
        |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::BIGINT AS n_punct,
        |    length(text) AS n_chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_admitted, sum(n_words)::BIGINT AS sum_words
        |FROM t WHERE n_words >= 20 AND n_punct * 5 < n_chars
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // streaming ingest dedup: first row per (user, type) survives; the
    // per-type survivor count equals batch COUNT(DISTINCT user)
    // at-ingest throttle dedup: the streaming twin of
    // q_event_dedup_window (same 1 h gap, same keep rule); versioned
    // re-judgment per (user, type) converges to the batch answer however
    // arrivals split across micro-batches — the oracle IS the batch SQL
    "q_stream_throttle" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val snaps = EventStreams.runUpdatesToBatch(s,
          EventStreams.streamingThrottle(s, d, graft.operators.EventLifecycle.throttleUs))
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ver").desc)
        snaps.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select("user_id", "event_type", "n_events", "n_kept")
          .orderBy("user_id", "event_type")
      },
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
         |           FROM events),
         |f AS (SELECT user_id, event_type,
         |        CASE WHEN lag(ts_us) OVER w IS NULL
         |               OR ts_us - lag(ts_us) OVER w > ${graft.operators.EventLifecycle.throttleUs}
         |             THEN 1 ELSE 0 END AS kept
         |      FROM e WINDOW w AS (PARTITION BY user_id, event_type
         |                          ORDER BY ts_us, event_id))
         |SELECT user_id, event_type, count(*)::BIGINT AS n_events,
         |  sum(kept)::BIGINT AS n_kept
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q_stream_dedup" -> Q(
      (s, d) => {
        val out = EventStreams.runAppendToBatch(s,
          EventStreams.dedupStream(s, d, Seq("user_id", "event_type"))
            .select("user_id", "event_type"),
          s"sdedup_${System.nanoTime()}")
        out.groupBy("event_type").agg(count(lit(1)).as("n_unique_users"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),

    // watermark-BOUNDED ingest dedup: same answer as q_stream_dedup, but
    // the state store forgets keys once the watermark passes them — the
    // deployment form for unbounded key spaces. The delay here spans the
    // whole replayed history so the result provably equals global batch
    // dedup under any micro-batch split; the spec drives a short delay to
    // show state genuinely expires (bounded) where dropDuplicates' does not.
    "q_stream_dedup_wm" -> Q(
      (s, d) => {
        val out = EventStreams.runAppendToBatch(s,
          EventStreams.dedupWithinWatermarkStream(s, d,
            Seq("user_id", "event_type"), "3650 days")
            .select("user_id", "event_type"),
          s"sdedupwm_${System.nanoTime()}")
        out.groupBy("event_type").agg(count(lit(1)).as("n_unique_users"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),

    // stream-stream interval join (attribution): purchases x same-user
    // clicks in the preceding hour, both sides watermarked
    // stream-STATIC enrich at ingest: purchases pick up the customer
    // dimension via a stateless broadcast join inside the stream (no
    // watermark, no state store — the cheapest join a streaming pipeline
    // has); the post-hoc batch rollup over the memory sink must equal the
    // all-batch SQL join exactly
    "q_stream_enrich" -> Q(
      (s, d) => {
        val out = EventStreams.runAppendToBatch(s,
          EventStreams.streamStaticEnrich(s, d),
          s"ssenrich_${System.nanoTime()}")
        out.groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("sum_value"))
          .orderBy("c_nationkey")
      },
      """SELECT c_nationkey, count(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    "q_stream_join" -> Q(
      (s, d) => {
        val out = EventStreams.runAppendToBatch(s,
          EventStreams.purchaseClickJoin(s, d).select(col("event_id"), col("c_ts")),
          s"ssjoin_${System.nanoTime()}")
        out.groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
          .orderBy("event_id")
      },
      """SELECT a.event_id, count(*) AS n_clicks
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_type = 'purchase'
        | AND b.event_type = 'click'
        | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
        |GROUP BY 1 ORDER BY a.event_id""".stripMargin),

    // watermarked stream-stream LEFT OUTER interval join (r14): every
    // purchase emits — clickless ones as a null-padded row once the
    // watermark fences their candidate interval. count(c_ts) counts only
    // matched clicks, so unmatched purchases surface as n_clicks = 0 and
    // the batch LEFT JOIN oracle checks both the matched multiplicities
    // AND the unmatched-row emission.
    "q_stream_join_outer" -> Q(
      (s, d) => {
        val out = EventStreams.purchaseClickJoinOuterToBatch(s, d)
        out.where(col("event_id") >= 0) // batch-side fence guard (see operator doc)
          .groupBy("event_id").agg(count(col("c_ts")).as("n_clicks"))
          .orderBy("event_id")
      },
      """SELECT a.event_id, count(b.ts) AS n_clicks
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.event_type = 'click'
        | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
        |WHERE a.event_type = 'purchase'
        |GROUP BY 1 ORDER BY a.event_id""".stripMargin),

    // watermarked stream-stream FULL OUTER interval join (r15, verdict
    // #7) — completes the enrichment matrix (inner / left / full):
    // unmatched purchases AND unmatched clicks both emit null-padded as
    // the watermark fences their windows (see the operator doc for why
    // one fence per side flushes both tails). Unmatched clicks carry a
    // null event_id, grouped under the -1 sentinel so both engines agree
    // without touching null-ordering divergence; the batch FULL JOIN
    // oracle checks matched multiplicities and BOTH unmatched tails.
    "q_stream_join_full" -> Q(
      (s, d) => {
        val out = EventStreams.purchaseClickJoinOuterToBatch(s, d,
          joinType = "full_outer")
        out.where(col("event_id").isNull || col("event_id") >= 0)
          .groupBy(coalesce(col("event_id"), lit(-1L)).as("event_id"))
          .agg(count(col("c_ts")).as("n_clicks"))
          .orderBy("event_id")
      },
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT coalesce(a.event_id, -1) AS event_id, count(b.ts) AS n_clicks
        |FROM p a FULL JOIN c b
        |  ON a.user_id = b.user_id
        | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
        |GROUP BY 1 ORDER BY event_id""".stripMargin),

    // Bloom-fronted streaming novelty gate: the seen corpus (doc_id < 250)
    // compressed to a word map compiled into the stream's plan; proven-new
    // rows skip the join entirely, the might-contain sliver pays the exact
    // broadcast anti-join. Differential oracle: DuckDB replays the md5-60
    // bloom build + probe AND the exact membership, reproducing each row's
    // admission path.
    "q_stream_novel" -> Q(
      (s, d) => {
        val out = EventStreams.runAppendToBatch(s,
          EventStreams.noveltyGateStream(s, d), s"snovel_${System.nanoTime()}")
        out.orderBy("doc_id")
      },
      """WITH fp AS (SELECT doc_id, lang,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp FROM documents),
        |posh AS (
        |  SELECT doc_id, fp,
        |    ('0x' || substr(md5('bloom' || k.k::VARCHAR || '_' || fp), 1, 15))::BIGINT % 4096 AS p
        |  FROM fp CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k),
        |bloom AS (
        |  SELECT p // 63 AS w, bit_or(1::BIGINT << (p % 63)::INT) AS bits
        |  FROM posh WHERE doc_id < 250 GROUP BY 1),
        |probe AS (
        |  SELECT ph.doc_id,
        |    bool_and((coalesce(b.bits, 0) & (1::BIGINT << (ph.p % 63)::INT)) <> 0) AS member
        |  FROM posh ph LEFT JOIN bloom b ON ph.p // 63 = b.w
        |  WHERE ph.doc_id >= 250 GROUP BY 1)
        |SELECT f.doc_id, f.lang,
        |  CASE WHEN NOT p.member THEN 'bloom_proved' ELSE 'exact_verified' END AS via
        |FROM probe p JOIN fp f USING (doc_id)
        |WHERE NOT p.member
        |   OR f.fp NOT IN (SELECT fp FROM fp WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin),

    "q_stream_session" -> Q(
      (s, d) => EventStreams.sessions(Tables.events(s, d), "6 hours")
        .orderBy("user_id", "session_start_us"),
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |m AS (SELECT *, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 6 HOUR
        |                     THEN 1 ELSE 0 END AS new_s FROM e),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT epoch_us(min(ts)) AS session_start_us, user_id, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin)
  )
}
