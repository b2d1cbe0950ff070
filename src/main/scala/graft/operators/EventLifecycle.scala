package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch event-lifecycle operators (north-star extension, round 12):
  * the "event log → curated table" reshaping steps a training-data
  * pipeline runs over interaction/telemetry logs before feature
  * extraction.
  *
  *   - sessionization: split each user's event stream into sessions at
  *     idle gaps (the batch twin of the streaming `session_window`
  *     query, whose semantics the reference-free batch path can oracle
  *     exactly);
  *   - SCD2 history: run-length-encode each user's `event_type`
  *     transitions into versioned validity intervals
  *     (`valid_from`/`valid_to`/`is_current`) — the slowly-changing-
  *     dimension shape used for snapshot lineage of mutable metadata.
  *
  * Scale: both operators are ONE hash shuffle on `user_id`; every
  * window and the final aggregation run inside those partitions (the
  * group-by keys extend the window partition key, so Spark's
  * `EnsureRequirements` inserts no second exchange — locked by
  * PlanSpec). State per key is a row, not a buffer: at 100 TB the
  * operator scales with key cardinality × events-per-key, and a skewed
  * user would be handled by the same salting pattern as the join family
  * (not needed on the harness data — measured skew is flat).
  */
object EventLifecycle {

  /** 6 hours in microseconds — the idle gap that splits sessions. The
    * harness events run ~30 days × 15 users with a median inter-event
    * gap of ~7.7 h, so 6 h yields real multi-event sessions rather than
    * one session (gap too big) or one event each (gap too small). */
  val sessionGapUs: Long = 6L * 3600 * 1000000

  /** Throttle window for [[q_event_dedup_window]]: events of the same
    * (user, type) within 1 h of their predecessor are near-duplicates. */
  val throttleUs: Long = 3600L * 1000000

  val all: Map[String, Q] = Map(

    // -- EXACT grouped telemetry percentiles (r15): the p50/p90/p99 table
    //    every ops dashboard runs, by nearest-rank ELEMENT PICK — never an
    //    interpolated average, so the reported value is an actual observed
    //    int64-cents observation and bit parity is an integer compare.
    //    Index = ceil(q·n) via pure integer arithmetic ((n·num + den−1)
    //    div den) in BOTH engines. Scale: HISTOGRAM-EXACT — a raw
    //    rank window over events partitions by event_type, and with ~5
    //    types parallelism caps at 5 single-threaded sorts (measured: the
    //    first implementation read 3.9× on the 4× x64 step). Instead ONE
    //    map-side-combined (type, cents) count rollup absorbs the corpus
    //    in parallel; the cumulative window then runs over DISTINCT cents
    //    per type — bounded by the VALUE DOMAIN (≤ 100·max_value rows),
    //    not the corpus — and the percentile is the smallest cents whose
    //    cumulative count reaches ceil(q·n), which IS the nearest-rank
    //    element. --
    "q_latency_percentiles" -> Q(
      (s, d) => {
        val hist = Tables.events(s, d).select(col("event_type"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
          .groupBy(col("event_type"), col("cents"))
          .agg(count(lit(1)).as("c"))
        val n = hist.groupBy("event_type").agg(sum(col("c")).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        def idx(num: Int, den: Int) = expr(s"(n * $num + $den - 1) div $den")
        hist.withColumn("cum", sum(col("c")).over(w))
          .join(broadcast(n), "event_type")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            min(when(col("cum") >= idx(1, 2), col("cents"))).as("p50_cents"),
            min(when(col("cum") >= idx(9, 10), col("cents"))).as("p90_cents"),
            min(when(col("cum") >= idx(99, 100), col("cents"))).as("p99_cents"))
          .orderBy("event_type")
      },
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents, event_id
        |  FROM events),
        |n AS (SELECT event_type, count(*)::BIGINT AS n FROM ev GROUP BY 1),
        |r AS (
        |  SELECT ev.event_type, cents, n.n,
        |    row_number() OVER (PARTITION BY ev.event_type ORDER BY cents, event_id) AS rn
        |  FROM ev JOIN n USING (event_type))
        |SELECT event_type, max(n) AS n,
        |  max(CASE WHEN rn = (n * 1 + 1) // 2 THEN cents END) AS p50_cents,
        |  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN cents END) AS p90_cents,
        |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN cents END) AS p99_cents
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin),

    // -- A/B experiment readout (r14): deterministic hash-bucket variant
    //    assignment (md5-60("ab_" + user_id) % 2 — exactly how production
    //    bucketing works, reproducible across runs/engines), per-variant
    //    user and converter counts as EXACT integers from two tiny keyed
    //    aggs (user-keyed rollup, then a 2-row variant agg; conversion =
    //    a high-value purchase, value > 100 — the raw any-purchase rate
    //    saturates at 1.0 on the harness corpus and degenerates z), and the
    //    pooled two-proportion z statistic with ONE sqrt — the float
    //    expression tree mirrored token-for-token by the oracle, z
    //    rounded to 6 before the |z| > 1.96 gate so the flag can't flip
    //    on a ulp. At 100 TB: one user-keyed exchange, reduce side 2 rows. --
    "q_ab_test" -> Q(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        import graft.functions.GraftFunctions.md5Hash60
        val perUser = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("value"))
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
              col("value") > 100.0, 1).otherwise(0))
            .as("converted"))
          .withColumn("variant",
            (md5Hash60(concat(lit("ab_"), col("user_id").cast("string"))) % 2)
              .cast("int"))
        val v = perUser.groupBy(col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("c"))
        val wide = v.where(col("variant") === 0)
          .select(col("n").as("n0"), col("c").as("c0"))
          .crossJoin(v.where(col("variant") === 1)
            .select(col("n").as("n1"), col("c").as("c1")))
        val p0 = col("c0").cast("double") / col("n0")
        val p1 = col("c1").cast("double") / col("n1")
        val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
        val z = (p1 - p0) /
          sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
        wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
          round(p0, 6).as("rate0"), round(p1, 6).as("rate1"),
          round(z, 6).as("z"),
          (abs(round(z, 6)) > 1.96).as("significant"))
      },
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 100.0 THEN 1 ELSE 0 END) AS converted,
        |    ('0x' || substr(md5('ab_' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS variant
        |  FROM events GROUP BY user_id),
        |v AS (SELECT variant, count(*)::BIGINT AS n, sum(converted)::BIGINT AS c
        |  FROM u GROUP BY variant)
        |SELECT a.n AS n0, a.c AS c0, b.n AS n1, b.c AS c1,
        |  round(a.c::DOUBLE / a.n, 6) AS rate0,
        |  round(b.c::DOUBLE / b.n, 6) AS rate1,
        |  round((b.c::DOUBLE / b.n - a.c::DOUBLE / a.n) /
        |    sqrt(((a.c + b.c)::DOUBLE / (a.n + b.n))
        |      * (1.0 - (a.c + b.c)::DOUBLE / (a.n + b.n))
        |      * (1.0 / a.n + 1.0 / b.n)), 6) AS z,
        |  abs(round((b.c::DOUBLE / b.n - a.c::DOUBLE / a.n) /
        |    sqrt(((a.c + b.c)::DOUBLE / (a.n + b.n))
        |      * (1.0 - (a.c + b.c)::DOUBLE / (a.n + b.n))
        |      * (1.0 / a.n + 1.0 / b.n)), 6)) > 1.96 AS significant
        |FROM (SELECT n, c FROM v WHERE variant = 0) a
        |CROSS JOIN (SELECT n, c FROM v WHERE variant = 1) b""".stripMargin),

    // -- CUPED variance-reduced A/B readout (r14): the industry-standard
    //    upgrade of q_ab_test — each user's post-period revenue y is
    //    adjusted by their PRE-period revenue x (y − θ(x − x̄), θ =
    //    cov(x,y)/var(x)), which cancels between-user variance the
    //    experiment didn't cause. Everything reduces to EXACT sums:
    //    per-user cents are int64, pooled Σxy/Σx² are DECIMAL(38,0)
    //    (HUGEINT in the oracle — per-user products overflow int64 at
    //    ladder scale), and the adjusted MEANS collapse algebraically to
    //    (Σy_v − θ·(Σx_v − n_v·x̄))/n_v — no per-row float ever sums, so
    //    no summation-order hazard exists. θ and x̄ are each ONE IEEE
    //    division of exact operands; the pre/post pivot is min(day)+15,
    //    data-derived and integer-exact. Two tiny keyed aggs at 100 TB. --
    "q_ab_cuped" -> Q(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        import graft.functions.GraftFunctions.md5Hash60
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        val pivot = ev.agg((min(col("day")) + 15).as("pivot"))
        val perUser = ev.crossJoin(broadcast(pivot))
          .groupBy(col("user_id"))
          .agg(sum(when(col("day") < col("pivot"), col("cents"))
              .otherwise(0L)).as("x"),
            sum(when(col("day") >= col("pivot"), col("cents"))
              .otherwise(0L)).as("y"))
          .withColumn("variant",
            (md5Hash60(concat(lit("ab_"), col("user_id").cast("string"))) % 2)
              .cast("int"))
        val g = perUser.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("variant") === 0, col("x")).otherwise(0L)).as("sx0"),
          sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sy0"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("variant") === 1, col("x")).otherwise(0L)).as("sx1"),
          sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sy1"))
        val num = (col("n").cast(DecimalType(38, 0)) * col("sxy")
          - col("sx").cast(DecimalType(38, 0)) * col("sy"))
        val den = (col("n").cast(DecimalType(38, 0)) * col("sxx")
          - col("sx").cast(DecimalType(38, 0)) * col("sx"))
        val theta = when(den === 0, lit(0.0))
          .otherwise(num.cast("double") / den.cast("double"))
        val xbar = col("sx").cast("double") / col("n")
        def adj(sy: Column, sx: Column, n: Column): Column =
          (sy.cast("double")
            - theta * (sx.cast("double") - n.cast("double") * xbar)) /
            n.cast("double")
        g.select(col("n0"), col("n1"),
          round(theta, 9).as("theta"),
          round(col("sy0").cast("double") / col("n0"), 6).as("mean_y0"),
          round(col("sy1").cast("double") / col("n1"), 6).as("mean_y1"),
          round(adj(col("sy0"), col("sx0"), col("n0")), 6).as("mean_adj0"),
          round(adj(col("sy1"), col("sx1"), col("n1")), 6).as("mean_adj1"),
          round(adj(col("sy1"), col("sx1"), col("n1"))
            - adj(col("sy0"), col("sx0"), col("n0")), 6).as("lift_adj"))
      },
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT min(day) + 15 AS pv FROM ev),
        |u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN day < pv THEN cents ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN day >= pv THEN cents ELSE 0 END) AS BIGINT) AS y,
        |    ('0x' || substr(md5('ab_' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS variant
        |  FROM ev CROSS JOIN p GROUP BY user_id),
        |g AS (SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
        |    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
        |  FROM u)
        |SELECT n0, n1,
        |  round(CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0.0
        |    ELSE (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |      / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END, 9) AS theta,
        |  round(sy0::DOUBLE / n0, 6) AS mean_y0,
        |  round(sy1::DOUBLE / n1, 6) AS mean_y1,
        |  round((sy0::DOUBLE - (CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0.0
        |      ELSE (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |        / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END)
        |      * (sx0::DOUBLE - n0::DOUBLE * (sx::DOUBLE / n))) / n0::DOUBLE, 6)
        |    AS mean_adj0,
        |  round((sy1::DOUBLE - (CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0.0
        |      ELSE (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |        / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END)
        |      * (sx1::DOUBLE - n1::DOUBLE * (sx::DOUBLE / n))) / n1::DOUBLE, 6)
        |    AS mean_adj1,
        |  round(((sy1::DOUBLE - (CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0.0
        |      ELSE (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |        / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END)
        |      * (sx1::DOUBLE - n1::DOUBLE * (sx::DOUBLE / n))) / n1::DOUBLE)
        |    - ((sy0::DOUBLE - (CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx = 0 THEN 0.0
        |      ELSE (n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
        |        / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE END)
        |      * (sx0::DOUBLE - n0::DOUBLE * (sx::DOUBLE / n))) / n0::DOUBLE), 6)
        |    AS lift_adj
        |FROM g""".stripMargin),

    // -- time-window event dedup (telemetry near-duplicate suppression):
    //    an event is kept iff it is the first of its (user, type) or its
    //    predecessor is more than 1 h older — the standard client-retry /
    //    double-fire throttle. ONE user-keyed exchange (the same shuffle
    //    sessionize pays); the lag comparison is per-row inside the
    //    sorted partition. Output is the per-(user, type) keep ledger. --
    "q_event_dedup_window" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts_us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            expr("ts_ns div 1000").as("ts_us"))
          .withColumn("kept",
            when(lag(col("ts_us"), 1).over(w).isNull
                || col("ts_us") - lag(col("ts_us"), 1).over(w) > throttleUs,
              1L).otherwise(0L))
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("kept")).as("n_kept"))
          .orderBy("user_id", "event_type")
      },
      s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
         |           FROM events),
         |f AS (SELECT user_id, event_type,
         |        CASE WHEN lag(ts_us) OVER w IS NULL
         |               OR ts_us - lag(ts_us) OVER w > $throttleUs
         |             THEN 1 ELSE 0 END AS kept
         |      FROM e WINDOW w AS (PARTITION BY user_id, event_type
         |                          ORDER BY ts_us, event_id))
         |SELECT user_id, event_type, count(*)::BIGINT AS n_events,
         |  sum(kept)::BIGINT AS n_kept
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- gap-based sessionization: flag rows whose distance to the
    //    previous event (same user, total (ts, event_id) order)
    //    exceeds the gap, running-sum the flags into a session id, then
    //    aggregate per (user, session). Exactly one exchange: the
    //    windows partition by user_id and the group-by keys
    //    (user_id, session_id) are a superset, so the existing hash
    //    partitioning satisfies the aggregation's distribution. --
    "q_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("ts_ns div 1000").as("ts_us"), col("value"))
          .withColumn("new_s",
            when(lag(col("ts_us"), 1).over(w).isNull
                || col("ts_us") - lag(col("ts_us"), 1).over(w) > sessionGapUs,
              1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_s"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"),
            max(col("ts_us")).as("end_us"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .orderBy("user_id", "session_id")
      },
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
         |           FROM events),
         |f AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |                       OR ts_us - lag(ts_us) OVER w > $sessionGapUs
         |                     THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
         |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
         |      FROM f)
         |SELECT user_id, session_id::BIGINT AS session_id,
         |  count(*)::BIGINT AS n_events, min(ts_us) AS start_us,
         |  max(ts_us) AS end_us,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM g GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin),

    // -- SCD2 validity intervals from the event log: a `chg` flag marks
    //    rows where event_type differs from the previous row (per user),
    //    its running sum numbers the runs, and each row also looks AHEAD
    //    (`1 FOLLOWING..UNBOUNDED`) for the first change timestamp — so
    //    the run's valid_to is known on every member row and the final
    //    aggregation needs no second windowing pass over the grouped
    //    output (which WOULD re-shuffle: hash(user, version) does not
    //    satisfy a user-only window). One exchange total. --
    "q_scd2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull
                || lag(col("event_type"), 1).over(w) =!= col("event_type"),
              1).otherwise(0))
          .withColumn("ver",
            sum(col("chg"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nxt",
            min(when(col("chg") === 1, col("ts_us")))
              .over(w.rowsBetween(1, Window.unboundedFollowing)))
          .groupBy(col("user_id"), col("ver"))
          .agg(min(col("event_type")).as("event_type"),
            min(col("ts_us")).as("valid_from_us"),
            min(col("nxt")).as("valid_to_us"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("ver").as("version"), col("event_type"),
            col("valid_from_us"), col("valid_to_us"), col("n_events"),
            col("valid_to_us").isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |f AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                       OR lag(event_type) OVER w <> event_type
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (SELECT *,
        |        SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS ver,
        |        MIN(CASE WHEN chg = 1 THEN ts_us END) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
        |      FROM f)
        |SELECT user_id, ver::BIGINT AS version, min(event_type) AS event_type,
        |  min(ts_us) AS valid_from_us, min(nxt) AS valid_to_us,
        |  count(*)::BIGINT AS n_events, (min(nxt) IS NULL) AS is_current
        |FROM g GROUP BY user_id, ver
        |ORDER BY user_id, version""".stripMargin),

    // -- cumulative-distinct window: per event_type and day, the number
    //    of FIRST-seen users that day and the running distinct-user total
    //    — computed from each user's first-occurrence day (one user-keyed
    //    aggregate), so no per-day distinct state ever materializes: the
    //    window sums daily new-user counts, the shape that stays bounded
    //    at any history length. --
    "q_window_cume_distinct" -> Q(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            expr("ts_ns div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("user_id"))
          .agg(min(col("day")).as("first_day"))
          .groupBy(col("event_type"), col("first_day").as("day"))
          .agg(count(lit(1)).as("n_new"))
          .withColumn("cume_distinct", sum(col("n_new")).over(w))
          .orderBy("event_type", "day")
      },
      """WITH f AS (SELECT event_type, user_id,
        |    min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, first_day AS day, count(*)::BIGINT AS n_new
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, day, n_new,
        |  CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cume_distinct
        |FROM d ORDER BY event_type, day""".stripMargin),

    // -- ordered funnel (view → click → purchase): stage k's entry time
    //    is the user's FIRST stage-k event strictly after their stage-
    //    (k−1) entry — three user-keyed aggregates chained by
    //    co-partitioned joins (hash(user_id) satisfies every step: one
    //    shuffle total at scale). Output is the per-stage user count. --
    "q_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_ns"))
        val t1 = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t1"))
        val t2 = ev.where(col("event_type") === "click").join(t1, "user_id")
          .where(col("ts_ns") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t2"))
        val t3 = ev.where(col("event_type") === "purchase").join(t2, "user_id")
          .where(col("ts_ns") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t3"))
        val counts = t1.agg(count(lit(1)).as("n")).select(lit(1).as("stage"),
            lit("view").as("event_type"), col("n"))
          .unionAll(t2.agg(count(lit(1)).as("n")).select(lit(2).as("stage"),
            lit("click_after_view").as("event_type"), col("n")))
          .unionAll(t3.agg(count(lit(1)).as("n")).select(lit(3).as("stage"),
            lit("purchase_after_click").as("event_type"), col("n")))
        counts.orderBy("stage")
      },
      """WITH t1 AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |  FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |  FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t2 GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS event_type, count(*)::BIGINT AS n FROM t1
        |UNION ALL
        |SELECT 2, 'click_after_view', count(*)::BIGINT FROM t2
        |UNION ALL
        |SELECT 3, 'purchase_after_click', count(*)::BIGINT FROM t3
        |ORDER BY stage""".stripMargin),

    // -- retention cohorts: users grouped by first-seen week, counted as
    //    active in each later week they appear — first-seen via one
    //    user-keyed aggregate, activity via distinct (user, week), then a
    //    co-partitioned join and a small (cohort, offset) rollup. --
    "q_retention" -> Q(
      (s, d) => {
        val weeks = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 604800000000000").as("week"))
          .distinct()
        val cohort = weeks.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        weeks.join(cohort, "user_id")
          .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH weeks AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 604800000000000 AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(*)::BIGINT AS n_active
        |FROM weeks JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),

    // -- per-user behavior paths (sequence-pattern cohorting): each
    //    user's event stream collapses to an initials string in the
    //    total (ts, event_id) order — v/c/p/s/e — and conversion is a
    //    regex containment test (view … click … purchase, in order but
    //    not adjacent: the pattern funnels can't express without a pass
    //    per stage). ONE user-keyed exchange feeds both the rank window
    //    and the aggregation. The path is CAPPED at the user's first
    //    `pathCap` events (ADVICE r16: an uncapped collect_list holds
    //    per-group state ∝ the heaviest user's full history — one hot
    //    user can blow an executor at scale): rank first, then
    //    collect_list over a when(rn ≤ cap) — collect_list drops nulls,
    //    so the AGGREGATION STATE itself is bounded by the cap, not just
    //    the output (same fixed-constant discipline as the session
    //    gaps); n_events stays the uncapped count. The oracle mirrors
    //    the cap via FILTER (WHERE rn ≤ cap), so both engines agree even
    //    for a series past the cap (the harness max is 99 events/user —
    //    no truncation at correctness scale). array_sort on (ts, id,
    //    char) structs gives the engine-independent order; the regex is
    //    plain `.`/`.*` so Java and RE2-style engines can't disagree. --
    "q_event_paths" -> Q(
      (s, d) => {
        val pathCap = 256
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .select(col("user_id"), col("rn"),
            struct(col("ts_ns"), col("event_id"),
              substring(col("event_type"), 1, 1).as("c")).as("x"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            array_join(transform(
              array_sort(collect_list(when(col("rn") <= pathCap, col("x")))),
              x => x.getField("c")), "").as("path"))
          .select(col("user_id"), col("n_events"), col("path"),
            col("path").rlike("v.*c.*p").as("converted"))
          .orderBy("user_id")
      },
      """WITH r AS (SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  coalesce(string_agg(substr(event_type, 1, 1), ''
        |    ORDER BY epoch_ns(ts), event_id)
        |    FILTER (WHERE rn <= 256), '') AS path,
        |  regexp_matches(coalesce(string_agg(substr(event_type, 1, 1), ''
        |    ORDER BY epoch_ns(ts), event_id)
        |    FILTER (WHERE rn <= 256), ''), 'v.*c.*p') AS converted
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin),

    // -- first-order Markov transition matrix over per-user event
    //    sequences (the behavior-model fit a curation pipeline runs on
    //    interaction logs): consecutive (type → next type) pairs via one
    //    lead() over the user-keyed time order, counted per ordered pair,
    //    with the row-conditional probability as count/src-total. Scale
    //    shape: ONE user-keyed exchange feeds the window (per-user series
    //    sort only — never a global sort), the pair counts reduce to the
    //    type-alphabet square (bounded by |types|², not events), and the
    //    src totals ride the same tiny frame. The probability is a single
    //    int64/int64 double division — both engines correctly round, so
    //    no tolerance is needed. --
    "q_markov_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts_ns"),
            col("event_type").as("src"))
          .withColumn("dst", lead(col("src"), 1).over(w))
          .where(col("dst").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
          .withColumn("src_total",
            sum(col("n")).over(Window.partitionBy(col("src"))))
          .select(col("src"), col("dst"), col("n"),
            (col("n").cast("double") / col("src_total")).as("p"))
          .orderBy("src", "dst")
      },
      """WITH seq AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_ns(ts), event_id) AS dst
        |  FROM events),
        |cnt AS (SELECT src, dst, count(*)::BIGINT AS n FROM seq
        |        WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  n::DOUBLE / sum(n) OVER (PARTITION BY src) AS p
        |FROM cnt ORDER BY src, dst""".stripMargin)
  )
}
