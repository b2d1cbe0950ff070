package graft.operators

import graft.core.{Norm, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second wave of relational/extension queries: as-of join, salt-equalized
  * join, JSON extraction, pivot, grouping sets, percentiles, array
  * aggregation, null handling, scalar subquery, ntile/first/last windows. */
object AdvancedQueries {

  private val dec = DecimalType(18, 2)

  /** Deterministic-result salted join: replicate the build side `s` ways,
    * spread probe rows across salts; the result equals the unsalted join —
    * which is exactly what the oracle checks. At scale this is the
    * mitigation when one join key dominates (AQE skew-join handles moderate
    * skew; salting handles adversarial single-key skew). */
  def saltedJoin(salts: Int)(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String): org.apache.spark.sql.DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toSeq.map(col): _*), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
      saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Distributed ordinary least squares (r14): per-group closed-form
    * simple linear regression of integer column `y` on integer column `x`
    * — the feature-calibration / drift-modeling primitive a pipeline fits
    * without ever leaving SQL. All five sufficient statistics
    * (Σx, Σy, Σx², Σxy, Σy²) are EXACT integer sums accumulated as
    * DECIMAL(38,0) (HUGEINT on the DuckDB side) — order-free, so parallel
    * partial aggregation ≡ serial, and the normal-equation numerators /
    * denominators (n·Σxy − ΣxΣy etc.) stay exact until ONE IEEE division
    * each for slope/intercept; r² squares the cast doubles in a pinned op
    * order (the exact product would overflow 38 digits — the one
    * deliberate double step, identical in both engines). Scale: one
    * partial-agg pass, reduce side ∝ |groups|; no second pass, no driver
    * math. Input columns must be long; per-row x·y / y² must fit int64
    * (the SUMS are unbounded — they ride decimal). */
  def ols(df: org.apache.spark.sql.DataFrame, group: String): org.apache.spark.sql.DataFrame = {
    val big = DecimalType(38, 0)
    val g = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(big)).as("sx"),
      sum(col("y").cast(big)).as("sy"),
      sum((col("x") * col("x")).cast(big)).as("sxx"),
      sum((col("x") * col("y")).cast(big)).as("sxy"),
      sum((col("y") * col("y")).cast(big)).as("syy"))
    val nD = col("n").cast(big)
    val num = nD * col("sxy") - col("sx") * col("sy")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val deny = nD * col("syy") - col("sy") * col("sy")
    // den = 0 (constant x) / deny = 0 (constant y) are degenerate fits:
    // Spark's non-ANSI Divide yields NULL there while DuckDB's IEEE float
    // division yields +-inf/NaN — guard explicitly (and mirror the CASE in
    // the oracle SQL) so both engines agree on NULL.
    g.select(col(group), col("n"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6)).as("slope"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / den.cast("double"), 6)).as("intercept"),
      when(den === 0 || deny === 0, lit(null).cast("double"))
        .otherwise(round((num.cast("double") * num.cast("double"))
          / (den.cast("double") * deny.cast("double")), 6)).as("r2"))
  }

  /** Heaviest join key's share of probe-side rows, from ONE cheap agg:
    * per-key counts partial-aggregate map-side, so the exchange moves at
    * most one narrow (key, count) row per distinct key per partition —
    * never the data. Exact, not sampled: a sampled estimate misses the
    * adversarial single hot key unless the sample is row-uniform AND the
    * key is already heavy, at which point the full count costs the same
    * pruned single-column scan. */
  def measuredTopKeyShare(probe: org.apache.spark.sql.DataFrame, key: String): Double = {
    val r = probe.groupBy(col(key)).count()
      .agg(max("count").cast("double").as("mx"),
        sum("count").cast("double").as("tot"))
      .head()
    if (r.isNullAt(0) || r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Salt count from measured skew: a key holding `topShare` of the rows
    * occupies `topShare * parallelism` reducers' worth of work, so that is
    * exactly how many ways the build side must replicate to level it.
    * Floor 1 = the plain join: replication is paid only when skew exists
    * (r11 verdict: a fixed 8x dial paid the adversarial premium on every
    * run — 3.4 s vs q_join_star's 1.3 s on unskewed data). */
  def adaptiveSalts(topShare: Double, parallelism: Int): Int =
    math.max(1, math.ceil(topShare * parallelism).toInt)

  /** Measured salt count for `probe`'s `key` (see [[adaptiveSalts]]). */
  def adaptiveSaltCount(probe: org.apache.spark.sql.DataFrame, key: String): Int = {
    val parallelism = probe.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    adaptiveSalts(measuredTopKeyShare(probe, key), parallelism)
  }

  /** Join with a known salt count: 1 ⇒ the plain single-shuffle equi-join
    * (no replication, no salt column), >1 ⇒ [[saltedJoin]]. */
  def saltedJoinWith(salts: Int)(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String): org.apache.spark.sql.DataFrame =
    if (salts <= 1) left.join(right, left(leftKey) === right(rightKey))
    else saltedJoin(salts)(left, right, leftKey, rightKey)

  /** Skew-adaptive salted join: measures the probe side's top-key share,
    * derives the salt count, and degenerates to the single-shuffle plain
    * equi-join when no key is hot. The measurement is one narrow agg per
    * call — at 100 TB that is a pruned scan of the key column plus a
    * (distinct keys)-sized exchange, amortized against a join that would
    * otherwise straggle on one reducer. Callers joining the same table
    * repeatedly should measure once and reuse ([[adaptiveSaltCount]] +
    * [[saltedJoinWith]] — how the registered query caches it per session:
    * a table's skew profile is a stable property, not a per-query fact). */
  def saltedJoinAdaptive(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String): org.apache.spark.sql.DataFrame =
    saltedJoinWith(adaptiveSaltCount(left, leftKey))(left, right, leftKey, rightKey)

  /** One skew measurement per (session, dir) for the registered query. */
  private val saltCache = new graft.core.SessionCache[Integer]

  val all: Map[String, Q] = Map(

    // -- join-key skew audit: the diagnostic a deployment runs BEFORE
    //    choosing a join strategy (the same measurement q_join_salted's
    //    adaptive dial makes, exposed as a report). Top-10 keys by row
    //    share over the events user_id key (the harness's deliberately
    //    skewed key), each with its share and the reducer-replication
    //    factor adaptiveSalts would derive at 32-way parallelism. One
    //    key-hashed partial agg + a bounded TakeOrdered — the 100 TB
    //    cost is a pruned single-column scan. Shares are single IEEE
    //    divisions of exact counts. --
    "q_skew_audit" -> Q(
      (s, d) => {
        val counts = Tables.events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"))
        val tot = counts.agg(sum(col("n")).as("tot"))
        counts.crossJoin(tot)
          .select(col("user_id"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("share"))
          .withColumn("salts",
            greatest(lit(1L), ceil(col("share") * 32).cast("long")))
          .orderBy(col("n").desc, col("user_id"))
          .limit(10)
          .orderBy("user_id")
      },
      """SELECT user_id, n, share, salts FROM (
        |  SELECT user_id, n, n::DOUBLE / tot::DOUBLE AS share,
        |    greatest(1, CAST(ceil((n::DOUBLE / tot::DOUBLE) * 32) AS BIGINT)) AS salts
        |  FROM (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id)
        |  CROSS JOIN (SELECT count(*)::BIGINT AS tot FROM events)
        |  ORDER BY n DESC, user_id LIMIT 10)
        |ORDER BY user_id""".stripMargin),

    // -- column profiling: per-column stats (count/nulls/distinct/min/max)
    //    for a column set in ONE aggregation pass over the table (all
    //    metrics partial-agg before a single exchange), reshaped to one
    //    row per column via explode — the schema-inspection primitive a
    //    data catalog runs over every ingested table. --
    "q_profile" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // The four countDistincts aggregate SEPARATELY from the plain
        // stats: one Aggregate mixing them plans the multi-distinct
        // Expand (x5 rows) with all 13 non-distinct buffers riding every
        // expanded row — 4.6 s on sf0.1 vs two clean passes. Both sides
        // are 1-row outputs, so the crossJoin is free.
        val nd = li.agg(
          countDistinct(col("l_quantity")).as("q_nd"),
          countDistinct(col("l_extendedprice")).as("e_nd"),
          countDistinct(col("l_returnflag")).as("r_nd"),
          countDistinct(col("l_linestatus")).as("s_nd"))
        val a = li.agg(
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("q_cnt"),
          min(col("l_quantity")).cast("double").as("q_mn"), max(col("l_quantity")).cast("double").as("q_mx"),
          count(col("l_extendedprice")).as("e_cnt"),
          min(col("l_extendedprice")).cast("double").as("e_mn"), max(col("l_extendedprice")).cast("double").as("e_mx"),
          count(col("l_returnflag")).as("r_cnt"),
          min(col("l_returnflag")).as("r_mn"), max(col("l_returnflag")).as("r_mx"),
          count(col("l_linestatus")).as("s_cnt"),
          min(col("l_linestatus")).as("s_mn"), max(col("l_linestatus")).as("s_mx"))
          .crossJoin(nd)
        val nullD = lit(null).cast("double")
        val nullS = lit(null).cast("string")
        a.select(explode(array(
            struct(lit("l_quantity").as("col_name"), col("n"),
              (col("n") - col("q_cnt")).as("n_nulls"), col("q_nd").as("n_distinct"),
              col("q_mn").as("min_num"), col("q_mx").as("max_num"),
              nullS.as("min_str"), nullS.as("max_str")),
            struct(lit("l_extendedprice").as("col_name"), col("n"),
              (col("n") - col("e_cnt")).as("n_nulls"), col("e_nd").as("n_distinct"),
              col("e_mn").as("min_num"), col("e_mx").as("max_num"),
              nullS.as("min_str"), nullS.as("max_str")),
            struct(lit("l_returnflag").as("col_name"), col("n"),
              (col("n") - col("r_cnt")).as("n_nulls"), col("r_nd").as("n_distinct"),
              nullD.as("min_num"), nullD.as("max_num"),
              col("r_mn").as("min_str"), col("r_mx").as("max_str")),
            struct(lit("l_linestatus").as("col_name"), col("n"),
              (col("n") - col("s_cnt")).as("n_nulls"), col("s_nd").as("n_distinct"),
              nullD.as("min_num"), nullD.as("max_num"),
              col("s_mn").as("min_str"), col("s_mx").as("max_str")))).as("p"))
          .select(col("p.*"))
          .orderBy("col_name")
      },
      """WITH a AS (SELECT count(*) AS n,
        |  count(l_quantity) AS q_cnt, count(DISTINCT l_quantity) AS q_nd,
        |  CAST(min(l_quantity) AS DOUBLE) AS q_mn, CAST(max(l_quantity) AS DOUBLE) AS q_mx,
        |  count(l_extendedprice) AS e_cnt, count(DISTINCT l_extendedprice) AS e_nd,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS e_mn, CAST(max(l_extendedprice) AS DOUBLE) AS e_mx,
        |  count(l_returnflag) AS r_cnt, count(DISTINCT l_returnflag) AS r_nd,
        |  min(l_returnflag) AS r_mn, max(l_returnflag) AS r_mx,
        |  count(l_linestatus) AS s_cnt, count(DISTINCT l_linestatus) AS s_nd,
        |  min(l_linestatus) AS s_mn, max(l_linestatus) AS s_mx
        | FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_name, n, n - q_cnt AS n_nulls, q_nd AS n_distinct,
        |    q_mn AS min_num, q_mx AS max_num, NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM a
        |  UNION ALL
        |  SELECT 'l_extendedprice', n, n - e_cnt, e_nd, e_mn, e_mx, NULL, NULL FROM a
        |  UNION ALL
        |  SELECT 'l_returnflag', n, n - r_cnt, r_nd, NULL::DOUBLE, NULL::DOUBLE, r_mn, r_mx FROM a
        |  UNION ALL
        |  SELECT 'l_linestatus', n, n - s_cnt, s_nd, NULL::DOUBLE, NULL::DOUBLE, s_mn, s_mx FROM a)
        |ORDER BY col_name""".stripMargin),

    // -- gap-fill / resample: daily per-type event counts on a complete
    //    date spine (missing days appear with n=0) + forward-filled last
    //    observed daily sum. The spine is generated from the data's own
    //    bounds (one tiny agg, broadcast both ways) — no driver loop; the
    //    fill is last_value(IGNORE NULLS) over the spine order. --
    "q_gapfill" -> Q(
      (s, d) => {
        val day = expr("ts_ns div 86400000000000").as("day")
        val daily = Tables.events(s, d)
          .select(day, col("event_type"), col("value"))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec)).cast("double").as("day_sum"))
        val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
        val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("day"))
          .crossJoin(daily.select("event_type").distinct())
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("day_sum"), ignoreNulls = true).over(w).as("carried_sum"))
          .orderBy("event_type", "day")
      },
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type, value FROM events),
        |daily AS (SELECT day, event_type, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        |types AS (SELECT DISTINCT event_type FROM daily)
        |SELECT s.day, t.event_type, coalesce(d.n, 0) AS n,
        |  last_value(d.day_sum IGNORE NULLS) OVER (
        |    PARTITION BY t.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_sum
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
        |ORDER BY t.event_type, s.day""".stripMargin),

    // -- RANGE-frame window: rolling 7-day spend per customer — the frame
    //    is bounded by the ORDER VALUE (days), not row count, so same-day
    //    peers aggregate together and gaps shrink the frame. One shuffle on
    //    the partition key, day numbers via NTZ→date (timezone-free). --
    "q_window_range" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01")).as("day"),
          col("o_totalprice"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-6, Window.currentRow)
        o.withColumn("rolling_7d",
            sum(col("o_totalprice").cast(dec)).over(w).cast("double"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("day").cast("long").as("day"), col("rolling_7d"))
          .orderBy("o_orderkey")
      },
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |  o_totalprice FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
        |FROM o ORDER BY o_orderkey""".stripMargin),

    // -- unpivot/melt: wide numeric columns → long (metric, value) rows —
    //    per-row explode, zero shuffle before the aggregation --
    "q_unpivot" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            col("l_quantity").cast("double").as("quantity"),
            col("l_extendedprice").cast("double").as("extendedprice"),
            col("l_tax").cast("double").as("tax"))
        li.unpivot(Array(col("l_orderkey")),
            Array(col("quantity"), col("extendedprice"), col("tax")),
            "metric", "value")
          .groupBy("metric")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec)).cast("double").as("sum_value"))
          .orderBy("metric")
      },
      """SELECT metric, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT l_orderkey, 'quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_orderkey, 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, 'tax', l_tax FROM lineitem)
        |GROUP BY metric ORDER BY metric""".stripMargin),

    // -- as-of join: each event ↔ the user's most recent click (<=) --
    "q_asof_join" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        AsOfJoin(
          left = ev.select(col("event_id"), col("user_id"), col("ts")),
          right = clicks, key = "user_id", leftTs = "ts", rightTs = "ts",
          payloadCols = Map("event_id" -> "last_click_id"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("last_click_id"))
          .orderBy("event_id")
      },
      """SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
        | b.event_id AS last_click_id
        |FROM events a
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
        |                WHERE event_type = 'click') b
        | ON a.user_id = b.user_id AND a.ts >= b.ts
        |ORDER BY a.event_id""".stripMargin),

    // -- forward as-of join: each event ↔ the user's NEXT click (>=) —
    //    the label-attribution / time-to-event lookup; same one-shuffle
    //    window plan as backward, ordered descending --
    "q_asof_forward" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        AsOfJoin(
          left = ev.select(col("event_id"), col("user_id"), col("ts")),
          right = clicks, key = "user_id", leftTs = "ts", rightTs = "ts",
          payloadCols = Map("event_id" -> "next_click_id"), forward = true)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("next_click_id"))
          .orderBy("event_id")
      },
      """SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
        | (SELECT b.event_id FROM events b
        |   WHERE b.user_id = a.user_id AND b.event_type = 'click'
        |     AND b.ts >= a.ts
        |   ORDER BY b.ts LIMIT 1) AS next_click_id
        |FROM events a ORDER BY a.event_id""".stripMargin),

    // -- nearest as-of join: each event ↔ the user's click with the
    //    SMALLEST |Δt|, either direction — the feature-store lookup
    //    backward/forward as-of can't express alone. One user-keyed join +
    //    min(struct(|Δ|, ts, id)) per event: lexicographic struct-min makes
    //    ties (equal distance before/after, equal timestamps) fully
    //    deterministic, matching the oracle's ORDER BY abs, ts, id LIMIT 1.
    //    Left join keeps click-less users with a NULL lookup. --
    "q_asof_nearest" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val left = ev.select(col("event_id"), col("user_id"), col("ts"), col("ts_ns"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts_ns").as("c_ts_ns"),
            col("event_id").as("c_event_id"))
        left.join(clicks, col("user_id") === col("c_user"), "left")
          .groupBy(col("event_id"), col("user_id"), col("ts"))
          .agg(min(struct(abs(col("ts_ns") - col("c_ts_ns")).as("d"),
            col("c_ts_ns").as("t"), col("c_event_id").as("id"))).as("best"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            col("best.id").as("nearest_click_id"))
          .orderBy("event_id")
      },
      """SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
        | (SELECT b.event_id FROM events b
        |   WHERE b.user_id = a.user_id AND b.event_type = 'click'
        |   ORDER BY abs(epoch_us(b.ts) - epoch_us(a.ts)), b.ts, b.event_id
        |   LIMIT 1) AS nearest_click_id
        |FROM events a ORDER BY a.event_id""".stripMargin),

    // -- salted join == plain join (the oracle IS the unsalted answer).
    //    q_join_salted is the ADAPTIVE dial: it measures the top-key share
    //    and, on the unskewed harness data, degenerates to the plain
    //    single-shuffle join (no replication paid when no key is hot).
    //    q_join_salted_forced keeps the fixed-8 replication as the
    //    adversarial-skew demo, oracled against the same unsalted answer. --
    "q_join_salted" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        val salts: Int = saltCache.getOrElseUpdate(s, s"salt:$d")(
          Integer.valueOf(adaptiveSaltCount(li, "l_orderkey")))
        saltedJoinWith(salts)(li, o, "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    "q_join_salted_forced" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        saltedJoin(8)(li, o, "l_orderkey", "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    // -- JSON extraction from events.props --
    "q_json" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      """SELECT event_type,
        | CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        | count(CAST(props->>'k' AS BIGINT)) AS n_k,
        | CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        | CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),

    // -- pivot (wide aggregation) --
    "q_pivot" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(Norm.dsum(col("l_quantity")))
        .orderBy("l_linestatus"),
      """SELECT l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag='A') AS DOUBLE) AS A,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag='N') AS DOUBLE) AS N,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag='R') AS DOUBLE) AS R
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin),

    // -- grouping sets (SQL surface) --
    "q_grouping_sets" -> Q(
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n
            |FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // -- exact percentiles (interpolated; rounded: interpolation ulps) --
    "q_percentile" -> Q(
      (s, d) => {
        val p = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
            Norm.davg(col("l_quantity")).as("mean_qty"))
        p.select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 6).as("p25"),
          round(element_at(col("ps"), 2), 6).as("p50"),
          round(element_at(col("ps"), 3), 6).as("p75"),
          col("mean_qty"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        | round(quantile_cont(l_quantity, 0.50), 6) AS p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // -- weighted median (50% of the WEIGHT mass, not of the rows): the
    //    quantity-weighted median price per return flag — smallest value
    //    whose inclusive cumulative weight reaches half the group total.
    //    Exact everywhere: prices as value-cents, weights as int64, an
    //    inclusive cumulative (value ties accumulate together), and the
    //    crossing test is the integer `2·cum ≥ tot`. Shape: the corpus
    //    first COLLAPSES to per-(flag, value) weight sums — one keyed
    //    partial-agg exchange — and only that group table (∝ distinct
    //    values, not rows; constant under row replication) enters the
    //    windows. The naive RANGE-frame form over raw rows partitions by
    //    the 3 flags and single-threads 1/3 of the corpus per partition —
    //    measured 19× on 16× data before this collapse. The cumulative
    //    over the distinct-value table is TWO-PHASE (the q_skyline /
    //    q_curriculum prefix-merge shape): `pid = cents >> 16` is a
    //    deterministic, data-independent, MONOTONE-in-cents bucketing
    //    ($655 value blocks — bucket count ∝ price domain, never rows),
    //    per-(flag, pid) bucket sums prefix-merge on the bucket frame,
    //    and the per-row cumulative windows partition by (flag, pid) —
    //    so no window anywhere is capped at |return flags| = 3
    //    parallelism (the r16 residual). All in-plan: no driver collect,
    //    no broadcast hint (AQE broadcasts the bucket-sized offset
    //    frame). The oracle keeps the RANGE form over raw rows: an
    //    independent formulation that must agree. --
    "q_weighted_median" -> Q(
      (s, d) => {
        // floor(x+0.5) == round() for this positive integer-cents data
        // (lineitem price/quantity > 0 by construction — a negative value
        // would truncate toward zero instead; see q_benford), without
        // Spark Round's per-row BigDecimal allocation (2 per row over the
        // fact table was the gc term at the x64 rung)
        //
        // r19 crossing-bucket selection (guide §2.2/§2.3). The r17/r18
        // shape collapsed the corpus to per-(flag, cents) sums first —
        // but cents are ~97% UNIQUE on this data (594 k groups from
        // 600 k rows, measured), so that exchange + the (flag,pid)
        // window sort moved essentially the whole fact table twice and
        // was the row's GC flapper. The median only needs the cumulative
        // WHERE IT CROSSES tot/2, and the bucket id `pid = cents >> 16`
        // is monotone in cents, so:
        //   phase 1: per-(flag, pid) weight sums straight off the scan —
        //     map-side partial agg makes the exchange input ∝ BUCKETS
        //     (price domain / 65536 — never rows); windows over that
        //     bucket frame give exclusive prefix `off`, flag total `tot`,
        //     and the CROSSING bucket = first pid with 2·(off+bw) ≥ tot.
        //   phase 2: re-scan, keep only crossing-bucket rows (a
        //     broadcast semi-join against the ≤|flags| crossing frame),
        //     collapse those to per-cents sums (∝ rows in ONE bucket),
        //     one tiny window, and the crossing test 2·(off+cum) ≥ tot.
        // Exactness: every pre-crossing bucket's inclusive total is
        // < tot/2, so no cents outside the crossing bucket can be the
        // minimum satisfying value, and ties still accumulate together
        // in the per-cents collapse. Same bucket math, same integer
        // tests — the oracle's RANGE formulation is unchanged.
        val base = Tables.lineitem(s, d).select(col("l_returnflag"),
            floor(col("l_extendedprice") * 100 + 0.5).as("cents"),
            floor(col("l_quantity") + 0.5).as("wt"))
          .withColumn("pid", shiftright(col("cents"), 16))
        val wOff = Window.partitionBy(col("l_returnflag")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.partitionBy(col("l_returnflag"))
        val offs = base.groupBy(col("l_returnflag"), col("pid"))
          .agg(sum(col("wt")).as("bw"))
          .select(col("l_returnflag"), col("pid"),
            coalesce(sum(col("bw")).over(wOff), lit(0L)).as("off"),
            sum(col("bw")).over(wTot).as("tot"), col("bw"))
        val wPick = Window.partitionBy(col("l_returnflag")).orderBy(col("pid"))
        val crossing = offs
          .where((col("off") + col("bw")) * 2 >= col("tot"))
          .withColumn("rk", row_number().over(wPick)).where(col("rk") === 1)
          .select(col("l_returnflag"), col("pid"), col("off"), col("tot"))
        val cumW = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.join(broadcast(crossing), Seq("l_returnflag", "pid"))
          .groupBy(col("l_returnflag"), col("cents"), col("off"), col("tot"))
          .agg(sum(col("wt")).as("w"))
          .withColumn("cum", col("off") + sum(col("w")).over(cumW))
          .groupBy(col("l_returnflag"))
          .agg(min(when(col("cum") * 2 >= col("tot"), col("cents")))
              .as("wmedian_cents"),
            max(col("tot")).as("tot_weight"))
          .orderBy("l_returnflag")
      },
      """WITH base AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    CAST(round(l_quantity, 0) AS BIGINT) AS wt
        |  FROM lineitem),
        |w AS (SELECT l_returnflag, cents,
        |    CAST(sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        |  FROM base)
        |SELECT l_returnflag,
        |  min(CASE WHEN cum * 2 >= tot THEN cents END) AS wmedian_cents,
        |  max(tot) AS tot_weight
        |FROM w GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // -- quantile binning (the ML-prep discretizer): exact quartile cut
    //    points from ONE aggregation pass, then a zero-shuffle CASE
    //    assignment + per-bin rollup. The 1-row cut frame cross-joins in
    //    (broadcast by construction). Cut points are interpolated over
    //    INTEGER-valued quantities: when the interpolation fraction is 0
    //    the cut is produced exactly, and otherwise it falls strictly
    //    between integers — either way no data value sits within an ulp
    //    of a cut, so the <= bin assignment can never diverge between
    //    engines (the reason this binning column is safe to gate on
    //    while raw interpolated quantiles ship rounded). --
    "q_bin_quantile" -> Q(
      (s, d) => {
        val cuts = Tables.lineitem(s, d).agg(
          percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))).as("cs"))
          .select(element_at(col("cs"), 1).as("c1"),
            element_at(col("cs"), 2).as("c2"), element_at(col("cs"), 3).as("c3"))
        Tables.lineitem(s, d).select(col("l_quantity")).crossJoin(cuts)
          .withColumn("bin",
            when(col("l_quantity") <= col("c1"), 1)
              .when(col("l_quantity") <= col("c2"), 2)
              .when(col("l_quantity") <= col("c3"), 3).otherwise(4))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min(col("l_quantity")).cast("double").as("lo"),
            max(col("l_quantity")).cast("double").as("hi"))
          .orderBy("bin")
      },
      """WITH c AS (SELECT quantile_cont(l_quantity, 0.25) AS c1,
        |             quantile_cont(l_quantity, 0.50) AS c2,
        |             quantile_cont(l_quantity, 0.75) AS c3 FROM lineitem)
        |SELECT bin, count(*) AS n, CAST(min(l_quantity) AS DOUBLE) AS lo,
        |       CAST(max(l_quantity) AS DOUBLE) AS hi
        |FROM (SELECT CASE WHEN l_quantity <= c1 THEN 1
        |                  WHEN l_quantity <= c2 THEN 2
        |                  WHEN l_quantity <= c3 THEN 3 ELSE 4 END AS bin,
        |             l_quantity
        |      FROM lineitem CROSS JOIN c)
        |GROUP BY bin ORDER BY bin""".stripMargin),

    // -- sketch percentile, oracled by its error bound: approx_percentile
    //    with accuracy A has rank error ≤ n/A (KLL-style guarantee); with
    //    A=10000 a ±0.005 quantile window is ~50× that bound. The query
    //    emits the EXACT quantiles (cross-engine checked) plus booleans
    //    asserting each sketch value lies inside its window; the sketch is
    //    deterministic for fixed data, so the booleans are stable. --
    "q_approx_percentile" -> Q(
      (s, d) => {
        val ps = Seq(0.5, 0.95, 0.99)
        val delta = 0.005
        val allQs = ps.flatMap(p =>
          Seq(math.max(0.0, p - delta), p, math.min(1.0, p + delta)))
        // r19 (guide §2.2): the exact `percentile()` buffer was the row's
        // whole cost (PctProbe: 2.68 s alone vs 0.44 s for the sketch) —
        // it hashes every value into a per-partition OpenHashMap (~583 k
        // distinct doubles here, measured) and merges/sorts them in one
        // final task. The nine exact quantiles are ORDER STATISTICS, so
        // compute them with the crossing-bucket discipline instead:
        //   1. per-bucket counts (pid = ⌊v/64⌋, monotone in v) straight
        //      off the scan — map-side partial agg makes the exchange
        //      input ∝ value domain/64, never rows; a prefix window over
        //      that bucket frame gives each bucket's global start rank
        //      and the total n.
        //   2. the 18 target ranks (⌊q·(n−1)⌋ / ⌈q·(n−1)⌉ per quantile)
        //      locate their buckets; a second scan keeps only those
        //      buckets' rows (broadcast join, ≤18 buckets), ranks them
        //      with one tiny window, and picks the 18 values.
        //   3. assembly replicates Percentile.getPercentile EXACTLY:
        //      position = q·(n−1) in double, equal-floor/ceil and
        //      equal-keys cases return the value directly, otherwise
        //      (hi−pos)·v_lo + (pos−lo)·v_hi — same IEEE ops, so the
        //      result is bit-identical to the removed buffer (spec-locked
        //      in Round19OpsSpec; rank-at-duplicate semantics match the
        //      buffer's binary search because every row of a duplicate
        //      run carries the same value).
        // The sketch aggregate stays — it IS the row's subject.
        val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
        val withPid = li.withColumn("pid", floor(col("v") / 64.0).cast("long"))
        val buckets = withPid.groupBy(col("pid")).agg(count(lit(1)).as("bc"))
        val wOff = Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val pref = buckets.select(col("pid"), col("bc"),
          coalesce(sum(col("bc")).over(wOff), lit(0L)).as("start"))
        val nRow = buckets.agg(sum(col("bc")).as("n"))
        def posOf(q: Double) = lit(q) * (col("n") - 1).cast("double")
        val rankCols = allQs.flatMap { q =>
          Seq(floor(posOf(q)).cast("long"), ceil(posOf(q)).cast("long"))
        }
        val ranks = nRow.select(
          explode(array_distinct(array(rankCols: _*))).as("rank"))
        val needed = ranks.join(pref,
            col("rank") >= col("start") &&
              col("rank") < col("start") + col("bc"))
          .select(col("pid"), col("start")).distinct()
        val wRank = Window.partitionBy(col("pid")).orderBy(col("v"))
        val picked = withPid.join(broadcast(needed), "pid")
          .withColumn("grank", col("start") + row_number().over(wRank) - 1)
          .join(broadcast(ranks), col("grank") === col("rank"))
          .select(col("rank"), col("v"))
        val vmap = picked.agg(map_from_entries(sort_array(
          collect_list(struct(col("rank"), col("v"))))).as("vm"))
        val ap = li.agg(approx_percentile(col("v"),
          array(ps.map(lit): _*), lit(10000)).as("ap"))
        val one = nRow.crossJoin(vmap).crossJoin(ap)
        def exact(q: Double) = {
          val pos = posOf(q)
          val lo = floor(pos).cast("long")
          val hi = ceil(pos).cast("long")
          val vLo = element_at(col("vm"), lo)
          val vHi = element_at(col("vm"), hi)
          when(lo === hi || vLo === vHi, vLo)
            .otherwise((hi.cast("double") - pos) * vLo +
              (pos - lo.cast("double")) * vHi)
        }
        // allQs layout per metric i (0-based): 3i = lo, 3i+1 = exact, 3i+2 = hi
        one.select(
          (ps.indices.map(i => round(exact(allQs(3 * i + 1)), 6).as(s"exact_p${(ps(i) * 100).toInt}")) ++
            ps.indices.map(i =>
              (element_at(col("ap"), i + 1) >= exact(allQs(3 * i)) &&
                element_at(col("ap"), i + 1) <= exact(allQs(3 * i + 2)))
                .as(s"approx_ok_p${(ps(i) * 100).toInt}"))): _*)
      },
      """SELECT round(quantile_cont(l_extendedprice, 0.50), 6) AS exact_p50,
        | round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
        | round(quantile_cont(l_extendedprice, 0.99), 6) AS exact_p99,
        | TRUE AS approx_ok_p50, TRUE AS approx_ok_p95, TRUE AS approx_ok_p99
        |FROM lineitem""".stripMargin),

    // -- array aggregation (array emitted as a joined string: the driver's
    //    pandas compare can't sort/hash a raw array column) --
    "q_collect_list" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(array_join(sort_array(collect_set(col("l_linenumber"))).cast("array<string>"), ",")
          .as("lines"),
          countDistinct(col("l_linenumber")).as("n_lines"))
        .orderBy("l_returnflag"),
      """WITH dd AS (SELECT DISTINCT l_returnflag, l_linenumber FROM lineitem)
        |SELECT l_returnflag,
        | string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines,
        | count(*) AS n_lines
        |FROM dd GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // -- numeric histogram: fixed-width integer bucketing (profiling
    //    pass over a fact column; bucket id is integer arithmetic, so
    //    engine-independent) --
    "q_histogram" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          Norm.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"),
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        | count(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin),

    // -- second-moment aggregates: stddev/corr/covar (rounded: one-pass
    //    co-moment accumulation differs across engines in the last ulps) --
    "q_corr_stats" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 6) AS sd_qty,
        | round(var_samp(l_discount), 6) AS var_disc,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // -- see AdvancedQueries.ols --
    //    simple linear regression of price-cents on quantity — the
    //    feature-calibration / drift-modeling primitive a pipeline fits
    //    without ever leaving SQL. All five sufficient statistics
    //    (Σx, Σy, Σx², Σxy, Σy²) are EXACT integer sums (quantity is
    //    integer-valued; price goes through the decimal-cents cast, the
    //    q_ks_drift pattern) accumulated as DECIMAL(38,0)/HUGEINT — order-
    //    free, so parallel partial aggregation ≡ serial, and the normal-
    //    equation numerators/denominators (n·Σxy − ΣxΣy etc.) stay exact
    //    until ONE IEEE division each for slope/intercept; r² squares the
    //    cast doubles in a pinned op order (the exact product would
    //    overflow 38 digits — the one deliberate double step, identical in
    //    both engines). Scale: one partial-agg pass, reduce side ∝
    //    |groups|; no second pass, no driver math. --
    "q_linreg" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast(dec) * 100).cast("long").as("y"))
        ols(li, "l_returnflag").orderBy("l_returnflag")
      },
      """WITH li AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM li GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
        |    round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6) END AS slope,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL ELSE
        |    round(CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6) END AS intercept,
        |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL ELSE
        |    round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
        |      / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6) END AS r2
        |FROM g ORDER BY l_returnflag""".stripMargin),

    // -- array function surface (arrays emitted as joined strings — the
    //    compare harness can't sort raw array columns) --
    "q_scalar_array" -> Q(
      (s, d) => {
        val words = split(col("p_name"), " ")
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            size(words).cast("long").as("n_words"),
            array_join(sort_array(words), "|").as("sorted_words"),
            array_join(sort_array(array_distinct(words)), "|").as("distinct_words"),
            array_join(slice(sort_array(words), 1, 2), "|").as("first2"),
            array_contains(words, "green").as("has_green"),
            element_at(words, 1).as("head_word"),
            array_join(reverse(sort_array(words)), "|").as("rev_sorted"))
          .orderBy("p_partkey")
      },
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
        |SELECT p_partkey,
        | len(words)::BIGINT AS n_words,
        | array_to_string(list_sort(words), '|') AS sorted_words,
        | array_to_string(list_sort(list_distinct(words)), '|') AS distinct_words,
        | array_to_string(list_sort(words)[1:2], '|') AS first2,
        | list_contains(words, 'green') AS has_green,
        | words[1] AS head_word,
        | array_to_string(list_reverse_sort(words), '|') AS rev_sorted
        |FROM w ORDER BY p_partkey""".stripMargin),

    // -- regex scalar surface (patterns restricted to the POSIX-ish subset
    //    both engines' dialects agree on) --
    "q_scalar_regex" -> Q(
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_upper"),
          size(split(col("p_name"), "[aeiou]+")).cast("long").as("vowel_runs_plus1"),
          col("p_name").rlike("^[a-z]").as("starts_lower"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
        | coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
        | coalesce(regexp_extract(p_type, '([A-Z]+)', 1), '') AS first_upper,
        | len(string_split_regex(p_name, '[aeiou]+'))::BIGINT AS vowel_runs_plus1,
        | regexp_matches(p_name, '^[a-z]') AS starts_lower,
        | regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked
        |FROM part ORDER BY p_partkey""".stripMargin),

    // -- null-handling scalar surface --
    "q_scalar_null" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("nf"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("XX")).as("co"),
          col("l_returnflag").isNull.as("isn"),
          when(col("l_quantity") > 25, col("l_quantity")).as("maybe_qty"))
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
        | nullif(l_returnflag, 'N') AS nf,
        | coalesce(nullif(l_returnflag, 'N'), 'XX') AS co,
        | l_returnflag IS NULL AS isn,
        | CASE WHEN l_quantity > 25 THEN l_quantity END AS maybe_qty
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // -- scalar subquery (broadcast of a 1-row aggregate) --
    "q_subquery_scalar" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
        val avgP = o.agg(Norm.davg(col("o_totalprice")).as("avg_price"))
        o.crossJoin(broadcast(avgP))
          .where(col("o_totalprice") > col("avg_price") * 1.5)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/count(*)
        |                      FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin),

    // -- ntile / first / last window frame functions --
    "q_window_frames" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .where(col("o_custkey") <= 50)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            ntile(4).over(w).cast("long").as("quartile"),
            first(col("o_orderkey")).over(wf).as("cheapest_key"),
            last(col("o_orderkey")).over(wf).as("priciest_key"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | ntile(4) OVER w AS quartile,
        | first_value(o_orderkey) OVER wf AS cheapest_key,
        | last_value(o_orderkey) OVER wf AS priciest_key
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),

    // -- CDC-style snapshot diff: per-customer order state in 1994 vs
    //    1995, classified added / removed / changed / unchanged via one
    //    full outer join. Both snapshot aggregations and the join hash on
    //    the SAME key (o_custkey), so the join adds no third exchange;
    //    at 100 TB this is the standard two-scan + co-partitioned-join
    //    CDC shape (no driver-side state, no collect). Sums go through
    //    DECIMAL(18,2) — exact and order-free — and compare as doubles
    //    cast from the same decimal. --
    "q_snapshot_diff" -> Q(
      (s, d) => {
        def snap(yr: Int) = Tables.orders(s, d)
          .where(year(col("o_orderdate").cast("date")) === yr)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as(s"n_$yr"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as(s"sum_$yr"))
        snap(1994).join(snap(1995), Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"), col("n_1994"), col("sum_1994"),
            col("n_1995"), col("sum_1995"),
            when(col("n_1994").isNull, "added")
              .when(col("n_1995").isNull, "removed")
              .when(col("n_1994") =!= col("n_1995")
                || col("sum_1994") =!= col("sum_1995"), "changed")
              .otherwise("unchanged").as("status"))
          .orderBy("o_custkey")
      },
      """WITH a AS (SELECT o_custkey, count(*)::BIGINT AS n_1994,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_1994
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1994 GROUP BY 1),
        |b AS (SELECT o_custkey, count(*)::BIGINT AS n_1995,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_1995
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1)
        |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
        |  n_1994, sum_1994, n_1995, sum_1995,
        |  CASE WHEN n_1994 IS NULL THEN 'added'
        |       WHEN n_1995 IS NULL THEN 'removed'
        |       WHEN n_1994 <> n_1995 OR sum_1994 <> sum_1995 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM a FULL OUTER JOIN b USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin),

    // -- CDC APPLY / MERGE upsert: the other half of the incremental-
    //    corpus story (q_snapshot_diff computes a change set; this applies
    //    one). Given a base snapshot and changes (key, op ∈ I/U/D,
    //    new_<payload>), produce the next snapshot in ONE co-partitioned
    //    full-outer join on the key: I/U take the change payload, D drops
    //    the row, untouched base rows pass through. No driver state, no
    //    second exchange — at 100 TB this is a single keyed shuffle of
    //    base ∪ changes (CdcApplySpec locks exactly 2 exchanges, both
    //    hashpartitioning on the key). Change set here is derived
    //    deterministically from customer (key%10: 0→insert of a new key,
    //    1→delete, 2,3→update acctbal+100), so both engines construct
    //    identical inputs; the +100 update is the same IEEE add on the
    //    same parquet double on both sides. --
    "q_cdc_apply" -> Q(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val base = cust.where(col("c_custkey") % 10 =!= 0)
        val changes = cust.where((col("c_custkey") % 10).isin(0, 1, 2, 3))
          .select(col("c_custkey"),
            when(col("c_custkey") % 10 === 1, "D")
              .when((col("c_custkey") % 10).isin(2, 3), "U")
              .otherwise("I").as("op"),
            col("c_name").as("new_c_name"),
            when((col("c_custkey") % 10).isin(2, 3), col("c_acctbal") + 100)
              .otherwise(col("c_acctbal")).as("new_c_acctbal"))
        cdcApply(base, changes, "c_custkey").orderBy("c_custkey")
      },
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer
        |  WHERE c_custkey % 10 <> 0),
        |ch AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 1 THEN 'D'
        |         WHEN c_custkey % 10 IN (2,3) THEN 'U' ELSE 'I' END AS op,
        |    c_name AS new_c_name,
        |    CASE WHEN c_custkey % 10 IN (2,3) THEN c_acctbal + 100
        |         ELSE c_acctbal END AS new_c_acctbal
        |  FROM customer WHERE c_custkey % 10 IN (0,1,2,3))
        |SELECT c_custkey,
        |  CASE WHEN op IN ('I','U') THEN new_c_name ELSE c_name END AS c_name,
        |  CASE WHEN op IN ('I','U') THEN new_c_acctbal ELSE c_acctbal END AS c_acctbal
        |FROM base FULL OUTER JOIN ch USING (c_custkey)
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY c_custkey""".stripMargin),

    // -- 2-D skyline / Pareto frontier (min price, max size over part):
    //    a row survives iff nothing is (≤ price, ≥ size) with one strict.
    //    Distributed shape: collapse to one row per distinct price (max
    //    size per price — dominance within a price class needs only that
    //    max), then the strict-prefix running max of size in price order
    //    via the SAME two-phase range-split used by q_vocab_growth: 32
    //    value-range buckets, per-bucket window prefix max + a broadcast
    //    scan-fold of the 32 bucket maxima — NO single-partition window
    //    at any cardinality. Survivors: size equals the price class max
    //    AND beats every strictly-cheaper class. The oracle is a genuine
    //    differential: DuckDB evaluates the NOT EXISTS dominance
    //    definition directly (a different algorithm entirely), so any
    //    error in the prefix-max decomposition turns the row red.
    //    Prices group and compare as the RAW stored double (a cents
    //    rescale would re-round and could merge distinct keys); the
    //    bucket assignment below is double arithmetic but only has to be
    //    MONOTONE in price — bucket boundaries affect balance, never the
    //    frontier. --
    "q_skyline" -> Q(
      (s, d) => {
        val p = Tables.part(s, d).select(col("p_partkey"),
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("sz"))
        val g = p.groupBy(col("price")).agg(max(col("sz")).as("gmax"))
        val parts = 32
        // NOTE: the two collect() calls below (1 bounds row + ≤32 bucket
        // maxima — bounded by construction, never by rows) run EAGERLY at
        // build time, so the returned plan captures a driver-side snapshot
        // of the input: re-executing it after the underlying parquet
        // changes would mix stale bucket offsets with fresh rows. Queries
        // in this registry are built per run, so the snapshot and the
        // execution always see the same files.
        val bounds = g.agg(min("price"), max("price")).collect()(0)
        if (bounds.isNullAt(0)) {
          // empty input: no parts ⇒ empty frontier, emit the schema only
          p.select(col("p_partkey"), col("price"),
            col("sz").as("size")).where(lit(false))
        } else {
        val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
        val block = math.max((mx - mn) / parts, java.lang.Double.MIN_NORMAL)
        val withPid = g.withColumn("pid",
          least(lit(parts - 1),
            floor((col("price") - mn) / block)).cast("int"))
        // bucket maxima: bounded by the bucket count, never by rows
        val bmax = withPid.groupBy("pid").agg(max("gmax").as("bm"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val pids = (0 to parts).toSeq
        val off = pids.scanLeft(Long.MinValue)((a, i) =>
          math.max(a, bmax.getOrElse(i, Long.MinValue)))
        val offsDf = broadcast(s.createDataFrame(
          pids.map(i => (i, off(i)))).toDF("pid", "om"))
        val w = Window.partitionBy(col("pid")).orderBy(col("price"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = withPid
          .withColumn("im", max(col("gmax")).over(w))
          .join(offsDf, "pid")
          .select(col("price"), col("gmax"),
            greatest(coalesce(col("im"), lit(Long.MinValue)), col("om"))
              .as("mstrict"))
        p.join(frontier, "price")
          .where(col("sz") === col("gmax") && col("sz") > col("mstrict"))
          .select(col("p_partkey"), col("price"), col("sz").as("size"))
          .orderBy("price", "p_partkey")
        }
      },
      """SELECT p.p_partkey, p.p_retailprice AS price,
        |  CAST(p.p_size AS BIGINT) AS size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
        |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
        |ORDER BY price, p_partkey""".stripMargin),

    // -- market-basket association rules (A-priori 2-itemsets): baskets =
    //    distinct parts per order; ITEM supports first, and only items
    //    passing the item-support floor enter pair enumeration — the
    //    a-priori property (a frequent pair needs two frequent items)
    //    makes the prefilter lossless while bounding the self-join's
    //    candidate volume by frequent-item basket size², not raw basket
    //    size². Both self-join sides are the SAME frequent-basket frame
    //    shuffled once on the order key; pair counts reduce to the
    //    co-occurring pair vocabulary. Confidence and lift are single
    //    divisions of exact int64 products, so the doubles agree
    //    bit-for-bit.
    //
    //    Support floors are FRACTIONS of the basket count — minsup =
    //    ⌈nbask/2000⌉ items, ⌈nbask/10000⌉ pairs — computed in-plan from
    //    the nbask aggregate by pure integer arithmetic (identical `div`
    //    in both engines, no double rounding). An absolute floor stops
    //    pruning as the corpus grows (every item becomes "frequent" and
    //    Σ basket² flows unpruned through the pair exchange — the r16
    //    ladder measured 51× cost on 64× data); a fractional floor
    //    re-arms the a-priori prefilter at every scale. At sf0.01 the
    //    fractions reproduce the r16 absolute floors exactly
    //    (⌈14743/2000⌉ = 8, ⌈14743/10000⌉ = 2), so the oracle row set
    //    keeps its richness at correctness scale. --
    "q_assoc_rules" -> Q(
      (s, d) => {
        val bask = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nb = bask.agg(countDistinct(col("ok")).as("nbask"))
        val freq = bask.groupBy("pk").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(nb))
          .where(col("n") >= expr("(nbask + 1999) div 2000"))
          .select("pk", "n")
        // pair rows shuffle as bare (pa, pb) — the item supports join back
        // onto the REDUCED pair table (∝ pair vocabulary, not pair
        // instances), halving the bytes through the big exchange
        val fb = bask.join(freq.select("pk"), "pk")
        val a = fb.select(col("ok"), col("pk").as("pa"))
        val b = fb.select(col("ok"), col("pk").as("pb"))
        a.join(b, Seq("ok")).where(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb"))
          .agg(count(lit(1)).as("n_ab"))
          .crossJoin(broadcast(nb))
          .where(col("n_ab") >= expr("(nbask + 9999) div 10000"))
          .join(broadcast(freq.select(col("pk").as("pa"), col("n").as("n_a"))), "pa")
          .join(broadcast(freq.select(col("pk").as("pb"), col("n").as("n_b"))), "pb")
          .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
            (col("n_ab").cast("double") / col("n_a")).as("conf"),
            ((col("n_ab") * col("nbask")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy("pa", "pb")
      },
      """WITH bask AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |              FROM lineitem),
        |nb AS (SELECT count(DISTINCT ok)::BIGINT AS nbask FROM bask),
        |freq AS (SELECT pk, count(*)::BIGINT AS n FROM bask
        |         GROUP BY 1
        |         HAVING count(*) >= (SELECT (nbask + 1999) // 2000 FROM nb)),
        |fb AS (SELECT b.ok, b.pk, f.n FROM bask b JOIN freq f USING (pk)),
        |pairs AS (SELECT a.pk AS pa, b.pk AS pb, a.n AS n_a, b.n AS n_b,
        |    count(*)::BIGINT AS n_ab
        |  FROM fb a JOIN fb b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2, 3, 4
        |  HAVING count(*) >= (SELECT (nbask + 9999) // 10000 FROM nb))
        |SELECT pa, pb, n_ab, n_a, n_b,
        |  n_ab::DOUBLE / n_a AS conf,
        |  (n_ab * nbask)::DOUBLE / (n_a * n_b)::DOUBLE AS lift
        |FROM pairs CROSS JOIN nb ORDER BY pa, pb""".stripMargin),

    // -- top-k co-occurrence rules: pair mining restricted to the k
    //    HIGHEST-SUPPORT items (k = 1000) — the distribution-proof
    //    complement of q_assoc_rules' fractional floor. On a uniform
    //    catalog a support FRACTION legitimately empties the frequent set
    //    (nothing reaches 0.05 % support — see SCALE.md r17), while
    //    top-k keeps the enumeration stage active and BOUNDED at every
    //    scale by construction: candidates are pairs of a fixed-k item
    //    set, so the pair exchange is capped regardless of catalog or
    //    corpus growth. The top-k itself is a deterministic total order
    //    (support DESC, then key — ties can't flap between engines) and
    //    executes as TakeOrdered (distributed partial top-k heaps — no
    //    single-partition sort, no vocabulary collect); the k-row item
    //    frame then broadcast-joins into the basket stream. --
    "q_assoc_topk" -> Q(
      (s, d) => {
        val k = 1000
        val bask = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val topk = bask.groupBy("pk").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pk")).limit(k)
        val fb = bask.join(broadcast(topk.select("pk")), "pk")
        val a = fb.select(col("ok"), col("pk").as("pa"))
        val b = fb.select(col("ok"), col("pk").as("pb"))
        a.join(b, Seq("ok")).where(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb"))
          .agg(count(lit(1)).as("n_ab"))
          .where(col("n_ab") >= 2)
          .join(broadcast(topk.select(col("pk").as("pa"), col("n").as("n_a"))), "pa")
          .join(broadcast(topk.select(col("pk").as("pb"), col("n").as("n_b"))), "pb")
          .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
            (col("n_ab").cast("double") / col("n_a")).as("conf"))
          .orderBy("pa", "pb")
      },
      """WITH bask AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |              FROM lineitem),
        |sup AS (SELECT pk, count(*)::BIGINT AS n FROM bask GROUP BY 1),
        |topk AS (SELECT pk, n FROM sup ORDER BY n DESC, pk LIMIT 1000),
        |fb AS (SELECT b.ok, b.pk FROM bask b JOIN topk USING (pk)),
        |pairs AS (SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS n_ab
        |  FROM fb a JOIN fb b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, n_ab, t1.n AS n_a, t2.n AS n_b,
        |  n_ab::DOUBLE / t1.n AS conf
        |FROM pairs JOIN topk t1 ON t1.pk = pa JOIN topk t2 ON t2.pk = pb
        |ORDER BY pa, pb""".stripMargin)
  )

  /** MERGE/upsert operator: apply a change set to a base snapshot.
    *
    * `changes` carries (`key`, `op` ∈ {"I","U","D"}, and `new_<c>` for
    * every base payload column c). Result = base with D-keys removed,
    * U-keys' payload replaced, I-keys appended — the standard MERGE
    * WHEN MATCHED UPDATE/DELETE + WHEN NOT MATCHED INSERT, computed as
    * one full-outer join hash-partitioned on the key (both inputs
    * shuffle once on the same key; nothing else moves). */
  def cdcApply(base: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    val applied = col("op").isin("I", "U")
    base.join(changes, Seq(key), "full_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: payload.map(c =>
        when(applied, col(s"new_$c")).otherwise(col(c)).as(c)): _*)
  }
}
