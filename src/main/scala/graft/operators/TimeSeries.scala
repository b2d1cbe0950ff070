package graft.operators

import graft.core.{Norm, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with gap-fill — the ops-metrics /
  * sensor half of a pipeline (irregular event streams → daily series a
  * model can consume). Two fills: linear interpolation between the
  * nearest observed neighbors, and forward-fill (last observation
  * carried forward).
  *
  * Scale shape: the ONLY events-proportional exchange is the first
  * (user, day) rollup, with map-side partial aggregation. Everything
  * after — per-user bounds, the exploded day grid, the grid⋈rollup
  * join, the neighbor windows — operates on the daily rollup, which is
  * users × days rows (~5 orders smaller than the event log at 100 TB).
  * The windows are per-user linear scans; no self-join, no driver loop.
  */
object TimeSeries {

  /** Daily per-user rollup. [[Norm.davg]] (exact decimal sum, one double
    * divide) keeps the mean independent of summation order — the value
    * every later fill arithmetic starts from, bit-identical across
    * engines and retries. */
  def dailyObserved(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(Norm.davg(col("value")).as("v"))

  /** Gap-filled daily series for every user, spanning each user's own
    * [first, last] observed day (every gap is interior, so both
    * neighbors always exist). `interpolate = true` → linear between the
    * previous and next observed value; `false` → forward-fill. */
  def resampleDaily(events: DataFrame, interpolate: Boolean): DataFrame = {
    val obs = dailyObserved(events)
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val j = grid.join(obs, Seq("user_id", "day"), "left")
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val f = j.select(col("user_id"), col("day"), col("v"),
      last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
      last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev).as("pd"),
      first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
      first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext).as("nd"))
    val filled: Column =
      if (interpolate)
        // identical op order to the oracle: (nv-pv), gap/span, mul, add
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")))
      else coalesce(col("v"), col("pv"))
    f.select(col("user_id"), Norm.dateStr(col("day")).as("day"),
      filled.as("v"), col("v").isNull.as("filled"))
  }

  /** Exponentially-weighted moving average over each user's observed
    * daily series: e_1 = v_1, e_t = α·v_t + (1−α)·e_{t−1}.
    *
    * The recurrence is inherently sequential PER USER, so it runs as an
    * ordered fold over the user's collected (day, v) array — bounded by
    * the series length (days), never by events, and users fold in
    * parallel. α is pinned to 0.5: both multiplications are exact
    * halvings in IEEE, so the engine's fold and the oracle's recursive
    * CTE agree bit-for-bit with no rounding (same reasoning that pinned
    * the temperature-mix exponent). The interpreted-HOF cost (the
    * q_entropy lesson) is irrelevant here: the lambda runs once per
    * rollup element, ~days-per-user rows, not once per event. */
  def ewmaDaily(events: DataFrame): DataFrame = {
    val obs = dailyObserved(events)
    obs.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("s"))
      .withColumn("e", expr(
        """aggregate(s, cast(array() as array<double>), (acc, x) ->
          |  case when size(acc) = 0 then array(x.v)
          |       else array_append(acc, 0.5D * x.v + 0.5D * element_at(acc, -1)) end)
          |""".stripMargin))
      .select(col("user_id"), explode(arrays_zip(col("s"), col("e"))).as("z"))
      .select(col("user_id"), Norm.dateStr(col("z.s.day")).as("day"),
        col("z.s.v").as("v"), col("z.e").as("ewma"))
  }

  /** Holt double-exponential smoothing per user (α = β = 0.5: correctly-
    * rounded halvings, the q_ts_ewma determinism discipline extended to
    * a COUPLED level+trend recurrence): l_t = ½x_t + ½(l+b),
    * b_t = ½(l_t − l) + ½b, one-step forecast = l_t + b_t. l_t is
    * inlined twice in the b_t expression on BOTH engines (neither SQL
    * recursion nor a fold lambda can bind intermediates) — the inlined
    * copy computes the identical double, so 30 coupled iterations stay
    * bit-equal with no rounding anywhere. */
  def holtDaily(events: DataFrame): DataFrame = {
    val obs = dailyObserved(events)
    obs.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("s"))
      .withColumn("e", expr(
        """aggregate(s, cast(array() as array<struct<l:double,b:double>>), (acc, x) ->
          |  case when size(acc) = 0
          |       then array(named_struct('l', cast(x.v as double), 'b', 0.0D))
          |       else array_append(acc, named_struct(
          |         'l', 0.5D * x.v + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
          |         'b', 0.5D * ((0.5D * x.v + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))
          |                      - element_at(acc, -1).l)
          |              + 0.5D * element_at(acc, -1).b)) end)
          |""".stripMargin))
      .select(col("user_id"), explode(arrays_zip(col("s"), col("e"))).as("z"))
      .select(col("user_id"), Norm.dateStr(col("z.s.day")).as("day"),
        col("z.s.v").as("v"), col("z.e.l").as("level"), col("z.e.b").as("trend"),
        (col("z.e.l") + col("z.e.b")).as("forecast"))
  }

  /** Holt-Winters ADDITIVE-SEASONAL smoothing per user, period `m` (= 7:
    * the weekly cycle of telemetry traffic) — [[holtDaily]]'s seasonal
    * upgrade and the forecaster that survives day-of-week effects Holt
    * mistakes for trend. α = β = γ = 0.5 (exact halvings, the established
    * determinism discipline), seasonal state initialized at 0 so the first
    * season degenerates to pure Holt and seasonality phases in from t > m:
    *
    *   SM  = s_{t−m}             (0 while t ≤ m)
    *   l_t = ½(x_t − SM) + ½(l+b)
    *   b_t = ½(l_t − l) + ½b
    *   s_t = ½(x_t − l_t) + ½SM
    *   one-step forecast = l_t + b_t + s_{t+1−m}
    *
    * l_t is inlined THREE times (into b_t and s_t — no intermediate
    * binding exists in a fold lambda or a SQL recursion) and the oracle's
    * recursive CTE carries the seasonal history as a list column indexed
    * at `rn − m`, token-for-token this fold's `element_at(acc, t−m)`; the
    * inlined copies compute identical doubles, so the coupled three-state
    * recurrence stays bit-equal across engines with no rounding anywhere.
    * Scale: one user-keyed rollup shuffle; the fold runs over the
    * days-per-user series (the acc array IS the seasonal history), never
    * over raw events. */
  def holtWintersDaily(events: DataFrame, m: Int = 7): DataFrame = {
    val obs = dailyObserved(events)
    val sm = s"(case when size(acc) + 1 > $m then element_at(acc, size(acc) + 1 - $m).sv else 0.0D end)"
    val lt = s"(0.5D * (x.v - $sm) + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))"
    obs.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("s"))
      .withColumn("e", expr(
        s"""aggregate(s, cast(array() as array<struct<l:double,b:double,sv:double>>), (acc, x) ->
           |  case when size(acc) = 0
           |       then array(named_struct('l', cast(x.v as double), 'b', 0.0D, 'sv', 0.0D))
           |       else array_append(acc, named_struct(
           |         'l', $lt,
           |         'b', 0.5D * ($lt - element_at(acc, -1).l) + 0.5D * element_at(acc, -1).b,
           |         'sv', 0.5D * (x.v - $lt) + 0.5D * $sm)) end)
           |""".stripMargin))
      .select(col("user_id"), col("e"),
        posexplode(arrays_zip(col("s"), col("e"))))
      .select(col("user_id"), Norm.dateStr(col("col.s.day")).as("day"),
        col("col.s.v").as("v"), col("col.e.l").as("level"),
        col("col.e.b").as("trend"), col("col.e.sv").as("seasonal"),
        (col("col.e.l") + col("col.e.b") +
          when(col("pos") + 1 >= m,
            element_at(col("e"), col("pos") + lit(2) - lit(m)).getField("sv"))
            .otherwise(lit(0.0))).as("forecast"))
  }

  /** Shared oracle prefix: daily decimal-exact rollup + each observed
    * point's NEXT observed neighbor (segment form — equivalent to the
    * engine's nearest-neighbor windows because every gap is interior). */
  private val segSql =
    """WITH obs AS (
      |  SELECT user_id, ts::DATE AS day,
      |    sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS v
      |  FROM events GROUP BY 1, 2),
      |seg AS (
      |  SELECT user_id, day, v,
      |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nd,
      |    lead(v)   OVER (PARTITION BY user_id ORDER BY day) AS nv
      |  FROM obs),
      |fill AS (
      |  SELECT user_id,
      |    unnest(generate_series(day::TIMESTAMP, (nd - INTERVAL 1 DAY)::TIMESTAMP, INTERVAL 1 DAY))::DATE AS gday,
      |    day, v, nd, nv
      |  FROM seg WHERE nd IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, day, day, v, NULL, NULL FROM seg WHERE nd IS NULL)""".stripMargin

  val all: Map[String, Q] = Map(

    // -- linear interpolation: the oracle replays the decimal-exact daily
    //    means, the per-user day grid and the same IEEE op order, so the
    //    interpolated doubles are bit-identical (no rounding needed). --
    "q_ts_resample" -> Q(
      (s, d) => resampleDaily(Tables.events(s, d), interpolate = true)
        .orderBy("user_id", "day"),
      s"""$segSql
         |SELECT user_id, strftime(gday, '%Y-%m-%d') AS day,
         |  CASE WHEN gday = day THEN v
         |       ELSE v + (nv - v) *
         |            (CAST(gday - day AS DOUBLE) / CAST(nd - day AS DOUBLE)) END AS v,
         |  (gday <> day) AS filled
         |FROM fill ORDER BY user_id, day""".stripMargin),

    // -- forward-fill (LOCF): each observed value holds until the next
    //    observation. --
    "q_ts_ffill" -> Q(
      (s, d) => resampleDaily(Tables.events(s, d), interpolate = false)
        .orderBy("user_id", "day"),
      s"""$segSql
         |SELECT user_id, strftime(gday, '%Y-%m-%d') AS day, v,
         |  (gday <> day) AS filled
         |FROM fill ORDER BY user_id, day""".stripMargin),

    // -- EWMA smoothing: the oracle replays the exact recurrence order
    //    with a recursive CTE (e_t = 0.5·v_t + 0.5·e_{t−1}) over the same
    //    decimal-exact daily means — bit-identical, no rounding. --
    // Holt level+trend smoothing (r14): EWMA's trend-aware upgrade — the
    // one-step-ahead forecaster a telemetry pipeline actually deploys.
    // Coupled recurrence, α = β = 0.5 (exact halvings); the DuckDB
    // oracle replays both recurrences in one recursive CTE with l_t
    // inlined twice, token-for-token the engine's fold. Scale: one
    // user-keyed rollup; recursion length = days per user.
    "q_ts_holt" -> Q(
      (s, d) => holtDaily(Tables.events(s, d)).orderBy("user_id", "day"),
      """WITH RECURSIVE obs AS (
        |  SELECT user_id, ts::DATE AS day,
        |    sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |ord AS (
        |  SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM obs),
        |rec AS (
        |  SELECT user_id, day, v, rn, v AS l, 0.0::DOUBLE AS b
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.day, o.v, o.rn,
        |    0.5 * o.v + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * o.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        |  FROM ord o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v,
        |  l AS level, b AS trend, l + b AS forecast
        |FROM rec ORDER BY user_id, day""".stripMargin),

    // Holt-Winters additive-seasonal (r15): the day-of-week-aware
    // forecaster. Seasonal history rides a LIST column in the oracle's
    // recursive CTE (indexed rn−7, the fold's element_at(acc, t−7));
    // l_t inlined three times on BOTH engines → bit-identical doubles.
    "q_ts_holt_winters" -> Q(
      (s, d) => holtWintersDaily(Tables.events(s, d)).orderBy("user_id", "day"),
      """WITH RECURSIVE obs AS (
        |  SELECT user_id, ts::DATE AS day,
        |    sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |ord AS (
        |  SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM obs),
        |rec AS (
        |  SELECT user_id, day, v, rn, v AS l, 0.0::DOUBLE AS b, 0.0::DOUBLE AS s,
        |    [0.0::DOUBLE] AS sl
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.day, o.v, o.rn,
        |    0.5 * (o.v - (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END)) + 0.5 * (r.l + r.b),
        |    0.5 * ((0.5 * (o.v - (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END)) + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b,
        |    0.5 * (o.v - (0.5 * (o.v - (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END)) + 0.5 * (r.l + r.b)))
        |      + 0.5 * (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END),
        |    list_append(r.sl,
        |      0.5 * (o.v - (0.5 * (o.v - (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END)) + 0.5 * (r.l + r.b)))
        |      + 0.5 * (CASE WHEN o.rn > 7 THEN r.sl[o.rn - 7] ELSE 0.0 END))
        |  FROM ord o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v, l AS level, b AS trend,
        |  s AS seasonal,
        |  l + b + (CASE WHEN rn >= 7 THEN sl[rn - 6] ELSE 0.0 END) AS forecast
        |FROM rec ORDER BY user_id, day""".stripMargin),

    // Theil-Sen robust trend per user (r15): the median of all pairwise
    // slopes of the daily series — the resistant alternative to the OLS
    // slope (q_linreg), with a 29% breakdown point vs OLS's zero: one
    // outlier day moves OLS arbitrarily but shifts a slope MEDIAN by at
    // most one rank. Exactness: each slope is ONE IEEE division of
    // exact operands (decimal-exact daily mean deltas / integer day
    // gaps), the median is an ELEMENT PICK (lower median, index
    // (n+1) div 2 on the ascending sort — never an average of two
    // slopes), so both engines select the identical double. Scale: the
    // O(days²) pair enumeration is a user-keyed self-join of the DAILY
    // ROLLUP (~435 pairs at 30 days/user), never of raw events — the
    // quadratic is in the bounded series length, not the corpus, and
    // every exchange carries narrow (user, slope) rows.
    "q_theil_sen" -> Q(
      (s, d) => {
        // pair enumeration as a user-keyed SELF-JOIN (codegen'd), not a
        // nested fold lambda: the O(days²)-per-user slope computation is
        // the hot loop, and interpreted higher-order functions cost ~10×
        // codegen (the q_entropy lesson, re-measured on the x16 rung:
        // 19 s fold vs join). Both exchanges carry narrow rows — the
        // rollup into the join, (user, slope) pairs out — and the
        // per-user sort runs on the bounded slope list.
        val obs = dailyObserved(Tables.events(s, d))
        val nd = obs.groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
        obs.as("a")
          .join(obs.as("b"),
            col("a.user_id") === col("b.user_id") && col("a.day") < col("b.day"))
          .select(col("a.user_id").as("user_id"),
            ((col("b.v") - col("a.v")) /
              datediff(col("b.day"), col("a.day")).cast("double")).as("slope"))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(col("slope"))).as("sl"),
            count(lit(1)).as("n_pairs"))
          .join(nd, "user_id")
          .select(col("user_id"), col("n_days"), col("n_pairs"),
            element_at(col("sl"),
              ((col("n_pairs") + 1) / 2).cast("int")).as("slope"))
          .orderBy("user_id")
      },
      """WITH obs AS (
        |  SELECT user_id, ts::DATE AS day,
        |    sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.user_id, (b.v - a.v) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM obs a JOIN obs b ON a.user_id = b.user_id AND a.day < b.day),
        |nd AS (SELECT user_id, count(*)::BIGINT AS n_days FROM obs GROUP BY 1),
        |agg AS (
        |  SELECT user_id, list_sort(list(slope)) AS sl, count(*)::BIGINT AS n_pairs
        |  FROM pairs GROUP BY 1)
        |SELECT a.user_id, nd.n_days, a.n_pairs,
        |  sl[CAST((a.n_pairs + 1) // 2 AS INTEGER)] AS slope
        |FROM agg a JOIN nd ON a.user_id = nd.user_id
        |ORDER BY a.user_id""".stripMargin),

    "q_ts_ewma" -> Q(
      (s, d) => ewmaDaily(Tables.events(s, d)).orderBy("user_id", "day"),
      """WITH RECURSIVE obs AS (
        |  SELECT user_id, ts::DATE AS day,
        |    sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |ord AS (
        |  SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM obs),
        |rec AS (
        |  SELECT user_id, day, v, rn, v AS ewma FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.day, o.v, o.rn, 0.5 * o.v + 0.5 * r.ewma
        |  FROM ord o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v, ewma
        |FROM rec ORDER BY user_id, day""".stripMargin)
  )
}
