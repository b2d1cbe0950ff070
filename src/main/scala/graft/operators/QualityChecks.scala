package graft.operators

import graft.core.Tables
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.md5Hash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality monitoring operators (north-star extension, round 12):
  * the Deequ-style assertion pass a pipeline runs over every ingested
  * table, and the trailing-window anomaly gate it runs over arriving
  * metrics.
  *
  *   - constraint suite: completeness / uniqueness / range / accepted-
  *     values metrics come from ONE aggregation pass over the fact table
  *     (all partial-aggregated before a single exchange); the one
  *     referential-integrity check is a broadcast anti-join against the
  *     dimension. Output is a tiny (constraint, metric, passed) table —
  *     the 100 TB cost is one scan.
  *   - trailing-window anomaly flag: per-user daily totals, each day
  *     judged against its trailing 7-day window. The 2σ rule
  *     |x − Σx/n| > 2σ is squared and cleared of divisions to
  *     (n·x − Σx)² > 4·(n·Σx² − (Σx)²), evaluated on int64 value-cents —
  *     EXACT in both engines, so no float tolerance or rounding can flip
  *     the flag.
  */
object QualityChecks {

  val all: Map[String, Q] = Map(

    // -- k-anonymity audit (privacy gate before a data release): group
    //    sizes over the quasi-identifier pair (nation, market segment);
    //    groups under k=5 are re-identification risks. ONE partial
    //    aggregation — the reduce side is |QI-combination| rows, not
    //    data-proportional; the flag is an exact integer compare. --
    "q_k_anonymity" -> Q(
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .withColumn("meets_k", col("n") >= 5)
        .orderBy("c_nationkey", "c_mktsegment"),
      """SELECT c_nationkey, c_mktsegment, count(*) AS n, count(*) >= 5 AS meets_k
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- l-diversity: k-anonymity's sensitive-attribute complement — a
    //    quasi-identifier group is safe only if the SENSITIVE column
    //    (here the account-balance sign band as a stand-in) takes ≥ l
    //    distinct values inside it, else group membership leaks the
    //    attribute. One partial agg; reduce side ∝ |QI combinations|. --
    "q_l_diversity" -> Q(
      (s, d) => Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low").otherwise("high").as("band"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), countDistinct(col("band")).as("l_distinct"))
        .withColumn("meets_l", col("l_distinct") >= 3)
        .orderBy("c_nationkey", "c_mktsegment"),
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
        |    WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END)::BIGINT AS l_distinct,
        |  count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
        |    WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END) >= 3 AS meets_l
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- CUSUM change-point detection (r14): the sequential complement of
    //    the window gates — S_t = max(0, S_{t-1} + (x_t − k)) over the
    //    daily revenue series, alarm when S crosses 2k. Everything is
    //    int64 cents (decimal-exact daily sums ×100, k = total div days),
    //    so the recurrence and the gate are EXACT in any engine — the one
    //    sequential op in the family, and it runs as an ordered fold over
    //    the TINY day rollup (the q_ts_ewma discipline: the corpus
    //    aggregates once, the recursion touches |days| rows). --
    "q_cusum" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("ts_ns div 86400000000000").as("day"),
            col("value").cast(DecimalType(18, 2)).as("v"))
          .groupBy(col("day"))
          .agg((sum(col("v")) * 100).cast("long").as("mv"))
        val tot = daily.agg(
          expr("sum(mv) div count(1)").as("k"))
        daily.agg(sort_array(collect_list(struct(col("day"), col("mv"))))
            .as("xs"))
          .crossJoin(tot)
          .select(col("xs"), col("k"), posexplode(expr(
            """aggregate(xs,
              |  named_struct('s', 0L, 'out', cast(array() as array<bigint>)),
              |  (a, x) -> named_struct(
              |    's', greatest(0L, a.s + (x.mv - k)),
              |    'out', concat(a.out, array(greatest(0L, a.s + (x.mv - k))))),
              |  a -> a.out)""".stripMargin)))
          .select(element_at(col("xs"), col("pos") + 1).getField("day").as("day"),
            element_at(col("xs"), col("pos") + 1).getField("mv").as("mv"),
            col("k"), col("col").as("s"),
            (col("col") > col("k") * 2).as("alarm"))
          .orderBy("day")
      },
      """WITH RECURSIVE daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS mv
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(mv) AS BIGINT) // count(*) AS k FROM daily),
        |r AS (SELECT day, mv, row_number() OVER (ORDER BY day) AS rn FROM daily),
        |it(rn, day, mv, s) AS (
        |  SELECT r.rn, r.day, r.mv, greatest(0, 0 + (r.mv - t.k))
        |  FROM r CROSS JOIN t WHERE r.rn = 1
        |  UNION ALL
        |  SELECT r.rn, r.day, r.mv, greatest(0, it.s + (r.mv - t.k))
        |  FROM it JOIN r ON r.rn = it.rn + 1 CROSS JOIN t)
        |SELECT day, mv, t.k, s::BIGINT AS s, s > t.k * 2 AS alarm
        |FROM it CROSS JOIN t ORDER BY day""".stripMargin),

    // -- t-closeness (r14): completes the privacy-audit triad (k-anonymity
    //    = group size, l-diversity = sensitive-value variety, t-closeness
    //    = sensitive-value DISTRIBUTION). A QI group leaks when its
    //    sensitive distribution strays from the global one; for the
    //    ORDERED 3-band balance attribute the distance is the Earth
    //    Mover's Distance = mean |cumulative difference|. Both cumulative
    //    gaps are cross-multiplied onto int64 (dj = cumj·N − CUMj·n, the
    //    q_ks_drift trick) so the t = 0.2 gate 5·(|d1|+|d2|) ≤ 2·n·N is
    //    an EXACT integer compare — no float tolerance can flip it. One
    //    partial agg (reduce ∝ |QI combinations|) + a broadcast of the
    //    1-row global distribution. --
    "q_t_closeness" -> Q(
      (s, d) => {
        val b = Tables.customer(s, d)
          .select(col("c_nationkey"), col("c_mktsegment"),
            when(col("c_acctbal") < 0, 0)
              .when(col("c_acctbal") < 5000, 1).otherwise(2).as("band"))
        val g = b.groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            count(when(col("band") === 0, 1)).as("c0"),
            count(when(col("band") === 1, 1)).as("c1"))
        val tot = g.agg(sum(col("n")).as("nn"), sum(col("c0")).as("g0"),
          sum(col("c1")).as("g1"))
        g.crossJoin(broadcast(tot))
          .withColumn("emd_num",
            abs(col("c0") * col("nn") - col("g0") * col("n")) +
              abs((col("c0") + col("c1")) * col("nn")
                - (col("g0") + col("g1")) * col("n")))
          .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
            col("emd_num"),
            (col("emd_num").cast("double") /
              (col("n") * col("nn") * 2).cast("double")).as("emd"),
            (col("emd_num") * 5 <= col("n") * col("nn") * 2).as("meets_t"))
          .orderBy("c_nationkey", "c_mktsegment")
      },
      """WITH b AS (SELECT c_nationkey, c_mktsegment,
        |    CASE WHEN c_acctbal < 0 THEN 0
        |         WHEN c_acctbal < 5000 THEN 1 ELSE 2 END AS band
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
        |    count(CASE WHEN band = 0 THEN 1 END)::BIGINT AS c0,
        |    count(CASE WHEN band = 1 THEN 1 END)::BIGINT AS c1
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT sum(n)::BIGINT AS nn, sum(c0)::BIGINT AS g0,
        |    sum(c1)::BIGINT AS g1 FROM g)
        |SELECT c_nationkey, c_mktsegment, n,
        |  (abs(c0 * nn - g0 * n)
        |   + abs((c0 + c1) * nn - (g0 + g1) * n))::BIGINT AS emd_num,
        |  (abs(c0 * nn - g0 * n)
        |   + abs((c0 + c1) * nn - (g0 + g1) * n))::DOUBLE
        |    / (2 * n * nn) AS emd,
        |  5 * (abs(c0 * nn - g0 * n)
        |       + abs((c0 + c1) * nn - (g0 + g1) * n)) <= 2 * n * nn AS meets_t
        |FROM g CROSS JOIN t ORDER BY 1, 2""".stripMargin),

    // -- constraint suite over lineitem (+ orders→customer RI). Metrics
    //    are exact ratios (integer/integer in IEEE double — identical in
    //    any engine); `passed` thresholds compare those exact values. --
    "q_dq_checks" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val a = li.agg(
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("qty_nn"),
          count(when(col("l_quantity") >= 1 && col("l_quantity") <= 50, 1))
            .as("qty_in_range"),
          count(when(col("l_returnflag").isin("A", "N", "R"), 1)).as("rf_ok"),
          // struct-wrapped so NULL-bearing key tuples still count (DuckDB's
          // tuple-DISTINCT semantics); bare countDistinct(c1..c5) drops any
          // row with a NULL component — exactly the dirty rows a uniqueness
          // check exists to see (r12 review)
          countDistinct(struct(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("l_extendedprice")))
            .as("key_nd"))
        val orphans = Tables.orders(s, d).select(col("o_custkey"))
          .join(broadcast(Tables.customer(s, d).select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
        val checks = a.crossJoin(orphans).select(explode(array(
          struct(lit("completeness:l_quantity").as("check_name"),
            (col("qty_nn").cast("double") / col("n")).as("metric"),
            (col("qty_nn") === col("n")).as("passed")),
          struct(lit("uniqueness:lineitem_key").as("check_name"),
            (col("key_nd").cast("double") / col("n")).as("metric"),
            (col("key_nd") === col("n")).as("passed")),
          struct(lit("range:l_quantity_1_50").as("check_name"),
            (col("qty_in_range").cast("double") / col("n")).as("metric"),
            (col("qty_in_range") === col("n")).as("passed")),
          struct(lit("accepted:l_returnflag_ANR").as("check_name"),
            (col("rf_ok").cast("double") / col("n")).as("metric"),
            (col("rf_ok") === col("n")).as("passed")),
          struct(lit("ri:orders_custkey").as("check_name"),
            col("n_orphan").cast("double").as("metric"),
            (col("n_orphan") === 0).as("passed")))).as("c"))
        checks.select(col("c.*")).orderBy("check_name")
      },
      """WITH a AS (SELECT count(*)::BIGINT AS n,
        |    count(l_quantity)::BIGINT AS qty_nn,
        |    count(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 END)::BIGINT AS qty_in_range,
        |    count(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 END)::BIGINT AS rf_ok,
        |    count(DISTINCT (l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice))::BIGINT AS key_nd
        |  FROM lineitem),
        |o AS (SELECT count(*)::BIGINT AS n_orphan FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |SELECT * FROM (
        |  SELECT 'completeness:l_quantity' AS check_name, qty_nn::DOUBLE / n AS metric, qty_nn = n AS passed FROM a
        |  UNION ALL
        |  SELECT 'uniqueness:lineitem_key', key_nd::DOUBLE / n, key_nd = n FROM a
        |  UNION ALL
        |  SELECT 'range:l_quantity_1_50', qty_in_range::DOUBLE / n, qty_in_range = n FROM a
        |  UNION ALL
        |  SELECT 'accepted:l_returnflag_ANR', rf_ok::DOUBLE / n, rf_ok = n FROM a
        |  UNION ALL
        |  SELECT 'ri:orders_custkey', n_orphan::DOUBLE, n_orphan = 0 FROM a CROSS JOIN o
        |) ORDER BY check_name""".stripMargin),

    // -- distribution drift (PSI) between two yearly order-price
    //    snapshots: prices bin at 50k width, one scan + ONE bin-keyed
    //    aggregate yields both years' counts, totals broadcast back.
    //    Per-bin PSI terms (p−q)·ln(p/q) are emitted as rows (the global
    //    sum is the consumer's ordered fold — emitting terms avoids an
    //    order-dependent float total); bins missing from either year are
    //    reported with a NULL psi term instead of the classic epsilon
    //    fudge, which would be an engine-specific constant. ln() drifts a
    //    last ulp across libms → psi rounded to 6. --
    "q_psi_drift" -> Q(
      (s, d) => {
        val binned = Tables.orders(s, d)
          .select(year(col("o_orderdate").cast("date")).as("yr"),
            expr("cast(floor(o_totalprice / 50000) as bigint)").as("bin"))
          .where(col("yr").isin(1994, 1995))
          .groupBy(col("bin"))
          .agg(count(when(col("yr") === 1994, 1)).as("n_a"),
            count(when(col("yr") === 1995, 1)).as("n_b"))
        val totals = binned.agg(sum(col("n_a")).as("tot_a"),
          sum(col("n_b")).as("tot_b"))
        binned.crossJoin(broadcast(totals))
          .select(col("bin"), col("n_a"), col("n_b"),
            when(col("n_a") > 0 && col("n_b") > 0,
              round((col("n_a").cast("double") / col("tot_a")
                  - col("n_b").cast("double") / col("tot_b"))
                * log((col("n_a").cast("double") / col("tot_a"))
                  / (col("n_b").cast("double") / col("tot_b"))), 6))
              .as("psi_term"))
          .orderBy("bin")
      },
      """WITH b AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        |    count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1994 THEN 1 END)::BIGINT AS n_a,
        |    count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995 THEN 1 END)::BIGINT AS n_b
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1994, 1995)
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
        |        CAST(sum(n_b) AS BIGINT) AS tot_b FROM b)
        |SELECT bin, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    round((n_a::DOUBLE / tot_a - n_b::DOUBLE / tot_b)
        |      * ln((n_a::DOUBLE / tot_a) / (n_b::DOUBLE / tot_b)), 6)
        |  END AS psi_term
        |FROM b CROSS JOIN t ORDER BY bin""".stripMargin),

    // -- Jensen-Shannon drift (r14): PSI's bounded, symmetric complement —
    //    same one-scan bin-keyed aggregate and broadcast totals, but JS is
    //    FINITE on one-sided bins (p ln(p/m) with q = 0 degenerates to
    //    p·ln 2), so the bins PSI must NULL out contribute real mass here.
    //    Per-bin terms are emitted as rows (the q_psi_drift shape: a global
    //    float sum would be partition-order-dependent); ln() drifts a last
    //    ulp across libms → terms rounded to 6. The SQL mirrors the Spark
    //    expression tree node-for-node so IEEE evaluation order matches. --
    "q_js_drift" -> Q(
      (s, d) => {
        val binned = Tables.orders(s, d)
          .select(year(col("o_orderdate").cast("date")).as("yr"),
            expr("cast(floor(o_totalprice / 50000) as bigint)").as("bin"))
          .where(col("yr").isin(1994, 1995))
          .groupBy(col("bin"))
          .agg(count(when(col("yr") === 1994, 1)).as("n_a"),
            count(when(col("yr") === 1995, 1)).as("n_b"))
        val totals = binned.agg(sum(col("n_a")).as("tot_a"),
          sum(col("n_b")).as("tot_b"))
        val p = col("n_a").cast("double") / col("tot_a")
        val q = col("n_b").cast("double") / col("tot_b")
        val m = (p + q) / 2
        binned.crossJoin(broadcast(totals))
          .select(col("bin"), col("n_a"), col("n_b"),
            when(col("n_a") > 0 && col("n_b") > 0,
              round(lit(0.5) * (p * log(p / m) + q * log(q / m)), 6))
              .when(col("n_a") > 0, round(lit(0.5) * (p * log(lit(2.0))), 6))
              .otherwise(round(lit(0.5) * (q * log(lit(2.0))), 6))
              .as("js_term"))
          .orderBy("bin")
      },
      """WITH b AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        |    count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1994 THEN 1 END)::BIGINT AS n_a,
        |    count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995 THEN 1 END)::BIGINT AS n_b
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1994, 1995)
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
        |        CAST(sum(n_b) AS BIGINT) AS tot_b FROM b)
        |SELECT bin, n_a, n_b,
        |  CASE
        |    WHEN n_a > 0 AND n_b > 0 THEN round(0.5 * (
        |      (n_a::DOUBLE / tot_a) * ln((n_a::DOUBLE / tot_a)
        |        / (((n_a::DOUBLE / tot_a) + (n_b::DOUBLE / tot_b)) / 2))
        |      + (n_b::DOUBLE / tot_b) * ln((n_b::DOUBLE / tot_b)
        |        / (((n_a::DOUBLE / tot_a) + (n_b::DOUBLE / tot_b)) / 2))), 6)
        |    WHEN n_a > 0 THEN round(0.5 * ((n_a::DOUBLE / tot_a) * ln(2.0)), 6)
        |    ELSE round(0.5 * ((n_b::DOUBLE / tot_b) * ln(2.0)), 6)
        |  END AS js_term
        |FROM b CROSS JOIN t ORDER BY bin""".stripMargin),

    // -- two-sample Kolmogorov-Smirnov drift between two yearly price
    //    snapshots, on a DATA-DERIVED 64-bin grid (PSI's complement: max
    //    ECDF deviation instead of a divergence sum). Exactness contract:
    //    values are integer CENTS (decimal×100), the grid (lo, w) comes
    //    from one 1-row min/max aggregate broadcast back, binning is
    //    integer `div`, and the deviation max is CROSS-MULTIPLIED onto
    //    int64 (|cumA·nB − cumB·nA|) so the argmax has no float boundary;
    //    the reported D is one IEEE division of exact integers. Scale
    //    shape: one scan → bin-keyed partial agg (reduce ∝ 64 bins) →
    //    a ≤64-row window. The single-partition window is bounded by the
    //    GRID, never the data. --
    "q_ks_drift" -> Q(
      (s, d) => {
        val snap = Tables.orders(s, d)
          .select(year(col("o_orderdate").cast("date")).as("yr"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("v"))
          .where(col("yr").isin(1997, 2000))
        val grid = snap.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
          .select(col("lo"), expr("(hi - lo) div 64 + 1").as("w"))
        val binned = snap.crossJoin(broadcast(grid))
          .select(expr("(v - lo) div w").as("bin"), col("yr"))
          .groupBy(col("bin"))
          .agg(count(when(col("yr") === 1997, 1)).as("ca"),
            count(when(col("yr") === 2000, 1)).as("cb"))
        val totals = binned.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
        val cum = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        binned
          .withColumn("cum_a", sum(col("ca")).over(cum))
          .withColumn("cum_b", sum(col("cb")).over(cum))
          .crossJoin(broadcast(totals))
          .groupBy(col("n_a"), col("n_b"))
          .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
            .as("d_num"))
          .select(col("d_num"), col("n_a"), col("n_b"),
            (col("d_num").cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("d"))
      },
      """WITH snap AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1997, 2000)),
        |grid AS (SELECT min(v) AS lo, (max(v) - min(v)) // 64 + 1 AS w FROM snap),
        |b AS (SELECT (v - lo) // w AS bin,
        |        count(CASE WHEN yr = 1997 THEN 1 END)::BIGINT AS ca,
        |        count(CASE WHEN yr = 2000 THEN 1 END)::BIGINT AS cb
        |      FROM snap CROSS JOIN grid GROUP BY 1),
        |c AS (SELECT bin, sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_a,
        |             sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_b FROM b),
        |t AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM b)
        |SELECT max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_num, n_a, n_b,
        |       max(abs(cum_a * n_b - cum_b * n_a))::DOUBLE / (n_a * n_b) AS d
        |FROM c CROSS JOIN t GROUP BY n_a, n_b""".stripMargin),

    // -- trailing-window anomaly flag, decimal-exact (see object doc).
    //    One user_id shuffle: daily rollup and the trailing window both
    //    cluster on user_id (day extends the grouping key). Windows use
    //    RANGE over the integer day so calendar gaps shorten the window
    //    instead of silently stretching it. --
    //    All window statistics are int64 value-CENTS (the 2-decimal day
    //    sum × 100): n ≤ 7, Σx ≤ ~1e8, so every product below stays far
    //    inside 64 bits — no decimal typing games, no overflow. --
    // -- mutual information between two document features (r14): the
    //    feature-selection / association-audit primitive — how much does
    //    knowing the language tell you about document length? The
    //    contingency table (lang × 200-char length bucket) is ONE partial-
    //    aggregated pass over the corpus; marginals and the grand total
    //    come from window sums over the TINY cell table (reduce side and
    //    the unpartitioned window are bounded by |langs|·|buckets|, never
    //    the corpus — the q_ks_drift grid-window pattern). Per-cell PMI
    //    and MI contributions are emitted AS ROWS (the q_psi_drift shape:
    //    no order-dependent float total to compare); products are taken in
    //    cast-double pinned order (c·N may overflow int64 at corpus scale,
    //    so the exact-integer form is deliberately NOT used), ln rounded
    //    to 9 dp (the q_zipf precedent). --
    "q_mutual_info" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("lang"),
          (col("n_chars") / 200).cast("long").as("bucket"))
        val cells = base.groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("c"))
        val m = cells.select(col("lang"), col("bucket"), col("c"),
          sum(col("c")).over(Window.partitionBy(col("lang"))).as("r"),
          sum(col("c")).over(Window.partitionBy(col("bucket"))).as("cc"),
          sum(col("c")).over(Window.partitionBy()).as("nn"))
        val ratio = (col("c").cast("double") * col("nn").cast("double")) /
          (col("r").cast("double") * col("cc").cast("double"))
        m.select(col("lang"), col("bucket"), col("c").as("n_xy"),
            round(log(ratio), 9).as("pmi"),
            round((col("c").cast("double") / col("nn").cast("double")) * log(ratio), 9)
              .as("mi_term"))
          .orderBy("lang", "bucket")
      },
      """WITH base AS (SELECT lang, n_chars // 200 AS bucket FROM documents),
        |cells AS (SELECT lang, bucket, count(*)::BIGINT AS c FROM base GROUP BY 1, 2),
        |m AS (SELECT lang, bucket, c,
        |    sum(c) OVER (PARTITION BY lang) AS r,
        |    sum(c) OVER (PARTITION BY bucket) AS cc,
        |    sum(c) OVER () AS nn
        |  FROM cells)
        |SELECT lang, bucket, c AS n_xy,
        |  round(ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
        |          / (CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))), 9) AS pmi,
        |  round((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
        |          / (CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))), 9) AS mi_term
        |FROM m ORDER BY lang, bucket""".stripMargin),

    // -- robust outlier gate (r14): the median/MAD twin of q_anomaly's
    //    mean/2σ rule — a single corrupted day shifts a mean but not a
    //    median, so this is the gate a pipeline uses when the telemetry
    //    itself is suspect. Two aggregation levels (per-user median of
    //    daily cents, then median absolute deviation around it), each a
    //    partial-aggregated pass over the DAILY rollup (events shuffle
    //    once; everything after moves rollup-sized rows on the same
    //    user key — co-partitioned joins, no re-exchange of raw events).
    //    Exactness: daily values are integer cents, so every median is
    //    a half-integer computed as lower + (upper−lower)·0.5 — EXACT in
    //    IEEE, both engines — and |mv − med| and 3·mad stay exact; the
    //    strict > flag can never flip on a ulp. Output: outlier days
    //    only. --
    // -- 10% TRIMMED MEAN per user (r15): the third member of the robust
    //    location family (2σ gate → MAD → trimmed mean): drop the k =
    //    n div 10 smallest and largest daily totals by (cents, day) rank
    //    and average the rest — resistant to k outliers per tail, unlike
    //    the plain mean one bad day moves arbitrarily. Exactness: daily
    //    totals are int64 CENTS (decimal-exact sums ×100), the trim is an
    //    integer rank gate on a TOTAL order (ties broken by day), kept
    //    sums/counts are exact int64, and each mean is ONE IEEE division
    //    of exact operands — bit parity with no rounding. Scale: one
    //    user-keyed rollup, rank window + final agg both on the |user·days|
    //    rollup, raw events never shuffle twice. --
    "q_trimmed_mean" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
            col("value").cast(DecimalType(18, 2)).as("v"))
          .groupBy(col("user_id"), col("day"))
          .agg((sum(col("v")) * 100).cast("long").as("mv"))
        val wr = Window.partitionBy(col("user_id")).orderBy(col("mv"), col("day"))
        val wu = Window.partitionBy(col("user_id"))
        val kept = col("rn") > col("k") && col("rn") <= col("nd") - col("k")
        daily
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("nd", count(lit(1)).over(wu))
          .withColumn("k", expr("nd div 10"))
          .groupBy(col("user_id"))
          .agg(max(col("nd")).as("n_days"), max(col("k")).as("n_trim"),
            sum(col("mv")).as("sum_all"),
            sum(when(kept, col("mv")).otherwise(0L)).as("sum_kept"),
            sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
          .select(col("user_id"), col("n_days"), col("n_trim"), col("n_kept"),
            (col("sum_kept").cast("double") / col("n_kept")).as("trimmed_mean_cents"),
            (col("sum_all").cast("double") / col("n_days")).as("mean_cents"))
          .orderBy("user_id")
      },
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS mv
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, mv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mv, day) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nd
        |  FROM daily),
        |a AS (
        |  SELECT user_id,
        |    max(nd)::BIGINT AS n_days, max(nd // 10)::BIGINT AS n_trim,
        |    sum(mv)::BIGINT AS sum_all,
        |    sum(CASE WHEN rn > nd // 10 AND rn <= nd - nd // 10 THEN mv ELSE 0 END)::BIGINT AS sum_kept,
        |    sum(CASE WHEN rn > nd // 10 AND rn <= nd - nd // 10 THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |  FROM r GROUP BY 1)
        |SELECT user_id, n_days, n_trim, n_kept,
        |  CAST(sum_kept AS DOUBLE) / n_kept AS trimmed_mean_cents,
        |  CAST(sum_all AS DOUBLE) / n_days AS mean_cents
        |FROM a ORDER BY user_id""".stripMargin),

    // -- 10% WINSORIZED mean per user (r15): the clamp-the-tails twin of
    //    q_trimmed_mean — instead of DROPPING the k = n div 10 extreme
    //    daily totals per tail, they are REPLACED by the nearest kept
    //    order statistics (x_(k+1) / x_(n−k)), so n stays the divisor and
    //    the estimator keeps full sample weight while still bounding any
    //    single day's influence. Same rank machinery (the window key is
    //    user_id — high cardinality, no low-cardinality serialization);
    //    mean = (Σ_kept + k·x_(k+1) + k·x_(n−k)) / n, all int64 until ONE
    //    IEEE division. --
    "q_winsorized_mean" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
            col("value").cast(DecimalType(18, 2)).as("v"))
          .groupBy(col("user_id"), col("day"))
          .agg((sum(col("v")) * 100).cast("long").as("mv"))
        val wr = Window.partitionBy(col("user_id")).orderBy(col("mv"), col("day"))
        val wu = Window.partitionBy(col("user_id"))
        val kept = col("rn") > col("k") && col("rn") <= col("nd") - col("k")
        daily
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("nd", count(lit(1)).over(wu))
          .withColumn("k", expr("nd div 10"))
          .groupBy(col("user_id"))
          .agg(max(col("nd")).as("n_days"), max(col("k")).as("n_clamped"),
            sum(when(kept, col("mv")).otherwise(0L)).as("sum_kept"),
            max(when(col("rn") === col("k") + 1, col("mv"))).as("v_lo"),
            max(when(col("rn") === col("nd") - col("k"), col("mv"))).as("v_hi"),
            sum(col("mv")).as("sum_all"))
          .select(col("user_id"), col("n_days"), col("n_clamped"),
            col("v_lo"), col("v_hi"),
            ((col("sum_kept") + col("n_clamped") * col("v_lo") +
              col("n_clamped") * col("v_hi")).cast("double") / col("n_days"))
              .as("win_mean_cents"),
            (col("sum_all").cast("double") / col("n_days")).as("mean_cents"))
          .orderBy("user_id")
      },
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS mv
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, mv,
        |    row_number() OVER (PARTITION BY user_id ORDER BY mv, day) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nd
        |  FROM daily),
        |a AS (
        |  SELECT user_id,
        |    max(nd)::BIGINT AS n_days, max(nd // 10)::BIGINT AS n_clamped,
        |    sum(CASE WHEN rn > nd // 10 AND rn <= nd - nd // 10 THEN mv ELSE 0 END)::BIGINT AS sum_kept,
        |    max(CASE WHEN rn = nd // 10 + 1 THEN mv END)::BIGINT AS v_lo,
        |    max(CASE WHEN rn = nd - nd // 10 THEN mv END)::BIGINT AS v_hi,
        |    sum(mv)::BIGINT AS sum_all
        |  FROM r GROUP BY 1)
        |SELECT user_id, n_days, n_clamped, v_lo, v_hi,
        |  CAST(sum_kept + n_clamped * v_lo + n_clamped * v_hi AS DOUBLE) / n_days AS win_mean_cents,
        |  CAST(sum_all AS DOUBLE) / n_days AS mean_cents
        |FROM a ORDER BY user_id""".stripMargin),

    "q_mad_outliers" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
            col("value").cast("decimal(18,2)").as("v"))
          .groupBy(col("user_id"), col("day"))
          .agg(sum(col("v")).as("x"))
          .select(col("user_id"), col("day"), (col("x") * 100).cast("long").as("mv"))
        val med = daily.groupBy("user_id")
          .agg(percentile(col("mv"), lit(0.5)).as("med"))
        val dev = daily.join(med, "user_id")
          .select(col("user_id"), col("day"), col("mv"), col("med"),
            abs(col("mv").cast("double") - col("med")).as("adev"))
        val mad = dev.groupBy("user_id")
          .agg(percentile(col("adev"), lit(0.5)).as("mad"))
        dev.join(mad, "user_id")
          .where(col("adev") > lit(3.0) * col("mad"))
          .select(col("user_id"), col("day"), col("mv"), col("med"), col("mad"))
          .orderBy("user_id", "day")
      },
      """WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, day, CAST(x * 100 AS BIGINT) AS mv FROM daily),
        |med AS (SELECT user_id, quantile_cont(mv, 0.5) AS med FROM m GROUP BY 1),
        |dev AS (SELECT m.user_id, m.day, m.mv, med.med,
        |    abs(CAST(m.mv AS DOUBLE) - med.med) AS adev
        |  FROM m JOIN med USING (user_id)),
        |mad AS (SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT dev.user_id, dev.day, dev.mv, dev.med, mad.mad
        |FROM dev JOIN mad USING (user_id)
        |WHERE dev.adev > 3.0 * mad.mad
        |ORDER BY user_id, day""".stripMargin),

    // -- differentially-private count release (r14): the privacy-release
    //    EXECUTION primitive next to the k-anonymity / l-diversity AUDITS
    //    — per-lang document counts with Laplace(sensitivity/ε) noise,
    //    ε = 1, sensitivity 1 (each document contributes one count).
    //    Noise by inverse-CDF: u from the md5-60 of a salt+key (52
    //    mantissa bits, +0.5 so u ∈ (0,1) strictly — no ln(0) pole;
    //    m/2⁵² and u−0.5 are EXACT double steps), noise =
    //    −sign(u−½)·ln(1−2|u−½|). The hash-derived noise makes the
    //    release bit-replayable by the oracle — the same trick as every
    //    sketch in this repo; a production deployment swaps the pinned
    //    salt for a secret per-release salt and the mechanism (and this
    //    plan) is unchanged. Scale: one partial-agg pass; noise is a
    //    per-group projection, reduce ∝ |langs|. --
    "q_dp_release" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val two52 = 4503599627370496L
        val g = Tables.documents(s, d).groupBy("lang")
          .agg(count(lit(1)).as("n"))
        val m = pmod(md5Hash60(concat(lit("dp1_"), col("lang"))), lit(two52))
        val u = (m.cast("double") + lit(0.5)) / lit(two52.toDouble)
        val noise = -signum(u - lit(0.5)) *
          log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
        g.select(col("lang"), lit(1.0).as("epsilon"),
            round(col("n").cast("double") + noise, 6).as("noisy_n"))
          .orderBy("lang")
      },
      """WITH g AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
        |h AS (SELECT lang, n,
        |    (('0x' || substr(md5('dp1_' || lang), 1, 15))::BIGINT
        |      % 4503599627370496) AS m
        |  FROM g),
        |u AS (SELECT lang, n,
        |    (CAST(m AS DOUBLE) + 0.5) / 4503599627370496.0 AS u FROM h)
        |SELECT lang, 1.0::DOUBLE AS epsilon,
        |  round(CAST(n AS DOUBLE)
        |    + (-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS noisy_n
        |FROM u ORDER BY lang""".stripMargin),

    "q_anomaly" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
            col("value").cast("decimal(18,2)").as("v"))
          .groupBy(col("user_id"), col("day"))
          .agg(sum(col("v")).as("x"))
          .select(col("user_id"), col("day"), col("x"),
            (col("x") * 100).cast("long").as("mv"))
        val w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("mv")).over(w))
          .withColumn("sxx", sum(col("mv") * col("mv")).over(w))
          .select(col("user_id"), col("day"),
            col("x").cast("double").as("day_sum"), col("n").as("n_window"),
            (col("n") >= 4 &&
              (col("n") * col("mv") - col("sx")) * (col("n") * col("mv") - col("sx"))
                > (col("n") * col("sxx") - col("sx") * col("sx")) * 4)
              .as("is_anomaly"))
          .orderBy("user_id", "day")
      },
      """WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT *, CAST(x * 100 AS BIGINT) AS mv FROM daily),
        |w AS (SELECT *, count(*) OVER win AS n,
        |    CAST(SUM(mv) OVER win AS BIGINT) AS sx,
        |    CAST(SUM(mv * mv) OVER win AS BIGINT) AS sxx
        |  FROM m
        |  WINDOW win AS (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day, CAST(x AS DOUBLE) AS day_sum, n::BIGINT AS n_window,
        |  (n >= 4 AND (n * mv - sx) * (n * mv - sx) > (n * sxx - sx * sx) * 4)
        |    AS is_anomaly
        |FROM w ORDER BY user_id, day""".stripMargin),

    // -- Benford first-digit audit (the fraud/synthetic-data smell test a
    //    DQ pass runs over financial-looking columns): first significant
    //    digit of each price in exact value-cents (×100 + half-away round
    //    — identical doubles→int64 in both engines), extracted by the
    //    firstDigit codegen kernel (pure integer divisions — never float
    //    log10, whose libm rounding could flip a power-of-ten boundary;
    //    the oracle's int64→string route is a THIRD formulation that must
    //    agree). Expected Benford
    //    mass ships as the SAME 10-dp literal table on both sides, so the
    //    only float op is one n/N division per digit. One scan + a
    //    9-group aggregate — nothing here grows past the digit alphabet. --
    "q_benford" -> Q(
      (s, d) => {
        import s.implicits._
        GraftFunctions.register(s)
        val expected = broadcast(Seq(
          (1L, 0.3010299957), (2L, 0.1760912591), (3L, 0.1249387366),
          (4L, 0.0969100130), (5L, 0.0791812460), (6L, 0.0669467896),
          (7L, 0.0579919470), (8L, 0.0511525224), (9L, 0.0457574906))
          .toDF("digit", "expected"))
        // floor(x+0.5) == round() for positive integer-cents data, minus
        // Spark Round's per-row BigDecimal allocation (see
        // q_weighted_median). Spelled as an explicit floor() — the
        // previous double→long CAST truncates toward zero, which only
        // coincides with floor for x ≥ 0; floor keeps the intent if a
        // schema ever carries negative amounts (they'd still diverge
        // from the oracle's half-away-from-zero round(), but the > 0
        // gate below excludes them from this digit audit entirely).
        val digits = Tables.lineitem(s, d)
          .select(floor(col("l_extendedprice") * 100 + 0.5).as("cents"))
          .where(col("cents") > 0)
          .select(GraftFunctions.firstDigit(col("cents")).as("digit"))
        val n = digits.agg(count(lit(1)).as("n_total"))
        digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(n))
          .join(expected, "digit")
          .select(col("digit"), col("n"),
            (col("n").cast("double") / col("n_total")).as("observed"),
            col("expected"))
          .orderBy("digit")
      },
      """WITH exp(digit, expected) AS (VALUES
        |  (1, 0.3010299957), (2, 0.1760912591), (3, 0.1249387366),
        |  (4, 0.0969100130), (5, 0.0791812460), (6, 0.0669467896),
        |  (7, 0.0579919470), (8, 0.0511525224), (9, 0.0457574906)),
        |digits AS (SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM lineitem WHERE round(l_extendedprice * 100, 0) > 0),
        |n AS (SELECT count(*)::BIGINT AS n_total FROM digits)
        |SELECT d.digit::BIGINT AS digit, count(*)::BIGINT AS n,
        |  count(*)::DOUBLE / any_value(n_total) AS observed,
        |  any_value(e.expected) AS expected
        |FROM digits d CROSS JOIN n JOIN exp e ON e.digit = d.digit
        |GROUP BY d.digit ORDER BY digit""".stripMargin)
  )
}
