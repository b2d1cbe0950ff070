package graft.operators

import graft.core.{Norm, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational extension surface (SURVEY.md §7.2 step 3): the reference has
  * none of these (§2.4) — they are capability extensions expressed purely on
  * stock Catalyst operators, designed for a 1000-executor cluster:
  *
  *   - dimension joins are explicitly `broadcast()` (region/nation/customer/
  *     part are tiny relative to the fact tables at any scale factor);
  *   - fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  *     let AQE pick shuffle-hash vs sort-merge and re-split skew;
  *   - aggregations are partial (map-side combine) by construction;
  *   - window functions partition on high-cardinality keys (suppkey,
  *     custkey), never a global single-partition window.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)

  /** Exact revenue: both factors cast to decimal BEFORE multiplying — a
    * double product rounded to decimal differs between engines in the last
    * cent; decimal×decimal is exact and engine-independent. */
  private def revenueCol = sum(col("l_extendedprice").cast(dec) *
    (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("double")
  private val revenue =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  private val bucketedCache = new graft.core.SessionCache[Boolean]

  /** ABSOLUTE path under target/ for bucketed-table data: a relative
    * `path` option resolves against the session WAREHOUSE dir, which for
    * a default session is ./spark-warehouse — an untracked repo-root
    * directory the round's auto-commit would then swallow (r12: caught as
    * a stray 704K spark-warehouse/ after the first run). */
  private def bucketPath(name: String): String =
    new java.io.File(s"target/bucketed_q/$name").getAbsolutePath

  /** Catalog table names for the co-bucketed pair, discriminated by the
    * dataset dir the same way bucketPath already is: the cache below is
    * keyed per (session, dir), so with session-GLOBAL table names a
    * dir-A → dir-B → dir-A sequence would cache-hit for A on the third
    * call while the catalog tables still held B's data (r12 advice). */
  private def bucketedNames(d: String): (String, String) = {
    val h = math.abs(d.hashCode)
    (s"graft_li_bucketed_$h", s"graft_o_bucketed_$h")
  }

  /** Create the co-bucketed lineitem/orders tables once per (session,
    * dir): 8 buckets on the join key, sorted within buckets, data under
    * the (gitignored, ephemeral) `target/` path — at 100 TB this write
    * is the one-time layout investment that removes the fact-fact
    * shuffle from EVERY later join on the key (BucketingSpec proves the
    * joint read is exchange-free). */
  private def ensureBucketed(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    bucketedCache.getOrElseUpdate(s, s"bucketed:$d") {
      val (liName, oName) = bucketedNames(d)
      s.conf.set("spark.sql.sources.bucketing.enabled", "true")
      // bucket count = the session's parallelism, NOT a fixed dial: each
      // bucket is one task in the shuffle-free join, so a fixed 8 caps
      // join parallelism at 8 regardless of data (measured: 5.7 s at the
      // x64 rung vs sub-second shapes). At 100 TB the same rule applies
      // with cluster parallelism (thousands of buckets).
      val buckets = s.sessionState.conf.numShufflePartitions
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .option("path", bucketPath(s"li_${math.abs(d.hashCode)}"))
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .option("path", bucketPath(s"o_${math.abs(d.hashCode)}"))
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oName)
      true
    }

  val all: Map[String, Q] = Map(

    // -- co-bucketed fact-fact join: the same revenue-by-priority answer
    //    as a plain join (which IS the oracle), computed from the
    //    bucketed layout so the join reads shuffle-free (plan property
    //    locked by BucketingSpec; this row locks the CORRECTNESS of the
    //    bucketed write→read round trip under the driver gate). --
    "q_join_bucketed" -> Q(
      (s, d) => {
        ensureBucketed(s, d)
        val (liName, oName) = bucketedNames(d)
        s.table(liName)
          .join(s.table(oName),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), revenueCol.as("revenue"))
          .orderBy("o_orderpriority")
      },
      s"""SELECT o_orderpriority, count(*)::BIGINT AS n, $revenue AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    // -- TPC-H Q1-shaped aggregation: partial agg + single shuffle on 4 keys --
    "q1_agg" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Norm.dsum(col("l_quantity")).as("sum_qty"),
          Norm.dsum(col("l_extendedprice")).as("sum_base_price"),
          revenueCol.as("sum_disc_price"),
          Norm.davg(col("l_quantity")).as("avg_qty"),
          Norm.davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         | $revenue AS sum_disc_price,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
         | count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // -- star join: fact ⋈ fact shuffle once, all dims broadcast.
    //    r19 eager aggregation (guide §2.2/§3 — the q_range_join move):
    //    revenue and n_orders both decompose over l_orderkey, and
    //    o_orderkey is unique in orders, so lineitem rolls up to ORDER
    //    grain below the joins — the fact-fact join input shrinks
    //    |lineitem| → |orders| (~4×), the joined rows carry one decimal
    //    partial instead of two double columns, and countDistinct
    //    becomes a plain count(*) (each orderkey appears once post-
    //    rollup), deleting the distinct-aggregate's extra (r,n,okey)
    //    exchange. Exact: decimal partial sums are associative; the
    //    rollup exchange replaces (not adds to) the join-side exchange
    //    because the join reuses its hash partitioning. --
    "q_join_star" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        val liAgg = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev_part"))
        liAgg.join(o, col("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum(col("rev_part")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("r_name", "n_name")
      },
      s"""SELECT r_name, n_name, $revenue AS revenue,
         | count(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    // -- broadcast dim join: lineitem ⋈ part by brand --
    "q_join_part" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(Norm.dsum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // -- TPC-H Q5 shape: 6-table join (2 fact-fact + co-nation supplier
    //    condition + 2 broadcast dims) — the join-ordering/strategy
    //    showcase: Catalyst reorders, dims broadcast, fact joins shuffle
    //    once each on their keys, AQE re-splits skew at runtime --
    "q_tpch_q5" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d); val su = Tables.supplier(s, d)
        val n = Tables.nation(s, d); val r = Tables.region(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .where(r("r_name") === "ASIA" &&
            o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            o("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(n("n_name"))
          .agg(revenueCol.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      s"""SELECT n_name, $revenue AS revenue, count(*) AS n_items
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // -- TPC-H Q10 shape: returned-item revenue per customer for a
    //    quarter, top 20 — join + partial agg + TakeOrdered (per-partition
    //    heaps, never a global sort) --
    "q_tpch_q10" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d); val n = Tables.nation(s, d)
        li.where(col("l_returnflag") === "R")
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .where(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            o("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
          .agg(revenueCol.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
          .orderBy("c_custkey")
      },
      s"""SELECT c_custkey, c_name, n_name, revenue, n_items FROM (
         |  SELECT c_custkey, c_name, n_name, $revenue AS revenue,
         |         count(*) AS n_items
         |  FROM lineitem
         |   JOIN orders ON l_orderkey = o_orderkey
         |   JOIN customer ON o_custkey = c_custkey
         |   JOIN nation ON c_nationkey = n_nationkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1996-04-01'
         |  GROUP BY c_custkey, c_name, n_name
         |  ORDER BY revenue DESC, c_custkey LIMIT 20)
         |ORDER BY c_custkey""".stripMargin),

    // -- TPC-H Q1 shape (the pricing summary — the canonical scan+agg):
    //    one pass over lineitem with map-side partial aggregation; all
    //    money sums in DECIMAL(18,2) (exact, order-free), averages as one
    //    double division of exact operands (single IEEE op, bit-equal
    //    across engines — never the engines' own AVG, whose accumulation
    //    order differs). Four output groups regardless of scale: the
    //    reduce side is constant-size at 100 TB. --
    "q_tpch_q1" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        val disc = col("l_discount").cast(dec)
        val price = col("l_extendedprice").cast(dec)
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(price * (lit(1).cast(dec) - disc)).cast("double").as("sum_disc_price"),
            sum(price * (lit(1).cast(dec) - disc) *
              (lit(1).cast(dec) + col("l_tax").cast(dec))).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price") / col("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  count(*) AS count_order,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // -- TPC-H Q6 shape (the forecasting-revenue-change scan): the
    //    predicate-pushdown showcase — every filter reaches the parquet
    //    reader (PushedFilters in the plan, locked by TpchShapeSpec), the
    //    scan reads only 4 columns, the aggregate is one exact decimal
    //    sum reduced to a single row. At 100 TB this is the shape that
    //    proves the engine reads what the query needs and nothing else. --
    "q_tpch_q6" -> Q(
      (s, d) => {
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin),

    // -- TPC-H Q19 shape (discounted-revenue, adapted to this dataset's
    //    part columns): the DISJUNCTIVE-predicate join — the equi-key
    //    (l_partkey = p_partkey) is conjunct across all three arms, so
    //    Catalyst extracts it as the join condition and the OR becomes a
    //    post-join residual on the BROADCAST hash join (part is the dim
    //    side; the fact table never shuffles). The shape an optimizer
    //    gets wrong by cartesian-ing the OR; `.explain` shows one
    //    BroadcastHashJoin + residual filter. --
    "q_tpch_q19" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(revenueCol.as("revenue"), count(lit(1)).as("n_items"))
      },
      s"""SELECT $revenue AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // -- TPC-H Q4 shape (order-priority checking, adapted: no
    //    commit/receipt dates in this dataset, so "late" = any line item
    //    shipped > 90 days after the order date): EXISTS becomes a
    //    LEFT-SEMI join with a correlated date predicate riding the
    //    equi-key — one keyed exchange, each order emitted at most once
    //    no matter how many lines are late. Day math on integer
    //    datediff, exact in both engines. --
    "q_tpch_q4" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              datediff(col("l_shipdate").cast("date"),
                col("o_orderdate").cast("date")) > 90,
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND datediff('day', o.o_orderdate::DATE,
        |                             l.l_shipdate::DATE) > 90)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // -- TPC-H Q22 shape (global sales opportunity, recast as churn:
    //    every customer here HAS orders, so "never ordered" is empty —
    //    the live business twin is "no orders since 2001-01-01"):
    //    customers in a nation pool with above-average balance and no
    //    RECENT orders. The threshold compare is CROSS-MULTIPLIED onto
    //    exact decimals (bal·n > Σbal — no float boundary, so the
    //    survivor set is bit-identical in both engines); the stats
    //    aggregate is one row broadcast back over the pool, and the NOT
    //    EXISTS is a left-anti join on the customer key against the
    //    date-filtered (and scan-pushed) orders slice — at scale, ONE
    //    keyed exchange of (custkey)-projected recent orders. --
    "q_tpch_q22" -> Q(
      (s, d) => {
        val pool = Tables.customer(s, d)
          .where(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
          .select(col("c_custkey"), col("c_nationkey"),
            col("c_acctbal").cast(dec).as("bal"))
        val stats = pool.where(col("bal") > 0)
          .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
        val recent = Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        val cand = pool.crossJoin(broadcast(stats))
          .where(col("bal") * col("n") > col("s"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        cand.groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13)),
        |stats AS (SELECT SUM(bal) AS s, count(*) AS n
        |          FROM pool WHERE bal > 0)
        |SELECT c_nationkey, count(*)::BIGINT AS numcust,
        |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM pool p, stats
        |WHERE p.bal * stats.n > stats.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = p.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // -- TPC-H Q7 shape (volume shipping between two nations): BOTH
    //    dimension sides are nation-filtered BEFORE touching a fact table
    //    (supplier and customer each shrink to 2/25), so the one fact-fact
    //    shuffle (lineitem ⋈ orders on the order key) moves only the
    //    supplier-nation-matching ~8% of line items. The asymmetric-pair
    //    predicate is a post-join residual on already-tiny dims. Year via
    //    integer `year()` — exact day math in both engines. --
    "q_tpch_q7" -> Q(
      (s, d) => {
        val n = Tables.nation(s, d)
        val pair = Seq("NATION_1", "NATION_2")
        val su = Tables.supplier(s, d)
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .where(col("n_name").isin(pair: _*))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cu = Tables.customer(s, d)
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .where(col("n_name").isin(pair: _*))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
          .where(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(revenueCol.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      s"""SELECT supp_nation, cust_nation, l_year, $revenue AS revenue,
         |       count(*) AS n_items
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |             l_extendedprice, l_discount
         |      FROM lineitem
         |       JOIN supplier ON l_suppkey = s_suppkey
         |       JOIN orders ON l_orderkey = o_orderkey
         |       JOIN customer ON o_custkey = c_custkey
         |       JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |       JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |      WHERE n1.n_name IN ('NATION_1','NATION_2')
         |        AND n2.n_name IN ('NATION_1','NATION_2')
         |        AND n1.n_name <> n2.n_name
         |        AND l_shipdate >= TIMESTAMP '1996-01-01'
         |        AND l_shipdate < TIMESTAMP '1998-01-01')
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // -- TPC-H Q13 shape (customer order-count distribution): the
    //    zero-inclusive outer-join + DOUBLE aggregation. Orders are
    //    pre-aggregated to per-customer counts BEFORE the outer join —
    //    the join's right side shrinks from |orders| to ≤|customers|
    //    rows, so at 100 TB the only orders-proportional exchange is the
    //    map-combined count; the second aggregation reduces to
    //    |distinct counts| rows. Zero-order customers surface via
    //    coalesce(cnt, 0) off the left join. --
    "q_tpch_q13" -> Q(
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .where(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"))
        Tables.customer(s, d).select(col("c_custkey"))
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      """SELECT c_count, count(*)::BIGINT AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey
        |       AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // -- TPC-H Q14 shape (promo revenue share): month-sliced scan joins
    //    the BROADCAST part dimension; promo vs total revenue are two
    //    conditional DECIMAL sums out of the same single pass (exact,
    //    order-free), and the share is ONE IEEE division of the two
    //    exact operands — bit-equal across engines, no avg() drift. --
    "q_tpch_q14" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        val rev = col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec))
        li.join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(dec)))
              .cast("double").as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"))
          .withColumn("promo_share",
            lit(100.0) * col("promo_revenue") / col("total_revenue"))
      },
      """SELECT promo_revenue, total_revenue,
        |       100.0 * promo_revenue / total_revenue AS promo_share
        |FROM (SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |       ELSE 0 END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')""".stripMargin),

    // -- TPC-H Q15 shape (top revenue supplier): per-supplier quarterly
    //    revenue from ONE map-combined aggregate (reduce ∝ |suppliers|),
    //    the global max re-broadcast as a 1-row aggregate, and the
    //    equality filter done on the EXACT decimal sums (a double max
    //    could tie-break differently between engines in the last ulp;
    //    decimals cannot). Supplier names arrive by broadcast at the
    //    end, on the ≤1-row survivor set. --
    "q_tpch_q15" -> Q(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev_dec"))
        val top = rev.agg(max(col("rev_dec")).as("max_rev"))
        rev.crossJoin(broadcast(top))
          .where(col("rev_dec") === col("max_rev"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("rev_dec").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin),

    // -- TPC-H Q17 shape (small-quantity-order revenue): the correlated
    //    per-part average. The brand slice broadcasts into the fact scan
    //    FIRST (one pass, ~1/25 of line items survive); per-part
    //    quantity stats aggregate that slice (reduce ∝ |brand parts|)
    //    and broadcast straight back over it. The `qty < 0.2·avg`
    //    compare is CROSS-MULTIPLIED onto int64 (5·qty·cnt < Σqty) — no
    //    float boundary, survivor set bit-identical in both engines. --
    "q_tpch_q17" -> Q(
      (s, d) => {
        val brandParts = Tables.part(s, d)
          .where(col("p_brand") === "Brand#13").select(col("p_partkey"))
        val liB = Tables.lineitem(s, d)
          .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
            col("l_extendedprice").cast(dec).as("price"))
        val stats = liB.groupBy(col("l_partkey").as("sp"))
          .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt_qty"))
        liB.join(broadcast(stats), col("l_partkey") === col("sp"))
          .where(lit(5L) * col("qty") * col("cnt_qty") < col("sum_qty"))
          .agg((sum(col("price")).cast("double") / 7.0).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      },
      """WITH lib AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |stats AS (
        |  SELECT l_partkey AS sp, SUM(qty)::BIGINT AS sum_qty,
        |         count(*)::BIGINT AS cnt_qty
        |  FROM lib GROUP BY l_partkey)
        |SELECT CAST(SUM(price) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*)::BIGINT AS n_items
        |FROM lib JOIN stats ON l_partkey = sp
        |WHERE 5 * qty * cnt_qty < sum_qty""".stripMargin),

    // -- TPC-H Q8 shape (national market share): the 7-table join where
    //    EVERY dimension leg broadcasts — ECONOMY parts, supplier→nation
    //    (supp_nation), customer→nation→region (the AMERICA-region cust
    //    keys) — so the only real exchange is the one fact-fact
    //    lineitem⋈orders shuffle on the order key. The share is two
    //    conditional DECIMAL sums out of the same pass (exact,
    //    order-free) divided ONCE in IEEE — the same no-avg()-drift
    //    discipline as Q14. At 100 TB the dims stay broadcast-sized by
    //    construction (25 nations, 5 regions, |part|·1/6, |cust|·1/5). --
    "q_tpch_q8" -> Q(
      (s, d) => {
        val n = Tables.nation(s, d)
        val pEco = Tables.part(s, d).where(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))
        val su = Tables.supplier(s, d)
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cuAmerica = Tables.customer(s, d)
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
              .where(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
        val o = Tables.orders(s, d)
          .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(cuAmerica), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"))
        val vol = col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec))
        Tables.lineitem(s, d)
          .join(broadcast(pEco), col("l_partkey") === col("p_partkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_3", vol)
              .otherwise(lit(0).cast(dec))).cast("double") /
              sum(vol).cast("double")).as("mkt_share"),
            count(lit(1)).as("n_items"))
          .orderBy("o_year")
      },
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
        |  count(*) AS n_items
        |FROM (SELECT o_orderdate, n2.n_name AS supp_nation,
        |             CAST(l_extendedprice AS DECIMAL(18,2)) *
        |               (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
        |      FROM lineitem
        |       JOIN part ON l_partkey = p_partkey
        |       JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN orders ON l_orderkey = o_orderkey
        |       JOIN customer ON o_custkey = c_custkey
        |       JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |       JOIN region ON n1.n_regionkey = r_regionkey
        |       JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |        AND o_orderdate >= TIMESTAMP '1995-01-01'
        |        AND o_orderdate < TIMESTAMP '1997-01-01')
        |GROUP BY 1 ORDER BY o_year""".stripMargin),

    // -- TPC-H Q9 shape (product-type profit by nation × year): the
    //    harness schema has no partsupp, so profit is the revenue term
    //    only (the ps_supplycost·l_quantity subtrahend has no source
    //    table) — the JOIN SHAPE is the point: a name-sliced part dim
    //    and the supplier→nation leg broadcast into the lineitem scan,
    //    then ONE fact-fact shuffle against orders for the year axis,
    //    partial aggs on (nation, year). DECIMAL-exact sums, desc-year
    //    TPC-H ordering. --
    "q_tpch_q9" -> Q(
      (s, d) => {
        val pGear = Tables.part(s, d)
          .where(col("p_name").contains("gear")).select(col("p_partkey"))
        val su = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        Tables.lineitem(s, d)
          .join(broadcast(pGear), col("l_partkey") === col("p_partkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(revenueCol.as("sum_profit"), count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      s"""SELECT nation, o_year, $revenue AS sum_profit, count(*) AS n_items
         |FROM (SELECT n_name AS nation,
         |             CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |             l_extendedprice, l_discount
         |      FROM lineitem
         |       JOIN part ON l_partkey = p_partkey
         |       JOIN supplier ON l_suppkey = s_suppkey
         |       JOIN orders ON l_orderkey = o_orderkey
         |       JOIN nation ON s_nationkey = n_nationkey
         |      WHERE p_name LIKE '%gear%')
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin),

    // -- TPC-H Q3 shape (shipping priority): segment-filtered customer
    //    BROADCASTS into orders (dimension side is the small one), the
    //    fact-fact lineitem⋈orders shuffles once on the order key, top-10
    //    via TakeOrderedAndProject (per-partition heaps — no global
    //    sort at any scale). --
    "q_tpch_q3" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .where(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(li("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
          .agg(revenueCol.as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .orderBy("l_orderkey")
      },
      s"""SELECT l_orderkey, revenue, o_date, o_orderpriority FROM (
         |  SELECT l_orderkey, $revenue AS revenue,
         |         strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
         |  FROM lineitem
         |   JOIN orders ON l_orderkey = o_orderkey
         |   JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-06-01'
         |    AND l_shipdate > TIMESTAMP '1998-06-01'
         |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |  ORDER BY revenue DESC, l_orderkey LIMIT 10)
         |ORDER BY l_orderkey""".stripMargin),

    // -- TPC-H Q18 shape (large-volume customers): the HAVING subquery is
    //    ONE orderkey-keyed partial aggregation over lineitem (map-side
    //    combine shrinks it to one row per order before the exchange);
    //    qualifying orders are a vanishing fraction, so the join back to
    //    orders/customer is AQE-broadcastable at any scale. Quantity sums
    //    in DECIMAL — exact, so the >300 gate cuts identically on both
    //    engines. --
    "q_tpch_q18" -> Q(
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(dec)).as("__qty"))
          .where(col("__qty") > 300)
          .select(col("l_orderkey").as("__ok"), col("__qty").cast("double").as("total_qty"))
        val o = Tables.orders(s, d); val c = Tables.customer(s, d)
        o.join(big, o("o_orderkey") === big("__ok"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(100)
          .orderBy("o_orderkey")
      },
      s"""SELECT c_custkey, c_name, o_orderkey, o_date, o_totalprice, total_qty FROM (
         |  SELECT c_custkey, c_name, o_orderkey,
         |         strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
         |         CAST(q.qty AS DOUBLE) AS total_qty
         |  FROM orders
         |   JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
         |         FROM lineitem GROUP BY l_orderkey HAVING qty > 300) q
         |     ON o_orderkey = q.l_orderkey
         |   JOIN customer ON o_custkey = c_custkey
         |  ORDER BY total_qty DESC, o_orderkey LIMIT 100)
         |ORDER BY o_orderkey""".stripMargin),

    // -- lateral array explode with position (the unnest-with-ordinality
    //    parity op): every 25th embedding vector flattens to (vec_id,
    //    pos, val) rows. Pure per-row generator — no shuffle; the float
    //    elements pass through unchanged (both engines read the same
    //    parquet FLOAT and cast to double identically). --
    "q_explode" -> Q(
      (s, d) => {
        Tables.embeddings(s, d)
          .where(col("vec_id") % 25 === 0)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            col("col").cast("double").as("val"))
          .orderBy("vec_id", "pos")
      },
      s"""SELECT vec_id, u.i - 1 AS pos, CAST(u.v AS DOUBLE) AS val
         |FROM (SELECT vec_id, unnest(embedding) AS v,
         |             generate_subscripts(embedding, 1) AS i
         |      FROM embeddings WHERE vec_id % 25 = 0) u(vec_id, v, i)
         |ORDER BY vec_id, pos""".stripMargin),

    // -- interval-OVERLAP join (see [[RangeJoin.intervalOverlap]]): two
    //    sampled order populations carry 20- and 25-day windows; every
    //    overlapping (a, b) window pair is found via double-sided bin
    //    replication + exact predicate, each pair emitted once by
    //    left-edge bin attribution (no post-join distinct). The naive
    //    formulation is a BroadcastNestedLoopJoin — dead at scale; this
    //    is the standard equi-key rewrite every real range-join engine
    //    uses. --
    "q_interval_overlap" -> Q(
      (s, d) => {
        val day = (c: org.apache.spark.sql.Column) =>
          datediff(c.cast("date"), lit("1970-01-01")).cast("long")
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), day(col("o_orderdate")).as("s_day"))
        val a = base.where(col("o_orderkey") % 200 === 0)
          .select(col("o_orderkey").as("a_key"), col("s_day").as("a_s"),
            (col("s_day") + 20).as("a_e"))
        val b = base.where(col("o_orderkey") % 200 === 1)
          .select(col("o_orderkey").as("b_key"), col("s_day").as("b_s"),
            (col("s_day") + 25).as("b_e"))
        RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 32)
          .select(col("a_key"), col("b_key"),
            (least(col("a_e"), col("b_e")) -
              greatest(col("a_s"), col("b_s")) + 1).as("overlap_days"))
          .orderBy("a_key", "b_key")
      },
      """WITH base AS (SELECT o_orderkey,
        |    datediff('day', DATE '1970-01-01', o_orderdate::DATE)::BIGINT AS s_day
        |  FROM orders),
        |a AS (SELECT o_orderkey AS a_key, s_day AS a_s, s_day + 20 AS a_e
        |      FROM base WHERE o_orderkey % 200 = 0),
        |b AS (SELECT o_orderkey AS b_key, s_day AS b_s, s_day + 25 AS b_e
        |      FROM base WHERE o_orderkey % 200 = 1)
        |SELECT a_key, b_key, least(a_e, b_e) - greatest(a_s, b_s) + 1 AS overlap_days
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_key, b_key""".stripMargin),

    // -- range (interval-containment) join: shipments landing inside a
    //    30-day window after each sampled order's date. Bin-replicated
    //    equi-join (RangeJoin) — the naive BETWEEN predicate would force a
    //    BroadcastNestedLoopJoin, O(|points|·|intervals|); binning turns it
    //    into a broadcastable equi-join + exact residual filter. Day
    //    numbers via NTZ-timestamp → date → days-since-epoch: no timezone
    //    enters on either engine.
    //
    //    EAGER AGGREGATION through the range join (r18): the query wants
    //    only per-interval count+sum, both decomposable over the range
    //    dimension — so points roll up to DAY grain before the join. The
    //    join then meets |distinct days| (~2.4k) rollup rows instead of
    //    |lineitem| (~600k at sf0.1, 7.8M true pairs / 16M bin candidates
    //    measured) — a ~240× cut in join work, and the rollup stays
    //    O(|days|) no matter how many facts a day holds, which is the
    //    100 TB property: growth densifies days, the joined frame doesn't
    //    grow at all. Exactness: count splits into a sum of per-day
    //    counts; the decimal(18,2) sum is associative, so summing per-day
    //    decimal sums equals the flat Norm.dsum to the last bit. --
    "q_range_join" -> Q(
      (s, d) => {
        val day = (c: org.apache.spark.sql.Column) =>
          datediff(c.cast("date"), lit("1970-01-01")).cast("long")
        val iv = Tables.orders(s, d)
          .where(col("o_orderkey") % 1000 < 7)
          .select(col("o_orderkey"), day(col("o_orderdate")).as("s_day"))
          .withColumn("e_day", col("s_day") + 30)
        val ptsByDay = Tables.lineitem(s, d)
          .select(day(col("l_shipdate")).as("p_day"), col("l_quantity"))
          .groupBy("p_day")
          .agg(count(lit(1)).as("n_day"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("qty_day"))
        RangeJoin.pointInInterval(ptsByDay, "p_day", iv, "s_day", "e_day", 32)
          .groupBy(col("o_orderkey"))
          .agg(sum(col("n_day")).as("n_ship"),
            sum(col("qty_day")).cast("double").as("sum_qty"))
          .orderBy("o_orderkey")
      },
      """WITH iv AS (
        |  SELECT o_orderkey, datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s_day,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 30 AS e_day
        |  FROM orders WHERE o_orderkey % 1000 < 7),
        |p AS (SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS p_day,
        |             l_quantity FROM lineitem)
        |SELECT o_orderkey, count(*) AS n_ship,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM iv JOIN p ON p.p_day BETWEEN iv.s_day AND iv.e_day
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin),

    // -- KEYED range join: the 100 TB shape (SCALE.md). Sampled events open
    //    a 7-day window; other events of the SAME USER falling inside it are
    //    counted. Join key is (user_id, bin) — per-bin occupancy is bounded
    //    by one user's rows, so when growth adds users (ScaleLadder offsets
    //    user_id per replica) candidate pairs grow LINEARLY, closing the
    //    workload-quadratic growth the unkeyed q_range_join shows when both
    //    sides densify a fixed time axis. Seconds via integer div of the
    //    exact nanos (double division corrupts at 1e18). --
    "q_range_join_keyed" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("sec", expr("ts_ns div 1000000000"))
        val iv = ev.where(col("event_id") % 20 === 0)
          .select(col("event_id").as("iv_id"), col("user_id").as("iv_user"),
            col("sec").as("s_sec"))
          .withColumn("e_sec", col("s_sec") + lit(604800L))
        val pts = ev.select(col("user_id"), col("sec").as("p_sec"), col("value"))
        RangeJoin.pointInIntervalKeyed(
            pts, "p_sec", Seq("user_id"), iv, "s_sec", "e_sec", Seq("iv_user"),
            binWidth = 604800L)
          .groupBy(col("iv_id"))
          .agg(count(lit(1)).as("n_pts"), Norm.dsum(col("value")).as("sum_value"))
          .orderBy("iv_id")
      },
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS sec, value
        |  FROM events),
        |iv AS (SELECT event_id AS iv_id, user_id AS iv_user, sec AS s_sec,
        |              sec + 604800 AS e_sec
        |       FROM ev WHERE event_id % 20 = 0)
        |SELECT iv_id, count(*) AS n_pts,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM iv JOIN ev p
        |  ON p.user_id = iv.iv_user AND p.sec BETWEEN iv.s_sec AND iv.e_sec
        |GROUP BY 1 ORDER BY iv_id""".stripMargin),

    // -- semi / anti joins (EXISTS / NOT EXISTS) --
    "q_join_semi" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),
    "q_join_anti" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // -- outer join with null-extension --
    "q_join_left" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(Norm.dsum(col("o_totalprice")), lit(0.0)).as("total"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    // -- FULL OUTER join with genuine null-extension on BOTH sides (r15):
    //    per-(user, day) purchase rollup vs click rollup — unlike
    //    customer⋈orders (referential integrity leaves the right side
    //    total), the two event slices each have days the other lacks, so
    //    both null-extension paths execute. Coalesced keys, side marker,
    //    zero-defaulted counts; both inputs partial-aggregate BEFORE the
    //    join, so the full-outer shuffles rollup rows, never raw events. --
    "q_join_full" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        def daily(t: String, n: String) = ev.where(col("event_type") === t)
          .groupBy(col("user_id"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as(n))
        daily("purchase", "n_pur")
          .join(daily("click", "n_clk"), Seq("user_id", "day"), "full_outer")
          .select(col("user_id"), Norm.dateStr(col("day")).as("day"),
            coalesce(col("n_pur"), lit(0L)).as("n_pur"),
            coalesce(col("n_clk"), lit(0L)).as("n_clk"),
            when(col("n_pur").isNotNull && col("n_clk").isNotNull, "both")
              .when(col("n_pur").isNotNull, "pur_only")
              .otherwise("clk_only").as("side"))
          .orderBy("user_id", "day")
      },
      """WITH p AS (
        |  SELECT user_id, ts::DATE AS day, count(*)::BIGINT AS n_pur
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, ts::DATE AS day, count(*)::BIGINT AS n_clk
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT coalesce(p.user_id, c.user_id) AS user_id,
        |  strftime(coalesce(p.day, c.day), '%Y-%m-%d') AS day,
        |  coalesce(n_pur, 0) AS n_pur, coalesce(n_clk, 0) AS n_clk,
        |  CASE WHEN p.user_id IS NOT NULL AND c.user_id IS NOT NULL THEN 'both'
        |       WHEN p.user_id IS NOT NULL THEN 'pur_only'
        |       ELSE 'clk_only' END AS side
        |FROM p FULL JOIN c ON p.user_id = c.user_id AND p.day = c.day
        |ORDER BY user_id, day""".stripMargin),

    // -- top-k: global sort + limit (Spark TakeOrderedAndProject) --
    "q_topk" -> Q(
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM
        | (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        |ORDER BY o_orderkey""".stripMargin),

    // -- window: rank within partition (deterministic tiebreak) --
    "q_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),

    // -- window: running sum with an explicit frame --
    "q_window_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .where(col("l_suppkey") <= 2)
          .withColumn("running_qty", sum(col("l_quantity").cast(dec)).over(w).cast("double"))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin),

    // -- window: lag/lead --
    "q_window_lag" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
          .where(col("o_custkey") <= 20)
          .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_key")
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey, o_totalprice, prev_price, next_key FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key
        | FROM orders)
        |WHERE o_custkey <= 20 ORDER BY o_custkey, o_orderkey""".stripMargin),

    // -- distinct --
    "q_distinct" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // -- set operations: union / intersect / except --
    "q_setops" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val a = c.where(col("c_acctbal") > 1000.0).select(col("c_custkey").as("k"))
        val b = c.where(col("c_nationkey") < 10).select(col("c_custkey").as("k"))
        val withOrders = o.select(col("o_custkey").as("k"))
        val big = o.where(col("o_totalprice") > 200000.0).select(col("o_custkey").as("k"))
        a.union(b).distinct()
          .intersect(withOrders)
          .except(big)
          .orderBy("k")
      },
      """(SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000.0
        | UNION
        | SELECT c_custkey AS k FROM customer WHERE c_nationkey < 10)
        |INTERSECT SELECT o_custkey AS k FROM orders
        |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY k""".stripMargin),

    // -- rollup / cube (nulls ordered first to match Spark's asc ordering) --
    "q_rollup" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Norm.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    "q_cube" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // -- exact distinct count (the approx variant is bench/rows-only) --
    "q_count_distinct" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // -- HLL sketch, oracled by its error bound: the estimate is
    //    deterministic for fixed data (fixed hash, no RNG), so "within 5%
    //    of exact" is a stable boolean; the exact counts are cross-engine
    //    checked as values --
    "q_approx_distinct" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // Sketches and exact distincts aggregate SEPARATELY: mixing them
        // in one Aggregate plans the multi-distinct Expand (x3 rows) with
        // the rsd=0.01 HLL++ buffers (~2.7K words each) riding every
        // intermediate row — 8.0 s on sf0.1 vs ~1 s for two clean passes.
        // Both sides stay 1-row outputs, so the crossJoin is free.
        val approx = li.agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
        val exact = li.agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        approx.crossJoin(exact)
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast("double") / col("exact_parts") <= 0.05)
            .as("parts_within_5pct"),
          (abs(col("ao") - col("exact_orders")).cast("double") / col("exact_orders") <= 0.05)
            .as("orders_within_5pct"))
      },
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        | count(DISTINCT l_orderkey) AS exact_orders,
        | TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
        |FROM lineitem""".stripMargin),

    // -- from-scratch HyperLogLog, FULL differential oracle: DuckDB
    //    rebuilds the md5-60 hashes, buckets, bin()-length ranks, register
    //    maxima, the exact integer harmonic sum, and the bias-corrected
    //    estimate — the algorithm is cross-engine checked (vs
    //    q_approx_distinct, where only the builtin sketch's BOUND is) --
    "q_hll_distinct" -> Q(
      (s, d) => {
        val est = HyperLogLog.estimate(
          HyperLogLog.registers(Tables.orders(s, d), "o_custkey"))
        val exact = Tables.orders(s, d)
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        est.crossJoin(exact)
      },
      s"""WITH h AS (
         |  SELECT ('0x' || substr(md5('hll_' || o_custkey::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM orders),
         |parts AS (SELECT h >> 52 AS bucket, h & ((1::BIGINT << 52) - 1) AS low FROM h),
         |rho AS (SELECT bucket,
         |          CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END AS rho
         |        FROM parts),
         |obs AS (SELECT bucket, max(rho) AS mj FROM rho GROUP BY 1),
         |regs AS (
         |  SELECT s.bucket, coalesce(obs.mj, 0) AS mj
         |  FROM (SELECT unnest(range(0, 256)) AS bucket) s LEFT JOIN obs USING (bucket)),
         |agg AS (
         |  SELECT count(*) AS m,
         |    sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END)::BIGINT AS v_empty,
         |    sum(1::BIGINT << (53 - mj)::INT)::BIGINT AS sum_int
         |  FROM regs)
         |SELECT m, v_empty,
         |  round(CASE WHEN v_empty > 0
         |              AND ${HyperLogLog.AlphaMM} / (sum_int / 9007199254740992.0) <= 640.0
         |             THEN 256.0 * ln(256.0 / v_empty)
         |             ELSE ${HyperLogLog.AlphaMM} / (sum_int / 9007199254740992.0) END, 4) AS est,
         |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_distinct
         |FROM agg""".stripMargin),

    // -- scalar string functions --
    "q_scalar_string" -> Q(
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).cast("long").as("len"),
          substring(col("p_name"), 1, 5).as("pre"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
          regexp_replace(col("p_name"), " ", "_").as("und"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          trim(col("p_name")).as("tr"))
        .orderBy("p_partkey"),
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        | CAST(length(p_name) AS BIGINT) AS len, substring(p_name, 1, 5) AS pre,
        | concat_ws('|', p_brand, p_type) AS cat,
        | replace(p_name, ' ', '_') AS und,
        | lpad(p_brand, 12, '*') AS pad, trim(p_name) AS tr
        |FROM part ORDER BY p_partkey""".stripMargin),

    // -- scalar date/time functions --
    "q_scalar_date" -> Q(
      (s, d) => Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          Norm.dateStr(date_trunc("month", col("o_orderdate"))).as("month_start"),
          Norm.dateStr(date_add(col("o_orderdate").cast("date"), 30)).as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // -- scalar math functions (transcendentals rounded: libm vs JVM ulps) --
    "q_scalar_math" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("ab"),
          round(col("l_extendedprice"), 0).as("rnd"),
          floor(col("l_quantity") / 7.0).as("fl"),
          ceil(col("l_quantity") / 7.0).as("ce"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("ln"),
          round(pow(col("l_quantity"), 2), 2).as("p2"),
          (col("l_partkey") % 7).as("md"))
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS ab,
        | round(l_extendedprice, 0) AS rnd,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS fl,
        | CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
        | round(sqrt(l_extendedprice), 6) AS sq,
        | round(ln(l_extendedprice), 6) AS ln,
        | round(pow(l_quantity, 2), 2) AS p2,
        | l_partkey % 7 AS md
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // -- conditional expressions --
    "q_case_expr" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 35, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), Norm.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("bucket"),
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 35 THEN 'mid' ELSE 'high' END AS bucket,
        | count(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin),

    // -- timestamp-range filter + monthly aggregation --
    "q_monthly_rev" -> Q(
      (s, d) => Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(month(col("o_orderdate")).as("m"))
        .agg(Norm.dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
        .orderBy("m"),
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        | count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY m""".stripMargin)
  )
}
