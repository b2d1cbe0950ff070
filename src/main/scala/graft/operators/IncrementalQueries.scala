package graft.operators

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental-maintenance operators (north-star extension, round 13):
  * the two patterns that let a 100 TB deployment answer "what changed?"
  * without rescanning what didn't.
  *
  *   - `q_ivm_agg` — incremental view maintenance for an additive
  *     aggregate: a materialized (group → count, sum) view is advanced by
  *     a change set of inserts (+1) and retractions (−1) as ONE delta
  *     aggregation merged into the base by a co-keyed full-outer join.
  *     The scan cost of an update is |delta|, never |base|. The oracle is
  *     genuinely differential: DuckDB recomputes the post-change state
  *     from scratch over the merged row set — two different computation
  *     paths (incremental vs full recompute) must agree bit-for-bit,
  *     which is the IVM correctness condition itself. Sums ride
  *     DECIMAL(18,2) (exact, order-free) with one final cast to double.
  *   - `q_hll_rollup` — mergeable-sketch rollup: per-(event_type) sparse
  *     HLL registers are built in one scan, then the GLOBAL distinct
  *     count is derived purely by register-wise MAX over those ≤ m-row
  *     sketch tables — no second scan of the events. This is the "sketch
  *     once, roll up anywhere" production pattern: per-shard/day sketches
  *     get unioned across any dimension after the fact. Every hash,
  *     rank, and harmonic-sum step replays in the DuckDB oracle
  *     ([[HyperLogLog]] parity notes), and both rollup levels are
  *     cross-checked against exact distinct counts in the same row.
  *
  * Scale shape: q_ivm_agg moves only group-cardinality rows after the
  * partial aggregations (map-side combined); q_hll_rollup's merge input
  * is ≤ m·|groups| register rows, each a (bucket, max-rank) pair.
  */
object IncrementalQueries {

  private val Cut = "1999-01-01 00:00:00"

  val all: Map[String, Q] = Map(

    // -- incremental aggregate maintenance: base view ⊕ delta. Inserts =
    //    orders on/after the cutoff; retractions = finalized ('F') base
    //    rows being aged out. Groups whose maintained count reaches 0
    //    disappear from the view (the classic IVM deletion rule). --
    "q_ivm_agg" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
        val cut = lit(Cut).cast("timestamp")
        val base = o.where(col("o_orderdate") < cut)
        // the materialized view being maintained (at 100 TB: a stored
        // table, not re-derived — only the delta below is scanned)
        val baseAgg = base.groupBy(col("o_orderpriority")).agg(
          count(lit(1)).as("n0"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev0"))
        // ONE delta relation: +1 inserts, −1 retractions
        val delta = o.where(col("o_orderdate") >= cut)
          .select(col("o_orderpriority"), col("o_totalprice"), lit(1L).as("sign"))
          .unionByName(base.where(col("o_orderstatus") === "F")
            .select(col("o_orderpriority"), col("o_totalprice"), lit(-1L).as("sign")))
        val deltaAgg = delta.groupBy(col("o_orderpriority")).agg(
          sum(col("sign")).as("dn"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)) * col("sign")).as("drev"))
        baseAgg.join(deltaAgg, Seq("o_orderpriority"), "full_outer")
          .select(col("o_orderpriority"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("rev0"), lit(0).cast(DecimalType(18, 2))) +
              coalesce(col("drev"), lit(0).cast(DecimalType(18, 2))))
              .cast("double").as("rev"))
          .where(col("n") > 0)
          .orderBy("o_orderpriority")
      },
      // differential oracle: FULL recompute of the post-change state —
      // base minus retracted 'F' rows plus the inserted tail
      s"""SELECT o_orderpriority,
         | count(*) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         |FROM orders
         |WHERE (o_orderdate < TIMESTAMP '$Cut' AND o_orderstatus <> 'F')
         |   OR o_orderdate >= TIMESTAMP '$Cut'
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- incremental JOIN-view maintenance: the delta rule for a two-sided
    //    change set. The maintained view is agg(orders ⋈ lineitem); when
    //    BOTH sides grow (Δo = orders on/after the cutoff, Δl = line items
    //    shipped on/after it), the view delta is exactly
    //        agg( Δo⋈L  ∪  O⋈Δl  ∪  Δo⋈Δl )
    //    — three delta-proportional joins, each probing a base side by the
    //    join key; the base⋈base term is NEVER recomputed. At 100 TB with
    //    the base tables bucketed on the order key (Sinks), every delta
    //    join co-partitions and the update cost is ∝ |Δ|, not |base|.
    //    Differential oracle: full recompute of the complete join-agg —
    //    the incremental path must agree bit-for-bit (exact decimal sums,
    //    so merge order cannot blur the compare). --
    "q_ivm_join" -> Q(
      (s, d) => {
        val cut = lit(Cut).cast("timestamp")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
            col("l_shipdate"))
        val oB = o.where(col("o_orderdate") < cut)
        val oD = o.where(col("o_orderdate") >= cut)
        val liB = li.where(col("l_shipdate") < cut)
        val liD = li.where(col("l_shipdate") >= cut)
        def joinAgg(os: org.apache.spark.sql.DataFrame,
            ls: org.apache.spark.sql.DataFrame) =
          os.join(ls, col("o_orderkey") === col("l_orderkey"))
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("nn"),
              sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
                (lit(1).cast(DecimalType(18, 2)) -
                  col("l_discount").cast(DecimalType(18, 2)))).as("rr"))
        val baseV = joinAgg(oB, liB)
          .select(col("o_orderpriority"), col("nn").as("n0"), col("rr").as("rev0"))
        // the three delta terms share one aggregation: union BEFORE the
        // group-by so the merge input is a single delta relation
        val deltaV = joinAgg(oD, liB)
          .unionByName(joinAgg(oB, liD))
          .unionByName(joinAgg(oD, liD))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("nn")).as("dn"), sum(col("rr")).as("drev"))
        baseV.join(deltaV, Seq("o_orderpriority"), "full_outer")
          .select(col("o_orderpriority"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("rev0"), lit(0).cast(DecimalType(28, 2))) +
              coalesce(col("drev"), lit(0).cast(DecimalType(28, 2))))
              .cast("double").as("rev"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*)::BIGINT AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- mergeable-sketch rollup: per-event_type HLL registers, global
    //    estimate from register-wise MAX of those sketches (no rescan),
    //    both levels cross-checked against exact distincts. --
    "q_hll_rollup" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val regs = HyperLogLog.registersBy(ev, "user_id", Seq("event_type"))
        val perType = HyperLogLog.estimateBy(regs, Seq("event_type"))
        val global = HyperLogLog.estimateBy(
            HyperLogLog.mergeRegisters(regs, Nil), Nil)
          .select(lit("ALL").as("event_type"), col("est"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
          .unionByName(ev.agg(countDistinct(col("user_id")).as("exact_users"))
            .select(lit("ALL").as("event_type"), col("exact_users")))
        perType.unionByName(global)
          .join(exact, Seq("event_type"))
          .orderBy("event_type")
      },
      s"""WITH h AS (
         |  SELECT event_type,
         |    ('0x' || substr(md5('hll_' || user_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM events),
         |parts AS (SELECT event_type, h >> 52 AS bucket,
         |            h & ((1::BIGINT << 52) - 1) AS low FROM h),
         |rho AS (SELECT event_type, bucket,
         |          CASE WHEN low = 0 THEN 53 ELSE 53 - length(bin(low)) END AS rho
         |        FROM parts),
         |regs AS (SELECT event_type, bucket, max(rho) AS mj FROM rho GROUP BY 1, 2),
         |merged AS (SELECT 'ALL' AS event_type, bucket, max(mj) AS mj
         |           FROM regs GROUP BY 1, 2),
         |lvl AS (SELECT event_type, count(*)::BIGINT AS n_obs,
         |          sum(1::BIGINT << (53 - mj)::INT)::BIGINT AS sum_obs
         |        FROM (SELECT * FROM regs UNION ALL SELECT * FROM merged)
         |        GROUP BY 1),
         |est AS (SELECT event_type,
         |  round(CASE WHEN (256 - n_obs) > 0
         |              AND ${HyperLogLog.AlphaMM} /
         |                ((sum_obs + (256 - n_obs) * (1::BIGINT << 53)) / 9007199254740992.0) <= 640.0
         |             THEN 256.0 * ln(256.0 / (256 - n_obs))
         |             ELSE ${HyperLogLog.AlphaMM} /
         |                ((sum_obs + (256 - n_obs) * (1::BIGINT << 53)) / 9007199254740992.0) END, 4) AS est
         |  FROM lvl),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
         |       FROM events GROUP BY 1
         |       UNION ALL
         |       SELECT 'ALL', count(DISTINCT user_id) FROM events)
         |SELECT est.event_type, est.est, ex.exact_users
         |FROM est JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin)
  )
}
