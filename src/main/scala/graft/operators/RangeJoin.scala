package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — points matched to every interval
  * containing them — an operator Spark has no native physical strategy for:
  * written naively (`p BETWEEN s AND e` with no equi-key) Catalyst can only
  * pick BroadcastNestedLoopJoin, which is O(|points|·|intervals|) work and
  * dead past toy sizes.
  *
  * Scale path (the standard bin-replication rewrite, used by every engine
  * that offers a real range join): quantize the range dimension into
  * fixed-width bins —
  *
  *   1. each point lands in exactly ONE bin (`floor(p / w)`);
  *   2. each interval is replicated to every bin it overlaps
  *      (`sequence(floor(s/w), floor(e/w))` exploded);
  *   3. an ordinary shuffle/broadcast EQUI-join on the bin key meets every
  *      (point, interval) pair whose containment can hold, and the exact
  *      predicate filters the bin-boundary false positives.
  *
  * Cost model: shuffle volume is |points| + Σ per-interval (len/w + 1)
  * replicas — pick `binWidth` near the typical interval length so the
  * replication factor stays O(1) and each bin's candidate set is small.
  * Pathologically long intervals (spanning many bins) are the skew hazard;
  * cap them by splitting upstream, or lean on AQE skew-join splitting. The
  * equi-join itself then broadcasts when the replicated interval side is
  * small, sort-merges otherwise — Catalyst's choice, visible in the plan.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`.
    * The three columns must be numeric and on a common scale (cast dates
    * to day numbers, timestamps to epoch seconds, ... upstream); output
    * carries all columns of both inputs.
    *
    * @param binWidth bin size in the columns' units; choose ≈ the typical
    *                 interval length (replication factor ≈ len/binWidth + 1)
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame =
    pointInIntervalKeyed(points, pointCol, Nil, intervals, startCol, endCol, Nil, binWidth)

  /** Keyed range join: like [[pointInInterval]], but a point only matches
    * intervals sharing its key (tenant / user / shard) — the join key becomes
    * `(key, bin)` instead of `bin` alone.
    *
    * This is the 100 TB shape of the operator. The unkeyed join's candidate
    * set per bin is |points-in-bin| × |intervals-over-bin| over the WHOLE
    * corpus — if data growth densifies a fixed range axis (more facts in the
    * same time window), candidate pairs grow quadratically no matter how the
    * bins are drawn. Keying bounds each bin's occupancy to one key's rows:
    * when growth adds KEYS (new tenants/users — the normal way a fact table
    * grows) per-key density is constant, candidate pairs grow linearly, and
    * the shuffle spreads over |keys|·|bins| reducers instead of |bins|.
    * Skew moves from "hot bin" to "hot key" — same hazard as any keyed
    * shuffle, handled by salting/AQE, not by this operator.
    *
    * `pointKeys`/`intervalKeys` are matched pairwise (`pointKeys(i) ===
    * intervalKeys(i)`); empty lists degrade to the unkeyed join.
    */
  def pointInIntervalKeyed(
      points: DataFrame, pointCol: String, pointKeys: Seq[String],
      intervals: DataFrame, startCol: String, endCol: String, intervalKeys: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(pointKeys.length == intervalKeys.length,
      "pointKeys and intervalKeys must pair up")
    // Both inputs are aliased internally and every join-condition column is
    // resolved THROUGH the alias: `p(pk) === iv(ik)` breaks down when the two
    // inputs share lineage (Spark's ambiguous-self-join resolution may reject
    // or misresolve it), and bare `col(pointCol)` is ambiguous whenever the
    // two sides share a column name. Aliasing makes the operator safe for
    // self-joins and same-named columns without requiring callers to rename.
    val p = points.withColumn("__pbin", floor(col(pointCol) / binWidth))
      .alias("__rj_p")
    val iv = intervals.withColumn("__ibin",
      explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
      .alias("__rj_i")
    def pc(c: String) = col(s"__rj_p.`$c`")
    def ic(c: String) = col(s"__rj_i.`$c`")
    val keyEq = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => pc(pk) === ic(ik) }
    val cond = ((pc("__pbin") === ic("__ibin")) +: keyEq).reduce(_ && _) &&
      pc(pointCol) >= ic(startCol) && pc(pointCol) <= ic(endCol)
    p.join(iv, cond).drop("__pbin", "__ibin")
  }

  /** Interval-OVERLAP join: every pair (a, b) with
    * `[aStart, aEnd] ∩ [bStart, bEnd] ≠ ∅` (inclusive ends). Same
    * bin-replication rewrite as [[pointInInterval]], applied to BOTH
    * sides: each interval replicates to every bin it spans, candidate
    * pairs meet on the bin equi-key, the exact overlap predicate filters
    * boundary false positives — and each true pair is emitted exactly
    * ONCE by attributing it to the single bin containing
    * `max(aStart, bStart)` (the overlap's left edge), so no distinct/
    * dedup pass is needed afterwards. Shuffle volume is the two
    * replicated sides; replication factor ≈ len/binWidth + 1 per row,
    * the dial a deployment tunes to its typical interval length. */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val av = a.withColumn("__abin",
      explode(sequence(floor(col(aStart) / binWidth), floor(col(aEnd) / binWidth))))
      .alias("__io_a")
    val bv = b.withColumn("__bbin",
      explode(sequence(floor(col(bStart) / binWidth), floor(col(bEnd) / binWidth))))
      .alias("__io_b")
    def ac(c: String) = col(s"__io_a.`$c`")
    def bc(c: String) = col(s"__io_b.`$c`")
    val cond = ac("__abin") === bc("__bbin") &&
      ac(aStart) <= bc(bEnd) && bc(bStart) <= ac(aEnd) &&
      floor(greatest(ac(aStart), bc(bStart)) / binWidth) === ac("__abin")
    av.join(bv, cond).drop("__abin", "__bbin")
  }
}
