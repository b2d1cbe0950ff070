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
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__pbin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("__ibin",
      explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(iv,
        col("__pbin") === col("__ibin") &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }
}
