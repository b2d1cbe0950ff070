package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Keeps at most k−1 weighted counters. Invariant after any sequence of
  * reduces and merges over a stream of n items: every counter undercounts
  * its item's true frequency by at most n/k, so ANY item with true
  * frequency > n/k is guaranteed to survive as a counter key — under
  * arbitrary partitioning and merge order. The candidate set is therefore
  * a deterministic SUPERSET of the true heavy hitters even though the
  * counter values themselves are merge-order-dependent; callers must
  * confirm candidates with an exact second pass (bounded: ≤ k−1 items)
  * before emitting counts.
  *
  * Scale rationale vs an exact `groupBy(term).count()`: the exact reduce
  * side is ∝ |vocabulary| (unbounded on raw web text); this summary is
  * O(k) per map partition and O(k) on the wire, with the exact confirm
  * pass touching only the ≤ k−1 candidate keys. The same shape as the
  * Count-Min path (`CountMinSketch`) but with a deterministic no-misses
  * guarantee instead of a probabilistic overcount bound.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c)                      => buf.updated(item, c + 1L)
      case None if buf.size < k - 1     => buf.updated(item, 1L)
      case None                         =>
        // classic MG step: decrement every counter (charges the new item's
        // single occurrence plus one occurrence of each tracked item)
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  /** Merge = counter-wise sum, then subtract the k-th largest count from
    * every counter and drop non-positives (Agarwal et al. §3.1) — restores
    * the ≤ k−1 size bound while adding at most n₂/k undercount. */
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = (x.keySet ++ y.keySet).iterator
      .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
    if (sum.size <= k - 1) sum
    else {
      val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
      sum.flatMap { case (t, c) => if (c - kth > 0L) Some(t -> (c - kth)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
