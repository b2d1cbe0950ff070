package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact second-moment accumulator over integer-quantized
  * embedding vectors — the distributed half of PCA (north-star extension:
  * dimensionality reduction for the embedding table).
  *
  * Input rows are d-dim vectors already quantized to int64 (the caller
  * maps x → ⌊x·2²⁰ + 0.5⌋, the q_embed_quant trick); the buffer packs
  * [n, s₀…s_{d−1}, upper-triangle Σvᵢvⱼ] into ONE Array[Long] of
  * 1 + d + d(d+1)/2 slots, so covariance is EXACT integer arithmetic —
  * no float summation order anywhere, which is what lets a DuckDB oracle
  * match the distributed result bit-for-bit.
  *
  * Scale rationale vs the explode formulation: posexploding d(d+1)/2
  * products per row pushes O(n·d²) rows through the aggregate; this
  * aggregator reduces each map partition to ONE 2145-slot buffer (d=64)
  * before the exchange — the shuffle carries O(partitions · d²) longs
  * regardless of corpus size, and the per-row hot loop is a primitive
  * long-array walk with no boxing in the loop body.
  *
  * Overflow headroom: |xq| ≤ 0.53·2²⁰ ≈ 5.6·10⁵ → per-row product
  * ≤ 3.1·10¹¹; 10⁷ rows stay < 3.1·10¹⁸ < 2⁶³. The x256 ladder
  * (512 K vectors) uses < 2% of the range.
  */
class CovAggregator(d: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val size = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    val x = v.toArray
    buf(0) += 1L
    var i = 0
    var p = 1 + d
    while (i < d) {
      val xi = x(i)
      buf(1 + i) += xi
      var j = i
      while (j < d) {
        buf(p) += xi * x(j)
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
