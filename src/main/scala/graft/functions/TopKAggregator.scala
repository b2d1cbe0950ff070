package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. */
case class Scored(vid: Long, cos: Double)

/** Typed top-k accumulator (SURVEY §7.3: custom `Aggregator` for top-k
  * similarity): keeps a bounded list of the k best (cos desc, vid asc)
  * candidates per group.
  *
  * Scale rationale vs the window-function formulation: `row_number() OVER
  * (PARTITION BY qid ORDER BY cos DESC)` must shuffle and sort ALL n·|Q|
  * scored rows; this aggregator reduces each map partition to ≤ k rows per
  * query before the exchange (partial aggregation), so the shuffle carries
  * O(|Q|·k·partitions) rows regardless of corpus size.
  *
  * The ordering ties (equal cos) break by ascending vid — identical to the
  * window query and the DuckDB oracle, so results are deterministic.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.vid < b.vid)

  /** Insert into a best-first sorted list (invariant held by every buffer):
    * O(position) list surgery, no sort. */
  private def insert(a: Scored, xs: List[Scored]): List[Scored] = xs match {
    case h :: t if lt(h, a) => h :: insert(a, t)
    case _                  => a :: xs
  }

  override def zero: List[Scored] = Nil

  /** Bounded insert: a full buffer rejects a candidate no better than its
    * current worst in O(1) list-tail peek + O(k) only on actual insertions
    * — the common case for a streaming top-k is the cheap rejection. */
  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    if (buf.lengthCompare(k) < 0) insert(a, buf)
    else if (lt(a, buf.last)) insert(a, buf.init)
    else buf

  /** Merge two sorted buffers, keeping the k best (merge-step of
    * mergesort, truncated). */
  override def merge(x: List[Scored], y: List[Scored]): List[Scored] = {
    val out = List.newBuilder[Scored]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && lt(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else {
        out += ys.head; ys = ys.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[Scored]): List[Scored] = buf
  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
}
