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

  private def trim(xs: List[Scored]): List[Scored] = xs.sortWith(lt).take(k)

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], a: Scored): List[Scored] = trim(a :: buf)
  override def merge(x: List[Scored], y: List[Scored]): List[Scored] = trim(x ::: y)
  override def finish(buf: List[Scored]): List[Scored] = buf
  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
}
