package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into [[TopKAggregator]]. */
case class Scored(c_id: Long, sim: Double)

/** Typed top-k aggregator (`Aggregator[IN, BUF, OUT]`, SURVEY.md §2.10):
  * keeps the k best (sim DESC, c_id ASC) candidates per group with a
  * bounded buffer.
  *
  * This is the scale-correct top-k-per-group shape: as a partial/final
  * aggregate, each map task reduces its pairs to ≤ k rows per group BEFORE
  * the shuffle, so the exchange carries O(groups × partitions × k) rows —
  * vs the window-function formulation (`row_number` over sim) that
  * shuffles and sorts EVERY candidate pair. Ordering ties are broken by
  * c_id, so the output is deterministic and byte-identical to the window
  * form.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.sim, x.c_id)).take(k)

  override def zero: Seq[Scored] = Nil
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  override def finish(b: Seq[Scored]): Seq[Scored] = trim(b)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
