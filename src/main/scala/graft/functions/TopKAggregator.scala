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

  // SQL-consistent ordering: java.lang.Double.compare ranks NaN greatest
  // (so a NaN sim sorts FIRST under DESC, exactly like Spark SQL's and
  // DuckDB's ORDER BY sim DESC) — a tuple sortBy on -sim would invert that
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    override def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(b.sim, a.sim) // sim DESC, NaN first
      if (c != 0) c else java.lang.Long.compare(a.c_id, b.c_id)
    }
  }

  /** buffers are kept sorted by [[ord]] (invariant of zero/reduce/merge) */
  private def trim(s: Seq[Scored]): Seq[Scored] = s.sorted(ord).take(k)

  override def zero: Seq[Scored] = Nil
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    // bounded insert: a candidate ranking at-or-after the current k-th
    // best can't enter a full buffer — no allocation, no re-sort
    if (b.size >= k && ord.compare(a, b.last) >= 0) b else trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  override def finish(b: Seq[Scored]): Seq[Scored] = trim(b)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
