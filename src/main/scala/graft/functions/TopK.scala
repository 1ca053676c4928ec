package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k by score: a mergeable typed `Aggregator` keeping the k
  * (score, id) pairs with the highest score (ties to the smaller id —
  * deterministic, oracle-comparable).
  *
  * This is the scale path for "top N per group": the window-function
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY s DESC)`)
  * shuffles EVERY row of every group and sorts each partition before
  * discarding all but k; this aggregator trims map-side, so the shuffle
  * carries at most k rows per group per input partition and no sort of
  * the full group ever happens. Same answer (ExtSpec pins the
  * equivalence), different physical plan — partial ObjectHashAggregate
  * instead of Exchange + Sort + Window.
  *
  * The buffer trim is amortized: rows append until the buffer doubles
  * past k, then one sort-and-take — O(log) sorts per partition instead
  * of one per row.
  */
final class TopKByScore[IN](k: Int, score: IN => Long, id: IN => Long)
    extends Aggregator[IN, Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)

  private def trim(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty
  override def reduce(b: Seq[(Long, Long)], row: IN): Seq[(Long, Long)] = {
    val appended = b :+ ((score(row), id(row)))
    if (appended.size >= 2 * k) trim(appended) else appended
  }
  override def merge(a: Seq[(Long, Long)],
                     b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)
  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(b)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
