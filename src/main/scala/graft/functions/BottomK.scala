package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import graft.functions.SketchKernels

/** Deterministic bottom-k sample: keeps the k ids with the smallest
  * md5(id) — a mergeable, order-independent, replayable alternative to
  * reservoir sampling (true reservoirs need randomness, which breaks
  * replay and oracle comparison). Typed `Aggregator` (SURVEY.md §2B
  * UDF/UDAF surface): partial aggregation merges bounded k-element
  * buffers, so the shuffle carries at most k rows per partition.
  */
final class BottomKByMd5[IN](k: Int, value: IN => Long)
    extends Aggregator[IN, Seq[(String, Long)], Seq[Long]] {
  require(k > 0)

  // per-deserialized-instance (= per task) digest: getInstance per row
  // is a provider lookup + allocation in the aggregation hot path
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  private def md5hex(v: Long): String = {
    val d = md5.digest(v.toString.getBytes("UTF-8"))
    md5.reset()
    SketchKernels.hex(d)
  }

  private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.sortBy(_._1).take(k)

  override def zero: Seq[(String, Long)] = Seq.empty
  override def reduce(b: Seq[(String, Long)], row: IN): Seq[(String, Long)] = {
    val v = value(row)
    // amortized trim: sort only when the buffer doubles past k, not on
    // every row (the final trim happens in merge/finish)
    val appended = b :+ (md5hex(v), v)
    if (appended.size >= 2 * k) trim(appended) else appended
  }
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)
  override def finish(b: Seq[(String, Long)]): Seq[Long] = trim(b).map(_._2)
  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
