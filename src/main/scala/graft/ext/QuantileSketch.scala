package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile-sketch store — the percentile half of the 100 TB
  * sketch warehouse next to q63's HLL store: per-partition sketches are
  * built once, stored SMALL (one row per non-empty bucket), and any
  * coarser rollup — per-day from per-(day, type), global from per-day —
  * is answered by UNIONING stored sketches instead of re-scanning raw
  * data.
  *
  * The sketch is a log-linear histogram (the HdrHistogram / DDSketch
  * family — Masson, Lee & Rim, "DDSketch", VLDB 2019): values bucket by
  * octave (floor(log2 v)) subdivided linearly into [[SubBuckets]]
  * sub-buckets, giving bounded RELATIVE value error (≤ 1/SubBuckets per
  * pick) with bucket counts that are EXACT integers. That choice is
  * deliberate over GK/KLL/t-digest: merge is bucket-wise count
  * addition, so union-of-sketches ≡ direct-sketch holds EXACTLY and
  * order-independently (CurationSpec pins it), rank walks are exact —
  * the returned bucket provably contains the true discrete quantile —
  * and every arithmetic step (bit length, shift, integer div) is
  * engine-mirrorable for the DuckDB oracle. A GK/KLL merge is
  * order-sensitive and engine-specific; it could never be hash-gated.
  *
  * Scale shape: building is one aggregation with map-side partials —
  * the shuffle carries (group, bucket) partial counts, bounded by
  * #groups × #buckets (a 64-bit cent domain is ≤ 63 octaves × 16 = ~1k
  * buckets), never by row count. Quantile answering sorts WITHIN a
  * group's own buckets (≤ ~1k rows per group, one task each); nothing
  * corpus-sized is ever sorted or re-read.
  */
object QuantileSketch {

  /** Linear subdivisions per octave: relative value error ≤ 1/16. */
  val SubBuckets = 16

  /** Log-linear bucket id of a POSITIVE integer value (cents-scaled by
    * the caller): `(b−1)·16 + ((v·16) >> (b−1)) − 16` where b is the
    * bit length of v — exact integer arithmetic end to end (bit length
    * via `length(bin(v))`, the sub-bucket via a right shift, never a
    * float log). Non-positive values collapse to the single underflow
    * bucket −1.
    *
    * Overflow discipline (ADVICE r12): for b > 4 the sub-bucket is
    * computed as `v >> (b−5)` — algebraically identical to
    * `(v·16) >> (b−1)` (multiply-by-16 IS a 4-bit left shift, so the
    * shifts compose) but the shift happens BEFORE the widen, so values
    * up to Long.MaxValue bucketize without the `v·16` overflow that
    * would throw ARITHMETIC_OVERFLOW under ANSI mode at v ≥ 2⁵⁹. The
    * multiply form survives only for b ≤ 4 (v < 16, product ≤ 240),
    * where b−5 would be a negative shift.
    */
  def bucketize(v: Column): Column = {
    val b = length(bin(v)).cast("long")
    val sub = when(b <= 4,
        call_function("shiftright", v * SubBuckets, (b - 1).cast("int")))
      .otherwise(call_function("shiftright", v, (b - 5).cast("int")))
    when(v <= 0, lit(-1L))
      .otherwise((b - 1) * SubBuckets + sub - SubBuckets)
  }

  /** Build the stored sketch from raw rows: one aggregation to
    * (group..., bucket, cnt). This IS the persisted artifact — tiny,
    * mergeable, exact counts.
    */
  def build(df: DataFrame, groups: Seq[(String, Column)],
            value: Column): DataFrame =
    df.groupBy(groups.map { case (n, c) => c.as(n) } :+
        bucketize(value).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Union stored sketches to a coarser grouping — bucket-wise count
    * addition, the whole merge operation. Exact: no register clamping,
    * no compaction, no order sensitivity.
    */
  def merge(sketch: DataFrame, groups: Seq[String]): DataFrame =
    sketch.groupBy((groups :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Answer a quantile from a stored sketch: per group, the smallest
    * bucket whose exact cumulative count reaches ⌈p·n⌉ (p = pNum/pDen).
    * Output: (group..., n_values, n_buckets, q_bucket). The rank walk
    * is exact, so `q_bucket` always contains the true discrete
    * quantile; the bucket's width bounds the value error.
    *
    * One window pass (VERDICT r12 item 4): the running cum and the
    * group total share partition AND order — the total uses an
    * explicit unbounded frame on the SAME ordered spec, so Catalyst
    * fuses both into a single WindowExec (one exchange, one sort, one
    * buffer walk) instead of two.
    */
  def quantileBucket(sketch: DataFrame, groups: Seq[String],
                     pNum: Int, pDen: Int): DataFrame = {
    require(pNum > 0 && pDen > 0 && pNum <= pDen,
      s"bad quantile: $pNum/$pDen")
    val gcols = groups.map(col)
    val wWalk = Window.partitionBy(gcols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gcols: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sketch
      .withColumn("__cum", sum(col("cnt")).over(wWalk))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      // ⌈p·n⌉ in pure integer arithmetic (div, never a double round-trip)
      .withColumn("__k", call_function("div",
        col("__n") * pNum + (pDen - 1), lit(pDen.toLong)))
      .groupBy(gcols: _*)
      .agg(max(col("__n")).as("n_values"),
        count(lit(1)).as("n_buckets"),
        min(when(col("__cum") >= col("__k"), col("bucket")))
          .as("q_bucket"))
  }
}
