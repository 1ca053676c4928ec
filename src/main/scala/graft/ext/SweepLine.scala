package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line: peak concurrency of [start, end) intervals —
  * "how many transfers were in flight at once", the capacity question
  * behind the reference's consumer-concurrency and backlog alerts
  * (`camel/file-pipeline.yaml:17-21` sets `concurrentConsumers`;
  * `k8s/monitoring/alerts.yaml` alarms on depth). Each interval
  * contributes a +1 delta at start and a −1 at end; the running sum of
  * deltas in time order is the number of open intervals, and its max
  * per calendar bucket is the reported peak.
  *
  * A running sum over one global ORDER BY is a single task — wrong at
  * scale. Prefix sums decompose, so this runs TWO-PHASE: phase 1
  * computes the running sum within each calendar bucket (parallel
  * windows, one hash exchange); phase 2 computes each bucket's starting
  * offset as the cumulative sum of whole-bucket totals — a window over
  * #buckets ROWS (thousands of months at most, broadcast back), not
  * #intervals. global_running = bucket_offset + local_running, exactly.
  *
  * Tie discipline: deltas sort by (t, d), so at one instant all −1s
  * precede all +1s — end-exclusive intervals, back-to-back intervals
  * don't overlap. The window keeps the default RANGE frame: every row
  * in a (t, d) tie group reads the group-end prefix, which is also the
  * only prefix that is well-defined concurrency (mid-group prefixes
  * depend on arbitrary row order within the group).
  */
object SweepLine {

  /** Per-`unit` (date_trunc) peak open-interval count and interval
    * starts. Output: (bkt, peak, n_starts) — a bucket's peak is the max
    * concurrency observed at delta instants falling in that bucket.
    */
  def concurrencyPeaks(df: DataFrame, start: Column, end: Column,
                       unit: String = "month"): DataFrame = {
    val deltas = df.select(start.as("t"), lit(1L).as("d"))
      .unionAll(df.select(end.as("t"), lit(-1L).as("d")))
      .withColumn("bkt", date_trunc(unit, col("t")))
    val inBucket = Window.partitionBy(col("bkt"))
      .orderBy(col("t").asc, col("d").asc) // default RANGE frame
    val run = deltas.withColumn("run_local", sum(col("d")).over(inBucket))
    val totals = deltas.groupBy(col("bkt")).agg(sum(col("d")).as("tot"))
    // cumulative offsets over whole-bucket totals: #buckets rows on one
    // task by design — this is the tiny side of the two-phase split
    val before = graft.functions.BoundedWindow.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("tot")).over(before), lit(0L)))
      .select(col("bkt"), col("off"))
    run.join(broadcast(offsets), "bkt")
      .groupBy(col("bkt"))
      .agg(max(col("run_local") + col("off")).as("peak"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"))
  }
}
