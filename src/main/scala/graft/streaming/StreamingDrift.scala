package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, MapState}

/** Streaming distribution-drift monitor — the online twin of q150's
  * PSI: each metric's observed values accumulate into a fixed-width
  * histogram in keyed state, and every micro-batch emits the
  * population-stability index of the RUNNING distribution against a
  * broadcast reference histogram (the training window's). This is the
  * "has serving drifted from training" gate run continuously instead
  * of per audit day — PSI < 0.1 stable, > 0.25 page someone.
  *
  * Exactness discipline matches q150: histogram counts are exact
  * integers in a MapState (one entry per non-empty bucket, ≤ nBuckets
  * entries — state is structurally bounded regardless of stream
  * length); Laplace smoothing (+1 per bucket over total + nBuckets)
  * keeps empty buckets finite; each (pa−pb)·ln(pa/pb) term is
  * nano-quantized to a Long before summation, so a batch recomputation
  * over the same values lands on the identical psiNano — pinned by
  * the parity spec.
  *
  * Scale shape: one shuffle on the metric name (#keys = #monitored
  * metrics), O(nBuckets) state and O(nBuckets) emission work per key
  * per batch. The reference histogram rides the processor closure
  * (broadcast with the task binary — it is nBuckets longs, not data).
  */
object StreamingDrift {

  /** One observed value of a monitored metric. */
  final case class MetricValue(metric: String, v: Double)

  /** Running drift of one metric after a batch: observation count and
    * the nano-quantized PSI vs the reference.
    */
  final case class DriftScore(metric: String, nObs: Long, psiNano: Long)

  /** The reference (training-window) distribution: fixed-width buckets
    * over [lo, hi] — values outside clamp to the edge buckets, exactly
    * as [[bucketOf]] assigns the live stream.
    */
  final case class Reference(lo: Double, hi: Double,
                             counts: Array[Long]) {
    require(counts.nonEmpty, "reference histogram must have buckets")
    require(hi > lo, "degenerate reference range")
    val total: Long = counts.sum
  }

  private[streaming] def bucketOf(v: Double, lo: Double, hi: Double,
                                  n: Int): Int = {
    val raw = math.floor((v - lo) / (hi - lo) * n).toInt
    math.min(n - 1, math.max(0, raw))
  }

  /** PSI in nano-units between the reference and a live histogram —
    * shared by the processor and the parity spec, so "the same
    * formula" is a compile-time fact, not a test assumption.
    */
  private[streaming] def psiNano(ref: Reference,
                                 live: Map[Int, Long]): Long = {
    val n = ref.counts.length
    val liveTotal = live.valuesIterator.sum
    (0 until n).map { b =>
      val pa = (ref.counts(b) + 1).toDouble / (ref.total + n)
      val pb = (live.getOrElse(b, 0L) + 1).toDouble / (liveTotal + n)
      math.floor((pa - pb) * math.log(pa / pb) * 1e9 + 0.5).toLong
    }.sum
  }

  private final class DriftProcessor(ref: Reference)
      extends StatefulProcessor[String, MetricValue, DriftScore] {

    @transient private var hist: MapState[Int, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getMapState[Int, Long]("hist",
        Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[MetricValue],
                                 timers: TimerValues): Iterator[DriftScore] = {
      val n = ref.counts.length
      rows.foreach { r =>
        val b = bucketOf(r.v, ref.lo, ref.hi, n)
        val cur = if (hist.containsKey(b)) hist.getValue(b) else 0L
        hist.updateValue(b, cur + 1)
      }
      val live: Map[Int, Long] = hist.iterator().toMap
      Iterator.single(DriftScore(key, live.valuesIterator.sum,
        psiNano(ref, live)))
    }
  }

  /** Monitor `values` against `ref`; one DriftScore per touched metric
    * per micro-batch (Append; latest emission is the current score).
    * Requires the RocksDB state store provider.
    */
  def monitor(values: Dataset[MetricValue], ref: Reference)
      : Dataset[DriftScore] = {
    val spark = values.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[DriftScore] = Encoders.product[DriftScore]
    values.groupByKey(_.metric)
      .transformWithState(new DriftProcessor(ref), TimeMode.None(),
        OutputMode.Append())
  }
}
