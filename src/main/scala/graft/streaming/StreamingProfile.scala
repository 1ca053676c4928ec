package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Streaming data-quality monitor — the online twin of
  * [[graft.ext.Profile.profile]] (q131): per-column running metrics
  * (rows, non-nulls, min/max, sum) maintained continuously as batches
  * land, instead of recomputed per ingest day. This is the engine-side
  * form of the reference's metrics counters (`k8s/monitoring/
  * alerts.yaml:24-49` pages on level thresholds; the counter feeding
  * them is exactly a running profile) — and the input a
  * [[StreamingHeldAlert]] rule would watch for "null ratio above X for
  * 10 minutes".
  *
  * Numeric proxy discipline matches the batch operator: values arrive
  * pre-projected to long form (col_name, proxy double) via
  * [[longForm]] — numerics as-is, timestamps as epoch seconds, strings
  * as length — so one state schema covers heterogeneous columns.
  * Sums accumulate in integer CENTS (floor(x·100 + 0.5) per value,
  * summed as Long) so the running total is fold-order-exact and
  * replay-stable — the q69/q89 integer-accumulation discipline carried
  * into state.
  *
  * Scale shape: one shuffle on col_name (#keys = #profiled columns —
  * tiny), one fixed-size ValueState record per column, one emission
  * per touched column per micro-batch (Append; last emission per key
  * is the current profile). Distinct counts are deliberately ABSENT:
  * exact distincts need unbounded state; corpora that need them run
  * the batch profile (exact or HLL++) on a schedule instead.
  */
object StreamingProfile {

  /** One profiled value: `v` is the numeric proxy, null when the
    * source column was null.
    */
  final case class ColValue(colName: String, v: Option[Double])

  /** Running per-column profile after a batch. `sumCents` is the
    * cent-quantized sum of non-null proxies; `completeness` the
    * nonnull ratio — both exactly reproducible by a batch aggregation
    * over the same rows.
    */
  final case class ColProfile(colName: String, nRows: Long, nNonnull: Long,
                              minV: Double, maxV: Double, sumCents: Long,
                              completeness: Double)

  private[streaming] final case class St(nRows: Long, nNonnull: Long, minV: Double,
                              maxV: Double, sumCents: Long)

  private final class ProfileProcessor
      extends StatefulProcessor[String, ColValue, ColProfile] {

    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("profile",
        Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ColValue],
                                 timers: TimerValues): Iterator[ColProfile] = {
      var s =
        if (st.exists()) st.get()
        else St(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity, 0L)
      rows.foreach { r =>
        s = r.v match {
          case Some(x) =>
            St(s.nRows + 1, s.nNonnull + 1, math.min(s.minV, x),
              math.max(s.maxV, x),
              s.sumCents + math.floor(x * 100 + 0.5).toLong)
          case None => s.copy(nRows = s.nRows + 1)
        }
      }
      st.update(s)
      Iterator.single(ColProfile(key, s.nRows, s.nNonnull, s.minV, s.maxV,
        s.sumCents,
        if (s.nRows == 0) 0.0 else s.nNonnull.toDouble / s.nRows))
    }
  }

  /** Project `cols` of `df` into the long form the monitor consumes —
    * the same numeric proxies as the batch profiler (numerics cast to
    * double, timestamps to epoch seconds, strings to length, booleans
    * to 0/1), one output row per (input row × profiled column).
    */
  def longForm(df: DataFrame, cols: Seq[String]): Dataset[ColValue] = {
    require(cols.nonEmpty, "profile of zero columns")
    val spark = df.sparkSession
    import spark.implicits._
    def proxy(c: String): Column = df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case _: TimestampType => unix_timestamp(col(c)).cast("double")
      case _: TimestampNTZType =>
        unix_timestamp(col(c).cast("timestamp")).cast("double")
      case _: DateType => unix_timestamp(col(c).cast("timestamp")).cast("double")
      case _: BooleanType => col(c).cast("int").cast("double")
      case _ => length(col(c)).cast("double")
    }
    val stacked = cols.map(c =>
      struct(lit(c).as("colName"), proxy(c).as("v")))
    df.select(explode(array(stacked: _*)).as("s"))
      .select(col("s.colName"), col("s.v"))
      .as[ColValue]
  }

  /** Maintain running profiles over a long-form value stream. Requires
    * the RocksDB state store provider (transformWithState's backend).
    */
  def monitor(values: Dataset[ColValue]): Dataset[ColProfile] = {
    val spark = values.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[ColProfile] = Encoders.product[ColProfile]
    values.groupByKey(_.colName)
      .transformWithState(new ProfileProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
