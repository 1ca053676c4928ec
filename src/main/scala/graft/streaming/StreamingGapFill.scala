package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming gap-fill / LOCF — the online twin of the batch date-spine
  * LOCF (q90): a per-key time series is re-emitted on a fixed tick
  * grid, and when a key goes quiet the last observed value is carried
  * forward (`filled = true`) as the watermark passes each missing tick
  * — the standard "sensor went dark vs. no data yet" disambiguation a
  * monitoring pipeline needs online.
  *
  * Built on `transformWithState` with EVENT-TIME TIMERS (the half of
  * the Spark 4 arbitrary-state API [[StreamingQuota]] doesn't use):
  * each key keeps (lastTick, lastValue, fillsSoFar) in a ValueState and
  * one registered timer at `lastTick + tick`. When the watermark passes
  * the timer, ALL elapsed ticks up to the watermark are emitted in one
  * expiry (each carrying the last value), and one timer is re-armed
  * beyond the watermark — one timer per key at any moment, regardless
  * of how far the watermark jumped.
  *
  * Boundedness and determinism:
  *  - `maxFillTicks` caps consecutive carried-forward emissions per
  *    gap: a permanently dead key emits that many fills and goes
  *    silent (no timer re-armed) until a real event revives it —
  *    state stays, emission stops, so a dead fleet can't flood the
  *    sink forever.
  *  - Exactly ONE row per (key, grid point), ever: the emitted frontier
  *    (`lastTickMs`) is monotone. Within a batch the latest reading per
  *    tick window wins; a late reading whose grid point was already
  *    emitted — observed or filled — is dropped rather than
  *    contradicted, because Append mode cannot retract. Downstream
  *    consumers keyed on (key, tickTime) therefore never see
  *    conflicting rows.
  *  - Ticks are aligned to `floor(eventTime / tick) * tick` — grid
  *    points are absolute, so replays and re-partitions emit identical
  *    grids. Fills are emitted only for ticks strictly at-or-below the
  *    current watermark, which only ever advances — replay-stable.
  *
  * Scale shape: one shuffle on the key; state is one (long, double,
  * int) per key plus one timer — millions of keys cost tens of MB in
  * RocksDB. Emission is bounded by observed rows + maxFillTicks per
  * gap.
  */
object StreamingGapFill {

  final case class Reading(key: String, eventTime: Timestamp, value: Double)

  /** One grid-point emission; `filled` marks carried-forward values. */
  final case class Tick(key: String, tickTime: Timestamp, value: Double,
                        filled: Boolean)

  private[streaming] final case class Last(lastTickMs: Long, value: Double,
                                fills: Int)

  private final class GapFillProcessor(tickMs: Long, maxFillTicks: Int)
      extends StatefulProcessor[String, Reading, Tick] {

    @transient private var last: ValueState[Last] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Last]("last",
        Encoders.product[Last], TTLConfig.NONE)

    private def align(ms: Long): Long = Math.floorDiv(ms, tickMs) * tickMs

    private def armTimer(at: Long): Unit = {
      // one timer per key: drop whatever was armed before (materialize
      // the listing first — deleting while the iterator is live is
      // store-implementation-defined)
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(at)
    }

    override def handleInputRows(key: String, rows: Iterator[Reading],
                                 timers: TimerValues): Iterator[Tick] = {
      val out = Seq.newBuilder[Tick]
      // the emitted frontier: grid points at-or-below it are final
      // (Append mode cannot retract), so the frontier never moves
      // backward — a late reading whose tick was already emitted
      // (observed or filled) is dropped rather than contradicted
      val floor = if (last.exists()) last.get().lastTickMs else Long.MinValue
      // one row per grid point per batch: the latest reading within a
      // tick window wins (it is the freshest observation of that tick)
      val perTick = rows.toSeq.sortBy(_.eventTime.getTime)
        .map(r => (align(r.eventTime.getTime), r))
        .filter { case (tick, _) => tick > floor }
        .foldLeft(scala.collection.immutable.SortedMap.empty[Long, Reading]) {
          case (acc, (tick, r)) => acc.updated(tick, r)
        }
      perTick.foreach { case (tick, r) =>
        out += Tick(key, new Timestamp(tick), r.value, filled = false)
      }
      perTick.lastOption.foreach { case (tick, r) =>
        last.update(Last(tick, r.value, 0))
      }
      if (last.exists()) armTimer(last.get().lastTickMs + tickMs)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Tick] = {
      val wm = timers.getCurrentWatermarkInMs()
      val out = Seq.newBuilder[Tick]
      var st = last.get()
      // emit every elapsed grid point in this one expiry, value carried
      // forward, capped by the per-gap fill budget
      while (st.lastTickMs + tickMs <= wm && st.fills < maxFillTicks) {
        st = Last(st.lastTickMs + tickMs, st.value, st.fills + 1)
        out += Tick(key, new Timestamp(st.lastTickMs), st.value,
          filled = true)
      }
      last.update(st)
      // re-arm only while fill budget remains: a dead key goes quiet
      // instead of producing timers forever
      if (st.fills < maxFillTicks) armTimer(st.lastTickMs + tickMs)
      out.result().iterator
    }
  }

  /** Gap-filled tick stream for `readings`. `delayThreshold` is the
    * watermark lateness bound (also the fill emission lag); requires
    * the RocksDB state store provider like every transformWithState
    * operator.
    */
  def fill(readings: Dataset[Reading], tickSeconds: Long,
           maxFillTicks: Int = 60,
           delayThreshold: String = "0 seconds"): Dataset[Tick] = {
    require(tickSeconds > 0, "tickSeconds must be > 0")
    require(maxFillTicks >= 1, "maxFillTicks must be >= 1")
    val spark = readings.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[Tick] = Encoders.product[Tick]
    readings
      .filter(col("key").isNotNull && col("eventTime").isNotNull)
      .withWatermark("eventTime", delayThreshold)
      .groupByKey(_.key)
      .transformWithState(
        new GapFillProcessor(tickSeconds * 1000L, maxFillTicks),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
