package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, ValueState}

/** Online two-sided CUSUM — the streaming twin of
  * [[graft.ext.Stats.cusumFixed]] (q186's pinned-reference sibling):
  * per series key, the Page recurrence
  * S⁺ ← max(0, S⁺ + x − μ0 − slack), S⁻ ← max(0, S⁻ − (x − μ0 + slack))
  * maintained continuously as day points land, alarming the moment the
  * cumulative drift crosses the threshold instead of at the next batch
  * recompute. CUSUM is the canonical ONLINE detector — the batch
  * operator is the retrospective audit, this is the form that actually
  * pages someone — and the pinned μ0 is what makes unbounded streaming
  * possible at all (the retrospective variant's reference is the
  * series' own full-history mean).
  *
  * Exactness: deviations, S⁺/S⁻, and the threshold compare are raw
  * integer cents, identical to the batch twin's Long arithmetic —
  * StreamingCusumSpec pins row-for-row equality of every emission
  * against [[graft.ext.Stats.cusumFixed]] on the same prefix, across
  * micro-batch boundaries.
  *
  * Ordering contract: day points must arrive in nondecreasing day
  * order PER KEY across batches (the natural shape when an upstream
  * windowed aggregation emits finalized days); within a batch the
  * processor sorts its buffer by day. A point at or before the last
  * processed day is late by contract and is DROPPED — deterministic,
  * and the drop is visible in the emission gap. A pipeline with real
  * out-of-order finalized days buffers on event-time timers first
  * (the [[StreamingFunnel]] pattern) — detection lag there is the
  * watermark, not the detector.
  *
  * State: ONE fixed-size record per series key (two Longs + the day
  * high-water mark) — no growth with history; TTL deliberately absent
  * (a quiet series keeps its drift account; staleness policy belongs
  * to the caller's key universe).
  */
object StreamingCusum {

  /** One finalized day point. */
  final case class DayPoint(key: String, dayIdx: Long, cents: Long)

  /** Detector emission for one processed day point — schema-compatible
    * with a [[graft.ext.Stats.cusumFixed]] row.
    */
  final case class CusumPoint(key: String, dayIdx: Long, xCents: Long,
                              sPos: Long, sNeg: Long,
                              alarmUp: Boolean, alarmDown: Boolean)

  private[streaming] final case class St(sPos: Long, sNeg: Long, lastDay: Long)

  private final class CusumProcessor(mu0Cents: Long, slackCents: Long,
                                     threshCents: Long)
      extends StatefulProcessor[String, DayPoint, CusumPoint] {

    @transient private var st: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("cusum",
        Encoders.product[St], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DayPoint],
                                 timers: TimerValues): Iterator[CusumPoint] = {
      var s = if (st.exists()) st.get() else St(0L, 0L, Long.MinValue)
      val out = Vector.newBuilder[CusumPoint]
      rows.toArray.sortBy(_.dayIdx).foreach { p =>
        if (p.dayIdx > s.lastDay) {
          val sp = math.max(0L, s.sPos + p.cents - mu0Cents - slackCents)
          val sn = math.max(0L, s.sNeg - (p.cents - mu0Cents + slackCents))
          s = St(sp, sn, p.dayIdx)
          out += CusumPoint(key, p.dayIdx, p.cents, sp, sn,
            sp > threshCents, sn > threshCents)
        } // else: late by contract — dropped
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Maintain per-key CUSUM accounts over a day-point stream. Requires
    * the RocksDB state store provider (transformWithState's backend).
    */
  def detect(points: Dataset[DayPoint], mu0Cents: Long, slackCents: Long,
             threshCents: Long): Dataset[CusumPoint] = {
    require(slackCents >= 0 && threshCents > 0,
      s"bad CUSUM params: slack=$slackCents thresh=$threshCents")
    val spark = points.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[CusumPoint] = Encoders.product[CusumPoint]
    points.groupByKey(_.key)
      .transformWithState(
        new CusumProcessor(mu0Cents, slackCents, threshCents),
        TimeMode.None(), OutputMode.Append())
  }
}
