package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Streaming deadline-boxed conversion funnel — the online twin of the
  * batch q151: per user, stage 1 is the first occurrence of its event
  * type, and each later stage must land within its deadline of the
  * previous stage's time; a `Reached` row is emitted per newly attained
  * stage.
  *
  * Correctness under out-of-order arrival is WATERMARK-FINALIZED: an
  * event only advances the funnel once the watermark has passed its
  * event time — until then it sits in a per-user buffer — so "first
  * view" really is the event-time minimum among everything that can
  * still arrive, and the emitted stage times equal the batch fold over
  * the same (watermark-admitted) events regardless of arrival order.
  * Same-instant ties resolve like the batch min()-chain: all events
  * sharing one timestamp are offered to the stage machine until it
  * stops advancing, so a view and a click on the same microsecond
  * still convert (ts ≥ t_view holds at equality).
  *
  * State and boundedness:
  *  - the buffer holds only events AHEAD of the watermark — its
  *    horizon is the configured lateness bound, not the stream;
  *  - a resolved funnel (all stages reached, or a deadline expired
  *    unreachably — decided by the watermark, so replay-stable) drops
  *    its buffer and timers and keeps ONE terminal `Prog` row so a
  *    later burst cannot re-enter the funnel and double-emit; that is
  *    the same per-user cardinality any per-user aggregate carries;
  *  - one event-time timer per user at most: min(earliest buffered
  *    event, current stage's deadline), re-armed per drain.
  *
  * Scale shape: one shuffle on user_id; per-user state is a handful of
  * longs plus the sub-watermark buffer. Emission is at most one row
  * per (user, stage).
  */
object StreamingFunnel {

  /** Stage spec: `deadlineMs` bounds this stage's event time relative
    * to the PREVIOUS stage's (ignored for the first stage).
    */
  final case class Stage(name: String, eventType: String, deadlineMs: Long)

  final case class Event(userId: Long, eventType: String,
                         eventTime: Timestamp)

  /** `stage` is 1-based, mirroring q151's output. */
  final case class Reached(userId: Long, stage: Int, name: String,
                           at: Timestamp)

  private[streaming] final case class Ev(tsMs: Long, tpe: String)

  /** `times(i)` = stage i's reach time in epoch ms, -1 while unset;
    * `resolved` marks a terminal funnel (complete or dead).
    */
  private[streaming] final case class Prog(times: Seq[Long], resolved: Boolean)

  private final class FunnelProcessor(stages: Seq[Stage])
      extends StatefulProcessor[Long, Event, Reached] {

    @transient private var buf: ListState[Ev] = _
    @transient private var prog: ValueState[Prog] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Ev]("buf", Encoders.product[Ev],
        TTLConfig.NONE)
      prog = getHandle.getValueState[Prog]("prog", Encoders.product[Prog],
        TTLConfig.NONE)
    }

    private def drain(user: Long, incoming: Seq[Ev],
                      wm: Long): Iterator[Reached] = {
      val st = if (prog.exists()) prog.get()
               else Prog(Seq.fill(stages.size)(-1L), resolved = false)
      if (st.resolved) return Iterator.empty
      val all = buf.get().toSeq ++ incoming
      val (ready, pending) = all.partition(_.tsMs <= wm)
      val times = st.times.toArray
      var s = times.indexWhere(_ < 0) match {
        case -1 => stages.size
        case i => i
      }
      val out = Seq.newBuilder[Reached]
      def offer(ev: Ev): Boolean = {
        val ok = s < stages.size && ev.tpe == stages(s).eventType &&
          (s == 0 || (ev.tsMs >= times(s - 1) &&
                      ev.tsMs <= times(s - 1) + stages(s).deadlineMs))
        if (ok) {
          times(s) = ev.tsMs
          out += Reached(user, s + 1, stages(s).name, new Timestamp(ev.tsMs))
          s += 1
        }
        ok
      }
      // event-time order; each same-instant group is re-offered until
      // the machine stops advancing (min()-chain tie semantics)
      ready.sortBy(_.tsMs).groupBy(_.tsMs).toSeq.sortBy(_._1)
        .foreach { case (_, group) =>
          var advanced = true
          while (advanced) advanced = group.exists(offer)
        }
      val complete = s == stages.size
      val dead = !complete && s > 0 &&
        wm > times(s - 1) + stages(s).deadlineMs
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      buf.clear()
      if (complete || dead) {
        prog.update(Prog(times.toSeq, resolved = true))
      } else if (s == 0 && pending.isEmpty) {
        // nothing reached, nothing buffered: keep zero state for the
        // users that only ever send non-matching events
        prog.clear()
      } else {
        if (pending.nonEmpty) buf.put(pending.toArray)
        prog.update(Prog(times.toSeq, resolved = false))
        val cands = pending.map(_.tsMs) ++
          (if (s > 0) Seq(times(s - 1) + stages(s).deadlineMs + 1)
           else Seq.empty)
        if (cands.nonEmpty) getHandle.registerTimer(cands.min)
      }
      out.result().iterator
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Reached] =
      drain(user,
        rows.map(e => Ev(e.eventTime.getTime, e.eventType)).toSeq,
        timers.getCurrentWatermarkInMs())

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Reached] =
      drain(user, Seq.empty, timers.getCurrentWatermarkInMs())
  }

  /** Funnel transitions for `events` under `stages` (2+ stages; the
    * first stage's deadline is ignored). `delayThreshold` is the
    * watermark lateness bound — also the emission lag, since stages
    * finalize only behind the watermark. Requires the RocksDB state
    * store provider like every transformWithState operator.
    */
  def track(events: Dataset[Event], stages: Seq[Stage],
            delayThreshold: String = "0 seconds"): Dataset[Reached] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.map(_.eventType).distinct.size == stages.size,
      "stage event types must be distinct")
    require(stages.tail.forall(_.deadlineMs > 0),
      "every non-entry stage needs a positive deadline")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[Reached] = Encoders.product[Reached]
    val types = stages.map(_.eventType)
    events
      .filter(col("eventTime").isNotNull &&
        col("eventType").isin(types: _*))
      .withWatermark("eventTime", delayThreshold)
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
