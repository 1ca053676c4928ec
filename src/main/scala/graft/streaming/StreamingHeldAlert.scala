package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The `for:` clause of the reference's alert rules, online — the
  * streaming twin of [[graft.analytics.Monitoring.heldFor]] (q119).
  * Every rule in the reference's alert config carries a hold duration
  * ("DLQ depth > 10 FOR 10 m", `k8s/monitoring/alerts.yaml:40-49`): a
  * breach must hold continuously before the alert FIRES, and the alert
  * RESOLVES when the condition clears. The depth/ratio/percentile
  * evaluations themselves already exist ([[graft.analytics.Monitoring]]
  * windowed aggregates); this operator consumes that finalized-window
  * stream and adds the temporal quantifier.
  *
  * Input is one evaluation per (key, aligned window start) — e.g. the
  * Append-mode output of a watermarked windowed aggregate, which Spark
  * emits exactly once per window when the watermark passes it. Breach =
  * `metric >= threshold`. The alert FIRES at the window that completes
  * `holdWindows` CONSECUTIVE breaching windows (consecutive = start
  * advances by exactly `windowSeconds`; an ABSENT window breaks the run
  * — no data is not evidence of breach) and RESOLVES at the first
  * non-breaching window after firing, or via an event-time timer when
  * the series goes silent for `resolveAfterWindows` windows (the
  * stale-series rule: a vanished metric must not hold an alert open
  * forever).
  *
  * Built on `transformWithState`: per-key state is ONE fixed-size run
  * record (since, frontier window, count, firing) in a ValueState plus
  * one event-time timer — millions of alert series cost tens of MB, and
  * the stale-series timer clears idle keys' state entirely, so the
  * bound is per ACTIVE series, not per series ever seen. Within a batch
  * evaluations apply in windowStart order; the frontier is monotone
  * (survives resolution), so an already-applied window can never
  * re-litigate a transition — Append mode cannot retract. One shuffle
  * on the alert key.
  *
  * Emission is transitions only (FIRING / RESOLVED rows), not
  * per-window status — the contract a pager needs, and the reason
  * Append mode suffices.
  */
object StreamingHeldAlert {

  /** One finalized windowed evaluation of the alert expression. */
  final case class Eval(key: String, windowStart: Timestamp, metric: Double)

  /** A state transition: phase is "FIRING" or "RESOLVED". `since` is
    * the breach run's first window start; `at` is the transition's
    * window start (for gap- or timer-driven resolution: the first
    * window the series was silent for). `metric` is the evaluation
    * that drove the transition (NaN when resolution was driven by
    * absence — there was no evaluation, that is the point).
    */
  final case class Transition(key: String, phase: String, since: Timestamp,
                              at: Timestamp, metric: Double)

  /** count == 0 marks an idle frontier (no active breach run): the
    * frontier must survive resolution so late windows cannot
    * re-litigate emitted transitions.
    */
  private[streaming] final case class Run(sinceMs: Long, lastWinMs: Long,
                               count: Int, firing: Boolean)

  private final class HeldProcessor(windowMs: Long, threshold: Double,
                                    holdWindows: Int, resolveAfterWindows: Int)
      extends StatefulProcessor[String, Eval, Transition] {

    @transient private var run: ValueState[Run] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      run = getHandle.getValueState[Run]("run",
        Encoders.product[Run], TTLConfig.NONE)

    private def armTimer(at: Long): Unit = {
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(at)
    }

    override def handleInputRows(key: String, rows: Iterator[Eval],
                                 timers: TimerValues): Iterator[Transition] = {
      val out = Seq.newBuilder[Transition]
      var st = if (run.exists()) Option(run.get()) else None
      rows.toSeq.sortBy(_.windowStart.getTime).foreach { e =>
        val ws = e.windowStart.getTime
        // monotone frontier: an at-or-below-frontier window was already
        // applied (or superseded) — drop it rather than contradict
        if (st.forall(ws > _.lastWinMs)) {
          val breach = e.metric >= threshold
          if (breach) {
            val extends_ = st.exists(s =>
              s.count > 0 && ws == s.lastWinMs + windowMs)
            if (extends_) {
              val s = st.get
              st = Some(Run(s.sinceMs, ws, s.count + 1, s.firing))
            } else {
              // a gap while firing resolves at the first missed window
              st.filter(_.firing).foreach { s =>
                out += Transition(key, "RESOLVED", new Timestamp(s.sinceMs),
                  new Timestamp(s.lastWinMs + windowMs), Double.NaN)
              }
              st = Some(Run(ws, ws, 1, firing = false))
            }
            val s = st.get
            if (!s.firing && s.count >= holdWindows) {
              out += Transition(key, "FIRING", new Timestamp(s.sinceMs),
                new Timestamp(ws), e.metric)
              st = Some(s.copy(firing = true))
            }
          } else {
            st.filter(_.firing).foreach { s =>
              out += Transition(key, "RESOLVED", new Timestamp(s.sinceMs),
                new Timestamp(ws), e.metric)
            }
            st = Some(Run(0L, ws, 0, firing = false))
          }
        }
      }
      st.foreach { s =>
        run.update(s)
        // stale-series timer: if no evaluation arrives for
        // resolveAfterWindows more windows, the run is abandoned and
        // the key's state freed (idle frontiers GC too — the state
        // bound is per ACTIVE series)
        armTimer(s.lastWinMs + (resolveAfterWindows + 1L) * windowMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Transition] = {
      val out = Seq.newBuilder[Transition]
      if (run.exists()) {
        val s = run.get()
        if (s.firing)
          out += Transition(key, "RESOLVED", new Timestamp(s.sinceMs),
            new Timestamp(s.lastWinMs + windowMs), Double.NaN)
        run.clear()
      }
      out.result().iterator
    }
  }

  /** Transition stream for `evals` under (windowSeconds, threshold,
    * holdWindows). Event-time mode needs a watermark: when chaining
    * after a watermarked windowed aggregate (the intended composition)
    * leave `watermarkDelay` as None — the upstream watermark propagates,
    * and re-declaring one on `windowStart` would mark every finalized
    * window late (a window only finalizes once the watermark passed
    * it). Only set `watermarkDelay` when `evals` comes from a raw,
    * un-watermarked source. Requires the RocksDB state store provider
    * like every transformWithState operator.
    *
    * `resolveAfterWindows`: how many silent windows after the last
    * evaluation abandon the run (and resolve a firing alert).
    */
  def alerts(evals: Dataset[Eval], windowSeconds: Long, threshold: Double,
             holdWindows: Int, resolveAfterWindows: Int = 2,
             watermarkDelay: Option[String] = None): Dataset[Transition] = {
    require(windowSeconds > 0, "windowSeconds must be > 0")
    require(holdWindows >= 1, "holdWindows must be >= 1")
    require(resolveAfterWindows >= 1, "resolveAfterWindows must be >= 1")
    val spark = evals.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[Transition] = Encoders.product[Transition]
    val watermarked = watermarkDelay.foldLeft(
      evals.filter(col("key").isNotNull && col("windowStart").isNotNull))(
      (d, delay) => d.withWatermark("windowStart", delay))
    watermarked
      .groupByKey(_.key)
      .transformWithState(
        new HeldProcessor(windowSeconds * 1000L, threshold, holdWindows,
          resolveAfterWindows),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
