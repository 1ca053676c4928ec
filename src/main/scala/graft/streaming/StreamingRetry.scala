package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Cross-batch retry scheduling — the broker-timed half of the
  * reference's redelivery policy (`camel/file-pipeline.yaml:269-277`:
  * 3 attempts, 5 s initial delay, ×2 multiplier, 60 s cap) that the
  * in-batch retry loop ([[graft.enrich.Docling]], SURVEY §7.4.1)
  * deliberately does not reproduce: there, all attempts happen inside
  * one micro-batch; here, a failed message WAITS OUT its backoff in
  * keyed state and is re-emitted in a later trigger, which is what a
  * broker's redelivery timer actually does.
  *
  * Shape: the operator consumes attempt RESULTS and emits dispatch
  * DECISIONS — `RETRY` rows when a message's backoff expires (carrying
  * the payload and the next attempt number) and `DEAD` rows when
  * attempts are exhausted. The caller wires `RETRY` back to the
  * processing stage through a durable bus (a directory the stage also
  * streams from — the file-borne stand-in for a retry topic; Spark
  * queries cannot contain cycles, so the feedback edge must be a
  * sink/source pair). `DEAD` rows go to the DLQ path (K3/K4).
  *
  * Built on `transformWithState`: one fixed-size (payload, attempt,
  * due) record per in-flight message plus ONE timer; state clears on
  * dispatch, so the bound is per message CURRENTLY WAITING, not per
  * message ever seen. Backoff is `initial × multiplier^(attempt-1)`
  * capped at `cap` — the reference's exact schedule by default.
  *
  * Time semantics: timers fire when the QUERY's clock passes the due
  * instant — `TimeMode.EventTime` (default here) keys that clock to
  * the watermark, making replays deterministic and tests sleep-free;
  * `TimeMode.ProcessingTime` keys it to the wall clock, which is what
  * a production retry bus wants (a stalled source must not stall
  * redelivery). The processor is identical under both; pass
  * `wallClock = true` for the latter.
  *
  * A success or a duplicate failure for a message already waiting is
  * ignored (first failure wins the slot; the in-flight attempt's
  * outcome will re-enter as a fresh result after dispatch). Results
  * arriving for an exhausted message re-enter at attempt 1 only if
  * state was already cleared — at-least-once, like the broker.
  */
object StreamingRetry {

  /** One processing-attempt result. `attempt` is 1-based. */
  final case class AttemptResult(msgId: String, payload: String,
                                 attempt: Int, failed: Boolean,
                                 eventTime: Timestamp)

  /** kind is "RETRY" (dispatch attempt `attempt` now) or "DEAD"
    * (attempts exhausted — route to the DLQ path). `due` is the
    * instant the backoff expired (RETRY) or the terminal failure's
    * event time (DEAD).
    */
  final case class Dispatch(kind: String, msgId: String, payload: String,
                            attempt: Int, due: Timestamp)

  private[streaming] final case class Waiting(payload: String, attempt: Int,
                                              dueMs: Long)

  private final class RetryProcessor(initialMs: Long, multiplier: Double,
                                     capMs: Long, maxAttempts: Int,
                                     wallClock: Boolean)
      extends StatefulProcessor[String, AttemptResult, Dispatch] {

    @transient private var waiting: ValueState[Waiting] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      waiting = getHandle.getValueState[Waiting]("waiting",
        Encoders.product[Waiting], TTLConfig.NONE)

    private def backoffMs(attempt: Int): Long = {
      val raw = initialMs * math.pow(multiplier, (attempt - 1).toDouble)
      math.min(capMs.toDouble, raw).toLong
    }

    override def handleInputRows(key: String, rows: Iterator[AttemptResult],
                                 timers: TimerValues): Iterator[Dispatch] = {
      val out = Seq.newBuilder[Dispatch]
      rows.toSeq.sortBy(r => (r.eventTime.getTime, r.attempt)).foreach { r =>
        if (r.failed && !waiting.exists()) {
          if (r.attempt >= maxAttempts) {
            out += Dispatch("DEAD", key, r.payload, r.attempt, r.eventTime)
          } else {
            // the backoff base is the operator's CLOCK: the event time
            // under event-time mode (watermark-driven, replay-stable),
            // the wall clock under processing-time mode (an event-time
            // base there would lie in the timer's past and dispatch
            // instantly)
            val base =
              if (wallClock) timers.getCurrentProcessingTimeInMs()
              else r.eventTime.getTime
            val due = base + backoffMs(r.attempt)
            waiting.update(Waiting(r.payload, r.attempt, due))
            getHandle.registerTimer(due)
          }
        }
        // successes and duplicate failures while waiting: no-ops — the
        // slot belongs to the first failure until its dispatch
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Dispatch] = {
      val out = Seq.newBuilder[Dispatch]
      if (waiting.exists()) {
        val s = waiting.get()
        out += Dispatch("RETRY", key, s.payload, s.attempt + 1,
          new Timestamp(s.dueMs))
        waiting.clear()
      }
      out.result().iterator
    }
  }

  /** Dispatch stream for `results` under the reference's redelivery
    * schedule. Event-time mode (default) needs `results` watermarked on
    * `eventTime` (declared here via `watermarkDelay`); wall-clock mode
    * (`wallClock = true`) uses processing-time timers instead — no
    * watermark required, dispatch latency is real elapsed time.
    * Requires the RocksDB state store provider like every
    * transformWithState operator.
    */
  def schedule(results: Dataset[AttemptResult],
               initialDelayMs: Long = 5000L, multiplier: Double = 2.0,
               capMs: Long = 60000L, maxAttempts: Int = 3,
               wallClock: Boolean = false,
               watermarkDelay: String = "0 seconds"): Dataset[Dispatch] = {
    require(initialDelayMs > 0, "initialDelayMs must be > 0")
    require(multiplier >= 1.0, "multiplier must be >= 1")
    require(capMs >= initialDelayMs, "capMs must be >= initialDelayMs")
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    val spark = results.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[Dispatch] = Encoders.product[Dispatch]
    val in = results.filter(col("msgId").isNotNull &&
      col("eventTime").isNotNull)
    val keyed =
      (if (wallClock) in else in.withWatermark("eventTime", watermarkDelay))
        .groupByKey(_.msgId)
    val proc = new RetryProcessor(initialDelayMs, multiplier, capMs,
      maxAttempts, wallClock)
    keyed.transformWithState(proc,
      if (wallClock) TimeMode.ProcessingTime() else TimeMode.EventTime(),
      OutputMode.Append())
  }
}
