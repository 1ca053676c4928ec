package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-transfer state tracking — the keyed stateful operator the reference
  * lacks entirely (its only state is the circuit breaker; SURVEY.md §2B
  * "stateful streaming ops"). Tracks every correlationId through its
  * lifecycle and emits:
  *   - a TERMINAL update when a transfer reaches PROCESSED/FAILED;
  *   - a STALLED update when a transfer saw RECEIVED but no terminal
  *     status before the event-time timeout — the streaming form of the
  *     reference's queue-backlog alert (k8s/monitoring/alerts.yaml:115-124:
  *     messages sitting unprocessed beyond a threshold).
  *
  * State is one small fixed-size record per in-flight transfer, scoped by
  * watermark timeout — bounded memory at any scale.
  */
object TransferTracker {

  final case class StatusEvent(
      correlationId: String,
      status: String, // RECEIVED | PROCESSED | FAILED
      eventTime: Timestamp)

  final case class TransferState(
      firstSeenMs: Long,
      lastStatus: String,
      updates: Int)

  final case class TransferUpdate(
      correlationId: String,
      finalStatus: String, // PROCESSED | FAILED | STALLED
      updates: Int,
      latencyMs: Long)

  val TimeoutMs: Long = 10 * 60 * 1000L

  /** Requires a watermark on eventTime upstream (EventTimeTimeout). */
  def track(events: Dataset[StatusEvent]): Dataset[TransferUpdate] = {
    implicit val su = Encoders.product[TransferUpdate]
    implicit val ss = Encoders.product[TransferState]
    implicit val str = Encoders.STRING
    events
      .groupByKey(_.correlationId)
      .flatMapGroupsWithState[TransferState, TransferUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[TransferState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(
              TransferUpdate(key, "STALLED", st.updates, TimeoutMs))
          } else {
            val sorted = rows.toSeq.sortBy(_.eventTime.getTime)
            val prev = state.getOption
              .getOrElse(TransferState(sorted.head.eventTime.getTime, "", 0))
            val updated = sorted.foldLeft(prev) { (s, e) =>
              TransferState(s.firstSeenMs, e.status, s.updates + 1)
            }
            if (updated.lastStatus == "PROCESSED"
                || updated.lastStatus == "FAILED") {
              state.remove()
              val last = sorted.last.eventTime.getTime
              Iterator.single(TransferUpdate(key, updated.lastStatus,
                updated.updates, last - updated.firstSeenMs))
            } else {
              state.update(updated)
              state.setTimeoutTimestamp(updated.firstSeenMs + TimeoutMs)
              Iterator.empty
            }
          }
      }
  }
}
