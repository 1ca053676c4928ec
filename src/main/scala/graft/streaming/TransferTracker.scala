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
            // a terminal status anywhere in the batch completes the
            // transfer even if a redelivered RECEIVED sorts after it —
            // otherwise the completion is lost and a spurious STALLED
            // fires later. (A terminal arriving in a LATER batch than a
            // replayed RECEIVED still re-creates state: exactly-once
            // tombstones would need TTL'd terminal markers.)
            val terminal = sorted.map(_.status)
              .find(st => st == "PROCESSED" || st == "FAILED")
            terminal match {
              case Some(status) =>
                state.remove()
                val atMs = sorted.find(e => e.status == status).get
                  .eventTime.getTime
                Iterator.single(TransferUpdate(key, status,
                  updated.updates, atMs - updated.firstSeenMs))
              case None =>
                state.update(updated)
                // never set a timeout at or below the watermark (Spark
                // rejects it): replayed old events get at least one more
                // microbatch interval before stalling
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                  math.max(updated.firstSeenMs + TimeoutMs, wm + 1))
                Iterator.empty
            }
          }
      }
  }
}
