package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming sessionization — the online twin of q19's batch
  * `session_window` aggregation, same native construct: per-user
  * activity sessions with an inactivity gap, maintained in the state
  * store so sessions MERGE across micro-batches (an event landing
  * within the gap of an open session extends it; two open sessions
  * bridged by a late-but-in-watermark event fuse into one). Append mode
  * emits each session exactly once, when the watermark passes its
  * close — the replay-stable contract downstream consumers need.
  *
  * Scale shape: state is keyed by (user, open session) — bounded by
  * concurrently-active users per gap window, not stream lifetime; the
  * watermark both bounds state age and gates emission. Values aggregate
  * in DECIMAL(12,2) exactly (house rule: float fold order never shows
  * up in results).
  */
object StreamingSessions {

  final case class UserEvent(userId: Long, value: Double, ts: Timestamp)

  def sessions(events: Dataset[UserEvent], gap: String = "30 minutes",
               watermarkDelay: String = "10 minutes"): DataFrame =
    events.toDF()
      // plan-edge null guard (house rule for every streaming operator)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("userId"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(12,2)")).cast("double")
             .as("sum_value"))
      .select(col("userId"),
              col("session_window").getField("start").as("session_start"),
              col("session_window").getField("end").as("session_end"),
              col("n_events"), col("sum_value"))
}
