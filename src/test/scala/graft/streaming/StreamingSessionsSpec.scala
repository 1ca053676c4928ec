package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.StreamingSessions.UserEvent

class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessions merge across micro-batches; append emits closed sessions once") {
    val source = MemoryStream[UserEvent](spark)
    val out = StreamingSessions.sessions(source.toDS(),
      gap = "30 minutes", watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sessions_merge").outputMode("append").start()
    // batch 1: user 1 opens a session; batch 2 extends it within the gap
    source.addData(UserEvent(1L, 1.0, ts("2024-03-05 10:00:00")))
    q.processAllAvailable()
    source.addData(UserEvent(1L, 2.0, ts("2024-03-05 10:20:00")),
                   UserEvent(2L, 5.0, ts("2024-03-05 10:20:00")))
    q.processAllAvailable()
    // nothing can emit yet: watermark hasn't passed any session end
    assert(spark.table("sessions_merge").count() == 0)
    // far-future event closes everything open
    source.addData(UserEvent(2L, 1.0, ts("2024-03-05 13:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sessions_merge")
      .select("userId", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // user 1's two batches merged into ONE session [10:00, 10:50)
    assert(rows == Set(
      (1L, ts("2024-03-05 10:00:00"), ts("2024-03-05 10:50:00"), 2L, 3.0),
      (2L, ts("2024-03-05 10:20:00"), ts("2024-03-05 10:50:00"), 1L, 5.0)))
    q.stop()
  }

  test("events past the gap open a new session, matching the batch construct") {
    val events = Seq(
      UserEvent(7L, 1.0, ts("2024-03-05 09:00:00")),
      UserEvent(7L, 1.0, ts("2024-03-05 09:10:00")),
      UserEvent(7L, 1.0, ts("2024-03-05 11:00:00"))) // > 30 min after
    val source = MemoryStream[UserEvent](spark)
    val q = StreamingSessions.sessions(source.toDS())
      .writeStream.format("memory")
      .queryName("sessions_gap").outputMode("append").start()
    source.addData(events: _*)
    source.addData(UserEvent(7L, 0.0, ts("2024-03-06 00:00:00"))) // close all
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_gap")
      .filter(col("session_start") < ts("2024-03-05 23:00:00"))
      .select("userId", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // batch twin: the same events through the same construct, statically
    val batch = events.toDF()
      .groupBy(session_window(col("ts"), "30 minutes"), col("userId"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("userId"), col("session_window.start"),
              col("session_window.end"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.size == 2, s"expected 2 sessions: $streamed")
  }

  test("null-ts rows are dropped at the plan edge") {
    val source = MemoryStream[UserEvent](spark)
    val q = StreamingSessions.sessions(source.toDS())
      .writeStream.format("memory")
      .queryName("sessions_nulls").outputMode("append").start()
    source.addData(UserEvent(1L, 1.0, null),
                   UserEvent(2L, 1.0, ts("2024-03-05 10:00:00")))
    source.addData(UserEvent(2L, 0.0, ts("2024-03-06 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val users = spark.table("sessions_nulls")
      .select("userId").collect().map(_.getLong(0)).toSet
    assert(!users.contains(1L))
  }
}
