package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.StreamingHeavyHitters.{HitterSnapshot, TokenEvent}

class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the operator's consumption contract: counts are strictly monotonic
  // per (bucket, token), so the current view is the max-COUNT snapshot
  // (robust to out-of-order event times, unlike max-by-eventTime)
  private def latest(rows: Seq[HitterSnapshot]): Map[(Int, String), HitterSnapshot] =
    rows.groupBy(h => (h.bucket, h.token))
      .view.mapValues(_.maxBy(_.count)).toMap

  test("hot tokens survive a long tail; SpaceSaving bounds hold; state is capped") {
    // 1 bucket, capacity 16, bucket traffic N = 100: the SpaceSaving
    // guarantee (error ≤ N/capacity ≈ 6) genuinely covers all three hot
    // tokens (true counts 30/20/10 > N/capacity), so they must survive
    // the 40-token unique tail churning the remaining 13 slots — not
    // merely linger as stale snapshots
    val events = Seq.newBuilder[TokenEvent]
    var t = 0
    def emit(tok: String): Unit = {
      events += TokenEvent(tok, ts(f"2024-03-05 07:00:${t % 60}%02d"))
      t += 1
    }
    (0 until 30).foreach(_ => emit("hot_a"))
    (0 until 20).foreach(_ => emit("hot_b"))
    (0 until 10).foreach(_ => emit("hot_c"))
    (0 until 40).foreach(i => emit(s"tail_$i"))

    val source = MemoryStream[TokenEvent](spark)
    val out = StreamingHeavyHitters.track(source.toDS(),
      nBuckets = 1, capacity = 16)
    val q = out.writeStream.format("memory")
      .queryName("hh_out").outputMode("append").start()
    // two micro-batches: state must carry counts across the boundary
    val (first, second) = events.result().splitAt(45)
    source.addData(first: _*); q.processAllAvailable()
    source.addData(second: _*); q.processAllAvailable()
    q.stop()

    val snaps = spark.table("hh_out").as[HitterSnapshot].collect().toSeq
    val cur = latest(snaps)
    val trueCounts = Map("hot_a" -> 30L, "hot_b" -> 20L, "hot_c" -> 10L)
    trueCounts.foreach { case (tok, truth) =>
      val h = cur.getOrElse((0, tok),
        fail(s"heavy hitter $tok missing from snapshots"))
      assert(h.count >= truth, s"$tok undercounted: ${h.count} < $truth")
      assert(h.count - h.err <= truth,
        s"$tok error bound violated: ${h.count} - ${h.err} > $truth")
    }
    // top-3 by guaranteed (count - err) mass must be exactly the hot set
    val top3 = cur.values.toSeq.sortBy(h => (-(h.count - h.err), h.token))
      .take(3).map(_.token).toSet
    assert(top3 == trueCounts.keySet, s"top-3 was $top3")
  }

  test("eviction golden: newcomer inherits the minimum's count; evicted emit nothing") {
    // capacity 1, one bucket, same event time: processed in token order
    // a -> (1,0); b evicts a -> (2,1); c evicts b -> (3,2). Only the
    // surviving counter c snapshots (bounded emission) and its
    // (count, err) pins the inheritance chain through a and b
    val source = MemoryStream[TokenEvent](spark)
    val out = StreamingHeavyHitters.track(source.toDS(),
      nBuckets = 1, capacity = 1)
    val q = out.writeStream.format("memory")
      .queryName("hh_cap").outputMode("append").start()
    source.addData(
      TokenEvent("a", ts("2024-03-05 08:00:00")),
      TokenEvent("b", ts("2024-03-05 08:00:00")),
      TokenEvent("c", ts("2024-03-05 08:00:00")))
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("hh_cap").as[HitterSnapshot].collect()
      .map(h => (h.token, h.count, h.err)).toSet
    assert(snaps == Set(("c", 3L, 2L)))
  }

  test("arbitrarily late events still count (no watermark, no undercount)") {
    val source = MemoryStream[TokenEvent](spark)
    val out = StreamingHeavyHitters.track(source.toDS(),
      nBuckets = 1, capacity = 4)
    val q = out.writeStream.format("memory")
      .queryName("hh_late").outputMode("append").start()
    source.addData(TokenEvent("x", ts("2024-03-05 12:00:00")))
    q.processAllAvailable()
    // hours behind the stream's max event time — a watermarked stateful
    // op would silently drop this and undercount x forever
    source.addData(TokenEvent("x", ts("2024-03-05 07:00:00")))
    q.processAllAvailable()
    q.stop()
    val best = spark.table("hh_late").as[HitterSnapshot].collect()
      .filter(_.token == "x").map(_.count).max
    assert(best == 2L)
  }
}
