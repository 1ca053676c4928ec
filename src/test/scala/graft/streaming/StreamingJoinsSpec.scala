package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.StreamingJoins.{Click, Purchase}

class StreamingJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches clicks in the horizon, across micro-batches") {
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)
    val out = StreamingJoins.clickAttribution(clicks.toDS(),
      purchases.toDS(), horizonSec = 600L)
    val q = out.writeStream.format("memory")
      .queryName("attrib_inner").outputMode("append").start()

    // click lands in an EARLIER micro-batch than the purchase it matches:
    // the pair must come from join state, not same-batch co-arrival
    clicks.addData(
      Click(1L, 100L, ts("2024-03-05 07:00:00")),
      Click(2L, 100L, ts("2024-03-05 07:04:00")),
      Click(3L, 200L, ts("2024-03-05 07:00:00")))
    q.processAllAvailable()
    purchases.addData(
      Purchase(10L, 100L, 25.0, ts("2024-03-05 07:05:00")), // matches 1 and 2
      Purchase(11L, 200L, 10.0, ts("2024-03-05 07:20:00")), // click 3 outside horizon
      Purchase(12L, 300L, 99.0, ts("2024-03-05 07:05:00"))) // no click at all
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib_inner").collect()
      .map(r => (r.getLong(0), r.getLong(4))).sorted
    assert(rows.toSeq == Seq((10L, 1L), (10L, 2L)),
      s"expected purchase 10 paired with clicks 1 and 2, got ${rows.toSeq}")
  }

  test("left-outer variant surfaces click-less purchases after the watermark passes") {
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)
    val out = StreamingJoins.clickAttribution(clicks.toDS(),
      purchases.toDS(), horizonSec = 600L, watermarkDelay = "5 minutes",
      leftOuter = true)
    val q = out.writeStream.format("memory")
      .queryName("attrib_outer").outputMode("append").start()

    clicks.addData(Click(1L, 100L, ts("2024-03-05 07:00:00")))
    purchases.addData(
      Purchase(10L, 100L, 25.0, ts("2024-03-05 07:05:00")),
      Purchase(11L, 300L, 99.0, ts("2024-03-05 07:05:00")))
    q.processAllAvailable()
    // advance BOTH watermarks far past purchase 11's window so its
    // no-match verdict becomes final, then run follow-up batches to
    // flush the expired state
    clicks.addData(Click(90L, 900L, ts("2024-03-05 09:00:00")))
    purchases.addData(Purchase(90L, 900L, 1.0, ts("2024-03-05 09:00:00")))
    q.processAllAvailable()
    clicks.addData(Click(91L, 901L, ts("2024-03-05 09:30:00")))
    purchases.addData(Purchase(91L, 901L, 1.0, ts("2024-03-05 09:30:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib_outer").collect()
    val matched = rows.filter(r => r.getLong(0) == 10L)
    assert(matched.length == 1 && matched.head.getLong(4) == 1L)
    val organic = rows.filter(r => r.getLong(0) == 11L)
    assert(organic.length == 1 && organic.head.isNullAt(4),
      s"purchase 11 should surface exactly once with null click, got ${organic.toSeq}")
  }

  test("join state is evicted by the range condition (bounded, not stream-length)") {
    val clicks = MemoryStream[Click](spark)
    val purchases = MemoryStream[Purchase](spark)
    val out = StreamingJoins.clickAttribution(clicks.toDS(),
      purchases.toDS(), horizonSec = 60L, watermarkDelay = "1 minutes")
    val q = out.writeStream.format("memory")
      .queryName("attrib_state").outputMode("append").start()

    // 50 clicks early in the morning
    clicks.addData((1L to 50L).map(i =>
      Click(i, i, ts(f"2024-03-05 07:00:${i % 60}%02d"))): _*)
    purchases.addData(Purchase(1L, 1L, 1.0, ts("2024-03-05 07:01:00")))
    q.processAllAvailable()
    // hours later: watermark sweeps past, old click state must be gone
    clicks.addData(Click(900L, 900L, ts("2024-03-05 12:00:00")))
    purchases.addData(Purchase(900L, 900L, 1.0, ts("2024-03-05 12:00:00")))
    q.processAllAvailable()
    clicks.addData(Click(901L, 901L, ts("2024-03-05 12:30:00")))
    purchases.addData(Purchase(901L, 901L, 1.0, ts("2024-03-05 12:30:00")))
    q.processAllAvailable()
    val state = q.lastProgress.stateOperators
    q.stop()
    assert(state.nonEmpty)
    val totalRows = state.map(_.numRowsTotal).sum
    assert(totalRows < 20,
      s"join state not evicted: $totalRows rows retained after watermark sweep")
  }
}
