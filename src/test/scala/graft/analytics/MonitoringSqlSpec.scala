package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftFunctions, TestSpark}

class MonitoringSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native functions are callable from spark.sql after registration") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT poly_hash('hello') AS p, simhash64('hello world') AS s,
                size(hashed_shingles('a b c d', 3)) AS n""").collect().head
    assert(row.getAs[Long]("p") == 99162322L)
    assert(row.getAs[Int]("n") == 2) // "a b c", "b c d"
    // simhash must equal the Column-API value
    val viaColumn = Seq("hello world").toDF("t")
      .select(graft.functions.SketchFns.simhash64(org.apache.spark.sql.functions.col("t")))
      .collect().head.getLong(0)
    assert(row.getAs[Long]("s") == viaColumn)
    // round-2 natives: banding, cosine, repetition — all SQL-reachable
    val r2 = spark.sql(
      """SELECT size(band_buckets(minhash_signature(hashed_shingles('a b c d e', 3), 128), 64)) AS nb,
                size(sign_band_buckets(transform(sequence(1, 64),
                  i -> CAST(i - 32.5 AS FLOAT)), 4)) AS ns,
                size(sign_band_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4)) AS ns_clamped,
                quantized_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                                 array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
                repetition_stats('a b a b a b')[0] AS top2""").collect().head
    assert(r2.getAs[Int]("nb") == 64)
    // dim >= 64: full layout, 2 * 64/bandBits tables
    assert(r2.getAs[Int]("ns") == 32)
    // dim < bandBits: band count clamps to the real sign bits (one band,
    // two tables) instead of hashing constant pad bits
    assert(r2.getAs[Int]("ns_clamped") == 2)
    assert(r2.getAs[Double]("cos") == 1.0)
    assert(math.abs(r2.getAs[Double]("top2") - 0.6) < 1e-15)
    // round-8 native: merge-intersection of sorted long arrays
    val r3 = spark.sql(
      """SELECT sorted_intersect(array(1L, 3L, 5L, 9L),
                                 array(2L, 3L, 9L, 12L)) AS ws""").collect().head
    assert(r3.getSeq[Long](0).toSeq == Seq(3L, 9L))
    // nullable ELEMENTS are rejected at analysis time (a null slot would
    // silently read as 0 through ArrayData.getLong), with a hint
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""SELECT sorted_intersect(array(1L, CAST(NULL AS BIGINT)),
                                           array(1L))""").collect()
    }
    assert(ex.getMessage.contains("null"), ex.getMessage)
  }

  test("streaming error-ratio windows compute the alert quantity continuously") {
    val source = MemoryStream[(Timestamp, Boolean)](spark)
    val ratio = Monitoring.errorRatio(
      source.toDF().toDF("ts", "failed"),
      window_ = "10 minutes", slide = "5 minutes", watermark = "1 minute")
    val q = ratio.writeStream.format("memory")
      .queryName("mon_ratio").outputMode("append").start()
    source.addData(
      (ts("2024-03-05 07:01:00"), false),
      (ts("2024-03-05 07:02:00"), true),
      (ts("2024-03-05 07:03:00"), false),
      (ts("2024-03-05 07:04:00"), true))
    q.processAllAvailable()
    source.addData((ts("2024-03-05 08:00:00"), false)) // close windows
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mon_ratio").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
                 r.getAs[Long]("n_total"), r.getAs[Double]("error_ratio")))
    // the 07:00 window saw all 4 events, 2 failed
    assert(rows.contains(("2024-03-05 07:00:00.0", 4L, 0.5)))
  }

  test("observe() metrics flow through the listener per micro-batch") {
    val listener = new graft.sinks.PipelineListener
    spark.streams.addListener(listener)
    try {
      val source = MemoryStream[(Timestamp, Boolean)](spark)
      val observed = Monitoring.withPipelineObservations(
        source.toDF().toDF("ts", "failed"))
      val q = observed.writeStream.format("memory")
        .queryName("obs_out").outputMode("append").start()
      source.addData((ts("2024-03-05 07:01:00"), false),
                     (ts("2024-03-05 07:02:00"), true),
                     (ts("2024-03-05 07:03:00"), true))
      q.processAllAvailable()
      q.stop()
      val deadline = System.currentTimeMillis() + 10000
      def total(k: String): Double = listener.snapshots
        .flatMap(_.observed.get("pipeline")).flatMap(_.get(k)).sum
      while (total("rows") < 3.0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(total("rows") == 3.0)
      assert(total("failed_rows") == 2.0)
    } finally spark.streams.removeListener(listener)
  }

  test("streaming dlq depth counts per window") {
    val source = MemoryStream[Timestamp](spark)
    val depth = Monitoring.dlqDepth(source.toDF().toDF("ts"))
    val q = depth.writeStream.format("memory")
      .queryName("mon_dlq").outputMode("append").start()
    source.addData(ts("2024-03-05 07:01:00"), ts("2024-03-05 07:02:00"))
    q.processAllAvailable()
    source.addData(ts("2024-03-05 08:00:00"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mon_dlq").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
                 r.getAs[Long]("dlq_messages")))
    assert(rows.contains(("2024-03-05 07:00:00.0", 2L)))
  }
}
