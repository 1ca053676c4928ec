package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Dedup
import graft.streaming.StreamingContamination.DocText

class StreamingContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private val benchDocs = Seq(
    (1L, words("b", 12)),          // 8 distinct 5-grams b0..b11
    (2L, s"${words("c", 6)} tail") // c-grams + one mixed gram
  ).toDF("bench_id", "bench_text")

  test("streaming report matches the batch contaminationReport per document") {
    val corpus = Seq(
      DocText(10L, words("b", 12), ts("2024-03-05 10:00:00")),  // fully contaminated
      DocText(11L, s"${words("z", 7)} ${words("b", 5)}", ts("2024-03-05 10:00:01")),
      DocText(12L, words("z", 20), ts("2024-03-05 10:00:02")),  // clean
      DocText(13L, words("c", 6), ts("2024-03-05 10:00:03")))
    val source = MemoryStream[DocText](spark)
    val out = StreamingContamination.report(source.toDS(), benchDocs,
      col("bench_text"), n = 5)
    val q = out.writeStream.format("memory")
      .queryName("stream_contam").outputMode("complete").start()
    source.addData(corpus: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_contam")
      .select("docId", "n_shingles", "n_shared").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val batch = Dedup.contaminationReport(
        corpus.toDF().withColumnRenamed("docId", "doc_id"),
        col("doc_id"), col("text"), benchDocs, col("bench_text"), n = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(!streamed.contains(12L), "clean doc must not appear")
    assert(streamed.contains(10L) && streamed.contains(13L))
  }

  test("null eventTime / null text rows are dropped at the plan edge") {
    val source = MemoryStream[DocText](spark)
    val out = StreamingContamination.report(source.toDS(), benchDocs,
      col("bench_text"), n = 5)
    val q = out.writeStream.format("memory")
      .queryName("stream_contam_nulls").outputMode("complete").start()
    source.addData(
      DocText(20L, words("b", 12), null),
      DocText(21L, null, ts("2024-03-05 10:00:00")),
      DocText(22L, words("b", 12), ts("2024-03-05 10:00:01")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("stream_contam_nulls")
      .select("docId").collect().map(_.getLong(0)).toSet
    assert(ids == Set(22L))
  }

  test("redelivered document does not double-count (at-least-once guard)") {
    val source = MemoryStream[DocText](spark)
    val out = StreamingContamination.report(source.toDS(), benchDocs,
      col("bench_text"), n = 5)
    val q = out.writeStream.format("memory")
      .queryName("stream_contam_redeliver").outputMode("complete").start()
    val doc = DocText(40L, words("b", 12), ts("2024-03-05 10:00:00"))
    source.addData(doc)
    q.processAllAvailable()
    source.addData(doc) // redelivery in a later micro-batch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stream_contam_redeliver")
      .select("docId", "n_shingles", "n_shared").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 1)
    val (_, nSh, nShared) = rows.head
    assert(nShared == nSh.toLong,
      s"redelivery double-counted: $nShared shared of $nSh shingles")
  }

  test("contamination accumulates across micro-batches into the same window") {
    val source = MemoryStream[DocText](spark)
    val out = StreamingContamination.report(source.toDS(), benchDocs,
      col("bench_text"), n = 5, windowLen = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("stream_contam_batches").outputMode("complete").start()
    source.addData(DocText(30L, words("b", 12), ts("2024-03-05 10:00:00")))
    q.processAllAvailable()
    source.addData(DocText(31L, words("b", 12), ts("2024-03-05 10:30:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stream_contam_batches").collect()
    assert(rows.length == 2)
    // both docs land in the same 1-hour window
    assert(rows.map(_.getTimestamp(0)).distinct.length == 1)
  }
}
