package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.StreamingBloomDedup.{Decision, DocKey}

class StreamingBloomDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val t0 = "2024-03-05 10:00:00"

  private def run(name: String)(batches: Seq[Seq[DocKey]]): Seq[Decision] = {
    val source = MemoryStream[DocKey](spark)
    val q = StreamingBloomDedup.dedup(source.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Decision].collect().toSeq
  }

  test("one-sided error: a re-sent key is NEVER flagged new, across batches") {
    val out = run("bloom_dedup_resend")(Seq(
      Seq(DocKey(1L, "alpha", ts(t0)), DocKey(2L, "beta", ts(t0))),
      Seq(DocKey(3L, "alpha", ts("2024-03-05 11:00:00"))),   // cross-batch dup
      Seq(DocKey(4L, "alpha", ts("2024-03-07 09:00:00")))))  // days later: still caught
    val byDoc = out.map(d => d.docId -> d.definitelyNew).toMap
    assert(byDoc(1L) && byDoc(2L))
    assert(!byDoc(3L) && !byDoc(4L), "re-sent key escaped the filter")
  }

  test("in-batch duplicate: first occurrence new, second caught (deterministic order)") {
    val out = run("bloom_dedup_inbatch")(Seq(Seq(
      DocKey(11L, "same", ts("2024-03-05 10:00:01")),
      DocKey(10L, "same", ts(t0)))))  // earlier eventTime wins "first"
    val byDoc = out.map(d => d.docId -> d.definitelyNew).toMap
    assert(byDoc(10L) && !byDoc(11L))
  }

  test("distinct keys come out overwhelmingly new (FP rate within budget)") {
    val keys = (0 until 2000).map(i => DocKey(i.toLong, s"key-$i", ts(t0)))
    val out = run("bloom_dedup_fp")(Seq(keys))
    val dupFlagged = out.count(!_.definitelyNew)
    // 2000 keys in 16 shards x 65536 bits = ~0.3 bits used per slot; FPs
    // should be essentially zero — allow a generous 1%
    assert(dupFlagged <= 20, s"$dupFlagged of 2000 distinct keys flagged dup")
    assert(out.length == 2000)
  }

  test("null key / null eventTime rows are dropped, not NPE'd") {
    val out = run("bloom_dedup_nulls")(Seq(Seq(
      DocKey(1L, null, ts(t0)),
      DocKey(2L, "ok", null),
      DocKey(3L, "ok", ts(t0)))))
    assert(out.map(_.docId) == Seq(3L))
  }
}
