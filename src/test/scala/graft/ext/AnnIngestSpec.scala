package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The continuous-ingest wiring for the maintainable ANN index: a
  * streaming source of vectors feeds [[AnnIndex.append]] through
  * foreachBatch, one generation per micro-batch (gen = batchId + 1, so
  * replayed batch ids re-stamp the same generation — idempotent against
  * exactly-once foreachBatch replays at the generation level). After the
  * stream drains, serving from the incrementally-fed index must be
  * indistinguishable from a rebuild over everything ever ingested.
  */
final case class IngestVec(vec_id: Long, embedding: Array[Float], label: Int)

class AnnIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch ingest: streamed appends serve exactly like a rebuild") {
    val sf = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-ann-stream"
    val ref = s"${sys.props("java.io.tmpdir")}/graft-ann-stream-ref"

    // base index from the first slice; the rest arrives as a stream
    AnnIndex.build(embs.filter(col("vec_id") % 3 === 0), dir, bits = 4)
    val rows = embs.filter(col("vec_id") % 3 =!= 0)
      .collect().map(r => IngestVec(r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    val (batch1, batch2) = rows.partition(_.vec_id % 2 == 0)

    val source = MemoryStream[IngestVec](spark)
    val q = source.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[IngestVec], id: Long) =>
        AnnIndex.append(batch.toDF(), dir, gen = id + 1)
      }
      .start()
    source.addData(batch1: _*)
    q.processAllAvailable()
    source.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    AnnIndex.build(embs, ref, bits = 4)
    val queries = embs.filter(col("vec_id") < 5)
    def serve(d: String) = AnnIndex.topK(spark, d, queries, k = 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sorted
    assert(serve(dir) == serve(ref))
    assert(serve(dir).nonEmpty)
  }
}
