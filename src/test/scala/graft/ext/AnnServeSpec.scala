package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The SERVING twin of [[AnnIngestSpec]]: a micro-batch stream of queries
  * answered from the live index WHILE ingest and compaction mutate it.
  * Each query batch's results are compared against the in-query IVF
  * reference ([[Similarity.ivfTopK]]) computed over exactly the logical
  * corpus whose appends had committed when the batch was served — which
  * is the read-your-writes-within-one-generation contract:
  *
  *  - a vector appended in generation N is served by every query batch
  *    after N commits (inserts visible);
  *  - an UPSERT that moves a vector to a different cell never serves its
  *    stale copy (the tombstone join), including from query batches that
  *    run between the upsert and the compaction;
  *  - compaction is invisible to serving: the query batch immediately
  *    after [[AnnIndex.compact]] returns bit-identically to the one
  *    before it, and post-compaction appends keep serving correctly
  *    (the generation clock and tombstone set reset cleanly).
  */
final case class ServeQuery(vec_id: Long, embedding: Array[Float])

class AnnServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("query stream over live index: read-your-writes, no stale serves across compaction") {
    val sf = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-ann-serve"

    // logical corpus states the ingest sequence walks through
    val base = embs.filter(col("vec_id") % 3 === 0)
    val insertBatch = embs.filter(col("vec_id") % 3 === 1)
    // upsert: flip an existing vector's embedding — flips every sign
    // bit, so it MOVES to a different cell and only the tombstone can
    // kill the stale copy in the old cell
    val movedId = base.select(min(col("vec_id"))).head().getLong(0)
    val upsertBatch = embs.filter(col("vec_id") === movedId)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    val afterInsert = base.unionByName(insertBatch)
    val afterUpsert = afterInsert.filter(col("vec_id") =!= movedId)
      .unionByName(upsertBatch)
    val postBatch = embs.filter(col("vec_id") % 3 === 2)
    val afterPost = afterUpsert.unionByName(postBatch)

    val queries = embs.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))

    def reference(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(queries, corpus, k = 5, bits = 4)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq.sorted

    // the serving stream: each micro-batch of query ids is answered
    // from the index's CURRENT on-disk state at trigger time
    val served =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Int, Long)]]()
    val qsource = MemoryStream[ServeQuery](spark)
    val qstream = qsource.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ServeQuery], id: Long) =>
        val res = AnnIndex.topK(spark, dir, batch.toDF(), k = 5, bits = 4)
          .select("query_id", "rank", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
          .toSeq.sorted
        served.put(id, res); ()
      }
      .start()
    val queryRows = queries.collect()
      .map(r => ServeQuery(r.getLong(0), r.getSeq[Float](1).toArray))
    def serveBatch(): Long = {
      qsource.addData(queryRows: _*)
      qstream.processAllAvailable()
      served.keySet().stream().mapToLong(_.longValue()).max().getAsLong
    }

    AnnIndex.build(base, dir, bits = 4)
    val q0 = serveBatch()
    assert(served.get(q0) == reference(base), "serve over the base build")

    AnnIndex.append(insertBatch, dir, gen = 1L)
    val q1 = serveBatch()
    assert(served.get(q1) == reference(afterInsert),
      "inserts visible to the next query batch (read-your-writes)")

    AnnIndex.append(upsertBatch, dir, gen = 2L)
    val q2 = serveBatch()
    assert(served.get(q2) == reference(afterUpsert),
      "upsert visible; stale cross-cell copy not served pre-compaction")

    AnnIndex.compact(spark, dir)
    val q3 = serveBatch()
    assert(served.get(q3) == served.get(q2),
      "compaction is invisible to serving (bit-identical results)")

    AnnIndex.append(postBatch, dir, gen = 1L)
    val q4 = serveBatch()
    assert(served.get(q4) == reference(afterPost),
      "post-compaction appends serve correctly (gen clock reset)")

    qstream.stop()
    // every batch equaled its exact logical-state reference, so the
    // stale cross-cell copy of movedId was never served post-upsert —
    // the per-batch equalities above ARE the staleness proof
    assert(served.size() == 5)
  }
}
