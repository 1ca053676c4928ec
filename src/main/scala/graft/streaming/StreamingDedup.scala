package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.SketchFns

/** Streaming near-duplicate detection — the online twin of
  * [[graft.ext.Dedup.simhashPairs]] for a document STREAM: each arriving
  * document is checked against the recent stream and emits a hit per
  * earlier near-duplicate (Hamming distance over 64-bit SimHash ≤
  * maxDistance), without ever re-scanning the corpus.
  *
  * Same pigeonhole decomposition as the batch operator (literally the
  * same builder — [[graft.functions.SketchFns.simhash_chunks]]): state is
  * keyed by (chunk, chunkValue) and each document visits maxDistance+1
  * buckets. Per-bucket state is a bounded list of (docId, simhash,
  * lastSeenMs) — ~24 bytes per doc per bucket — scoped two ways: an
  * event-time timeout removes idle buckets once EVERY entry's TTL has
  * passed, and the data path purges expired entries before matching (a
  * bucket that keeps receiving traffic would otherwise never time out
  * and would match against arbitrarily old documents).
  *
  * A pair colliding in several chunks emits one identical hit per
  * colliding chunk — duplicate-tolerant by contract, like the batch
  * LSH candidate stream. Consume idempotently on (docId, matchedId),
  * or dedup in a SEPARATE downstream query (sink the hits, then
  * `readStream.withWatermark("eventTime", d)
  * .dropDuplicatesWithinWatermark("docId", "matchedId")`). Do NOT
  * chain that dedup in the same query: its second watermark node only
  * advances when hits flow, and the global watermark is the minimum
  * over all nodes — a quiet period would freeze it and stall this
  * operator's own TTL cleanup.
  */
object StreamingDedup {

  final case class DocEvent(docId: Long, simhash: Long, eventTime: Timestamp)

  final case class KeyedDoc(chunk: Int, bucket: Long, docId: Long,
                            simhash: Long, eventTime: Timestamp)

  final case class BucketEntry(docId: Long, simhash: Long, lastMs: Long)

  final case class BucketState(entries: List[BucketEntry])

  final case class NearDupHit(docId: Long, matchedId: Long, hamming: Int,
                              eventTime: Timestamp)

  /** `docs` need not be pre-watermarked; `watermarkDelay` is applied to
    * eventTime after the chunk fan-out. `maxBucketEntries` bounds state
    * per bucket (oldest entries evicted first — an eviction only costs
    * recall against documents older than the bucket's recent window).
    */
  def detect(docs: Dataset[DocEvent], maxDistance: Int = 3,
             watermarkDelay: String = "10 minutes",
             ttlMs: Long = 3600 * 1000L,
             maxBucketEntries: Int = 1024): Dataset[NearDupHit] = {
    // 0 would leave `entries` empty after take() and crash the state
    // function on entries.max — fail at plan time, not mid-stream
    require(maxBucketEntries >= 1, "maxBucketEntries must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.toDF()
      .select(col("docId"), col("simhash"), col("eventTime"),
              explode(SketchFns.simhash_chunks(col("simhash"), maxDistance))
                .as("cc"))
      .select(col("cc.chunk"), col("cc.v").as("bucket"), col("docId"),
              col("simhash"), col("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[KeyedDoc]
    implicit val su = Encoders.product[NearDupHit]
    implicit val ss = Encoders.product[BucketState]
    keyed
      .groupByKey(k => (k.chunk, k.bucket))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // purge-on-read: entries past the TTL must not match even if
            // the bucket itself stays hot enough to never hit the timeout
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.lastMs + ttlMs > wm)
            val sorted = rows.toSeq.sortBy(d => (d.eventTime.getTime, d.docId))
            val out = Seq.newBuilder[NearDupHit]
            sorted.foreach { d =>
              entries.foreach { e =>
                if (e.docId != d.docId) {
                  val h = java.lang.Long.bitCount(e.simhash ^ d.simhash)
                  if (h <= maxDistance)
                    out += NearDupHit(d.docId, e.docId, h, d.eventTime)
                }
              }
              entries = (BucketEntry(d.docId, d.simhash, d.eventTime.getTime)
                :: entries.filterNot(_.docId == d.docId))
                .take(maxBucketEntries)
            }
            state.update(BucketState(entries))
            // timeout covers the LONGEST-lived kept entry: keying it off
            // this batch's max alone would let a late (but valid) arrival
            // shrink the bucket's lifetime and drop earlier entries
            // before their own TTLs expire. Never at/below the watermark
            // (Spark rejects that).
            val maxLast = entries.iterator.map(_.lastMs).max
            state.setTimeoutTimestamp(math.max(maxLast + ttlMs, wm + 1))
            out.result().iterator
          }
      }
  }
}
