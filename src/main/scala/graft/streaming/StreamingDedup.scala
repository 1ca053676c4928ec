package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the online twin of
  * [[graft.ext.Dedup.simhashPairs]] for a document STREAM: each arriving
  * document is checked against the recent stream and emits a hit per
  * earlier near-duplicate (Hamming distance over 64-bit SimHash ≤
  * maxDistance), without ever re-scanning the corpus.
  *
  * Same pigeonhole decomposition as the batch operator: the signature
  * splits into maxDistance+1 chunks, any pair within distance d agrees on
  * ≥1 chunk, so state is keyed by (chunk, chunkValue) and each document
  * visits maxDistance+1 buckets. Per-bucket state is a bounded list of
  * (docId, simhash, lastSeenMs) — ~24 bytes per doc per bucket — scoped
  * two ways: an event-time timeout removes idle buckets past the TTL, and
  * the data path purges expired entries before matching (a bucket that
  * keeps receiving traffic would otherwise never time out and would match
  * against arbitrarily old documents).
  *
  * A pair can collide in several chunks; complete the pipeline with a
  * watermarked `dropDuplicates("docId", "matchedId")` downstream.
  */
object StreamingDedup {

  final case class DocEvent(docId: Long, simhash: Long, eventTime: Timestamp)

  final case class KeyedDoc(chunk: Int, bucket: Long, docId: Long,
                                    simhash: Long, eventTime: Timestamp)

  final case class BucketEntry(docId: Long, simhash: Long, lastMs: Long)

  final case class BucketState(entries: List[BucketEntry])

  final case class NearDupHit(docId: Long, matchedId: Long, hamming: Int)

  /** `docs` need not be pre-watermarked; `watermarkDelay` is applied to
    * eventTime after the chunk fan-out. `maxBucketEntries` bounds state
    * per bucket (oldest entries evicted first — an eviction only costs
    * recall against documents older than the bucket's recent window).
    */
  def detect(docs: Dataset[DocEvent], maxDistance: Int = 3,
             watermarkDelay: String = "10 minutes",
             ttlMs: Long = 3600 * 1000L,
             maxBucketEntries: Int = 1024): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    // 1L << 64 wraps; a full-width chunk needs the explicit all-ones mask
    val mask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    val chunkStructs = (0 until chunks).map(c =>
      struct(lit(c).as("chunk"),
             shiftrightunsigned(col("simhash"), c * bitsPer)
               .bitwiseAND(mask).as("bucket")))
    val keyed = docs.toDF()
      .select(col("docId"), col("simhash"), col("eventTime"),
              explode(array(chunkStructs: _*)).as("cc"))
      .select(col("cc.chunk"), col("cc.bucket"), col("docId"),
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
                  if (h <= maxDistance) out += NearDupHit(d.docId, e.docId, h)
                }
              }
              entries = (BucketEntry(d.docId, d.simhash, d.eventTime.getTime)
                :: entries.filterNot(_.docId == d.docId))
                .take(maxBucketEntries)
            }
            val lastMs = sorted.last.eventTime.getTime
            state.update(BucketState(entries))
            // never set a timeout at or below the watermark (rejected)
            state.setTimeoutTimestamp(math.max(lastMs + ttlMs, wm + 1))
            out.result().iterator
          }
      }
  }
}
