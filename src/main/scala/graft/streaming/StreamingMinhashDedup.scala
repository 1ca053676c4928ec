package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.SketchFns

/** Streaming banded-MinHash near-duplicate detection — the online twin
  * of [[graft.ext.Dedup.minhashPairs]], complementing
  * [[StreamingDedup]]: SimHash catches near-IDENTICAL documents (a few
  * flipped bits); banded MinHash catches the Jaccard-0.8 regime the
  * batch dedup pipeline targets, where documents share most — but far
  * from all — of their shingles.
  *
  * Same building blocks as the batch operator (literally the same
  * native kernels — `hashed_shingles` → `minhash_signature` →
  * `band_buckets`): state is keyed by (band, bucket), and each document
  * visits `bands` buckets. Where the batch pipeline verifies candidates
  * with EXACT Jaccard by rejoining the shingle arrays, a stream has no
  * corpus to rejoin — so each bucket entry carries the document's full
  * minhash signature and verification is the signature-agreement
  * ESTIMATE (fraction of equal components; standard error
  * √(j(1−j)/numHashes) ≈ 0.035 at j=0.8 with 128 hashes). That is the
  * honest streaming trade and it is surfaced, not hidden: hits report
  * `estJaccard`, and a consumer needing exactness re-verifies the (few)
  * hit pairs against stored shingle sets downstream.
  *
  * State cost is `bands` copies of the signature per live document
  * (bands·numHashes·8 bytes ≈ 32 KB at the 128/32 defaults), bounded
  * three ways: `maxBucketEntries` per bucket (oldest evicted first),
  * per-entry TTL purged on read, and an event-time timeout that removes
  * idle buckets outright. Narrower `bands` cuts memory linearly at the
  * price of recall (P[miss | j] = (1−j^(numHashes/bands))^bands; 1.5e-6
  * at j=0.8 with 128/32).
  *
  * Like the batch LSH candidate stream and the SimHash twin, a pair
  * colliding in several bands emits one identical hit per colliding
  * band — consume idempotently on (docId, matchedId), or dedup in a
  * SEPARATE downstream query (never chain a second watermark after
  * this operator: the global watermark is the min over all nodes and a
  * quiet hit stream would freeze this operator's own TTL cleanup).
  */
object StreamingMinhashDedup {

  final case class DocText(docId: Long, text: String, eventTime: Timestamp)

  final case class KeyedSig(band: Int, bucket: Long, docId: Long,
                            sig: Array[Long], eventTime: Timestamp)

  final case class SigEntry(docId: Long, sig: Array[Long], lastMs: Long)

  final case class BandState(entries: List[SigEntry])

  final case class JaccardHit(docId: Long, matchedId: Long,
                              estJaccard: Double, eventTime: Timestamp)

  /** `docs` need not be pre-watermarked; `watermarkDelay` is applied
    * after the signature/band fan-out (all of it map-side native
    * kernels — the only shuffle is the groupByKey on (band, bucket)).
    */
  def detect(docs: Dataset[DocText], n: Int = 3, threshold: Double = 0.8,
             numHashes: Int = 128, bands: Int = 32,
             watermarkDelay: String = "10 minutes",
             ttlMs: Long = 3600 * 1000L,
             maxBucketEntries: Int = 256): Dataset[JaccardHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // 0 would leave `entries` empty after take() and crash the state
    // function on entries.max — fail at plan time, not mid-stream
    require(maxBucketEntries >= 1, "maxBucketEntries must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.toDF()
      .select(col("docId"), col("eventTime"),
        SketchFns.minhash_signature(
          SketchFns.hashed_shingles(col("text"), n), numHashes).as("sig"))
      .select(col("docId"), col("eventTime"), col("sig"),
        posexplode(SketchFns.band_buckets(col("sig"), bands))
          .as(Seq("band", "bucket")))
      .withWatermark("eventTime", watermarkDelay)
      .as[KeyedSig]
    implicit val hitEnc = Encoders.product[JaccardHit]
    implicit val stateEnc = Encoders.product[BandState]
    keyed
      .groupByKey(k => (k.band, k.bucket))
      .flatMapGroupsWithState[BandState, JaccardHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // purge-on-read: TTL-expired entries must not match even if
            // the bucket stays hot enough to never hit the timeout
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.lastMs + ttlMs > wm)
            val sorted = rows.toSeq.sortBy(d => (d.eventTime.getTime, d.docId))
            val out = Seq.newBuilder[JaccardHit]
            sorted.foreach { d =>
              entries.foreach { e =>
                if (e.docId != d.docId) {
                  var agree = 0
                  val k = math.min(e.sig.length, d.sig.length)
                  var i = 0
                  while (i < k) {
                    if (e.sig(i) == d.sig(i)) agree += 1
                    i += 1
                  }
                  val est = if (k == 0) 0d else agree.toDouble / k
                  if (est >= threshold)
                    out += JaccardHit(d.docId, e.docId, est, d.eventTime)
                }
              }
              entries = (SigEntry(d.docId, d.sig, d.eventTime.getTime)
                :: entries.filterNot(_.docId == d.docId))
                .take(maxBucketEntries)
            }
            state.update(BandState(entries))
            // timeout covers the longest-lived kept entry, never at or
            // below the watermark (Spark rejects that)
            val maxLast = entries.iterator.map(_.lastMs).max
            state.setTimeoutTimestamp(math.max(maxLast + ttlMs, wm + 1))
            out.result().iterator
          }
      }
  }
}
