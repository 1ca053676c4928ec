package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, MapState}
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
  * Built on `transformWithState`: a bucket's members live in a
  * `MapState[docId → (signature, lastSeenMs)]` — per-ENTRY state rows,
  * so a batch writes only the signatures it inserted/refreshed/evicted
  * (numHashes·8 bytes each) instead of serializing every resident
  * signature every trigger, and per-task transient memory is one bucket
  * plus its own batch rows, never a shard of the trigger. State is
  * scoped three ways: `maxBucketEntries` per bucket
  * (least-recently-seen evicted first, ties broken by docId —
  * deterministic), a per-entry TTL enforced on read, and ONE event-time
  * timer per bucket at the longest-lived entry's expiry that physically
  * frees idle state. The native TTLConfig is processing-time-based,
  * which would break replay determinism — the event-time window is
  * enforced explicitly. Narrower `bands` cuts memory linearly at the
  * price of recall (P[miss | j] = (1−j^(numHashes/bands))^bands;
  * 1.5e-6 at j=0.8 with 128/32).
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

  private[streaming] final case class SigEntry(sig: Array[Long], lastMs: Long)

  final case class JaccardHit(docId: Long, matchedId: Long,
                              estJaccard: Double, eventTime: Timestamp)

  private final class BandProcessor(threshold: Double, ttlMs: Long,
                                    maxBucketEntries: Int)
      extends StatefulProcessor[(Int, Long), KeyedSig, JaccardHit] {

    @transient private var entries: MapState[Long, SigEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getMapState[Long, SigEntry]("entries",
        Encoders.scalaLong, Encoders.product[SigEntry], TTLConfig.NONE)

    private def armTimer(at: Long): Unit = {
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(at)
    }

    override def handleInputRows(key: (Int, Long), rows: Iterator[KeyedSig],
                                 timers: TimerValues): Iterator[JaccardHit] = {
      val wm = timers.getCurrentWatermarkInMs()
      // load the bucket once (bounded by maxBucketEntries); purge-on-
      // read: TTL-expired entries must not match even if the bucket
      // stays hot enough that its timer keeps moving forward
      val live = mutable.LinkedHashMap.empty[Long, SigEntry]
      val removed = mutable.ArrayBuffer.empty[Long]
      val it = entries.iterator()
      while (it.hasNext) {
        val (id, e) = it.next()
        if (e.lastMs + ttlMs > wm) live.update(id, e) else removed += id
      }
      val touched = mutable.HashSet.empty[Long]
      val out = Seq.newBuilder[JaccardHit]
      rows.toSeq.sortBy(d => (d.eventTime.getTime, d.docId)).foreach { d =>
        live.foreach { case (id, e) =>
          if (id != d.docId) {
            var agree = 0
            val k = math.min(e.sig.length, d.sig.length)
            var i = 0
            while (i < k) {
              if (e.sig(i) == d.sig(i)) agree += 1
              i += 1
            }
            val est = if (k == 0) 0d else agree.toDouble / k
            if (est >= threshold)
              out += JaccardHit(d.docId, id, est, d.eventTime)
          }
        }
        live.update(d.docId, SigEntry(d.sig, d.eventTime.getTime))
        touched += d.docId
        if (live.size > maxBucketEntries) {
          // deterministic bound: evict the least-recently-seen entry
          val victim = live.minBy { case (id, e) => (e.lastMs, id) }._1
          live.remove(victim)
          touched.remove(victim)
          removed += victim
        }
      }
      // delta write-back: only inserted/refreshed and removed entries
      // touch the store
      removed.foreach(entries.removeKey)
      touched.foreach(id => entries.updateValue(id, live(id)))
      // the timer covers the LONGEST-lived kept entry (a late but valid
      // arrival must not shrink the bucket's lifetime)
      armTimer(live.valuesIterator.map(_.lastMs).max + ttlMs)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                    info: ExpiredTimerInfo)
        : Iterator[JaccardHit] = {
      val wm = timers.getCurrentWatermarkInMs()
      var any = false
      var maxLast = Long.MinValue
      val expired = mutable.ArrayBuffer.empty[Long]
      val it = entries.iterator()
      while (it.hasNext) {
        val (id, e) = it.next()
        if (e.lastMs + ttlMs > wm) { any = true; maxLast = math.max(maxLast, e.lastMs) }
        else expired += id
      }
      expired.foreach(entries.removeKey)
      if (!any) entries.clear()
      else armTimer(maxLast + ttlMs)
      Iterator.empty
    }
  }

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
    // 0 would empty the bucket after every insert and crash the timer
    // arming on an empty max — fail at plan time, not mid-stream
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
    implicit val hitEnc: Encoder[JaccardHit] = Encoders.product[JaccardHit]
    keyed
      .groupByKey(k => (k.band, k.bucket))
      .transformWithState(
        new BandProcessor(threshold, ttlMs, maxBucketEntries),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
