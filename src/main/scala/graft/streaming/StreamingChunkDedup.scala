package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming chunk-level exact dedup — the online twin of
  * [[graft.ext.Dedup.chunkDedup]]: each arriving document's fixed
  * word-chunks are claimed against a corpus-wide first-owner registry,
  * so a chunk already seen (in any earlier micro-batch, any document)
  * is flagged as a duplicate of its original owner. The chunking is
  * literally the batch operator's expression
  * ([[graft.ext.Dedup.chunksOf]]), so batch and stream dedup the SAME
  * units.
  *
  * State is keyed by the chunk STRING (exactness contract, matching the
  * batch operator; the value is a fixed ~24-byte owner record, the key
  * lives in the state store's own hashtable). The first-owner decision
  * within a micro-batch is ordered by (eventTime, docId, idx) — the
  * same deterministic, replay-stable "first" as the batch window. The
  * TTL is a DEDUP WINDOW: an owner entry's clock refreshes every time
  * its chunk is seen again (hot boilerplate stays deduplicated
  * indefinitely), and idle chunks age out via event-time timeout so
  * state is bounded by the distinct-chunk traffic of one TTL window,
  * not by stream lifetime.
  *
  * Emits one decision per chunk occurrence; reassembling retained text
  * (the batch operator's digest step) is a stateless downstream
  * `groupBy(docId)` — kept out of this query on purpose (a second
  * stateful/watermark node in the same query would gate this
  * operator's timeouts on downstream progress).
  */
object StreamingChunkDedup {

  final case class DocText(docId: Long, text: String, eventTime: Timestamp)

  final case class ChunkOccurrence(chunk: String, docId: Long, idx: Int,
                                   eventTime: Timestamp)

  final case class ChunkOwner(docId: Long, idx: Int, lastMs: Long)

  final case class ChunkDecision(docId: Long, idx: Int, kept: Boolean,
                                 ownerDoc: Long, ownerIdx: Int,
                                 eventTime: Timestamp)

  def dedup(docs: Dataset[DocText], chunkWords: Int = 8,
            watermarkDelay: String = "10 minutes",
            ttlMs: Long = 3600 * 1000L): Dataset[ChunkDecision] = {
    require(ttlMs > 0, "ttlMs must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.toDF()
      // plan-edge guard (mirrors StreamingHeavyHitters): a null eventTime
      // is NOT reliably dropped by the watermark before reaching the state
      // function, and would NPE the in-batch (eventTime, docId, idx) sort;
      // null text has no chunks to claim.
      .filter(col("eventTime").isNotNull && col("text").isNotNull)
      .select(col("docId"), col("eventTime"),
        posexplode(graft.ext.Dedup.chunksOf(col("text"), chunkWords))
          .as(Seq("idx", "chunk")))
      .select(col("chunk"), col("docId"), col("idx"), col("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[ChunkOccurrence]
    implicit val eo = Encoders.product[ChunkDecision]
    implicit val es = Encoders.product[ChunkOwner]
    keyed
      .groupByKey(_.chunk)
      .flatMapGroupsWithState[ChunkOwner, ChunkDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[ChunkOwner]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // purge-on-read: an owner past its dedup window must not
            // claim chunks that arrive after it should have aged out
            var owner = state.getOption.filter(_.lastMs + ttlMs > wm)
            val sorted = rows.toSeq
              .sortBy(o => (o.eventTime.getTime, o.docId, o.idx))
            val out = sorted.map { o =>
              owner match {
                case Some(w) =>
                  // keep-alive: every sighting refreshes the window
                  owner = Some(w.copy(lastMs = math.max(w.lastMs, o.eventTime.getTime)))
                  val self = w.docId == o.docId && w.idx == o.idx
                  ChunkDecision(o.docId, o.idx, kept = self,
                    ownerDoc = w.docId, ownerIdx = w.idx, o.eventTime)
                case None =>
                  owner = Some(ChunkOwner(o.docId, o.idx, o.eventTime.getTime))
                  ChunkDecision(o.docId, o.idx, kept = true,
                    ownerDoc = o.docId, ownerIdx = o.idx, o.eventTime)
              }
            }
            val w = owner.get // sorted is non-empty, so owner is set
            state.update(w)
            // never at/below the watermark (Spark rejects that)
            state.setTimeoutTimestamp(math.max(w.lastMs + ttlMs, wm + 1))
            out.iterator
          }
      }
  }
}
