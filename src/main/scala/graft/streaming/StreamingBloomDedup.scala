package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, MapState, ValueState}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{BloomKernels, SketchKernels}

/** Streaming Bloom dedup — the online twin of
  * [[graft.ext.Dedup.incrementalNew]]: an unbounded stream deduplicated
  * against everything ever seen, in memory bounded BY CONSTRUCTION
  * rather than by TTL. The exact streaming dedups in this package
  * (chunk/SimHash/MinHash state) hold one entry per distinct key inside
  * a TTL window; this operator's state is a FIXED bit budget —
  * 2^shardBits shards × bitsPerShard bits, forever — which is the only
  * honest shape for "never re-emit a document, ever" over a 100 TB-scale
  * stream.
  *
  * Approximation contract (Bloom, one-sided): a key already seen is
  * NEVER flagged new (no false negatives — re-sent documents are always
  * caught); a genuinely new key is flagged as a duplicate with
  * probability ≈ the filter's false-positive rate, which RISES as the
  * filter fills. Production rotates generations (fresh filter per epoch,
  * probe current + previous) before saturation; sizing: ~10 bits per
  * expected lifetime key keeps FPs under 1%.
  *
  * Sharding by the hash's top bits spreads both state and per-batch work
  * uniformly across the cluster — there is no hot key by construction.
  *
  * Built on `transformWithState` (RocksDB-backed), with two scale
  * properties the old `flatMapGroupsWithState` formulation lacked:
  *
  *  - '''No whole-shard buffering.''' Input rows stream through a single
  *    lazy pass — a shard's slice of the micro-batch is NEVER
  *    materialized or sorted in heap. Transient per-task memory is the
  *    filter itself (bitsPerShard/64 longs) plus one pending champion
  *    row per DISTINCT NEW key in the slice; an arbitrarily large
  *    trigger of mostly re-sent keys costs O(filter) heap, not O(rows).
  *  - '''Per-word state writes.''' The filter lives in a sparse
  *    `MapState[wordIdx → word]`, so a batch writes only the words its
  *    insertions touched (≤ numHashes per new key) instead of
  *    serializing the whole bit array every trigger — which is what
  *    lets `bitsPerShard` scale to 2^24+ bits without a per-batch
  *    megabyte blob rewrite.
  *
  * Determinism (replay of identical batches): probes are evaluated
  * against the filter as of the START of the batch, and for a key
  * occurring several times in one batch exactly one occurrence — the
  * minimum (eventTime, docId), the "champion" — is flagged new; every
  * other occurrence is emitted as a duplicate the moment it streams by.
  * Champions' bits are inserted at the end of the pass, so the decision
  * content is a pure function of (state, batch contents), independent of
  * shuffle arrival order.
  */
object StreamingBloomDedup {

  final case class DocKey(docId: Long, key: String, eventTime: Timestamp)

  final case class KeyedDoc(shard: Int, hash: Long, docId: Long,
                            eventTime: Timestamp)

  final case class Decision(docId: Long, hash: Long, definitelyNew: Boolean,
                            eventTime: Timestamp)

  private[streaming] final case class RotMeta(inserted: Long, curIsA: Boolean)

  /** The lazy single pass shared by both variants: emits a duplicate
    * decision for every row whose key is already in the filter
    * (`inFilter`) or already has a champion in `pending`; a new key's
    * champion is withheld (it is emitted — and its bits inserted — by
    * the caller's tail pass). For same-key occurrences in one batch the
    * champion is the minimum (eventTime, docId): a later-streaming but
    * earlier-timestamped row steals the slot and the deposed champion
    * is emitted as the duplicate.
    *
    * Memory: nothing is retained except `pending` (one row per distinct
    * new key) — the returned iterator is as lazy as `rows` itself.
    */
  private[streaming] def championPass(
      rows: Iterator[KeyedDoc],
      inFilter: Long => Boolean,
      pending: mutable.HashMap[Long, KeyedDoc]): Iterator[Decision] =
    rows.flatMap { r =>
      if (inFilter(r.hash)) {
        Iterator.single(Decision(r.docId, r.hash, definitelyNew = false,
          r.eventTime))
      } else pending.get(r.hash) match {
        case None =>
          pending.update(r.hash, r)
          Iterator.empty
        case Some(c) =>
          val rFirst = r.eventTime.getTime < c.eventTime.getTime ||
            (r.eventTime.getTime == c.eventTime.getTime && r.docId < c.docId)
          if (rFirst) {
            pending.update(r.hash, r)
            Iterator.single(Decision(c.docId, c.hash, definitelyNew = false,
              c.eventTime))
          } else {
            Iterator.single(Decision(r.docId, r.hash, definitelyNew = false,
              r.eventTime))
          }
      }
    }

  /** Load a sparse word map into a dense probe array. */
  private def loadWords(state: MapState[Int, Long], n: Int): Array[Long] = {
    val a = new Array[Long](n)
    val it = state.iterator()
    while (it.hasNext) {
      val kv = it.next()
      if (kv._1 >= 0 && kv._1 < n) a(kv._1) = kv._2
    }
    a
  }

  /** Write back only the words `dirty` marks. */
  private def writeDirty(state: MapState[Int, Long], words: Array[Long],
                         dirty: java.util.BitSet): Unit = {
    var i = dirty.nextSetBit(0)
    while (i >= 0) {
      state.updateValue(i, words(i))
      i = dirty.nextSetBit(i + 1)
    }
  }

  private final class BloomProcessor(bitsPerShard: Int, numHashes: Int)
      extends StatefulProcessor[Int, KeyedDoc, Decision] {

    @transient private var words: MapState[Int, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      words = getHandle.getMapState[Int, Long]("words",
        Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[KeyedDoc],
                                 timers: TimerValues): Iterator[Decision] = {
      val arr = loadWords(words, bitsPerShard / 64)
      val pending = mutable.HashMap.empty[Long, KeyedDoc]
      val main = championPass(rows,
        h => BloomKernels.mightContain(arr, h, numHashes), pending)
      // the by-name ++ operand runs only after `main` is fully drained:
      // insert every champion's bits, write back only the dirty words,
      // emit the champions. State commits after full consumption, so a
      // failed task replays the whole batch — no partial insert.
      main ++ {
        val dirty = new java.util.BitSet(arr.length)
        pending.valuesIterator.map { c =>
          BloomKernels.setDirty(arr, c.hash, numHashes, dirty)
          Decision(c.docId, c.hash, definitelyNew = true, c.eventTime)
        } ++ { writeDirty(words, arr, dirty); Iterator.empty }
      }
    }
  }

  private def keyedByShard(docs: Dataset[DocKey], shardBits: Int)
      : Dataset[KeyedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(d => d.eventTime != null && d.key != null)
      .map { d =>
        val h = SketchKernels.xx64(UTF8String.fromString(d.key))
        // JVM shifts are mod-64: >>> 64 is a no-op, so shardBits=0 needs
        // its own branch to land everything in shard 0
        val shard = if (shardBits == 0) 0 else (h >>> (64 - shardBits)).toInt
        KeyedDoc(shard, h, d.docId, d.eventTime)
      }
  }

  def dedup(docs: Dataset[DocKey], shardBits: Int = 6,
            bitsPerShard: Int = 1 << 16,
            numHashes: Int = 6): Dataset[Decision] = {
    require(shardBits >= 0 && shardBits <= 16)
    require(bitsPerShard > 0 && bitsPerShard % 64 == 0)
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val eo: Encoder[Decision] = Encoders.product[Decision]
    keyedByShard(docs, shardBits)
      .groupByKey(_.shard)
      .transformWithState(new BloomProcessor(bitsPerShard, numHashes),
        TimeMode.None(), OutputMode.Append())
  }

  /** Generation-rotating variant — the saturation fix [[dedup]]'s
    * scaladoc prescribes, implemented: each shard keeps TWO filters and
    * rotates (previous ← current, current ← empty) every
    * `rotateAfter` distinct insertions, probing both. The guarantee
    * becomes windowed-by-volume: a key re-sent within the last
    * `rotateAfter`–`2·rotateAfter` distinct keys is NEVER flagged new;
    * keys older than two generations may be re-admitted (bounded
    * forgetting). In exchange the false-positive rate stays bounded
    * FOREVER — each generation holds ≤ `rotateAfter` keys in
    * `bitsPerShard` bits, so size the shard at ~10 bits per
    * `rotateAfter` key and the FP ceiling never climbs past the design
    * point, no matter how long the stream runs. State is exactly
    * 2 × bitsPerShard bits + one meta record per shard, forever — two
    * sparse word maps that swap ROLES on rotation (the cleared map
    * becomes the new current), so rotation never copies a filter.
    *
    * Champions are inserted at the end of the pass in (eventTime,
    * docId) order, so which generation a key lands in — and therefore
    * every future forgetting boundary — is replay-deterministic.
    */
  def dedupRotating(docs: Dataset[DocKey], shardBits: Int = 6,
                    bitsPerShard: Int = 1 << 16,
                    numHashes: Int = 6,
                    rotateAfter: Long = 8192): Dataset[Decision] = {
    require(shardBits >= 0 && shardBits <= 16)
    require(bitsPerShard > 0 && bitsPerShard % 64 == 0)
    require(rotateAfter > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val eo: Encoder[Decision] = Encoders.product[Decision]
    keyedByShard(docs, shardBits)
      .groupByKey(_.shard)
      .transformWithState(
        new RotatingProcessor(bitsPerShard, numHashes, rotateAfter),
        TimeMode.None(), OutputMode.Append())
  }

  private final class RotatingProcessor(bitsPerShard: Int, numHashes: Int,
                                        rotateAfter: Long)
      extends StatefulProcessor[Int, KeyedDoc, Decision] {

    @transient private var wordsA: MapState[Int, Long] = _
    @transient private var wordsB: MapState[Int, Long] = _
    @transient private var meta: ValueState[RotMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      wordsA = getHandle.getMapState[Int, Long]("wordsA",
        Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)
      wordsB = getHandle.getMapState[Int, Long]("wordsB",
        Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)
      meta = getHandle.getValueState[RotMeta]("meta",
        Encoders.product[RotMeta], TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[KeyedDoc],
                                 timers: TimerValues): Iterator[Decision] = {
      val n = bitsPerShard / 64
      val m = if (meta.exists()) meta.get() else RotMeta(0L, curIsA = true)
      val arrA = loadWords(wordsA, n)
      val arrB = loadWords(wordsB, n)
      // probes see the START-of-batch generations; a mid-pass rotation
      // only affects which generation later champions are inserted into
      val pending = mutable.HashMap.empty[Long, KeyedDoc]
      val main = championPass(rows,
        h => BloomKernels.mightContain(arrA, h, numHashes) ||
             BloomKernels.mightContain(arrB, h, numHashes), pending)
      main ++ {
        val dirtyA = new java.util.BitSet(n)
        val dirtyB = new java.util.BitSet(n)
        var clearedA = false; var clearedB = false
        var curIsA = m.curIsA
        var inserted = m.inserted
        val champions = pending.values.toArray
          .sortBy(c => (c.eventTime.getTime, c.docId))
        val out = champions.iterator.map { c =>
          val (arr, dirty) = if (curIsA) (arrA, dirtyA) else (arrB, dirtyB)
          BloomKernels.setDirty(arr, c.hash, numHashes, dirty)
          inserted += 1
          if (inserted >= rotateAfter) {
            // the map holding the OLD previous is wiped and becomes the
            // new current; the full filter is never copied
            if (curIsA) {
              java.util.Arrays.fill(arrB, 0L); dirtyB.clear(); clearedB = true
            } else {
              java.util.Arrays.fill(arrA, 0L); dirtyA.clear(); clearedA = true
            }
            curIsA = !curIsA
            inserted = 0L
          }
          Decision(c.docId, c.hash, definitelyNew = true, c.eventTime)
        }
        out ++ {
          def flush(state: MapState[Int, Long], arr: Array[Long],
                    dirty: java.util.BitSet, cleared: Boolean): Unit =
            if (cleared) {
              state.clear()
              var i = 0
              while (i < arr.length) {
                if (arr(i) != 0L) state.updateValue(i, arr(i))
                i += 1
              }
            } else writeDirty(state, arr, dirty)
          flush(wordsA, arrA, dirtyA, clearedA)
          flush(wordsB, arrB, dirtyB, clearedB)
          meta.update(RotMeta(inserted, curIsA))
          Iterator.empty
        }
      }
    }
  }
}
