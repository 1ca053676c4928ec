package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
  * uniformly across the cluster — there is no hot key by construction,
  * and each shard's decision order is replay-deterministic
  * ((eventTime, docId) sort within the batch).
  *
  * Per-shard memory shape: the replay-deterministic sort materializes a
  * shard's slice of the micro-batch (1/2^shardBits of its rows) in one
  * task's heap before emitting. `shardBits` therefore trades state size
  * (2^shardBits × bitsPerShard bits, permanent) against transient batch
  * buffering (rows per shard per trigger): at 100 TB-scale ingest, size
  * `shardBits` so micro-batch-rows / 2^shardBits stays comfortably
  * inside one executor's task heap — the default of 6 (64 shards) keeps
  * a 10M-row trigger under ~160k buffered rows per task, and larger
  * triggers should raise it further.
  */
object StreamingBloomDedup {

  final case class DocKey(docId: Long, key: String, eventTime: Timestamp)

  final case class KeyedDoc(shard: Int, hash: Long, docId: Long,
                            eventTime: Timestamp)

  final case class ShardBloom(words: Array[Long])

  final case class RotatingShard(current: Array[Long], previous: Array[Long],
                                 inserted: Long)

  final case class Decision(docId: Long, hash: Long, definitelyNew: Boolean,
                            eventTime: Timestamp)

  def dedup(docs: Dataset[DocKey], shardBits: Int = 6,
            bitsPerShard: Int = 1 << 16,
            numHashes: Int = 6): Dataset[Decision] = {
    require(shardBits >= 0 && shardBits <= 16)
    require(bitsPerShard > 0 && bitsPerShard % 64 == 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs
      .filter(d => d.eventTime != null && d.key != null)
      .map { d =>
        val h = SketchKernels.xx64(UTF8String.fromString(d.key))
        // JVM shifts are mod-64: >>> 64 is a no-op, so shardBits=0 needs
        // its own branch to land everything in shard 0
        val shard = if (shardBits == 0) 0 else (h >>> (64 - shardBits)).toInt
        KeyedDoc(shard, h, d.docId, d.eventTime)
      }
    implicit val eo = Encoders.product[Decision]
    implicit val es = Encoders.product[ShardBloom]
    keyed
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardBloom, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[ShardBloom]) =>
          val words = state.getOption.map(_.words)
            .getOrElse(new Array[Long](bitsPerShard / 64))
          val out = rows.toSeq
            .sortBy(r => (r.eventTime.getTime, r.docId))
            .map { r =>
              val seen = BloomKernels.mightContain(words, r.hash, numHashes)
              if (!seen) BloomKernels.set(words, r.hash, numHashes)
              Decision(r.docId, r.hash, definitelyNew = !seen, r.eventTime)
            }
          state.update(ShardBloom(words))
          out.iterator
      }
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
    * 2 × bitsPerShard bits + one counter per shard, forever.
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
    val keyed = docs
      .filter(d => d.eventTime != null && d.key != null)
      .map { d =>
        val h = SketchKernels.xx64(UTF8String.fromString(d.key))
        val shard = if (shardBits == 0) 0 else (h >>> (64 - shardBits)).toInt
        KeyedDoc(shard, h, d.docId, d.eventTime)
      }
    implicit val eo = Encoders.product[Decision]
    implicit val es = Encoders.product[RotatingShard]
    keyed
      .groupByKey(_.shard)
      .flatMapGroupsWithState[RotatingShard, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[RotatingShard]) =>
          val words = bitsPerShard / 64
          var s = state.getOption.getOrElse(
            RotatingShard(new Array[Long](words), new Array[Long](words), 0L))
          val out = rows.toSeq
            .sortBy(r => (r.eventTime.getTime, r.docId))
            .map { r =>
              val seen =
                BloomKernels.mightContain(s.current, r.hash, numHashes) ||
                BloomKernels.mightContain(s.previous, r.hash, numHashes)
              if (!seen) {
                BloomKernels.set(s.current, r.hash, numHashes)
                s = s.copy(inserted = s.inserted + 1)
                if (s.inserted >= rotateAfter)
                  s = RotatingShard(new Array[Long](words), s.current, 0L)
              }
              Decision(r.docId, r.hash, definitelyNew = !seen, r.eventTime)
            }
          state.update(s)
          out.iterator
      }
  }
}
