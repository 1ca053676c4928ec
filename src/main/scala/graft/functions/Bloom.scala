package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Distributed Bloom filter: a mergeable typed [[Aggregator]] that folds
  * 64-bit key hashes into a fixed-size bit array, plus a codegen'd
  * membership expression. Built for the incremental-ingest dedup path
  * (see [[graft.ext.Dedup.incrementalNew]]): the filter is aggregated
  * over the historical corpus with map-side partial merge (each task
  * ORs its local words; the shuffle carries one bit-array per
  * partition, never the keys), broadcast as a single row, and probed
  * map-side over the new batch — rows the filter definitely has not
  * seen skip the exact anti-join shuffle entirely.
  *
  * Sizing is caller-supplied (`numBits`), NOT derived from a `count()`
  * of the build side: at 100 TB an extra counting pass over the
  * historical corpus costs more than an over-provisioned filter, and a
  * deterministic size keeps the plan replay-stable. 8 bits/key ≈ 2.1%
  * false positives at the optimal k=6 (FPs only cost exact-check work,
  * never correctness).
  */
object BloomKernels extends Serializable {

  /** Optimal bit count for `n` keys at false-positive rate `fpp`,
    * rounded up to a whole 64-bit word (m = -n·ln(p)/ln(2)²).
    */
  def optimalBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    val words = math.max(1L, (m.toLong + 63) / 64)
    require(words <= (Int.MaxValue / 64).toLong, s"bloom too large: $m bits")
    (words * 64).toInt
  }

  /** Optimal number of probe hashes (k = m/n·ln 2, clamped to [1, 16]). */
  def optimalHashes(numBits: Int, n: Long): Int =
    math.max(1, math.min(16, math.round(numBits.toDouble / n * math.log(2)).toInt))

  /** Kirsch–Mitzenmacher double hashing: probe i uses h1 + i·h2. The
    * second hash is derived by splitmix64 and forced odd so successive
    * probes never collapse onto one index (mod a power-of-two word
    * count an even step can cycle early).
    */
  @inline private def probeIndex(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    (java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong)).toInt

  def set(words: Array[Long], hash: Long, numHashes: Int): Unit = {
    val h2 = SketchKernels.splitmix64(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = probeIndex(hash, h2, i, words.length * 64)
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(words: ArrayData, hash: Long, numHashes: Int): Boolean = {
    val numWords = words.numElements()
    val h2 = SketchKernels.splitmix64(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = probeIndex(hash, h2, i, numWords * 64)
      if ((words.getLong(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** set() that also records the touched word indices — the streaming
    * MapState path writes back only dirty words, so insertion cost is
    * O(numHashes) state writes instead of a whole-filter rewrite.
    */
  def setDirty(words: Array[Long], hash: Long, numHashes: Int,
               dirty: java.util.BitSet): Unit = {
    val h2 = SketchKernels.splitmix64(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = probeIndex(hash, h2, i, words.length * 64)
      words(bit >>> 6) |= (1L << (bit & 63))
      dirty.set(bit >>> 6)
      i += 1
    }
  }

  /** Plain-array probe (streaming state path — no InternalRow in sight). */
  def mightContain(words: Array[Long], hash: Long, numHashes: Int): Boolean = {
    val h2 = SketchKernels.splitmix64(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = probeIndex(hash, h2, i, words.length * 64)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter build: input rows are 64-bit key hashes
  * (xxhash64 of the fingerprint), the buffer is the bit array itself,
  * merge is bitwise OR — associative, commutative, idempotent, so
  * map-side partial aggregation is exact and re-ingesting a key is a
  * no-op (the property that makes incremental corpus maintenance safe).
  */
final class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
  require(numHashes > 0 && numHashes <= 16)

  override def zero: Array[Long] = new Array[Long](numBits / 64)
  override def reduce(b: Array[Long], hash: Long): Array[Long] = {
    BloomKernels.set(b, hash, numHashes); b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAgg {
  /** Untyped aggregate column: OR-fold a BIGINT key-hash column into an
    * m-bit filter (udaf wrapping so DataFrame `.agg` works directly).
    */
  def build(numBits: Int, numHashes: Int, hashCol: Column): Column =
    org.apache.spark.sql.functions
      .udaf(new BloomAgg(numBits, numHashes), Encoders.scalaLong)
      .apply(hashCol)
}

/** bloom_might_contain(words, hash): true iff the filter MAY contain the
  * key; false is definitive absence. Codegen'd so the probe stays inside
  * the scan's whole-stage span — the broadcast filter row is a plain
  * array column after the 1-row broadcast nested-loop join.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             numHashes: Int) extends BinaryExpression {
  require(numHashes > 0 && numHashes <= 16)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (ARRAY<BIGINT>, BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(words: Any, hash: Any): Any =
    BloomKernels.mightContain(words.asInstanceOf[ArrayData],
      hash.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[BloomKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (w, h) =>
      s"${ev.value} = $k.mightContain($w, $h, $numHashes);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomMightContain = copy(left = l, right = r)
}
