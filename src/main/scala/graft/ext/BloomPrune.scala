package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder

/** Bloom-filter semi-join pruning — the runtime-filter pattern a
  * 100 TB engine needs when the dimension's KEY SET fits in a few MB
  * of bits but the dimension itself is too big (or too late-bound) to
  * broadcast raw: build a bitset over the dim keys, prune the fact
  * SCAN-SIDE before any exchange, then run the exact join on the
  * survivors. False positives are removed by the exact join, so
  * correctness never depends on the filter; false negatives are
  * structurally impossible because build and probe use the SAME hash
  * family (spec-pinned, and the q211 oracle-hash gate would flip red
  * on any dropped matching row).
  *
  * Scale shape: the build is a mergeable typed [[Aggregator]] — each
  * map task ORs keys into a local bitset, partials OR-merge, ONE
  * bitset row reaches the driver (`m/8` bytes, the same driver
  * transfer Spark's own AQE runtime filters make). The probe is pure
  * codegen'd built-ins (xxhash64 + pmod + element_at + shiftleft)
  * over a literal word array — no UDF, no broadcast join, evaluated
  * inside the fact scan's WholeStageCodegen stage below the exchange.
  * Sizing: ~10 bits/key at k=3 gives ~2-3% false positives; the
  * filter only PRUNES, so an undersized filter degrades shuffle
  * savings, never correctness.
  */
object BloomPrune {

  /** Hash count; 3 probes ≈ optimal for 8-16 bits/key. */
  val K = 3

  /** The SQL `xxhash64(key, i)` chain replayed on the JVM side: Spark
    * seeds with 42 and threads each column's hash as the next seed.
    * Build (here) and probe ([[mightContain]]) MUST agree bit-for-bit
    * — BloomPruneSpec pins this equivalence against the SQL function.
    */
  private[ext] def hashChain(key: Long, i: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, LongType}
    XxHash64Function.hash(i, IntegerType,
      XxHash64Function.hash(key, LongType, 42L))
  }

  /** Mergeable bitset build: reduce sets K bits per key into a local
    * `m/64`-word buffer; merge ORs buffers. Buffer size is fixed by
    * `mBits` regardless of row count — the structural bound.
    */
  final class BloomAgg(mBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 27),
      "mBits must be a multiple of 64 in [64, 2^27]")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      var i = 0
      while (i < K) {
        val pos = java.lang.Math.floorMod(hashChain(key, i), mBits.toLong)
        b((pos >> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Build the bitset over `dim`'s (long-castable) `key` column.
    * Null keys never match any join anyway and are skipped. One
    * distributed aggregation; the only driver transfer is the final
    * `m/8`-byte word array.
    */
  def buildBits(dim: DataFrame, key: Column, mBits: Int): Array[Long] = {
    val spark = dim.sparkSession
    import spark.implicits._
    val agg = new BloomAgg(mBits)
    dim.select(key.cast("long").as("k")).na.drop()
      .as[Long]
      .select(agg.toColumn) // typed select: one Array[Long] row
      .head()
  }

  /** Probe predicate over a built word array: bit (hash_i mod m) set
    * for ALL i < K. Pure built-in expressions — codegen'd, scan-side,
    * no UDF. `shiftleft` goes through `call_function` because the
    * Scala wrapper only takes a literal shift amount.
    */
  def mightContain(words: Array[Long], key: Column): Column = {
    val mBits = words.length * 64L
    val wordsLit = typedlit(words.toSeq)
    (0 until K).map { i =>
      val pos = pmod(xxhash64(key.cast("long"), lit(i)), lit(mBits))
      val word = element_at(wordsLit, (pos / 64).cast("int") + 1)
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!=
        lit(0L)
    }.reduce(_ && _)
  }

  /** Fact rows whose `factKey` is present in `dim`'s `dimKey` set:
    * bloom prune scan-side, then the exact semi-join on the
    * survivors. The exact join sees only `matched + falsePositive`
    * rows — at 10 bits/key that is ≈ `matched + 0.03·unmatched`, so
    * the exchange under the join shrinks by roughly the filter's
    * selectivity on non-matching rows.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
                    dim: DataFrame, dimKey: Column,
                    mBits: Int): DataFrame = {
    val words = buildBits(dim, dimKey, mBits)
    fact.filter(mightContain(words, factKey))
      .join(dim.select(dimKey.cast("long").as("__bloom_k")).distinct(),
        factKey.cast("long") === col("__bloom_k"), "left_semi")
  }
}
