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
  * transfer Spark's own AQE runtime filters make). The probe is a
  * native codegen'd expression replaying the same xxhash64 chain; the
  * word array rides along as a plan REFERENCE OBJECT
  * (`ctx.addReferenceObj`), not a Catalyst literal — a 2^27-bit
  * filter is a 16 MB array, which as a literal would bloat plan
  * serialization/printing and constant handling, but as a reference
  * ships once per task binary (itself torrent-broadcast). No UDF, no
  * broadcast join; evaluated inside the fact scan's
  * WholeStageCodegen stage below the exchange.
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

  /** JVM-side K-probe over a built word array — the single body both
    * the interpreted and generated paths of [[ProbeExpr]] call, and
    * exactly the bit positions [[BloomAgg.reduce]] set.
    */
  def probeContains(words: Array[Long], key: Long): Boolean = {
    val mBits = words.length * 64L
    var i = 0
    while (i < K) {
      val pos = java.lang.Math.floorMod(hashChain(key, i), mBits)
      if ((words((pos >> 6).toInt) & (1L << (pos & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Probe predicate as a native codegen'd expression: the word array
    * is attached via `ctx.addReferenceObj` (plan reference, not a
    * literal), so a 2^27-bit filter doesn't become a 2M-element array
    * literal in the plan; the generated code is one static-call probe
    * per row inside the scan's codegen span. Null key → null → row
    * filtered (null keys never match an equi-join anyway).
    */
  final case class ProbeExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      words: Array[Long])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_prune_probe"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"bloom_prune_probe requires BIGINT, got ${other.catalogString}")
      }

    override def nullSafeEval(key: Any): Any =
      probeContains(words, key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val ref = ctx.addReferenceObj("bloomPruneWords", words, "long[]")
      val mod = classOf[BloomPrune.type].getName.stripSuffix("$") +
        "$.MODULE$"
      nullSafeCodeGen(ctx, ev, k =>
        s"${ev.value} = $mod.probeContains($ref, $k);")
    }

    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression)
        : ProbeExpr = copy(child = newChild)
  }

  /** Probe predicate over a built word array: bit (hash_i mod m) set
    * for ALL i < K — [[ProbeExpr]] wrapped as a Column.
    */
  def mightContain(words: Array[Long], key: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(ProbeExpr(bridge.expression(key.cast("long")), words))
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
