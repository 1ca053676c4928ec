package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: fold over UTF-8 bytes of
  * h = (h * 31 + byte) mod 1e9+7. A native Catalyst expression with
  * `doGenCode` so it stays inside whole-stage codegen (a Scala UDF here
  * would box every row and break the codegen span around it) — the
  * document-fingerprinting hot path runs this over every document.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Winnowing fingerprint (MOSS-style): hash every k-gram of the string
  * with the rolling polynomial, slide a window of `w` k-gram hashes and
  * keep each window's minimum — a compact, position-robust document
  * fingerprint for near-dup detection. Native expression for the same
  * codegen reason as [[PolyHash]]; returns the distinct selected hashes
  * in first-occurrence order.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array.empty[Long])
    // rolling k-gram hashes
    val m = 1000000007L
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L; var j = 0
      while (j < k) { h = (h * 31 + (bytes(i + j) & 0xff)) % m; j += 1 }
      hashes(i) = h
      i += 1
    }
    // winnow: min per window of w, dedup consecutive selections
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prevIdx = -1
    var start = 0
    while (start <= nGrams - math.min(w, nGrams)) {
      val end = math.min(start + w, nGrams)
      var minIdx = start
      var j2 = start + 1
      while (j2 < end) {
        if (hashes(j2) <= hashes(minIdx)) minIdx = j2
        j2 += 1
      }
      if (minIdx != prevIdx) { out += hashes(minIdx); prevIdx = minIdx }
      start += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  // Array-building codegen is not worth the complexity here; winnowing is
  // interpreted but still JVM-local per row (no boxing of inputs).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("winnowExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $expr.nullSafeEval($c);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object ColumnFns {
  import org.apache.spark.sql.graft.bridge
  /** poly_hash(text): 64-bit-safe polynomial rolling hash mod 1e9+7. */
  def poly_hash(c: Column): Column =
    bridge.column(PolyHash(bridge.expression(c)))
  /** winnow(text, k, w): winnowing fingerprint hash set. */
  def winnow(c: Column, k: Int = 8, w: Int = 4): Column =
    bridge.column(Winnow(bridge.expression(c), k, w))
}
