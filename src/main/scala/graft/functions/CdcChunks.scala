package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the content-defined chunking rule of
  * [[graft.ext.Dedup.cdcChunkArray]] / [[graft.ext.Dedup.cdcChunkArrayBounded]].
  *
  * Why native and not the higher-order-function fold the rule was first
  * written as: Spark's `filter`/`aggregate` lambdas have no codegen path
  * (interpreted, boxed), and — the structural cost — every candidate
  * boundary evaluated `substring(md5(t.substr(i-15, 16)), 1, 1)`, where
  * `UTF8String.substringSQL` must scan from byte 0 to find CHAR offset
  * `i`. That makes the boundary filter O(chars²) per document plus one
  * full hex-encode + UTF8String allocation per position. This kernel
  * computes the char→byte offset table once, then runs one MD5 per
  * window over the raw byte range (first-nibble check on the digest
  * byte, no hex string), and carves the chunk array in the same pass —
  * O(chars · md5(w)) total, zero per-position allocation.
  *
  * EXACT-EQUIVALENCE CONTRACT (oracle-pinned at 3 SFs by
  * q238/q246/q247 and the DuckDB boundary replay): a chunk end falls
  * after any char position `p ≥ w` whose trailing `w`-char window's
  * UTF-8 bytes MD5-hash to a leading hex nibble of 0 — exactly
  * `substring(md5(substr(t, p-w+1, w)), 1, 1) = '0'` — plus the text
  * end; the bounded variant then applies the FastCDC min/max fold of
  * [[graft.ext.Dedup.cdcChunkArrayBounded]] over those ends,
  * branch-for-branch. Empty text is one empty chunk (totality).
  */
object CdcKernels extends Serializable {

  // MessageDigest is stateful; one per thread, reset per window.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Byte offset of each char start, plus the total length at the end:
    * offsets(i) = first byte of char i (0-based), offsets(nChars) = len.
    */
  private def charOffsets(bytes: Array[Byte]): Array[Int] = {
    // count chars first (cheap: one pass over leading bytes)
    var n = 0
    var b = 0
    while (b < bytes.length) {
      b += UTF8String.numBytesForFirstByte(bytes(b)); n += 1
    }
    val offs = new Array[Int](n + 1)
    var i = 0
    b = 0
    while (b < bytes.length) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b)); i += 1
    }
    offs(n) = bytes.length
    offs
  }

  @inline private def isBoundary(md: java.security.MessageDigest,
                                 digest: Array[Byte], bytes: Array[Byte],
                                 from: Int, until: Int): Boolean = {
    md.reset()
    md.update(bytes, from, until - from)
    md.digest(digest, 0, 16)
    (digest(0) & 0xf0) == 0
  }

  /** Unbounded rule: chunk at every banded end; text end closes the
    * last chunk. Equals the `ends`+fold composition in
    * [[graft.ext.Dedup.cdcChunkArray]] element-for-element.
    */
  def cdcChunks(text: UTF8String, w: Int): Array[UTF8String] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return Array(UTF8String.fromString(""))
    val offs = charOffsets(bytes)
    val nChars = offs.length - 1
    val md = mdLocal.get()
    val digest = new Array[Byte](16)
    val acc = new java.util.ArrayList[UTF8String]()
    var prev = 0 // char position of the previous cut
    var p = w
    while (p <= nChars) {
      if (isBoundary(md, digest, bytes, offs(p - w), offs(p))) {
        // ascending ends; p > prev always holds here (p advanced past prev)
        acc.add(UTF8String.fromBytes(bytes, offs(prev), offs(p) - offs(prev)))
        prev = p
      }
      p += 1
    }
    if (prev != nChars)
      acc.add(UTF8String.fromBytes(bytes, offs(prev),
        offs(nChars) - offs(prev)))
    acc.toArray(new Array[UTF8String](acc.size))
  }

  /** Bounded (FastCDC-profile) rule — the exact fold of
    * [[graft.ext.Dedup.cdcChunkArrayBounded]]: banded ends closer than
    * `minLen` to the previous cut are skipped (forced strides may still
    * advance), gaps longer than `maxLen` force exact-`maxLen` cuts.
    */
  def cdcChunksBounded(text: UTF8String, w: Int, minLen: Int,
                       maxLen: Int): Array[UTF8String] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return Array(UTF8String.fromString(""))
    val offs = charOffsets(bytes)
    val nChars = offs.length - 1
    val md = mdLocal.get()
    val digest = new Array[Byte](16)
    val acc = new java.util.ArrayList[UTF8String]()
    var prev = 0
    // one fold step of the original expression, for end `e` (char pos)
    def step(e: Int): Unit = {
      if (e == prev) return
      val d = e - prev
      val f = (d - 1) / maxLen // = max(0, floor((d-1)/maxLen)), d >= 1
      val base = prev + f * maxLen
      val rem = d - f * maxLen // in [1, maxLen]
      val isFinal = e == nChars
      val tailEmit = isFinal || rem >= minLen
      var i = 0
      while (i < f) {
        val s = prev + i * maxLen
        acc.add(UTF8String.fromBytes(bytes, offs(s), offs(s + maxLen) - offs(s)))
        i += 1
      }
      if (tailEmit)
        acc.add(UTF8String.fromBytes(bytes, offs(base), offs(e) - offs(base)))
      prev = if (isFinal || rem >= minLen) e else base
    }
    var p = w
    while (p <= nChars) {
      if (isBoundary(md, digest, bytes, offs(p - w), offs(p))) step(p)
      p += 1
    }
    step(nChars)
    acc.toArray(new Array[UTF8String](acc.size))
  }
}

/** cdc_chunk_array(text, w): chunk texts of the unbounded CDC rule. */
case class CdcChunkArray(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunk_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_array requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CdcKernels.cdcChunks(input.asInstanceOf[UTF8String], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[CdcKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.cdcChunks($c, $w));")
  }
  override protected def withNewChildInternal(c: Expression): CdcChunkArray =
    copy(child = c)
}

/** cdc_chunk_array_bounded(text, w, minLen, maxLen): FastCDC profile. */
case class CdcChunkArrayBounded(child: Expression, w: Int, minLen: Int,
                                maxLen: Int) extends UnaryExpression {
  require(w > 0 && minLen > 0 && maxLen >= minLen,
    "need 0 < minLen <= maxLen and w > 0")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunk_array_bounded"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_array_bounded requires STRING input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CdcKernels.cdcChunksBounded(input.asInstanceOf[UTF8String], w,
        minLen, maxLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = classOf[CdcKernels.type].getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new $gad($k.cdcChunksBounded($c, $w, $minLen, $maxLen));")
  }
  override protected def withNewChildInternal(c: Expression): CdcChunkArrayBounded =
    copy(child = c)
}

object CdcFns {
  import org.apache.spark.sql.graft.bridge
  def cdc_chunk_array(text: Column, w: Int): Column =
    bridge.column(CdcChunkArray(bridge.expression(text), w))
  def cdc_chunk_array_bounded(text: Column, w: Int, minLen: Int,
                              maxLen: Int): Column =
    bridge.column(CdcChunkArrayBounded(bridge.expression(text), w,
      minLen, maxLen))
}
