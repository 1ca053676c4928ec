package graft.ext

import org.apache.spark.sql.Dataset

/** Minimal baseline-sequential JPEG codec (ITU-T T.81) for the
  * restricted still-image profile, completing the pixel-decode family
  * started by [[ImageHash.Png]] (zlib/unfilter) and [[ImageHash.Gif]]
  * (LZW): the third — and last — mainstream image codec decodable in
  * pure JVM code with no native or library dependency. Profile:
  * baseline DCT (SOF0 only), 8-bit precision, 1 or 3 components, no
  * chroma subsampling (all sampling factors 1×1), 8-bit quantization
  * tables, single interleaved scan, optional restart markers.
  * Everything else — progressive/extended SOFs, 16-bit DQT,
  * subsampling, multiple scans, arithmetic coding, DNL, hierarchical —
  * and every malformed byte decodes to None.
  *
  * Same discipline as the PNG/GIF decoders: bounded (every read
  * bounds-checked, pixel count capped, Huffman walk limited to 16
  * bits, coefficient index limited to 63, MCU count fixed by the
  * frame header), fail-closed (None, never throws or spins on hostile
  * bytes), fuzz-armed (JpegCodecSpec), exact-size contract (after the
  * last MCU only pad bits, fill bytes, and the EOI marker may remain).
  *
  * Unlike PNG/GIF the transform is lossy, so exact oracle replay
  * needs a fixture the DCT round-trips bit-exactly: an 8×8-block-
  * constant image with flat (all-ones) quantization has only DC
  * energy — DC = 8·(v−128) is integer-exact through quantize, and the
  * IDCT of a DC-only block reconstructs v to well within 1e-10 of an
  * integer before rounding (JpegCodecSpec pins this; ImageQueries
  * q210 leans on it). Arbitrary-content images round-trip within ±2
  * per sample (quantization error bound, spec-pinned) — the AC
  * Huffman/zigzag/run-length path is exercised by the spec's
  * gradient and random-pattern round-trips plus a hand-assembled
  * golden that never touches this object's encoder.
  *
  * All floating-point uses StrictMath-derived cosine tables and fixed
  * summation order, so decode is bit-deterministic across executors —
  * the property every oracle-gated query in this repo requires.
  */
object JpegCodec {

  /** Scan-order → natural-order (row·8+col) permutation (T.81 fig. 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(x)(u) = cos((2x+1)·u·π/16); StrictMath for cross-JVM
    * bit-determinism (Math.cos is allowed 1 ulp of platform slack).
    */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16))
  private val CU: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)

  /** Standard Huffman tables (T.81 Annex K.3): (BITS counts for code
    * lengths 1..16, HUFFVAL). One DC + one AC table shared by every
    * component — legal JPEG (the scan header binds tables per
    * component) and half the DHT bytes; the decoder reads whatever
    * tables the stream declares, so interop does not depend on these.
    */
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  private val AcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical code assignment (T.81 C.2): codes(i) for vals(i). */
  private def canonicalCodes(bits: Array[Int])
      : (Array[Int], Array[Int]) = {
    val n = bits.sum
    val lens = new Array[Int](n)
    val codes = new Array[Int](n)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < bits(l - 1)) {
        lens(k) = l; codes(k) = code; code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    (codes, lens)
  }

  // ---------------------------------------------------------------------
  // Encoder (fixture/spec side; decode never depends on it)
  // ---------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Magnitude category: the bit length of |v| (0 for v == 0). */
  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Fixed-point RGB→YCbCr (BT.601/JFIF): each coefficient row sums to
    * exactly 65536, so r=g=b=v maps to (Y=v, Cb=128, Cr=128) with NO
    * rounding residue — the property the block-constant oracle fixture
    * (ImageQueries q210) and the cross-codec parity spec lean on.
    */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
    val cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    (y, cb, cr)
  }

  /** Inverse fixed-point YCbCr→RGB; Cb=Cr=128 reconstructs R=G=B=Y
    * exactly (the companions of [[rgbToYcc]]'s zero-residue rows).
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = y + ((91881 * (cr - 128) + 32768) >> 16)
    val g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val b = y + ((116130 * (cb - 128) + 32768) >> 16)
    (clamp(r), clamp(g), clamp(b))
  }

  /** Encode an image whose pixel (x, y) is `pixel(x, y)` — an array of
    * 1 (gray) or 3 (RGB) 0..255 ints, dims multiples of 8 (encoder
    * profile; the decoder handles ragged dims via edge-block crop).
    * `quant` is the 64-entry natural-order quantization table (flat
    * all-ones by default — the near-lossless operating point);
    * `restartInterval` > 0 emits DRI + RSTn every that-many MCUs.
    * `comment` inserts a COM segment the decoder must skip.
    */
  def encode(w: Int, h: Int, components: Int,
             pixel: (Int, Int) => Array[Int],
             quant: Array[Int] = Array.fill(64)(1),
             restartInterval: Int = 0,
             comment: Option[String] = None): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      "encoder profile: dims must be positive multiples of 8")
    require(components == 1 || components == 3, "1 or 3 components")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "8-bit quant table")

    // planes in YCbCr (or a single gray plane)
    val planes = Array.fill(components)(new Array[Int](w * h))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = pixel(x, y)
        if (components == 1) planes(0)(y * w + x) = px(0) & 0xff
        else {
          val (yy, cb, cr) = rgbToYcc(px(0) & 0xff, px(1) & 0xff, px(2) & 0xff)
          planes(0)(y * w + x) = yy
          planes(1)(y * w + x) = cb
          planes(2)(y * w + x) = cr
        }
        x += 1
      }
      y += 1
    }

    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }

    marker(0xd8) // SOI
    comment.foreach(c => segment(0xfe, c.getBytes("US-ASCII")))
    // DQT: Pq=0 Tq=0, zigzag order
    segment(0xdb, (0.toByte +: Array.tabulate(64)(i =>
      quant(Zigzag(i)).toByte)).toArray)
    // SOF0
    val sofB = new java.io.ByteArrayOutputStream
    sofB.write(8) // precision
    sofB.write(h >> 8); sofB.write(h & 0xff)
    sofB.write(w >> 8); sofB.write(w & 0xff)
    sofB.write(components)
    var c = 0
    while (c < components) {
      sofB.write(c + 1) // component id
      sofB.write(0x11)  // 1x1 sampling
      sofB.write(0)     // quant table 0
      c += 1
    }
    segment(0xc0, sofB.toByteArray)
    // DHT: DC table 0 + AC table 0 in one segment
    val dhtB = new java.io.ByteArrayOutputStream
    dhtB.write(0x00); DcBits.foreach(dhtB.write); DcVals.foreach(dhtB.write)
    dhtB.write(0x10); AcBits.foreach(dhtB.write); AcVals.foreach(dhtB.write)
    segment(0xc4, dhtB.toByteArray)
    if (restartInterval > 0)
      segment(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    // SOS
    val sosB = new java.io.ByteArrayOutputStream
    sosB.write(components)
    c = 0
    while (c < components) { sosB.write(c + 1); sosB.write(0x00); c += 1 }
    sosB.write(0); sosB.write(63); sosB.write(0)
    segment(0xda, sosB.toByteArray)

    // entropy-coded scan
    val (dcCodes, dcLens) = canonicalCodes(DcBits)
    val (acCodes, acLens) = canonicalCodes(AcBits)
    val dcCodeOf = DcVals.zipWithIndex.map { case (v, i) => v -> i }.toMap
    val acCodeOf = AcVals.zipWithIndex.map { case (v, i) => v -> i }.toMap
    val bw = new BitWriter(out)
    val preds = new Array[Int](components)
    val coef = new Array[Int](64)
    val blocksW = w / 8; val blocksH = h / 8
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          marker(0xd0 + rst)
          rst = (rst + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        c = 0
        while (c < components) {
          // FDCT (direct; encoder runs only at fixture-build time)
          val p = planes(c)
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  s += (p((by * 8 + yy) * w + bx * 8 + xx) - 128) *
                    CosT(xx)(u) * CosT(yy)(v)
                  xx += 1
                }
                yy += 1
              }
              val q = quant(v * 8 + u)
              coef(v * 8 + u) =
                Math.round(0.25 * CU(u) * CU(v) * s / q).toInt
              u += 1
            }
            v += 1
          }
          // DC
          val diff = coef(0) - preds(c)
          preds(c) = coef(0)
          val t = category(diff)
          val di = dcCodeOf(t)
          bw.put(dcCodes(di), dcLens(di))
          if (t > 0)
            bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          // AC: run-length over zigzag 1..63
          var k = 1
          var run = 0
          while (k < 64) {
            val ac = coef(Zigzag(k))
            if (ac == 0) run += 1
            else {
              while (run > 15) {
                val zi = acCodeOf(0xf0) // ZRL
                bw.put(acCodes(zi), acLens(zi))
                run -= 16
              }
              val s = category(ac)
              val ai = acCodeOf((run << 4) | s)
              bw.put(acCodes(ai), acLens(ai))
              bw.put(if (ac < 0) ac + (1 << s) - 1 else ac, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) {
            val ei = acCodeOf(0x00) // EOB
            bw.put(acCodes(ei), acLens(ei))
          }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  /** Huffman table in the T.81 F.2.2.3 mincode/maxcode/valptr form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: un-stuffs
    * FF00, surfaces RSTn markers at byte boundaries, and fails closed
    * (negative return) on every other marker, EOF, or malformed
    * stuffing. `pos` ends at the byte after the last consumed one.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** -1 = EOF/marker. */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff
          if (m != 0x00) return -1 // a real marker mid-entropy: malformed
          pos += 1
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val bi = bit()
        if (bi < 0) return -1
        v = (v << 1) | bi
        i += 1
      }
      v
    }
    def alignByte(): Unit = n = 0
    /** At a restart boundary: discard pad bits, expect FF Dm. */
    def expectRst(m: Int): Boolean = {
      n = 0
      if (pos + 2 > b.length) return false
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + m))
        return false
      pos += 2
      true
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l)) {
          val idx = t.valPtr(l) + code - t.minCode(l)
          if (idx >= t.values.length) return -1
          return t.values(idx)
        }
        val bi = bit()
        if (bi < 0) return -1
        code = (code << 1) | bi
        l += 1
      }
      -1 // no code within 16 bits: malformed
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode within the restricted profile; None on ANYTHING else: bad
    * or missing markers, non-SOF0 frames, 16-bit quant tables, chroma
    * subsampling, unknown component/table references, pixel count
    * above `maxPixels`, any Huffman/run-length defect, a missing RSTn
    * at a declared restart boundary, or trailing bytes after EOI.
    * Returns the [[ImageHash.Decoded]] luma plane (BT.601 integer luma
    * for color, the sample itself for grayscale); `colorType` carries
    * the component count (1 or 3).
    */
  def decode(b: Array[Byte], maxPixels: Long = 1L << 24)
      : Option[ImageHash.Decoded] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2

    val qt = new Array[Array[Int]](4) // zigzag order, as declared
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0; var ncomp = 0
    var compTq: Array[Int] = null
    var restartInterval = 0
    var sawSof = false

    def u16(i: Int): Int =
      if (i + 2 > b.length) -1
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    // marker loop up to SOS
    var atScan = false
    while (!atScan) {
      // skip fill bytes: any number of FFs precede a marker code
      if (pos + 2 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      var m = b(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) {
        if (pos >= b.length) return None
        m = b(pos) & 0xff
        pos += 1
      }
      m match {
        case 0xc0 => // SOF0 (baseline); every other SOFn unsupported
          val len = u16(pos)
          if (len < 8 || pos + len > b.length || sawSof) return None
          val prec = b(pos + 2) & 0xff
          h = u16(pos + 3); w = u16(pos + 5)
          ncomp = b(pos + 7) & 0xff
          if (prec != 8 || w <= 0 || h <= 0 ||
            w.toLong * h > maxPixels ||
            (ncomp != 1 && ncomp != 3) ||
            len != 8 + 3 * ncomp) return None
          compTq = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            val id = b(pos + 8 + 3 * c) & 0xff
            val samp = b(pos + 9 + 3 * c) & 0xff
            val tq = b(pos + 10 + 3 * c) & 0xff
            if (id != c + 1 || samp != 0x11 || tq > 3) return None
            compTq(c) = tq
            c += 1
          }
          sawSof = true
          pos += len
        case 0xc4 => // DHT: one or more tables
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) return None
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            if (p + 17 > end) return None
            val tcTh = b(p) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val n = bits.sum
            if (n == 0 || n > 256 || p + 17 + n > end) return None
            val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
          if (p != end) return None
          pos += len
        case 0xdb => // DQT: one or more tables, 8-bit only
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) return None
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            val pqTq = b(p) & 0xff
            val pq = pqTq >> 4; val tq = pqTq & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > end) return None
            qt(tq) = Array.tabulate(64)(i => b(p + 1 + i) & 0xff)
            if (qt(tq).exists(_ == 0)) return None
            p += 65
          }
          if (p != end) return None
          pos += len
        case 0xdd => // DRI
          val len = u16(pos)
          if (len != 4 || pos + len > b.length) return None
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda => atScan = true
        case x if x >= 0xe0 && x <= 0xef => // APPn
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
        case 0xfe => // COM
          val len = u16(pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
        case _ => return None // SOF2/DNL/DAC/RST-outside-scan/EOI-early/...
      }
    }
    if (!sawSof) return None

    // SOS header
    val sosLen = u16(pos)
    if (sosLen < 3 || pos + sosLen > b.length) return None
    val ns = b(pos + 2) & 0xff
    if (ns != ncomp || sosLen != 6 + 2 * ns) return None
    val compDc = new Array[HuffTable](ncomp)
    val compAc = new Array[HuffTable](ncomp)
    var c = 0
    while (c < ncomp) {
      val id = b(pos + 3 + 2 * c) & 0xff
      val tdTa = b(pos + 4 + 2 * c) & 0xff
      val td = tdTa >> 4; val ta = tdTa & 0x0f
      if (id != c + 1 || td > 3 || ta > 3 ||
        dcT(td) == null || acT(ta) == null) return None
      compDc(c) = dcT(td); compAc(c) = acT(ta)
      c += 1
    }
    val ss = b(pos + 3 + 2 * ns) & 0xff
    val se = b(pos + 4 + 2 * ns) & 0xff
    val ahAl = b(pos + 5 + 2 * ns) & 0xff
    if (ss != 0 || se != 63 || ahAl != 0) return None
    c = 0
    while (c < ncomp) { if (qt(compTq(c)) == null) return None; c += 1 }
    pos += sosLen

    // entropy-coded data: one block per component per MCU (4:4:4)
    val blocksW = (w + 7) / 8
    val blocksH = (h + 7) / 8
    val planes = Array.fill(ncomp)(new Array[Int](w * h))
    val preds = new Array[Int](ncomp)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val tmp = new Array[Double](64)
    val rowMask = new Array[Boolean](8)
    val br = new BitReader(b, pos)
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.expectRst(rst)) return None
          rst = (rst + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        c = 0
        while (c < ncomp) {
          java.util.Arrays.fill(coef, 0)
          val q = qt(compTq(c))
          var maxK = 0 // highest zigzag index holding a nonzero coef
          // DC
          val t = br.decodeHuff(compDc(c))
          if (t < 0 || t > 15) return None
          val diffBits = if (t == 0) 0 else br.receive(t)
          if (diffBits < 0) return None
          preds(c) += extend(diffBits, t)
          coef(0) = preds(c) * q(0)
          // AC
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = br.decodeHuff(compAc(c))
            if (rs < 0) return None
            val r = rs >> 4; val s = rs & 0x0f
            if (s == 0) {
              if (rs == 0x00) eob = true
              else if (rs == 0xf0) k += 16
              else return None
            } else {
              k += r
              if (k > 63) return None
              val vb = br.receive(s)
              if (vb < 0) return None
              coef(Zigzag(k)) = extend(vb, s) * q(k)
              maxK = k
              k += 1
            }
          }
          if (k > 64) return None
          if (maxK == 0) {
            // DC-only block (the common case on flat regions — and the
            // entire q210 profile): the separable IDCT reduces to the
            // SAME two-step product the general path computes (every
            // dropped term is an exact +0.0, every dropped factor an
            // exact ×1.0), so this is bit-identical, just without the
            // 1024 multiply-adds.
            val t0 = CU(0) * coef(0)
            val px0 = Math.round(0.25 * (CU(0) * t0)).toInt + 128
            val pxc = if (px0 < 0) 0 else if (px0 > 255) 255 else px0
            java.util.Arrays.fill(block, pxc)
          } else {
            // separable IDCT: rows (u), then columns (v); rows with no
            // nonzero coefficient are skipped (their terms are exact
            // zeros — output-identical, libjpeg's pruned-IDCT idea)
            var v = 0
            while (v < 8) {
              var rowNz = false
              var u0 = 0
              while (u0 < 8 && !rowNz) {
                if (coef(v * 8 + u0) != 0) rowNz = true
                u0 += 1
              }
              rowMask(v) = rowNz
              if (rowNz) {
                var x = 0
                while (x < 8) {
                  var s2 = 0.0
                  var u = 0
                  while (u < 8) {
                    val cf = coef(v * 8 + u)
                    if (cf != 0) s2 += CU(u) * cf * CosT(x)(u)
                    u += 1
                  }
                  tmp(v * 8 + x) = s2
                  x += 1
                }
              }
              v += 1
            }
            var yy = 0
            while (yy < 8) {
              var x = 0
              while (x < 8) {
                var s2 = 0.0
                var v2 = 0
                while (v2 < 8) {
                  if (rowMask(v2)) s2 += CU(v2) * tmp(v2 * 8 + x) * CosT(yy)(v2)
                  v2 += 1
                }
                val px = Math.round(0.25 * s2).toInt + 128
                block(yy * 8 + x) =
                  if (px < 0) 0 else if (px > 255) 255 else px
                x += 1
              }
              yy += 1
            }
          }
          // place (crop ragged edge blocks)
          val x0 = bx * 8; val y0 = by * 8
          val xMax = math.min(8, w - x0); val yMax = math.min(8, h - y0)
          val p = planes(c)
          var py = 0
          while (py < yMax) {
            var x = 0
            while (x < xMax) {
              p((y0 + py) * w + x0 + x) = block(py * 8 + x)
              x += 1
            }
            py += 1
          }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }

    // exact-size contract: pad bits, then fill FFs + EOI, then nothing
    br.alignByte()
    var p2 = br.pos
    if (p2 + 2 > b.length) return None
    if ((b(p2) & 0xff) != 0xff) return None
    var m2 = b(p2 + 1) & 0xff
    p2 += 2
    while (m2 == 0xff) {
      if (p2 >= b.length) return None
      m2 = b(p2) & 0xff
      p2 += 1
    }
    if (m2 != 0xd9 || p2 != b.length) return None

    // luma plane
    val lum = new Array[Int](w * h)
    if (ncomp == 1) System.arraycopy(planes(0), 0, lum, 0, w * h)
    else {
      var i = 0
      while (i < lum.length) {
        val (r, g, bb) = yccToRgb(planes(0)(i), planes(1)(i), planes(2)(i))
        lum(i) = ImageHash.luma8(r, g, bb)
        i += 1
      }
    }
    Some(ImageHash.Decoded(w, h, ncomp, lum))
  }

  /** JPEG decode + dHash; `raw_len` is the decoded sample count
    * w·h·components — derivable by the oracle, unlike the
    * entropy-coding-dependent container length.
    */
  def extractJpegHash(media: Dataset[Multimodal.MediaRecord])
      : Dataset[ImageHash.MediaDHash] =
    ImageHash.extractWith(media, decode(_),
      d => d.width.toLong * d.height.toLong * d.colorType)
}
