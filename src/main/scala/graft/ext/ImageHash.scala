package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.SketchFns

/** Pixel-level image near-dup (VERDICT r12 item 2 / r13 item 5): real
  * decoders for the two codecs runnable in pure JVM code — PNG (zlib
  * via `java.util.zip.Inflater`, all five scanline filters) and GIF
  * (a from-scratch variable-width LZW) — an integer-only 9×8
  * box-average grayscale downsample, a 64-bit difference hash
  * (dHash), and banded Hamming pairing over the hashes — closing the
  * "codec formats stubbed" gap in [[Multimodal]] for both decodable
  * formats.
  *
  * Same discipline as the other Multimodal parsers: bounded reads
  * (chunk lengths validated against the buffer, pixel count capped,
  * inflate into an exact-size buffer), fail-closed (`ok=false` rows,
  * never task aborts), fuzz-armed (ImageHashSpec), and every
  * numeric step integer-exact so the q202/q203 oracles can replay
  * downsample + bit packing from the pristine pixel formula — the
  * decode path is thereby verified END-TO-END: if unfiltering or
  * channel layout were wrong, the replayed dHash would not match.
  *
  * Scale shape: decode+hash is per-row map-side work over
  * `mapPartitions` (media bytes never cross a shuffle — the pointer
  * discipline); pairing shuffles only (chunk, value)-keyed 16-byte
  * rows and is banded by the pigeonhole decomposition
  * ([[graft.functions.SketchFns.simhash_chunks]], shared with the
  * q29 text SimHash path), never all-pairs.
  */
object ImageHash {

  /** BT.601 integer luma approximation; exact for r=g=b (77+150+29 =
    * 256, so gray pixels round-trip bit-exactly — the property the
    * oracle fixtures lean on).
    */
  def luma8(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  /** Decoded 8-bit image: row-major luma plane. */
  final case class Decoded(width: Int, height: Int, colorType: Int,
                           luma: Array[Int])

  /** Minimal PNG codec for the restricted still-image profile: 8-bit
    * depth, colorType 0 (gray) / 2 (RGB) / 6 (RGBA), no interlace, no
    * palette. Everything else — and every malformed byte — decodes to
    * None. Encoder exists for fixtures/specs and exercises all five
    * scanline filters (row % 5).
    */
  object Png {
    private val Signature =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def channelsOf(colorType: Int): Int = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => -1
    }

    private def crc(typ: Array[Byte], data: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32
      c.update(typ); c.update(data); c.getValue
    }

    private def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      be32(data.length.toLong) ++ t ++ data ++ be32(crc(t, data))
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Encode an image whose pixel (x, y) is `pixel(x, y)` — an array
      * of `channels` 0..255 ints. Filter type rotates per row (y % 5)
      * so a decoder must implement all five unfilters to round-trip.
      */
    def encode(w: Int, h: Int, colorType: Int,
               pixel: (Int, Int) => Array[Int]): Array[Byte] = {
      val ch = channelsOf(colorType)
      require(ch > 0, s"unsupported colorType $colorType")
      val stride = w * ch
      val raw = new Array[Byte](h * (1 + stride))
      val prior = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = pixel(x, y)
          var c = 0
          while (c < ch) { cur(x * ch + c) = px(c) & 0xff; c += 1 }
          x += 1
        }
        val f = y % 5
        raw(y * (1 + stride)) = f.toByte
        var i = 0
        while (i < stride) {
          val left = if (i >= ch) cur(i - ch) else 0
          val up = prior(i)
          val ul = if (i >= ch) prior(i - ch) else 0
          val filt = f match {
            case 0 => cur(i)
            case 1 => cur(i) - left
            case 2 => cur(i) - up
            case 3 => cur(i) - ((left + up) / 2)
            case 4 => cur(i) - paeth(left, up, ul)
          }
          raw(y * (1 + stride) + 1 + i) = (filt & 0xff).toByte
          i += 1
        }
        System.arraycopy(cur, 0, prior, 0, stride)
        y += 1
      }
      val deflater = new java.util.zip.Deflater
      deflater.setInput(raw); deflater.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      while (!deflater.finished())
        out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)
      Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Decode within the restricted profile; None on ANYTHING else:
      * bad signature, wrong chunk layout, unsupported
      * depth/color/interlace, out-of-bounds chunk lengths, CRC
      * mismatch, pixel count above `maxPixels`, inflate output that
      * is not EXACTLY the expected scanline byte count, or an unknown
      * filter type. Bounded: never reads past the buffer, never
      * allocates more than the declared (capped) image size.
      */
    def decode(b: Array[Byte], maxPixels: Long = 1L << 24)
        : Option[Decoded] = {
      if (b == null || b.length < Signature.length + 12) return None
      var i = 0
      while (i < Signature.length) {
        if (b(i) != Signature(i)) return None
        i += 1
      }
      def u32(off: Int): Long =
        ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      var w = 0; var h = 0; var colorType = -1; var seenIhdr = false
      val idat = new java.io.ByteArrayOutputStream
      var pos = Signature.length
      var done = false
      while (!done) {
        if (pos + 12 > b.length) return None
        val len = u32(pos)
        if (len < 0 || len > Int.MaxValue - 12 ||
          pos + 12 + len > b.length) return None
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        val data = java.util.Arrays.copyOfRange(b, pos + 8,
          pos + 8 + len.toInt)
        if (crc(java.util.Arrays.copyOfRange(b, pos + 4, pos + 8), data)
            != u32(pos + 8 + len.toInt)) return None
        typ match {
          case "IHDR" =>
            if (seenIhdr || len != 13) return None
            seenIhdr = true
            w = u32(pos + 8).toInt; h = u32(pos + 12).toInt
            val depth = data(8) & 0xff; colorType = data(9) & 0xff
            val (compression, filterM, interlace) =
              (data(10) & 0xff, data(11) & 0xff, data(12) & 0xff)
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels ||
              depth != 8 || channelsOf(colorType) < 0 ||
              compression != 0 || filterM != 0 || interlace != 0)
              return None
          case "IDAT" =>
            if (!seenIhdr) return None
            idat.write(data)
          case "IEND" => done = true
          case _ => // ancillary chunks skipped (CRC already verified)
        }
        pos += 12 + len.toInt
      }
      if (!seenIhdr) return None
      val ch = channelsOf(colorType)
      val stride = w * ch
      val expected = h.toLong * (1 + stride)
      if (expected > Int.MaxValue) return None
      val raw = new Array[Byte](expected.toInt)
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      try {
        var got = 0
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          // All input is pre-set, so zero progress while !finished()
          // means needsInput (truncated) OR needsDictionary (FDICT
          // preset-dictionary stream) — both malformed for this
          // profile. Bailing on ANY no-progress step keeps the loop
          // provably bounded on hostile bytes (a valid-FCHECK
          // FDICT stream would otherwise spin forever).
          if (n == 0) return None
          got += n
        }
        // exact-size contract: a stream with MORE data than the
        // scanlines need is malformed for this profile
        if (got != raw.length ||
          (!inflater.finished() && inflater.inflate(new Array[Byte](1)) > 0))
          return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inflater.end()
      // unfilter in place into the luma plane
      val lum = new Array[Int](w * h)
      val prior = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xff
        if (f > 4) return None
        var i2 = 0
        while (i2 < stride) {
          val v = raw(y * (1 + stride) + 1 + i2) & 0xff
          val left = if (i2 >= ch) cur(i2 - ch) else 0
          val up = prior(i2)
          val ul = if (i2 >= ch) prior(i2 - ch) else 0
          cur(i2) = (f match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + ((left + up) / 2)
            case 4 => v + paeth(left, up, ul)
          }) & 0xff
          i2 += 1
        }
        var x = 0
        while (x < w) {
          lum(y * w + x) =
            if (ch == 1) cur(x)
            else luma8(cur(x * ch), cur(x * ch + 1), cur(x * ch + 2))
          x += 1
        }
        System.arraycopy(cur, 0, prior, 0, stride)
        y += 1
      }
      Some(Decoded(w, h, colorType, lum))
    }
  }

  /** Minimal GIF codec for the restricted still-image profile:
    * GIF87a/89a, a GLOBAL color table (no local tables), one
    * non-interlaced full-frame image at (0, 0), extensions skipped,
    * trailer required. Everything else — and every malformed byte —
    * decodes to None. The decoded plane is palette INDICES mapped
    * through the palette by the same BT.601 integer luma kernel as
    * PNG, so a grayscale palette (entry i = (i,i,i)) makes
    * luma == index exactly — the property the q207 oracle leans on.
    *
    * The LZW layer is a from-scratch implementation of GIF's
    * variable-width variant (LSB-first bit packing, codes start at
    * minCodeSize+1 bits, CLEAR/EOI, dictionary capped at 4096 with
    * deferred-clear tolerated on decode). The subtle part is width
    * alignment: the ENCODER grows its code width AFTER emitting the
    * first code while the next free slot already overflows (the
    * classic compress/ppmtogif ordering), because the DECODER's
    * dictionary lags one entry behind — it grows after ITS add
    * reaches 2^width, one code later in the stream. ImageHashSpec
    * pins the alignment with a hand-assembled golden byte stream,
    * independent of this encoder.
    *
    * Bounded and fail-closed like [[Png]]: every read is
    * bounds-checked, the pixel count is capped BEFORE any allocation,
    * the LZW output is EXACTLY w·h indices (overflow, underflow, a
    * missing EOI, or a whole spare byte after it are all malformed),
    * prefix-chain walks terminate by construction (entry numbers
    * strictly decrease), and every index is validated against the
    * palette size.
    */
  object Gif {

    /** GIF-variant LZW, classic ordering: emit at the CURRENT width,
      * then grow when the next free code no longer fits; the
      * dictionary add follows the emit. Emits CLEAR up front and on a
      * full dictionary, EOI at the end.
      */
    private def lzwEncode(indices: Array[Int],
                          minCodeSize: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream
      var bitBuf = 0
      var bitCnt = 0
      var width = minCodeSize + 1
      var next = eoi + 1
      def put(code: Int): Unit = {
        bitBuf |= code << bitCnt
        bitCnt += width
        while (bitCnt >= 8) {
          out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8
        }
        if (next > (1 << width) - 1 && width < 12) width += 1
      }
      put(clear)
      val dict = new java.util.HashMap[Integer, Integer](8192)
      var cur = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val hit = dict.get(Integer.valueOf((cur << 8) | k))
        if (hit != null) cur = hit.intValue
        else {
          put(cur)
          if (next < 4096) {
            dict.put(Integer.valueOf((cur << 8) | k),
              Integer.valueOf(next))
            next += 1
          } else {
            put(clear)
            dict.clear(); next = eoi + 1; width = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      put(cur)
      put(eoi)
      if (bitCnt > 0) out.write(bitBuf & 0xff)
      out.toByteArray
    }

    /** Encode an image whose pixel (x, y) is `pixel(x, y)` — an INDEX
      * into the 256-entry GRAYSCALE global color table (entry i =
      * (i, i, i), so decoded luma == index). `withGce` prepends a
      * Graphic Control Extension so fixtures exercise the decoder's
      * extension-skip path.
      */
    def encode(w: Int, h: Int, pixel: (Int, Int) => Int,
               withGce: Boolean = false): Array[Byte] = {
      require(w > 0 && h > 0, s"empty image ${w}x$h")
      val out = new java.io.ByteArrayOutputStream
      def u16(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      }
      out.write("GIF89a".getBytes("US-ASCII"))
      u16(w); u16(h)
      out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
      out.write(0)    // background color index
      out.write(0)    // pixel aspect ratio
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      if (withGce) {
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0); u16(0); out.write(0) // no disposal/delay/transparency
        out.write(0)                       // block terminator
      }
      out.write(0x2c); u16(0); u16(0); u16(w); u16(h)
      out.write(0)    // no local color table, no interlace
      out.write(8)    // LZW minimum code size
      val idx = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { idx(y * w + x) = pixel(x, y) & 0xff; x += 1 }
        y += 1
      }
      val lzw = lzwEncode(idx, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n); off += n
      }
      out.write(0)    // image-data terminator
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** LZW decode to EXACTLY `expected` indices; None on a truncated
      * stream, a code beyond the dictionary, output overflow or
      * underflow, a missing EOI, or a whole spare byte after it.
      */
    private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                          expected: Int): Option[Array[Int]] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new Array[Int](expected)
      var op = 0
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      val stack = new Array[Int](4097)
      var width = minCodeSize + 1
      var next = eoi + 1
      var prev = -1
      var bitPos = 0L
      val total = data.length.toLong * 8
      def read(): Int = {
        if (bitPos + width > total) return -1
        var v = 0
        var got = 0
        while (got < width) {
          val byteI = ((bitPos + got) >> 3).toInt
          val bitI = ((bitPos + got) & 7).toInt
          val take = math.min(width - got, 8 - bitI)
          v |= (((data(byteI) & 0xff) >> bitI) & ((1 << take) - 1)) << got
          got += take
        }
        bitPos += width
        v
      }
      var finished = false
      while (!finished) {
        val code = read()
        if (code < 0) return None // bits ran out before EOI
        if (code == clear) {
          next = eoi + 1; width = minCodeSize + 1; prev = -1
        } else if (code == eoi) {
          finished = true
        } else if (prev < 0) {
          if (code >= clear) return None // first code must be a root
          if (op >= expected) return None
          out(op) = code; op += 1
          prev = code
        } else {
          if (code > next) return None // beyond the (lagged) dictionary
          // materialize the string: walk the prefix chain (strictly
          // decreasing entry numbers — terminates) onto a stack, then
          // emit root-first; code == next is the cScSc case (string =
          // string(prev) + its own first char)
          var chase = if (code == next) prev else code
          var sp = 0
          while (chase > eoi) {
            stack(sp) = suffix(chase); sp += 1
            chase = prefix(chase)
          }
          val first = chase
          val len = 1 + sp + (if (code == next) 1 else 0)
          if (op + len > expected) return None
          out(op) = first; op += 1
          while (sp > 0) { sp -= 1; out(op) = stack(sp); op += 1 }
          if (code == next) { out(op) = first; op += 1 }
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = first
            next += 1
            if (next >= (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      if (op != expected) return None
      // exact-size contract: only sub-byte padding may follow EOI
      if (total - bitPos >= 8) return None
      Some(out)
    }

    /** Decode within the restricted profile; None on ANYTHING else:
      * bad signature, missing global color table, out-of-bounds
      * reads, a local color table or interlace flag, an image that is
      * not full-frame at the origin, a second image, pixel count
      * above `maxPixels`, any LZW defect ([[lzwDecode]]), an index
      * outside the palette, or a missing trailer.
      */
    def decode(b: Array[Byte], maxPixels: Long = 1L << 24)
        : Option[Decoded] = {
      if (b == null || b.length < 14) return None
      val magic = new String(b, 0, 6, "US-ASCII")
      if (magic != "GIF87a" && magic != "GIF89a") return None
      def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      val w = u16(6); val h = u16(8)
      val packed = b(10) & 0xff
      if ((packed & 0x80) == 0) return None // profile: GCT required
      val gctSize = 2 << (packed & 7)
      if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
      var pos = 13
      if (pos + 3 * gctSize > b.length) return None
      val palLuma = new Array[Int](gctSize)
      var pi = 0
      while (pi < gctSize) {
        palLuma(pi) =
          luma8(b(pos) & 0xff, b(pos + 1) & 0xff, b(pos + 2) & 0xff)
        pos += 3; pi += 1
      }
      def skipSubBlocks(start: Int): Int = {
        var p = start
        while (p < b.length) {
          val n = b(p) & 0xff
          if (n == 0) return p + 1
          p += 1 + n
        }
        -1
      }
      // block stream up to the single image descriptor
      var atImage = false
      while (!atImage) {
        if (pos >= b.length) return None
        (b(pos) & 0xff) match {
          case 0x21 =>
            if (pos + 2 > b.length) return None
            pos = skipSubBlocks(pos + 2)
            if (pos < 0) return None
          case 0x2c => atImage = true
          case _ => return None
        }
      }
      if (pos + 10 > b.length) return None
      if (u16(pos + 1) != 0 || u16(pos + 3) != 0 ||
          u16(pos + 5) != w || u16(pos + 7) != h) return None
      if ((b(pos + 9) & 0xc0) != 0) return None // LCT / interlace
      pos += 10
      if (pos >= b.length) return None
      val minCodeSize = b(pos) & 0xff
      pos += 1
      if (minCodeSize < 2 || minCodeSize > 8) return None
      val data = new java.io.ByteArrayOutputStream
      var inImage = true
      while (inImage) {
        if (pos >= b.length) return None
        val n = b(pos) & 0xff
        if (n == 0) { inImage = false; pos += 1 }
        else {
          if (pos + 1 + n > b.length) return None
          data.write(b, pos + 1, n); pos += 1 + n
        }
      }
      // after the image: only skippable extensions, then the trailer
      var trailed = false
      while (!trailed) {
        if (pos >= b.length) return None
        (b(pos) & 0xff) match {
          case 0x3b => trailed = true
          case 0x21 =>
            if (pos + 2 > b.length) return None
            pos = skipSubBlocks(pos + 2)
            if (pos < 0) return None
          case _ => return None
        }
      }
      lzwDecode(data.toByteArray, minCodeSize, w * h) match {
        case None => None
        case Some(indices) =>
          val lum = new Array[Int](w * h)
          var j = 0
          while (j < lum.length) {
            val v = indices(j)
            if (v >= gctSize) return None
            lum(j) = palLuma(v)
            j += 1
          }
          Some(Decoded(w, h, 3, lum))
      }
    }
  }

  /** 64-bit dHash over a luma plane: integer box-average downsample to
    * a 9×8 grid (cell (gx, gy) averages columns [gx·w/9, (gx+1)·w/9) ×
    * rows [gy·h/8, (gy+1)·h/8), integer division throughout), then
    * bit gy·8+gx = (mean(gx+1, gy) > mean(gx, gy)). Box-average
    * (rather than point sampling) so single-pixel perturbations move
    * a cell mean by at most delta/area — the property that makes
    * dHash a NEAR-dup hash. None when the image is smaller than the
    * grid.
    */
  def dhash64(lum: Array[Int], w: Int, h: Int): Option[Long] = {
    if (w < 9 || h < 8) return None
    val means = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lum(y * w + x); x += 1 }
          y += 1
        }
        means(gy)(gx) = s / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (means(gy)(gx + 1) > means(gy)(gx))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Some(hash)
  }

  /** One decoded-and-hashed media row (PNG or GIF — `color_type`
    * carries the PNG color type or 3/indexed for GIF; `raw_len` the
    * format's derivable decoded-size surrogate).
    */
  final case class MediaDHash(
      media_id: Long,
      mime: String,
      width: Int,
      height: Int,
      color_type: Int,
      raw_len: Long,
      dhash: Long,
      dhash_hex: String,
      ok: Boolean,
      error: Option[String])

  /** Decode + hash stage: per-partition typed loop (the
    * [[Multimodal.extractExifMeta]] discipline) — unparseable or
    * sub-grid payloads become zero rows with ok=false, exceptions
    * error rows, never task aborts. Shared by both codecs; `rawLen`
    * is the format's oracle-derivable decoded-size surrogate.
    */
  def extractWith(media: Dataset[Multimodal.MediaRecord],
                  decode: Array[Byte] => Option[Decoded],
                  rawLen: Decoded => Long)
      : Dataset[MediaDHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          decode(r.media).flatMap { d =>
            dhash64(d.luma, d.width, d.height).map { hsh =>
              MediaDHash(r.media_id, r.mime, d.width, d.height, d.colorType,
                rawLen(d), hsh, f"$hsh%016X", ok = true, None)
            }
          }.getOrElse(
            MediaDHash(r.media_id, r.mime, 0, 0, 0, 0L, 0L, "", ok = false,
              None))
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaDHash(r.media_id, r.mime, 0, 0, 0, 0L, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** PNG decode + hash; `raw_len` is the decoded scanline byte count
    * h·(1+w·channels) — derivable by the oracle, unlike the
    * deflate-dependent container length.
    */
  def extractPngHash(media: Dataset[Multimodal.MediaRecord])
      : Dataset[MediaDHash] =
    extractWith(media, Png.decode(_), d => {
      val ch = d.colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
      d.height.toLong * (1 + d.width.toLong * ch)
    })

  /** GIF decode + hash; `raw_len` is the decoded index-plane byte
    * count w·h (one palette index per pixel) — derivable by the
    * oracle, unlike the LZW-dependent container length.
    */
  def extractGifHash(media: Dataset[Multimodal.MediaRecord])
      : Dataset[MediaDHash] =
    extractWith(media, Gif.decode(_),
      d => d.width.toLong * d.height.toLong)

  /** Near-dup pairs among 64-bit dHashes with Hamming distance ≤
    * maxDistance — the q29 SimHash pairing applied to image hashes:
    * pigeonhole chunks for candidate generation (any pair within
    * distance d agrees on ≥1 of d+1 chunks), bucket join on
    * (chunk, value), exact Hamming verify on the full signature.
    * Exact w.r.t. the hashes; never all-pairs.
    */
  def dhashPairs(sigs: DataFrame, id: Column, sig: Column,
                 maxDistance: Int): DataFrame = {
    val s = sigs.select(id.as("id"), sig.as("sig"))
    val chunked = s.select(col("id"), col("sig"),
        explode(SketchFns.simhash_chunks(col("sig"), maxDistance)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk"), col("cc.v"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
