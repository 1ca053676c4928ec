package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.SketchFns

/** Pixel-level image near-dup (VERDICT r12 item 2): a real PNG decoder
  * for the one codec the JVM can run without external libraries
  * (zlib via `java.util.zip.Inflater`), an integer-only 9×8
  * box-average grayscale downsample, a 64-bit difference hash
  * (dHash), and banded Hamming pairing over the hashes — closing the
  * "codec formats stubbed" gap in [[Multimodal]] for one decodable
  * format.
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

  final case class PngHash(
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
    * error rows, never task aborts. `raw_len` is the decoded scanline
    * byte count h·(1+w·channels) — derivable by the oracle, unlike
    * the deflate-dependent container length.
    */
  def extractPngHash(media: Dataset[Multimodal.MediaRecord])
      : Dataset[PngHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          Png.decode(r.media).flatMap { d =>
            dhash64(d.luma, d.width, d.height).map { hsh =>
              val ch = d.colorType match {
                case 0 => 1; case 2 => 3; case _ => 4
              }
              PngHash(r.media_id, r.mime, d.width, d.height, d.colorType,
                d.height.toLong * (1 + d.width.toLong * ch), hsh,
                f"$hsh%016X", ok = true, None)
            }
          }.getOrElse(
            PngHash(r.media_id, r.mime, 0, 0, 0, 0L, 0L, "", ok = false,
              None))
        } catch {
          case scala.util.control.NonFatal(e) =>
            PngHash(r.media_id, r.mime, 0, 0, 0, 0L, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

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
