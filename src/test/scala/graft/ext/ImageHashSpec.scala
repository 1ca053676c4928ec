package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-13 PNG decode + dHash ([[graft.ext.ImageHash]]): a hand-built
  * stored-block PNG golden (pins the decoder independently of our own
  * encoder), encode/decode roundtrips over every filter type, color
  * type and ragged dimensions, alpha-ignorance, hostile/fuzzed bytes
  * (never throw, fail closed), and banded-pairing parity against
  * brute force.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val c = new java.util.zip.CRC32
    c.update(t); c.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(c.getValue)
  }

  /** zlib stream with ONE stored (uncompressed) deflate block —
    * hand-writable without running Deflater, so the golden bytes do
    * not depend on any compressor's output.
    */
  private def storedZlib(raw: Array[Byte]): Array[Byte] = {
    val len = raw.length
    val header = Array[Byte](0x78, 0x01, 0x01,
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (~len & 0xff).toByte, ((~len >> 8) & 0xff).toByte)
    val a = new java.util.zip.Adler32
    a.update(raw)
    header ++ raw ++ be32(a.getValue)
  }

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47,
    0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] =
    chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))

  test("decode: hand-built stored-block 2x2 gray PNG yields the " +
       "hand-written pixels (decoder pinned without our encoder)") {
    val raw = Array[Byte](0, 10, 20, 0, 30, 40) // filter 0 rows
    val png = pngSig ++ ihdr(2, 2, 0) ++
      chunk("IDAT", storedZlib(raw)) ++ chunk("IEND", Array.emptyByteArray)
    val d = ImageHash.Png.decode(png).get
    assert(d.width == 2 && d.height == 2 && d.colorType == 0)
    assert(d.luma.toSeq == Seq(10, 20, 30, 40))
  }

  test("decode: hand-built Sub/Up-filtered RGB rows unfilter correctly") {
    // 2x2 RGB. Row 0 filter 1 (Sub): first pixel literal, second
    // stores deltas. Row 1 filter 2 (Up): stores deltas vs row 0.
    // Pristine pixels: (10,20,30) (13,24,35) / (20,20,20) (23,24,25)
    val raw = Array[Byte](
      1, 10, 20, 30, 3, 4, 5,
      2, 10, 0, (256 - 10).toByte, 10, 0, (256 - 10).toByte)
    val png = pngSig ++ ihdr(2, 2, 2) ++
      chunk("IDAT", storedZlib(raw)) ++ chunk("IEND", Array.emptyByteArray)
    val d = ImageHash.Png.decode(png).get
    def l(r: Int, g: Int, b: Int) = ImageHash.luma8(r, g, b)
    assert(d.luma.toSeq ==
      Seq(l(10, 20, 30), l(13, 24, 35), l(20, 20, 20), l(23, 24, 25)))
  }

  test("encode/decode roundtrip: every color type, ragged dims, all " +
       "five filters, IDAT split across chunks") {
    for (ct <- Seq(0, 2, 6); (w, h) <- Seq((9, 8), (10, 9), (23, 17))) {
      def px(x: Int, y: Int): Array[Int] = {
        val v = (x * 31 + y * 57 + ct * 11) % 256
        ct match {
          case 0 => Array(v)
          case 2 => Array(v, (v + 85) % 256, (v + 170) % 256)
          case _ => Array(v, (v + 85) % 256, (v + 170) % 256, (x + y) % 256)
        }
      }
      val bytes = ImageHash.Png.encode(w, h, ct, px)
      val d = ImageHash.Png.decode(bytes).get
      assert(d.width == w && d.height == h && d.colorType == ct,
        s"ct=$ct w=$w h=$h")
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(x, y)
        val want = if (ct == 0) p(0) else ImageHash.luma8(p(0), p(1), p(2))
        assert(d.luma(y * w + x) == want, s"ct=$ct ($x,$y)")
      }
    }
  }

  test("decode: RGBA alpha is ignored — images differing only in " +
       "alpha produce identical luma and dhash") {
    def enc(alpha: (Int, Int) => Int) =
      ImageHash.Png.encode(18, 16, 6,
        (x, y) => Array((x * 7 + y * 13) % 256, (x * 7 + y * 13) % 256,
          (x * 7 + y * 13) % 256, alpha(x, y)))
    val a = ImageHash.Png.decode(enc((_, _) => 255)).get
    val b = ImageHash.Png.decode(enc((x, y) => (x * y) % 256)).get
    assert(a.luma.toSeq == b.luma.toSeq)
    assert(ImageHash.dhash64(a.luma, 18, 16) ==
      ImageHash.dhash64(b.luma, 18, 16))
  }

  test("decode: hostile inputs fail closed (None, never throw)") {
    val good = ImageHash.Png.encode(9, 8, 0, (x, y) => Array((x + y) % 256))
    val hostile = Seq[Array[Byte]](
      Array.emptyByteArray,
      pngSig, // signature only
      pngSig ++ ihdr(9, 8, 0), // no IDAT/IEND
      // CRC corruption
      { val b = good.clone(); b(b.length - 5) = (b(b.length - 5) ^ 1).toByte; b },
      // truncated IDAT payload
      good.dropRight(20),
      // declared dimensions beyond the pixel cap
      pngSig ++ ihdr(1 << 16, 1 << 16, 0) ++
        chunk("IDAT", storedZlib(Array[Byte](0))) ++
        chunk("IEND", Array.emptyByteArray),
      // unsupported: 16-bit depth, palette color, interlace
      pngSig ++ chunk("IHDR", be32(2) ++ be32(2) ++
        Array[Byte](16, 0, 0, 0, 0)),
      pngSig ++ chunk("IHDR", be32(2) ++ be32(2) ++
        Array[Byte](8, 3, 0, 0, 0)),
      pngSig ++ chunk("IHDR", be32(2) ++ be32(2) ++
        Array[Byte](8, 0, 0, 0, 1)),
      // chunk length pointing past the buffer
      pngSig ++ be32(9999) ++ "IHDR".getBytes("US-ASCII"))
    hostile.foreach(b => assert(ImageHash.Png.decode(b).isEmpty))
    // inflate output longer than the scanlines need is malformed
    val fat = pngSig ++ ihdr(2, 1, 0) ++
      chunk("IDAT", storedZlib(Array[Byte](0, 1, 2, 3, 4, 5))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(ImageHash.Png.decode(fat).isEmpty)
    // preset-dictionary zlib (FDICT set with a VALID FCHECK: 0x7820 is
    // divisible by 31): Inflater returns 0 with needsDictionary() and
    // neither needsInput() nor finished() — the ADVICE r13 infinite
    // loop. Must fail closed in bounded time, not spin.
    val raw = Array[Byte](0, 10, 20, 0, 30, 40)
    val inner = storedZlib(raw)
    val dictId = {
      val a = new java.util.zip.Adler32; a.update("dict".getBytes); be32(a.getValue)
    }
    val fdictStream = Array[Byte](0x78, 0x20) ++ dictId ++ inner.drop(2)
    assert((0x78 * 256 + 0x20) % 31 == 0, "FCHECK must be valid")
    val fdictPng = pngSig ++ ihdr(2, 2, 0) ++
      chunk("IDAT", fdictStream) ++ chunk("IEND", Array.emptyByteArray)
    val done = new java.util.concurrent.CompletableFuture[Option[ImageHash.Decoded]]
    val t = new Thread(() => done.complete(ImageHash.Png.decode(fdictPng)))
    t.setDaemon(true); t.start()
    assert(done.get(30, java.util.concurrent.TimeUnit.SECONDS).isEmpty,
      "FDICT stream must decode to None (and terminate)")
  }

  test("decode: fuzzed single-byte mutations never throw") {
    val good = ImageHash.Png.encode(18, 16, 2,
      (x, y) => Array(x % 256, y % 256, (x + y) % 256))
    val rnd = new scala.util.Random(0xd44a5L) // deterministic
    (0 until 500).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ImageHash.Png.decode(b) // Option either way; must not throw
    }
  }

  test("dhash64: grid minimum, identity, and near-dup locality") {
    val w = 18; val h = 16
    def lum(f: (Int, Int) => Int) =
      Array.tabulate(w * h)(i => f(i % w, i / w))
    assert(ImageHash.dhash64(Array.fill(8 * 8)(7), 8, 8).isEmpty)
    val base = lum((x, y) => (x * 13 + y * 29) % 251)
    val h1 = ImageHash.dhash64(base, w, h).get
    assert(ImageHash.dhash64(base.clone(), w, h).get == h1)
    // single-pixel +2 perturbation moves one 2x2 box mean by <=1:
    // hamming stays tiny (the near-dup property the pairing leans on)
    val pert = base.clone(); pert(5 * w + 7) = pert(5 * w + 7) + 2
    val h2 = ImageHash.dhash64(pert, w, h).get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2)
  }

  test("dhashPairs: banded pairing equals brute force at radius 2") {
    val rnd = new scala.util.Random(7)
    // clustered hashes: 20 bases, each with variants at hamming 0-3
    val sigs = (0 until 20).flatMap { c =>
      val base = rnd.nextLong()
      (0 until 4).map { v =>
        var s = base
        (0 until v).foreach(_ => s ^= 1L << rnd.nextInt(64))
        (c * 10 + v).toLong -> s
      }
    }
    val df = sigs.toDF("id", "sig")
    val got = ImageHash.dhashPairs(df, col("id"), col("sig"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb)
      if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == want)
  }

  // ---------------------------------------------------------------- GIF

  /** Hand-assembled 3x2 GIF (palette 4, minCodeSize 2, pixel indices
    * 1,1,2,2,3,3): code stream 4,1,1,2 @3 bits then 2,3,3,5 @4 bits
    * — the width grows exactly at the encoder/decoder alignment point
    * (the compress-ordering subtlety), so this golden pins the decoder
    * INDEPENDENTLY of our own encoder, like the PNG stored-block one.
    */
  private def gifGolden: Array[Byte] = {
    val head = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 2, 0, 0x91.toByte, 0, 0) ++
      Array[Byte](0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30) ++
      Array[Byte](0x2c, 0, 0, 0, 0, 3, 0, 2, 0, 0)
    head ++ Array[Byte](2, 4, 0x4c, 0x24, 0x33, 0x05, 0, 0x3b)
  }

  test("gif decode: hand-assembled golden pins LZW width alignment " +
       "independently of our encoder") {
    val d = ImageHash.Gif.decode(gifGolden).get
    assert(d.width == 3 && d.height == 2 && d.colorType == 3)
    assert(d.luma.toSeq == Seq(10, 10, 20, 20, 30, 30))
  }

  test("gif encode/decode roundtrip: ragged dims, GCE extension, " +
       "grayscale palette makes luma == index") {
    for ((w, h) <- Seq((9, 8), (10, 9), (23, 17), (64, 48));
         gce <- Seq(false, true)) {
      def px(x: Int, y: Int): Int = (x * 31 + y * 57 + w) % 256
      val bytes = ImageHash.Gif.encode(w, h, px, withGce = gce)
      val d = ImageHash.Gif.decode(bytes).get
      assert(d.width == w && d.height == h && d.colorType == 3)
      for (y <- 0 until h; x <- 0 until w)
        assert(d.luma(y * w + x) == px(x, y), s"($x,$y) w=$w h=$h gce=$gce")
    }
  }

  test("gif roundtrip: runs force the cScSc (code == next) case; " +
       "random content forces dictionary-full clears") {
    // constant image: every step after the first is a dictionary hit or
    // the code-equals-next-entry case the decoder must special-case
    val flat = ImageHash.Gif.encode(40, 30, (_, _) => 7)
    assert(ImageHash.Gif.decode(flat).get.luma.forall(_ == 7))
    // deterministic noise: 32768 px, thousands of distinct strings ->
    // the 4096-entry dictionary fills and the encoder emits CLEAR +
    // resets mid-stream; decoder must resync
    val rnd = new scala.util.Random(0x617f1L)
    val noise = Array.fill(256 * 128)(rnd.nextInt(256))
    val bytes = ImageHash.Gif.encode(256, 128, (x, y) => noise(y * 256 + x))
    val d = ImageHash.Gif.decode(bytes).get
    assert(d.luma.toSeq == noise.toSeq)
  }

  test("gif decode: cross-codec agreement — the same gray pixel plane " +
       "through PNG and GIF yields the identical dhash") {
    def v(x: Int, y: Int): Int = (23 + 5 * x * x + 3 * y * y) % 251
    val png = ImageHash.Png.decode(
      ImageHash.Png.encode(18, 16, 0, (x, y) => Array(v(x, y)))).get
    val gif = ImageHash.Gif.decode(
      ImageHash.Gif.encode(18, 16, v)).get
    assert(png.luma.toSeq == gif.luma.toSeq)
    assert(ImageHash.dhash64(png.luma, 18, 16) ==
      ImageHash.dhash64(gif.luma, 18, 16))
  }

  test("gif decode: hostile inputs fail closed (None, never throw)") {
    val good = ImageHash.Gif.encode(18, 16, (x, y) => (x + y) % 256)
    def mut(f: Array[Byte] => Array[Byte]) = f(good.clone())
    val hostile = Seq[Array[Byte]](
      Array.emptyByteArray,
      "GIF89a".getBytes("US-ASCII"),
      mut { b => b(0) = 'J'.toByte; b },                 // bad magic
      mut { b => b(10) = (b(10) & 0x7f).toByte; b },     // no GCT
      good.dropRight(1),                                 // missing trailer
      good.dropRight(12),                                // truncated image data
      good.take(13 + 100),                               // truncated GCT/blocks
      // LCT / interlace flags on the image descriptor (profile breach)
      mut { b => b(13 + 768 + 9) = 0x80.toByte; b },
      mut { b => b(13 + 768 + 9) = 0x40.toByte; b },
      // image not full-frame at the origin
      mut { b => b(13 + 768 + 1) = 1; b },
      // nonsense LZW minimum code size
      mut { b => b(13 + 768 + 10) = 1; b },
      mut { b => b(13 + 768 + 10) = 12; b },
      // pixel count beyond the cap
      mut { b => b(6) = 0; b(7) = 0x40; b(8) = 0; b(9) = 0x40; b })
    hostile.foreach(b => assert(ImageHash.Gif.decode(b).isEmpty))
    // palette index beyond the color table: 1x1, GCT of 4, but
    // minCodeSize 3 — the root code 5 is a legal LZW code and an
    // ILLEGAL palette index; stream = clear(8),5,eoi(9) @4 bits
    val badIdx = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 1, 0, 0x91.toByte, 0, 0) ++
      Array[Byte](0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30) ++
      Array[Byte](0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0) ++
      Array[Byte](3, 2, 0x58, 0x09, 0, 0x3b)
    assert(ImageHash.Gif.decode(badIdx).isEmpty)
    // a code beyond the (lagged) dictionary: first code after clear
    // must be a root — 6 (= eoi+1) is not; stream = clear(4),6,eoi(5)
    // @3 bits: bits 001 011 101 LSB-first -> bytes 0x74, 0x01
    val badCode = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 1, 0, 0x91.toByte, 0, 0) ++
      Array[Byte](0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30) ++
      Array[Byte](0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0) ++
      Array[Byte](2, 2, 0x74, 0x01, 0, 0x3b)
    assert(ImageHash.Gif.decode(badCode).isEmpty)
    // output overflow: the golden's 6 pixels against a 1x1 descriptor
    val overflow = {
      val b = gifGolden.clone()
      b(6) = 1; b(8) = 1          // screen 1x1
      b(13 + 12 + 5) = 1; b(13 + 12 + 7) = 1 // image 1x1
      b
    }
    assert(ImageHash.Gif.decode(overflow).isEmpty)
  }

  test("gif decode: fuzzed single-byte mutations never throw") {
    val good = ImageHash.Gif.encode(18, 16, (x, y) => (x * 7 + y * 13) % 256)
    val rnd = new scala.util.Random(0x61f2L) // deterministic
    (0 until 500).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ImageHash.Gif.decode(b) // Option either way; must not throw
    }
  }
}
