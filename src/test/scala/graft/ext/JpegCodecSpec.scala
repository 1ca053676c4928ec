package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.JpegCodec]] — the q210 decode path. Mirrors the
  * PNG/GIF discipline (ImageHashSpec): a hand-assembled golden that
  * never touches the repo's own encoder, exactness pins for the
  * block-constant profile the q210 oracle leans on, round-trips
  * through the AC/run-length path, cross-codec dHash agreement,
  * hostile inputs, and a fuzz arm.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def grayBlocks(w: Int, h: Int)(v: (Int, Int) => Int) =
    JpegCodec.encode(w, h, 1, (x, y) => Array(v(x / 8, y / 8)))

  // -----------------------------------------------------------------
  // Hand-assembled golden: built with this test's OWN bit-writer and
  // canonical-code derivation from the T.81 Annex K BITS/HUFFVAL
  // spec arrays — the decoder is pinned independently of the repo's
  // encoder (the ImageHashSpec stored-block discipline).
  // -----------------------------------------------------------------
  test("decode: hand-built single-block DC-only golden yields the " +
      "exact constant plane") {
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 11).toArray
    val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    // only the first few AC values matter for an EOB-only scan, but a
    // DHT segment must carry the full table
    val acVals = Array(
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
    // canonical assignment (independent re-derivation of T.81 C.2)
    def codesOf(bits: Array[Int], vals: Array[Int])
        : Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          out(vals(k)) = (code, l); code += 1; k += 1
        }
        code <<= 1
      }
      out.toMap
    }
    val dc = codesOf(dcBits, dcVals)
    val ac = codesOf(acBits, acVals)
    // DC-only scan for one 8x8 gray block of constant 200:
    // DC = 8*(200-128) = 576, diff = 576, category 10, then EOB
    val bits = new java.io.ByteArrayOutputStream
    var acc = 0; var n = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1); n += 1
        if (n == 8) {
          bits.write(acc); if (acc == 0xff) bits.write(0)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    val (c10, l10) = dc(10)
    put(c10, l10); put(576, 10)
    val (eobC, eobL) = ac(0x00)
    put(eobC, eobL)
    if (n > 0) put((1 << (8 - n)) - 1, 8 - n) // 1-pad
    val scan = bits.toByteArray

    val out = new java.io.ByteArrayOutputStream
    def seg(m: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb, 0 +: Array.fill(64)(1)) // DQT flat
    seg(0xc0, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0)) // SOF0 8x8 gray
    seg(0xc4, (Array(0x00) ++ dcBits ++ dcVals) ++
      (Array(0x10) ++ acBits ++ acVals)) // DHT (both classes)
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    out.write(scan, 0, scan.length)
    out.write(0xff); out.write(0xd9) // EOI

    val d = JpegCodec.decode(out.toByteArray)
    assert(d.isDefined)
    assert(d.get.width == 8 && d.get.height == 8 && d.get.colorType == 1)
    assert(d.get.luma.forall(_ == 200))
  }

  test("block-constant exactness: the lossy transform round-trips " +
      "block-constant planes bit-exactly (the q210 oracle contract) — " +
      "gray and RGB, with restart markers and COM segments") {
    def v(bx: Int, by: Int): Int = (23 + 5 * bx * bx + 3 * by * by) % 251 +
      (if ((bx * by) % 13 == 4) 2 else 0)
    for (ncomp <- Seq(1, 3); ri <- Seq(0, 4)) {
      val bytes = JpegCodec.encode(72, 64, ncomp, (x, y) => {
        val vv = v(x / 8, y / 8)
        if (ncomp == 1) Array(vv) else Array(vv, vv, vv)
      }, restartInterval = ri, comment = Some("spec"))
      val d = JpegCodec.decode(bytes)
      assert(d.isDefined, s"ncomp=$ncomp ri=$ri")
      assert(d.get.width == 72 && d.get.height == 64 &&
        d.get.colorType == ncomp)
      for (y <- 0 until 64; x <- 0 until 72)
        assert(d.get.luma(y * 72 + x) == v(x / 8, y / 8),
          s"($x,$y) ncomp=$ncomp ri=$ri")
    }
    // ALL 256 levels are exact, not just the formula's values
    val levels = JpegCodec.encode(128, 128, 3, (x, y) => {
      val vv = (y / 8) * 16 + x / 8
      Array(vv, vv, vv)
    })
    val dl = JpegCodec.decode(levels).get
    for (y <- 0 until 128; x <- 0 until 128)
      assert(dl.luma(y * 128 + x) == (y / 8) * 16 + x / 8)
  }

  test("roundtrip: arbitrary content exercises the AC/run-length/" +
      "ZRL path and stays within the flat-quant error bound") {
    def px(x: Int, y: Int): Int = (x * 31 + y * 17 + x * y) % 256
    val gray = JpegCodec.encode(24, 16, 1, (x, y) => Array(px(x, y)))
    val dg = JpegCodec.decode(gray).get
    for (y <- 0 until 16; x <- 0 until 24)
      assert(math.abs(dg.luma(y * 24 + x) - px(x, y)) <= 2,
        s"gray ($x,$y): ${dg.luma(y * 24 + x)} vs ${px(x, y)}")
    // RGB with genuinely distinct channels: decoded luma tracks the
    // BT.601 luma of the source within the conversion+DCT bound
    def rgb(x: Int, y: Int): Array[Int] =
      Array((x * 13 + y * 7) % 256, (x * 5 + y * 23) % 256,
        (x * 29 + y * 3) % 256)
    val color = JpegCodec.encode(16, 16, 3, (x, y) => rgb(x, y))
    val dc = JpegCodec.decode(color).get
    for (y <- 0 until 16; x <- 0 until 16) {
      val e = rgb(x, y)
      val expected = ImageHash.luma8(e(0), e(1), e(2))
      assert(math.abs(dc.luma(y * 16 + x) - expected) <= 4,
        s"rgb ($x,$y)")
    }
    // a long zero run inside a block (sparse pattern) forces ZRL
    val sparse = JpegCodec.encode(8, 8, 1,
      (x, y) => Array(if (x == 7 && y == 7) 255 else 0))
    val ds = JpegCodec.decode(sparse).get
    assert(math.abs(ds.luma(63) - 255) <= 16 && ds.luma(0) <= 16)
  }

  test("cross-codec: the same gray block-constant plane hashes " +
      "identically through PNG, GIF and JPEG decodes") {
    def v(bx: Int, by: Int): Int = (91 + 17 * bx + 41 * by) % 251
    val w = 72; val h = 64
    val png = ImageHash.Png.encode(w, h, 0, (x, y) => Array(v(x / 8, y / 8)))
    val gif = ImageHash.Gif.encode(w, h, (x, y) => v(x / 8, y / 8))
    val jpg = grayBlocks(w, h)(v)
    val hp = ImageHash.Png.decode(png).flatMap(d =>
      ImageHash.dhash64(d.luma, d.width, d.height))
    val hg = ImageHash.Gif.decode(gif).flatMap(d =>
      ImageHash.dhash64(d.luma, d.width, d.height))
    val hj = JpegCodec.decode(jpg).flatMap(d =>
      ImageHash.dhash64(d.luma, d.width, d.height))
    assert(hp.isDefined && hp == hg && hg == hj)
  }

  test("restart markers: a wrong RSTn index fails closed") {
    val bytes = grayBlocks(72, 16)((bx, by) => 10 + bx * 7 + by)
    val withRst = JpegCodec.encode(72, 16, 1,
      (x, y) => Array(10 + (x / 8) * 7 + y / 8), restartInterval = 3)
    assert(JpegCodec.decode(withRst).isDefined)
    // find the first RST (FF D0) and bump its index to D5
    val idx = withRst.indices.dropRight(1).find(i =>
      (withRst(i) & 0xff) == 0xff && (withRst(i + 1) & 0xff) == 0xd0)
    assert(idx.isDefined)
    val broken = withRst.clone()
    broken(idx.get + 1) = 0xd5.toByte
    assert(JpegCodec.decode(broken).isEmpty)
    assert(JpegCodec.decode(bytes).isDefined)
  }

  test("decode: hostile inputs fail closed (None, never throw)") {
    val good = grayBlocks(24, 16)((bx, by) => 40 + bx * 9 + by * 5)
    assert(JpegCodec.decode(good).isDefined)
    // truncation at EVERY byte boundary
    for (n <- 0 until good.length)
      assert(JpegCodec.decode(java.util.Arrays.copyOf(good, n)).isEmpty,
        s"truncated at $n")
    // trailing garbage after EOI
    assert(JpegCodec.decode(good :+ 0x00.toByte).isEmpty)
    // progressive SOF2 in place of SOF0
    val prog = good.clone()
    val sofAt = prog.indices.dropRight(1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // 16-bit quant table (Pq=1)
    val pq = good.clone()
    val dqtAt = pq.indices.dropRight(1).find(i =>
      (pq(i) & 0xff) == 0xff && (pq(i + 1) & 0xff) == 0xdb).get
    pq(dqtAt + 4) = 0x10.toByte
    assert(JpegCodec.decode(pq).isEmpty)
    // chroma subsampling (2x2 sampling factors on component 1);
    // SOF0 layout: FF C0 len2 precision h2 w2 ncomp [id samp tq]...
    val sub = JpegCodec.encode(16, 16, 3, (_, _) => Array(9, 9, 9))
    val sAt = sub.indices.dropRight(1).find(i =>
      (sub(i) & 0xff) == 0xff && (sub(i + 1) & 0xff) == 0xc0).get
    val sub2 = sub.clone()
    sub2(sAt + 11) = 0x22.toByte
    assert(JpegCodec.decode(sub2).isEmpty)
    // not a JPEG at all
    assert(JpegCodec.decode("plain text".getBytes("UTF-8")).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode(null).isEmpty)
    // pixel cap
    assert(JpegCodec.decode(good, maxPixels = 100).isEmpty)
  }

  test("decode: fuzzed single-byte mutations never throw and never " +
      "spin (bounded on every input)") {
    val good = grayBlocks(24, 16)((bx, by) => (bx * 53 + by * 29) % 251)
    val rnd = new scala.util.Random(210)
    var checked = 0
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (checked < 500 && System.nanoTime() < deadline) {
      val mutated = good.clone()
      val i = rnd.nextInt(mutated.length)
      mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      JpegCodec.decode(mutated) // must terminate without throwing
      checked += 1
    }
    assert(checked == 500, s"fuzz budget exhausted after $checked cases")
  }

  test("extractJpegHash: non-JPEG payloads become ok=false rows, " +
      "never task aborts") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image/jpeg",
        grayBlocks(72, 64)((bx, by) => 30 + bx + by)),
      Multimodal.MediaRecord(2L, "text/plain", "hello".getBytes("UTF-8")))
    val out = JpegCodec.extractJpegHash(rows.toDS()).collect()
      .sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).ok && out(0).width == 72 && out(0).raw_len == 72L * 64)
    assert(!out(1).ok && out(1).dhash_hex == "")
  }
}
