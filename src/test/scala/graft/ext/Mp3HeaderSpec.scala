package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Multimodal.Mp3Header]] — the q213 parser. Golden frame
  * assembled by hand from the ISO tables (independent of the q213
  * fixture builder), profile rejections, hostile inputs, fuzz arm.
  */
class Mp3HeaderSpec extends AnyFunSuite {

  /** One hand-built CBR frame: MPEG-1 Layer III, 128 kbps, 44100 Hz,
    * stereo, no padding → frame length 144·128000/44100 = 417 bytes.
    */
  private def goldenFrame: Array[Byte] = {
    val len = 144 * 128000 / 44100 // 417
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte // sync|V1|L3|no-CRC
    b(2) = 0x90.toByte // bitrate idx 9 (=128), rate idx 0, no pad
    b(3) = 0x00        // stereo
    b
  }

  test("golden: hand-built V1/L3 CBR frame parses to the ISO values") {
    val got = Multimodal.Mp3Header.parse(goldenFrame)
    assert(got.contains((1, 3, 128, 44100, 2, 1L,
      1152L * 1000 / 44100, false, false)))
    // two identical frames: double the count and duration
    val two = Multimodal.Mp3Header.parse(goldenFrame ++ goldenFrame)
    assert(two.contains((1, 3, 128, 44100, 2, 2L,
      2L * 1152 * 1000 / 44100, false, false)))
  }

  test("ID3v2 skip, ID3v1 trailer, and VBR detection") {
    val tagged = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 5,
      0, 0, 0, 0, 0) ++ goldenFrame ++
      (Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125))
    val got = Multimodal.Mp3Header.parse(tagged)
    assert(got.contains((1, 3, 128, 44100, 2, 1L,
      1152L * 1000 / 44100, false, true)))
    // second frame at 160 kbps (idx 10) → VBR; len 144·160000/44100=522
    val f2 = new Array[Byte](144 * 160000 / 44100)
    f2(0) = 0xff.toByte; f2(1) = 0xfb.toByte
    f2(2) = 0xa0.toByte; f2(3) = 0x00
    val vbr = Multimodal.Mp3Header.parse(goldenFrame ++ f2)
    assert(vbr.isDefined && vbr.get._8, "bitrate change must flag VBR")
    assert(vbr.get._3 == 128, "reported bitrate is the first frame's")
  }

  test("profile rejections and hostile inputs fail closed") {
    val good = goldenFrame
    // truncation at every byte boundary
    for (n <- 0 until good.length)
      assert(Multimodal.Mp3Header
        .parse(java.util.Arrays.copyOf(good, n)).isEmpty, s"trunc $n")
    // trailing garbage (not a 128-byte TAG)
    assert(Multimodal.Mp3Header.parse(good :+ 0x00.toByte).isEmpty)
    // broken sync
    val nosync = good.clone(); nosync(0) = 0x7f
    assert(Multimodal.Mp3Header.parse(nosync).isEmpty)
    // reserved layer bits (00)
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) & ~0x06).toByte
    assert(Multimodal.Mp3Header.parse(badLayer).isEmpty)
    // free-format bitrate (idx 0) and invalid (idx 15)
    val br0 = good.clone(); br0(2) = (br0(2) & 0x0f).toByte
    assert(Multimodal.Mp3Header.parse(br0).isEmpty)
    val br15 = good.clone(); br15(2) = (br15(2) | 0xf0).toByte
    assert(Multimodal.Mp3Header.parse(br15).isEmpty)
    // a second frame disagreeing on sample rate (idx 1 = 48000)
    val f2 = new Array[Byte](144 * 128000 / 48000)
    f2(0) = 0xff.toByte; f2(1) = 0xfb.toByte
    f2(2) = 0x94.toByte; f2(3) = 0x00
    assert(Multimodal.Mp3Header.parse(good ++ f2).isEmpty)
    // ID3v2 with a non-syncsafe size byte
    val badTag = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0,
      0x80.toByte) ++ good
    assert(Multimodal.Mp3Header.parse(badTag).isEmpty)
    // not audio at all
    assert(Multimodal.Mp3Header.parse("hello world".getBytes).isEmpty)
    assert(Multimodal.Mp3Header.parse(Array.emptyByteArray).isEmpty)
    assert(Multimodal.Mp3Header.parse(null).isEmpty)
  }

  test("fuzz: single-byte mutations never throw and stay bounded") {
    val base = goldenFrame ++ goldenFrame
    val rnd = new scala.util.Random(213)
    var i = 0
    while (i < 300) {
      val mutated = base.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.Mp3Header.parse(mutated) // must terminate quietly
      i += 1
    }
  }
}
