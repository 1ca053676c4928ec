package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-14 WAV PCM decode + frame-energy fingerprint
  * ([[graft.ext.AudioHash]]): a hand-built golden (pins the decoder
  * independently of our own encoder), encode/decode roundtrips with
  * chunk skipping and word-alignment padding, signed little-endian
  * sample decoding, gradient-hash locality, hostile/fuzzed bytes
  * (never throw, fail closed).
  */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Hand-assembled 3-sample mono PCM16 WAV at 8 kHz: bytes written
    * field by field, no encoder involved.
    */
  private def wavGolden: Array[Byte] =
    tag("RIFF") ++ le32(4 + 24 + 8 + 6) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      tag("data") ++ le32(6) ++ le16(100) ++ le16(0xff9c) ++ le16(3)

  test("wav decode: hand-built golden yields the hand-written samples " +
       "(signed little-endian, decoder pinned without our encoder)") {
    val d = AudioHash.Wav.decode(wavGolden).get
    assert(d.sampleRate == 8000)
    assert(d.samples.toSeq == Seq(100, -100, 3))
  }

  test("wav decode: odd-sized unknown chunk is skipped with its pad byte") {
    val junk = tag("junk") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // 0 = pad
    val b = wavGolden
    val withJunk = b.take(12) ++ junk ++ b.drop(12)
    val d = AudioHash.Wav.decode(withJunk).get
    assert(d.samples.toSeq == Seq(100, -100, 3))
  }

  test("wav encode/decode roundtrip: clamping, LIST skip, ragged lengths") {
    for ((n, list) <- Seq((65, false), (130, true), (1001, true))) {
      def s(i: Int): Int = ((i * 37 + 11) % 2003) - 1001
      val bytes = AudioHash.Wav.encode(44100, Array.tabulate(n)(s),
        withList = list)
      val d = AudioHash.Wav.decode(bytes).get
      assert(d.sampleRate == 44100 && d.samples.length == n)
      for (i <- 0 until n) assert(d.samples(i) == s(i), s"i=$i n=$n")
    }
    // out-of-range samples clamp, not wrap
    val clamped = AudioHash.Wav.decode(
      AudioHash.Wav.encode(8000, Array(40000, -40000))).get
    assert(clamped.samples.toSeq == Seq(32767, -32768))
  }

  test("energyHash64: sub-65 floor, identity, gradient direction, " +
       "perturbation locality") {
    assert(AudioHash.energyHash64(Array.fill(64)(5)).isEmpty)
    // constant energy -> strictly-greater never fires -> hash 0
    assert(AudioHash.energyHash64(Array.fill(650)(7)).contains(0L))
    // strictly rising |amplitude| -> every gradient bit set
    val rising = Array.tabulate(650)(i => i + 1)
    assert(AudioHash.energyHash64(rising).contains(-1L)) // 64 ones
    // ±2 on a few samples moves each frame energy by <= 2·hits:
    // hamming stays tiny (the near-dup property the pairing leans on)
    def base(i: Int): Int = ((3 * i * i + 5 * i) % 2003) - 1001
    val a = Array.tabulate(650)(base)
    val b = Array.tabulate(650)(i => base(i) + (if (i % 97 == 0) 2 else 0))
    val ha = AudioHash.energyHash64(a).get
    val hb = AudioHash.energyHash64(b).get
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3)
  }

  test("wav decode: hostile inputs fail closed (None, never throw)") {
    val good = AudioHash.Wav.encode(8000,
      Array.tabulate(130)(i => (i * 13) % 1000 - 500))
    def mut(f: Array[Byte] => Array[Byte]) = f(good.clone())
    val hostile = Seq[Array[Byte]](
      Array.emptyByteArray,
      tag("RIFF"),
      mut { b => b(0) = 'X'.toByte; b },              // bad magic
      mut { b => b(8) = 'X'.toByte; b },              // bad WAVE tag
      good.dropRight(7),                              // truncated data
      mut { b => b(20) = 3; b },                      // float format
      mut { b => b(22) = 2; b },                      // stereo
      mut { b => b(34) = 8; b },                      // 8-bit
      mut { b => b(16) = 8; b },                      // fmt chunk too short
      // data chunk size beyond the buffer
      mut { b => b(43) = 0x7f; b },
      // odd data size (not a whole number of 16-bit samples)
      tag("RIFF") ++ le32(4 + 24 + 8 + 3) ++ tag("WAVE") ++
        tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        tag("data") ++ le32(3) ++ Array[Byte](1, 2, 3),
      // data before fmt
      tag("RIFF") ++ le32(4 + 8 + 6) ++ tag("WAVE") ++
        tag("data") ++ le32(6) ++ le16(1) ++ le16(2) ++ le16(3),
      // sample count beyond the cap
      tag("RIFF") ++ le32(100) ++ tag("WAVE") ++
        tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        tag("data") ++ le32(0x7ffffffeL) ++ le16(0))
    hostile.foreach(b => assert(AudioHash.Wav.decode(b).isEmpty))
    // the cap itself: 66 samples with maxSamples = 65 fails closed
    val sixtysix = AudioHash.Wav.encode(8000, Array.fill(66)(1))
    assert(AudioHash.Wav.decode(sixtysix, maxSamples = 65).isEmpty)
    assert(AudioHash.Wav.decode(sixtysix, maxSamples = 66).isDefined)
  }

  test("wav decode: fuzzed single-byte mutations never throw") {
    val good = AudioHash.Wav.encode(8000,
      Array.tabulate(650)(i => ((i * 31) % 1500) - 750), withList = true)
    val rnd = new scala.util.Random(0xa4d10L) // deterministic
    (0 until 500).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      AudioHash.Wav.decode(b) // Option either way; must not throw
    }
  }

  test("extractWavFp: ok rows for wav, fail-closed rows for junk; " +
       "fingerprint matches the local computation") {
    def s(m: Long)(i: Int): Int = ((i * 17 + m.toInt) % 1999) - 999
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav",
        AudioHash.Wav.encode(8000, Array.tabulate(650)(s(1L)))),
      Multimodal.MediaRecord(2L, "application/octet-stream",
        "not audio".getBytes("UTF-8"))
    ).toDS()
    val out = AudioHash.extractWavFp(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).ok && out(1L).n_samples == 650L)
    assert(out(1L).fp ==
      AudioHash.energyHash64(Array.tabulate(650)(s(1L))).get)
    assert(!out(2L).ok && out(2L).fp_hex == "")
  }
}
