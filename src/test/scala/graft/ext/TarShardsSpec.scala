package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TarShards]] — the q219 WebDataset walk. Hand-built
  * header golden (independent of the repo's encoder, exercising the
  * `prefix` field the encoder never writes), grouping semantics,
  * strict-profile rejections, fuzz arm.
  */
class TarShardsSpec extends AnyFunSuite {

  /** Assemble one USTAR header + data with this test's own bytes. */
  private def handHeader(name: String, prefix: String, size: Int,
                         typeflag: Byte, payload: Array[Byte])
      : Array[Byte] = {
    val h = new Array[Byte](512)
    System.arraycopy(name.getBytes("US-ASCII"), 0, h, 0, name.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val p = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(p.getBytes("US-ASCII"), 0, h, off, len - 1)
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
    oct(size.toLong, 124, 12); oct(0, 136, 12)
    h(156) = typeflag
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    System.arraycopy(prefix.getBytes("US-ASCII"), 0, h, 345, prefix.length)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += h(i) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
      0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    val out = new java.io.ByteArrayOutputStream
    out.write(h)
    out.write(payload)
    out.write(new Array[Byte]((512 - payload.length % 512) % 512))
    out.toByteArray
  }

  test("golden: hand-built headers with a prefix field parse, group, " +
      "and account correctly") {
    val txt = "hello".getBytes("US-ASCII")
    val img = Array.fill[Byte](600)(7) // spans two data blocks
    val bytes = handHeader("k1.txt", "shard/a", txt.length, '0', txt) ++
      handHeader("k1.img", "shard/a", img.length, '0', img) ++
      handHeader("sub/", "", 0, '5', Array.emptyByteArray) ++
      new Array[Byte](1024)
    val got = TarShards.parse(bytes, Set("txt", "img"))
    assert(got.isDefined)
    val (entries, dirs, samples, complete, payload, first, md5) = got.get
    assert(entries == 2 && dirs == 1 && samples == 1 && complete == 1)
    assert(payload == 605L && first == "k1")
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(md5 == md.digest(txt).map(x => f"$x%02x").mkString)
  }

  test("grouping: required-extension completeness and extensionless " +
      "files") {
    val t = (s: String) => s.getBytes("US-ASCII")
    val bytes = TarShards.encode(Seq(
      ("a.txt", false, t("x")), ("a.cls", false, t("1")),
      ("b.txt", false, t("y")),
      ("README", false, t("r"))))
    val got = TarShards.parse(bytes, Set("txt", "cls")).get
    assert(got._1 == 4 && got._3 == 2 && got._4 == 1) // only a complete
  }

  test("strict-profile rejections fail closed") {
    val ok = TarShards.encode(Seq(
      ("x.txt", false, "abc".getBytes("US-ASCII"))))
    assert(TarShards.parse(ok, Set.empty).isDefined)
    // corrupted checksum
    val bad = ok.clone(); bad(0) = 'y'
    assert(TarShards.parse(bad, Set.empty).isEmpty)
    // truncation at every block boundary
    for (n <- 512 until ok.length by 512)
      assert(TarShards.parse(java.util.Arrays.copyOf(ok, n),
        Set.empty).isEmpty, s"trunc $n")
    // not block-aligned
    assert(TarShards.parse(java.util.Arrays.copyOf(ok, ok.length - 1),
      Set.empty).isEmpty)
    // missing second zero block
    assert(TarShards.parse(
      java.util.Arrays.copyOf(ok, ok.length - 512), Set.empty).isEmpty)
    // trailing bytes after the terminator
    assert(TarShards.parse(ok ++ new Array[Byte](512), Set.empty).isEmpty)
    // GNU long-name typeflag is outside the profile
    val gnu = handHeader("x", "", 1, 'L', Array[Byte]('y')) ++
      new Array[Byte](1024)
    assert(TarShards.parse(gnu, Set.empty).isEmpty)
    // not a tar at all
    assert(TarShards.parse("text".getBytes, Set.empty).isEmpty)
    assert(TarShards.parse(null, Set.empty).isEmpty)
  }

  test("fuzz: single-byte mutations never throw and stay bounded") {
    val base = TarShards.encode(Seq(
      ("s-0.txt", false, "hello world".getBytes("US-ASCII")),
      ("s-0.cls", false, "3".getBytes("US-ASCII"))))
    val rnd = new scala.util.Random(219)
    var i = 0
    while (i < 300) {
      val mutated = base.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      TarShards.parse(mutated, Set("txt"))
      i += 1
    }
  }
}
