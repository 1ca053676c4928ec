package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Warc]] — the q216 crawl-archive walk. Hand-assembled
  * golden (never touches Warc.encode), strict-profile rejections,
  * hostile inputs, fuzz arm.
  */
class WarcSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Golden archive built with raw string concatenation only. */
  private def golden: Array[Byte] = {
    val body = "<html>hi</html>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    bytes(
      "WARC/1.0\r\n" +
        "WARC-Type: warcinfo\r\n" +
        "Content-Length: 4\r\n" +
        "\r\n" +
        "w: g\r\n\r\n" +
        "WARC/1.1\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: " + "http" + "://a.test/x\r\n" +
        "WARC-Date: 2026-08-16T00:00:00Z\r\n" +
        s"Content-Length: ${http.length}\r\n" +
        "\r\n" +
        http + "\r\n\r\n")
  }

  test("golden: hand-assembled two-record archive parses to the " +
      "response fields") {
    val got = Warc.parse(golden)
    assert(got.isDefined)
    val (n, uri, date, code, ct, blen, bmd5) = got.get
    assert(n == 2)
    assert(uri == "http" + "://a.test/x")
    assert(date == "2026-08-16T00:00:00Z")
    assert(code == 200 && ct == "text/html")
    assert(blen == 15L)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(bmd5 ==
      md.digest(bytes("<html>hi</html>")).map(x => f"$x%02x").mkString)
  }

  test("first response wins; later records still counted") {
    val http404 = "HTTP/1.1 404 NF\r\nContent-Type: text/plain\r\n\r\nno"
    val http200 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nyes"
    val two = Warc.encode(Seq(
      ("response", Seq("WARC-Target-URI" -> "u1"), bytes(http404)),
      ("response", Seq("WARC-Target-URI" -> "u2"), bytes(http200)),
      ("metadata", Nil, bytes("m"))))
    val got = Warc.parse(two)
    assert(got.isDefined)
    assert(got.get._1 == 3 && got.get._2 == "u1" && got.get._4 == 404)
  }

  test("strict-profile rejections and hostile inputs fail closed") {
    val good = golden
    for (n <- 0 until good.length)
      assert(Warc.parse(java.util.Arrays.copyOf(good, n)).isEmpty,
        s"trunc $n")
    assert(Warc.parse(good ++ bytes("x")).isEmpty) // trailing garbage
    // wrong version
    val v = good.clone(); v(5) = '2'
    assert(Warc.parse(v).isEmpty)
    // archive without any response record
    assert(Warc.parse(Warc.encode(Seq(
      ("warcinfo", Nil, bytes("a")),
      ("metadata", Nil, bytes("b"))))).isEmpty)
    // missing Content-Length
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nab\r\n\r\n")).isEmpty)
    // Content-Length overrunning the buffer
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 99\r\n\r\n" +
        "ab\r\n\r\n")).isEmpty)
    // broken record terminator
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\n" +
        "ab\r\nxx")).isEmpty)
    // header line without a colon
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type metadata\r\nContent-Length: 0\r\n\r\n" +
        "\r\n\r\n")).isEmpty)
    // malformed HTTP status line inside a response
    assert(Warc.parse(Warc.encode(Seq(
      ("response", Nil, bytes("HTTP/1.1 2OO OK\r\n\r\nx"))))).isEmpty)
    // not WARC at all
    assert(Warc.parse(bytes("plain text")).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
    assert(Warc.parse(null).isEmpty)
  }

  test("gz: per-record members and one whole-file member inflate to " +
      "the same parse; hostile gz fails closed") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody!"
    val recs = Seq(
      ("warcinfo", Nil, bytes("w: g\r\n")),
      ("response", Seq("WARC-Target-URI" -> "u"), bytes(http)))
    val perRecord = Warc.encodeGz(recs)
    // JDK gzip member starts 1f 8b twice (two members)
    assert(perRecord.count(_ == 0x1f.toByte) >= 2)
    val whole = {
      val out = new java.io.ByteArrayOutputStream
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(Warc.encode(recs)); gz.close()
      out.toByteArray
    }
    val a = Warc.parseGz(perRecord)
    val b = Warc.parseGz(whole)
    assert(a.isDefined && a == b)
    assert(a.get._1 == 2 && a.get._4 == 200 && a.get._6 == 5L)
    // not gzip at all / truncated member / output cap
    assert(Warc.parseGz(Warc.encode(recs)).isEmpty) // plain bytes
    assert(Warc.parseGz(
      java.util.Arrays.copyOf(perRecord, perRecord.length - 3)).isEmpty)
    assert(Warc.parseGz(perRecord, maxBytes = 64).isEmpty)
    assert(Warc.parseGz(null).isEmpty)
  }

  test("gz byte accounting: trailing garbage, a corrupt later member, " +
      "and trailer defects all fail closed — never a truncated prefix") {
    def gzipOne(raw: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(raw); gz.close()
      out.toByteArray
    }
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody!"
    val recs = Seq(
      ("warcinfo", Nil, bytes("w: g\r\n")),
      ("response", Seq("WARC-Target-URI" -> "u"), bytes(http)))
    // member 1 alone is a COMPLETE well-formed archive (2 records) —
    // the dangerous shape: a reader that stops at the first defect
    // would return ok=true with member 2's record silently dropped
    val m1 = gzipOne(Warc.encode(recs))
    val m2 = gzipOne(Warc.encode(Seq(
      ("metadata", Nil, bytes("m: 1\r\n")))))
    val both = m1 ++ m2
    assert(Warc.parseGz(both).exists(_._1 == 3), "3 records expected")
    // corrupt member 2's magic: GZIPInputStream called this EOF
    val badMagic = both.clone(); badMagic(m1.length) = 0x00
    assert(Warc.parseGz(badMagic).isEmpty,
      "corrupt later member must reject the whole input")
    // trailing garbage after the last member
    assert(Warc.parseGz(both ++ bytes("junk")).isEmpty)
    // flipped CRC32 / ISIZE in the final trailer
    val badCrc = both.clone()
    badCrc(both.length - 8) = (badCrc(both.length - 8) ^ 1).toByte
    assert(Warc.parseGz(badCrc).isEmpty)
    val badIsize = both.clone()
    badIsize(both.length - 1) = (badIsize(both.length - 1) ^ 1).toByte
    assert(Warc.parseGz(badIsize).isEmpty)
    // optional header fields (FNAME + FEXTRA + FHCRC) are walked, not
    // rejected: hand-build a member with all three set
    val raw = Warc.encode(recs)
    val deflated = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val hdr = new java.io.ByteArrayOutputStream
    hdr.write(Array[Byte](0x1f, 0x8b.toByte, 8, (1 | 2 | 4 | 8).toByte,
      0, 0, 0, 0, 0, 0xff.toByte)) // FTEXT|FHCRC|FEXTRA|FNAME
    hdr.write(Array[Byte](3, 0, 'a', 'b', 'c')) // FEXTRA xlen=3
    hdr.write(bytes("name.warc")); hdr.write(0) // FNAME
    val hcrc = new java.util.zip.CRC32
    hcrc.update(hdr.toByteArray)
    hdr.write((hcrc.getValue & 0xff).toInt)
    hdr.write(((hcrc.getValue >> 8) & 0xff).toInt)
    hdr.write(deflated)
    val crc = new java.util.zip.CRC32; crc.update(raw)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    hdr.write(le32(crc.getValue)); hdr.write(le32(raw.length.toLong))
    assert(Warc.parseGz(hdr.toByteArray).exists(_._1 == 2),
      "full-featured gzip header must parse")
    // ...and a WRONG header CRC16 fails closed
    val badHcrc = hdr.toByteArray.clone()
    val hcrcOff = 10 + 2 + 3 + "name.warc".length + 1
    badHcrc(hcrcOff) = (badHcrc(hcrcOff) ^ 1).toByte
    assert(Warc.parseGz(badHcrc).isEmpty)
  }

  test("cdx: member offsets are exact random-access handles — a " +
      "sliced member re-parses alone; multi-record members fail closed") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody!"
    val recs = Seq(
      ("warcinfo", Nil, bytes("w: g\r\n")),
      ("response", Seq("WARC-Target-URI" -> "u"), bytes(http)),
      ("metadata", Nil, bytes("m: 1\r\n")))
    val gz = Warc.encodeGz(recs)
    val Some(idx) = Warc.cdxIndex(gz)
    assert(idx.map(_._1) == Seq(0, 1, 2))
    assert(idx.map(_._4) == Seq("warcinfo", "response", "metadata"))
    assert(idx(1)._5 == "u" && idx(1)._6 == http.length.toLong)
    // contiguity + total coverage: offsets partition the file exactly
    assert(idx.head._2 == 0L)
    idx.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 + a._3 == b._2, "members must be contiguous")
    }
    assert(idx.last._2 + idx.last._3 == gz.length.toLong)
    // random access: the (offset, length) slice is a self-contained
    // member whose single record is the indexed one
    val slice = java.util.Arrays.copyOfRange(gz,
      idx(1)._2.toInt, (idx(1)._2 + idx(1)._3).toInt)
    val Some(members) = Warc.gzMembers(slice)
    assert(members.length == 1)
    // the serving path: fetchMember inflates exactly that member and
    // the bytes re-parse as the indexed record (a 1-record archive)
    val Some(one) = Warc.fetchMember(gz, idx(1)._2, idx(1)._3)
    assert(java.util.Arrays.equals(one, members.head._3))
    assert(Warc.parse(one).exists(p => p._1 == 1 && p._2 == "u"))
    // off-by-one handles are rejected, not mis-inflated
    assert(Warc.fetchMember(gz, idx(1)._2 + 1, idx(1)._3).isEmpty)
    assert(Warc.fetchMember(gz, idx(1)._2, idx(1)._3 - 1).isEmpty)
    assert(Warc.fetchMember(gz, 0L, gz.length.toLong).isEmpty) // 3 members
    // a whole-file single member (3 records in one member) is a valid
    // ARCHIVE (parseGz) but not a valid CDX layout (record != member)
    val whole = {
      val out = new java.io.ByteArrayOutputStream
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(Warc.encode(recs)); g.close()
      out.toByteArray
    }
    assert(Warc.parseGz(whole).isDefined)
    assert(Warc.cdxIndex(whole).isEmpty)
    // not gzip at all
    assert(Warc.cdxIndex(Warc.encode(recs)).isEmpty)
    assert(Warc.cdxIndex(null).isEmpty)
  }

  test("fuzz: single-byte mutations never throw and stay bounded") {
    val base = golden
    val rnd = new scala.util.Random(216)
    var i = 0
    while (i < 300) {
      val mutated = base.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      Warc.parse(mutated)
      i += 1
    }
  }
}
