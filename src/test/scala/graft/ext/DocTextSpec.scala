package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.DocText]] — the q222/q223 document-text extractors.
  * Goldens are hand-assembled (never via the fixture builders, so an
  * encoder/decoder bug can't cancel out), profile violations must be
  * fail-closed Nones, and single-byte fuzz must never throw.
  */
class DocTextSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  // ------------------------------------------------------------------
  // PDF
  // ------------------------------------------------------------------

  private def pdf(body: String): Array[Byte] =
    bytes(s"%PDF-1.4\n$body\ntrailer\n<< /Size 2 >>\nstartxref\n0\n%%EOF\n")

  private def streamObj(content: String, filter: String = ""): String = {
    s"1 0 obj\n<< /Length ${content.length}$filter >>\nstream\n" +
      content + "\nendstream\nendobj"
  }

  test("pdf golden: Tj + TJ + escapes + octal + balanced parens " +
      "reassemble exactly; streams join with newline") {
    val c1 = "BT (He) Tj [(llo \\(w\\)) -120 (orld)] TJ ET"
    val c2 = "BT (tab\\there \\101 (nest)ed \\\\ done) Tj ET"
    val doc = pdf(
      s"1 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj")
    val Some((ns, ops, t)) = DocText.PdfTextExtract.parse(doc)
    assert(ns == 2 && ops == 3)
    assert(t == "Hello (w)orld\ntab\there A (nest)ed \\ done")
  }

  test("pdf: FlateDecode stream inflates; ' and \" show forms prepend " +
      "a newline") {
    val content = "BT (a) Tj (b) ' ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(bytes(content)); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val out = new java.io.ByteArrayOutputStream
    out.write(bytes("%PDF-1.4\n1 0 obj\n<< /Length " +
      s"${deflated.length} /Filter /FlateDecode >>\nstream\n"))
    out.write(deflated)
    out.write(bytes("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n" +
      "startxref\n0\n%%EOF\n"))
    val Some((ns, ops, t)) = DocText.PdfTextExtract.parse(out.toByteArray)
    assert(ns == 1 && ops == 2 && t == "a\nb")
  }

  test("pdf hex strings decode: even/odd nibbles, case, whitespace, " +
      "TJ mixing — and the new edges stay fail-closed") {
    // golden: <48656c6c6f> = Hello (was a violation until r16)
    val Some((_, ops, t)) = DocText.PdfTextExtract.parse(
      pdf(streamObj("BT <48656c6c6f> Tj ET")))
    assert(ops == 1 && t == "Hello")
    // odd nibble count pads 0: <48655> = He + 0x50 = HeP
    val Some((_, _, t2)) = DocText.PdfTextExtract.parse(
      pdf(streamObj("BT <48655> Tj ET")))
    assert(t2 == "HeP")
    // uppercase digits + interior whitespace; hex mixes with literals
    // in a TJ array
    val Some((_, _, t3)) = DocText.PdfTextExtract.parse(
      pdf(streamObj("BT [<4865 6C\t6C6F> -120 ( there)] TJ ET")))
    assert(t3 == "Hello there")
    // hex next-line show form
    val Some((_, _, t4)) = DocText.PdfTextExtract.parse(
      pdf(streamObj("BT (a) Tj <62> ' ET")))
    assert(t4 == "a\nb")
    // non-hex digit inside: fail closed
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT <48g5> Tj ET"))).isEmpty)
    // unterminated hex string: fail closed
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT <4865 Tj ET"))).isEmpty)
    // hex show outside BT/ET: still a violation
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("<48> Tj"))).isEmpty)
  }

  test("pdf: /Length key match requires a delimiter — /Length1 in a " +
      "font-stream dict is never read as THE stream length") {
    // dict carries /Length1 BEFORE /Length: a bare indexOf would read
    // the /Length1 value (wrong length → mis-slice); the fixed parser
    // reads the real /Length and extracts cleanly
    val c = "BT (ok) Tj ET"
    val Some((_, _, t)) = DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length1 99 /Length ${c.length} >>\nstream\n" +
        s"$c\nendstream\nendobj"))
    assert(t == "ok")
    // only /Length1 present, no /Length: fail closed, never mis-sliced
    assert(DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length1 ${c.length} >>\nstream\n" +
        s"$c\nendstream\nendobj")).isEmpty)
  }

  test("pdf real-world widenings: indirect /Length resolves; typed " +
      "streams (xref/font/image) are skipped, not tokenized") {
    val c = "BT (real content) Tj ET"
    // indirect /Length: the value object resolves
    val Some((ns1, _, t1)) = DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length 5 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        s"5 0 obj\n${c.length}\nendobj"))
    assert(ns1 == 1 && t1 == "real content")
    // a later redefinition wins (incremental-update files append)
    val Some((_, _, t1b)) = DocText.PdfTextExtract.parse(pdf(
      s"5 0 obj\n7\nendobj\n" +
        s"1 0 obj\n<< /Length 5 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        s"5 0 obj\n${c.length}\nendobj"))
    assert(t1b == "real content")
    // typed streams carry binary that must never reach the tokenizer:
    // an xref stream, a font program, an image — interleaved with real
    // content; only the typeless stream contributes
    val bin = new String(Array.tabulate(64)(i => (i * 37 % 256).toByte),
      "ISO-8859-1")
    val Some((ns2, ops2, t2)) = DocText.PdfTextExtract.parse(pdf(
      s"2 0 obj\n<< /Type /XRef /Length ${bin.length} /W [1 2 1] " +
        s">>\nstream\n$bin\nendstream\nendobj\n" +
        s"3 0 obj\n<< /Length ${bin.length} /Subtype /Image " +
        s">>\nstream\n$bin\nendstream\nendobj\n" +
        s"1 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\n" +
        "endobj\n" +
        s"4 0 obj\n<< /Type /ObjStm /N 2 /First 9 /Length ${bin.length} " +
        s">>\nstream\n$bin\nendstream\nendobj"))
    assert(ns2 == 1 && ops2 == 1 && t2 == "real content")
    // /TypeX is NOT /Type (name-boundary discipline): such a stream is
    // typeless, must tokenize — binary fails closed
    assert(DocText.PdfTextExtract.parse(pdf(
      s"2 0 obj\n<< /TypeX /Y /Length ${bin.length} >>\nstream\n$bin" +
        "\nendstream\nendobj")).isEmpty)
    // typed stream whose declared length overruns: still fail-closed
    assert(DocText.PdfTextExtract.parse(pdf(
      "2 0 obj\n<< /Type /XRef /Length 99999 >>\nstream\nxx\n" +
        "endstream\nendobj")).isEmpty)
  }

  test("pdf ObjStm resolution: /Length living in an object stream " +
      "resolves; direct shadows ObjStm; later ObjStm wins; truncated " +
      "ObjStm fails the doc closed") {
    val c = "BT (objstm content) Tj ET"
    // pair table "7 0 8 N " then members "<len> << /K 3 >>" — the
    // non-integer member must be skipped, not fail the stream
    def objStm(objnum: Int, lenVal: Int): String = {
      val bodies = Seq(lenVal.toString, "<< /K 3 >>")
      val header = s"7 0 8 ${bodies.head.length + 1} "
      val payload = header + bodies.mkString(" ")
      s"$objnum 0 obj\n<< /Type /ObjStm /N 2 /First ${header.length} " +
        s"/Length ${payload.length} >>\nstream\n$payload\nendstream\nendobj"
    }
    // the ONLY definition of 7 is inside the ObjStm
    val Some((ns1, _, t1)) = DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length 7 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        objStm(5, c.length)))
    assert(ns1 == 1 && t1 == "objstm content")
    // later ObjStm definition wins over an earlier wrong one
    val Some((_, _, t2)) = DocText.PdfTextExtract.parse(pdf(
      objStm(4, c.length + 3) + "\n" +
        s"1 0 obj\n<< /Length 7 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        objStm(5, c.length)))
    assert(t2 == "objstm content")
    // a DIRECT integer object shadows the ObjStm-resident one (and
    // then a malformed ObjStm elsewhere is never consulted)
    val garbage = "5 0 obj\n<< /Type /ObjStm /N 9 /First 2 /Length 4 " +
      ">>\nstream\nZZZZ\nendstream\nendobj"
    val Some((_, _, t3)) = DocText.PdfTextExtract.parse(pdf(
      objStm(4, c.length + 3) + "\n" + garbage + "\n" +
        s"1 0 obj\n<< /Length 7 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        s"7 0 obj\n${c.length}\nendobj"))
    assert(t3 == "objstm content")
    // but once consulted, ANY malformed ObjStm fails the doc closed
    // (all-or-nothing: a broken one could shadow any object)
    assert(DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length 7 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        objStm(5, c.length) + "\n" + garbage)).isEmpty)
    // truncated FLATE ObjStm: inflate fails → closed
    val z = {
      val d = new java.util.zip.Deflater()
      val in = "7 0 9".getBytes("ISO-8859-1")
      d.setInput(in); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n / 2)
    }
    val cut = new String(z, "ISO-8859-1")
    assert(DocText.PdfTextExtract.parse(pdf(
      s"1 0 obj\n<< /Length 7 0 R >>\nstream\n$c\nendstream\nendobj\n" +
        s"5 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length ${cut.length} " +
        s"/Filter /FlateDecode >>\nstream\n$cut\nendstream\nendobj"))
      .isEmpty)
    // payload bytes spelling "N G obj M endobj" inside a DIRECT-length
    // stream are never read as an object (ADVICE r16: the int scan
    // skips direct payload ranges) — here a LATER payload trap would
    // shadow the real length under later-wins and mis-slice; skipping
    // it keeps the parse correct
    val cx = "BT (x) Tj ET"
    val trap = "9 0 obj 3 endobj"
    val Some((_, _, t4)) = DocText.PdfTextExtract.parse(pdf(
      s"9 0 obj\n${cx.length}\nendobj\n" +
        s"1 0 obj\n<< /Length 9 0 R >>\nstream\n$cx\nendstream\nendobj\n" +
        s"2 0 obj\n<< /Type /XRef /Length ${trap.length} >>\nstream\n" +
        s"$trap\nendstream\nendobj"))
    assert(t4 == "x")
  }

  test("pdf filter chains: ASCIIHexDecode alone and chained with " +
      "FlateDecode decode in application order; hex edges fail closed") {
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](s.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def hex(b: Array[Byte], upper: Boolean): String =
      b.map(x => f"${x & 0xff}%02x")
        .map(h => if (upper) h.toUpperCase else h).mkString
    val c = "BT (chained) Tj ET"
    // plain ASCIIHexDecode: uppercase, interior whitespace, EOD
    val h1 = hex(c.getBytes("ISO-8859-1"), upper = true)
      .grouped(8).mkString(" ") + ">"
    val Some((_, _, t1)) = DocText.PdfTextExtract.parse(pdf(
      streamObj(h1, " /Filter /ASCIIHexDecode")))
    assert(t1 == "chained")
    // odd final digit pads with 0: content ends with a space (0x20),
    // encoded with its trailing '0' dropped — the pad must restore it
    val body = "BT (P) Tj ET " // trailing space = 0x20
    val hOdd = hex(body.getBytes("ISO-8859-1"), upper = false)
      .dropRight(1) + ">" // drop the trailing '0' of 0x20
    val Some((_, _, tOdd)) = DocText.PdfTextExtract.parse(pdf(
      streamObj(hOdd, " /Filter /ASCIIHexDecode")))
    assert(tOdd == "P")
    // the two-stage chain decodes hex FIRST, then inflates
    val h2 = hex(deflate(c), upper = false) + ">"
    val Some((_, _, t2)) = DocText.PdfTextExtract.parse(pdf(
      streamObj(h2, " /Filter [ /ASCIIHexDecode /FlateDecode ]")))
    assert(t2 == "chained")
    // one-element array form
    val z = new String(deflate(c), "ISO-8859-1")
    val Some((_, _, t3)) = DocText.PdfTextExtract.parse(pdf(
      streamObj(z, " /Filter [/FlateDecode]")))
    assert(t3 == "chained")
    // hex edges: bad digit, missing EOD, non-ws bytes after EOD
    assert(DocText.PdfTextExtract.parse(pdf(
      streamObj("48g5>", " /Filter /ASCIIHexDecode"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(pdf(
      streamObj("4865", " /Filter /ASCIIHexDecode"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(pdf(
      streamObj("4865>zz", " /Filter /ASCIIHexDecode"))).isEmpty)
    // empty array and malformed values fail closed
    assert(DocText.PdfTextExtract.parse(pdf(
      streamObj(c, " /Filter []"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(pdf(
      streamObj(c, " /Filter 7"))).isEmpty)
  }

  test("failure REASON codes are stable: parseR/parseFullR land each " +
      "violation family on its documented code (the q243 vocabulary)") {
    import DocText.{PdfTextExtract => P, DocxTextExtract => D}
    assert(P.parseR(bytes("not a pdf at all!!")) == Left("pdf_magic"))
    assert(P.parseR(bytes("%PDF-1.4\n" + streamObj("BT (x) Tj ET")))
      == Left("pdf_no_eof"))
    assert(P.parseR(pdf(streamObj("BT (x) Tj", ""))) ==
      Left("pdf_content_profile"))
    assert(P.parseR(pdf(
      "1 0 obj\n<< /Length 9 0 R >>\nstream\nBT (x) Tj ET\nendstream" +
        "\nendobj")) == Left("pdf_length_unresolved"))
    assert(P.parseR(pdf(streamObj("BT (x) Tj ET",
      " /Filter /DCTDecode"))) == Left("pdf_filter_unsupported"))
    assert(P.parseR(pdf(streamObj("garbage",
      " /Filter /FlateDecode"))) == Left("pdf_decode_error"))
    assert(P.parseR(pdf(
      "1 0 obj\n<< /Length 99999 >>\nstream\nx\nendstream\nendobj"))
      == Left("pdf_stream_bounds"))
    assert(D.parseFullR(bytes("PKtruncated")) ==
      Left("docx_zip"))
    assert(D.parseFullR(storedZip("other.xml",
      "<x/>".getBytes("UTF-8"))) == Left("docx_no_document_part"))
    assert(D.parseFullR(storedZip("word/document.xml",
      "<w:document><w:body><w:tbl/></w:body></w:document>"
        .getBytes("UTF-8"))) == Left("docx_xml_profile"))
  }

  test("pdf profile violations all fail closed") {
    // inline dict in a content stream (`<<` still out of profile)
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT << /K 1 >> (x) Tj ET"))).isEmpty)
    // UNRESOLVABLE indirect /Length (no such integer object)
    assert(DocText.PdfTextExtract.parse(pdf(
      "1 0 obj\n<< /Length 5 0 R >>\nstream\nBT (x) Tj ET\nendstream\nendobj"))
      .isEmpty)
    // out-of-profile filters — alone and inside a chain
    assert(DocText.PdfTextExtract.parse(pdf(streamObj("BT (x) Tj ET",
      " /Filter /LZWDecode"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(pdf(streamObj("BT (x) Tj ET",
      " /Filter [ /FlateDecode /LZWDecode ]"))).isEmpty)
    // in-profile chain over data that is NOT actually flate: the
    // decode stage itself must fail closed
    assert(DocText.PdfTextExtract.parse(pdf(streamObj("BT (x) Tj ET",
      " /Filter [ /FlateDecode /ASCIIHexDecode ]"))).isEmpty)
    // show outside BT/ET
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("(loose) Tj"))).isEmpty)
    // unbalanced BT
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT (x) Tj"))).isEmpty)
    // unterminated literal
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT (x Tj ET"))).isEmpty)
    // /Length overruns the file
    assert(DocText.PdfTextExtract.parse(pdf(
      "1 0 obj\n<< /Length 99999 >>\nstream\nBT (x) Tj ET\nendstream\nendobj"))
      .isEmpty)
    // declared length cuts the stream short of endstream
    assert(DocText.PdfTextExtract.parse(pdf(
      "1 0 obj\n<< /Length 3 >>\nstream\nBT (x) Tj ET\nendstream\nendobj"))
      .isEmpty)
    // corrupt flate bytes
    assert(DocText.PdfTextExtract.parse(pdf(streamObj("garbagegarbage",
      " /Filter /FlateDecode"))).isEmpty)
    // not a PDF / no EOF / empty / null
    assert(DocText.PdfTextExtract.parse(bytes("plain text here")).isEmpty)
    assert(DocText.PdfTextExtract.parse(
      bytes("%PDF-1.4\n" + streamObj("BT (x) Tj ET"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(Array.emptyByteArray).isEmpty)
    assert(DocText.PdfTextExtract.parse(null).isEmpty)
  }

  test("pdf: a no-stream but well-formed file extracts empty text; " +
      "positioning ops render their structural whitespace (r17)") {
    val Some((ns, ops, t)) =
      DocText.PdfTextExtract.parse(pdf("1 0 obj\n<< /Type /Catalog >>\nendobj"))
    assert(ns == 0 && ops == 0 && t == "")
    // Td ty>0 (indent/first-line move): nothing; Tm: nothing;
    // T*: newline — the line-break form every writer emits
    val Some((_, ops2, t2)) = DocText.PdfTextExtract.parse(
      pdf(streamObj("BT /F1 12 Tf 10 20 Td 1 0 0 1 5 5 Tm T* (x) Tj ET")))
    assert(ops2 == 1 && t2 == "\nx")
  }

  test("pdf positioning whitespace (r17): Td/TD ty<0 and T* break " +
      "lines, TJ kerns below -180 are spaces, traps stay silent") {
    // words placed individually: big negative TJ gaps are the spaces
    val Some((_, o1, t1)) = DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT [(He) -40 (llo) -333 (wor) 250 (ld)] TJ ET")))
    assert(o1 == 1 && t1 == "Hello world")
    // line breaks: Td with negative ty, TD, T*; ty=0 is horizontal
    val Some((_, o2, t2)) = DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT 72 720 Td (a) Tj 0 -14 Td (b) Tj 8 0 Td (c) Tj " +
        "12 -16 TD (d) Tj T* (e) Tj ET")))
    assert(o2 == 5 && t2 == "a\nbc\nd\ne")
    // exactly -180 is a space; -179.9 is a kern
    val Some((_, _, t3)) = DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT [(x) -180 (y) -179.9 (z)] TJ ET")))
    assert(t3 == "x yz")
    // positioning outside BT is a profile violation, like shows
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("T* BT (x) Tj ET"))).isEmpty)
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("0 -14 Td BT (x) Tj ET"))).isEmpty)
    // Td with fewer than two operands is malformed
    assert(DocText.PdfTextExtract.parse(
      pdf(streamObj("BT -14 Td (x) Tj ET"))).isEmpty)
  }

  test("pdf inline images (r17): BI/ID/EI segments skip wholesale, " +
      "unflanked EI does not terminate, violations fail closed") {
    // binary payload with an XEI trap and non-letter bytes around it
    val img = "q BI /W 4 /H 2 /BPC 8 /CS /G ID XEI" +
      " EI Q"
    val Some((_, ops, t)) = DocText.PdfTextExtract.parse(pdf(streamObj(
      s"BT (a) Tj ET $img BT (b) Tj ET")))
    assert(ops == 2 && t == "ab")
    // unterminated data fails the document closed
    assert(DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT (a) Tj ET q BI /W 2 /H 1 ID  Q"))).isEmpty)
    // inline image inside a text object: content-model violation
    assert(DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT BI /W 1 /H 1 ID  EI (y) Tj ET"))).isEmpty)
    // BI with no ID token at all
    assert(DocText.PdfTextExtract.parse(pdf(streamObj(
      "BT (a) Tj ET BI /W 2"))).isEmpty)
  }

  test("pdf legacy filters (r17): LZW known vector + ASCII85 " +
      "Leviathan vector, z/overflow/EOD edges fail closed") {
    import DocText.PdfTextExtract.{ascii85Decode, lzwDecode}
    // hand-packed 9-bit MSB stream: Clear(256) 'A'(65) 'B'(66) EOD(257)
    val vec = Array(0x80, 0x10, 0x48, 0x50, 0x10).map(_.toByte)
    assert(lzwDecode(vec, 1 << 20).map(new String(_, "ISO-8859-1"))
      .contains("AB"))
    // truncated before EOD / code beyond the next free entry
    assert(lzwDecode(vec.dropRight(2), 1 << 20).isEmpty)
    assert(lzwDecode(Array(0x81, 0x01, 0x00).map(_.toByte), 1 << 20)
      .isEmpty) // second code = 258: nothing assigned yet
    // the classic ASCII85 vector ("Man is d" from Leviathan)
    assert(ascii85Decode("9jqo^BlbD-~>".getBytes("ISO-8859-1"))
      .map(new String(_, "ISO-8859-1")).contains("Man is d"))
    // z = four zero bytes, only at a group boundary
    assert(ascii85Decode("z z~>".getBytes("ISO-8859-1"))
      .exists(_.sameElements(new Array[Byte](8))))
    assert(ascii85Decode("9jz~>".getBytes("ISO-8859-1")).isEmpty)
    // group overflow, lone trailing digit, missing EOD, bad byte
    assert(ascii85Decode("uuuuu~>".getBytes("ISO-8859-1")).isEmpty)
    assert(ascii85Decode("9jqo^B~>".getBytes("ISO-8859-1")).isEmpty)
    assert(ascii85Decode("9jqo^".getBytes("ISO-8859-1")).isEmpty)
    assert(ascii85Decode("9jvo^~>".getBytes("ISO-8859-1")).isEmpty)
  }

  test("pdf legacy filters (r17): LZW width growth roundtrips and " +
      "DecodeParms fails closed") {
    // enough distinct pairs to push the code width past 9 and 10 bits
    val rnd = new scala.util.Random(250)
    val big = Array.fill[Byte](6000)(rnd.nextInt(256).toByte)
    val rep = ("the quick brown fox " * 40).getBytes("ISO-8859-1")
    Seq(big, rep, Array.emptyByteArray, Array[Byte](7)).foreach { d =>
      val enc = graft.analytics.DocTextQueries.lzwEncodeForTest(d)
      assert(DocText.PdfTextExtract.lzwDecode(enc, 1 << 22)
        .exists(_.sameElements(d)), s"roundtrip len=${d.length}")
    }
    // a DecodeParms dict on a typeless stream fails closed
    assert(DocText.PdfTextExtract.parse(pdf(streamObj("BT (x) Tj ET",
      " /Filter /FlateDecode /DecodeParms << /Predictor 12 >>")))
      .isEmpty)
  }

  test("pdf page tree (r17): pages come out in TREE order, orphans " +
      "and file order are ignored, parts concatenate, cycles fail") {
    import DocText.PdfTextExtract.parsePagesR
    def doc(objs: String): Array[Byte] = bytes(
      s"%PDF-1.6\n$objs\ntrailer\n<< /Size 99 /Root 1 0 R >>\n" +
        "startxref\n0\n%%EOF\n")
    def cs(num: Int, content: String): String =
      s"$num 0 obj\n<< /Length ${content.length} >>\nstream\n" +
        content + "\nendstream\nendobj\n"
    // page 2's objects FIRST in the file + an orphan stream: the
    // walk must yield page order and never the orphan
    val two = doc(
      cs(90, "BT (orphan) Tj ET") +
        cs(22, "BT (second page) Tj ET") +
        "12 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 22 0 R >>\nendobj\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 11 0 R 12 0 R ] /Count 2 >>\nendobj\n" +
        "11 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 21 0 R >>\nendobj\n" +
        cs(21, "BT (first page) Tj ET"))
    assert(parsePagesR(two) ==
      Right(Vector((1, "first page"), (1, "second page"))))
    // two-level tree + a two-part /Contents whose BT...ET spans parts
    // + an empty (contents-less) page
    val nested = doc(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R 13 0 R ] /Count 3 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [ 11 0 R 12 0 R ] /Count 2 >>\nendobj\n" +
        "11 0 obj\n<< /Type /Page /Contents [ 21 0 R 22 0 R ] >>\nendobj\n" +
        "12 0 obj\n<< /Type /Page >>\nendobj\n" +
        "13 0 obj\n<< /Type /Page /Contents 23 0 R >>\nendobj\n" +
        cs(21, "BT (He) Tj") + cs(22, "(llo) Tj ET") +
        cs(23, "BT (tail) Tj ET"))
    assert(parsePagesR(nested) ==
      Right(Vector((2, "Hello"), (0, ""), (1, "tail"))))
    // later redefinition of a page object wins (incremental update)
    val redef = doc(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 11 0 R ] /Count 1 >>\nendobj\n" +
        "11 0 obj\n<< /Type /Page /Contents 21 0 R >>\nendobj\n" +
        cs(21, "BT (old) Tj ET") + cs(22, "BT (new) Tj ET") +
        "11 0 obj\n<< /Type /Page /Contents 22 0 R >>\nendobj\n")
    assert(parsePagesR(redef) == Right(Vector((1, "new"))))
    // cycle, dangling kid, missing root: fail closed
    assert(parsePagesR(doc(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 2 0 R ] /Count 1 >>\nendobj\n"))
      == Left("pdf_page_tree"))
    assert(parsePagesR(doc(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 44 0 R ] /Count 1 >>\nendobj\n"))
      == Left("pdf_page_tree"))
    assert(parsePagesR(bytes(
      "%PDF-1.6\n1 0 obj\n<< /Type /Catalog >>\nendobj\n" +
        "trailer\n<< /Size 9 >>\nstartxref\n0\n%%EOF\n"))
      == Left("pdf_no_root"))
  }

  test("docx numbering (r17): markers render from numbering.xml — " +
      "counters, resets, w:start, numId 0, independence, failures") {
    import DocText.DocxNumExtract
    def zip2(doc: String, num: Option[String]): Array[Byte] =
      multiStoredZip(
        (Seq("word/document.xml" -> doc) ++
          num.map("word/numbering.xml" -> _))
          .map { case (n, x) => n -> x.getBytes("UTF-8") })
    val numbering =
      """<w:numbering>
        |<w:abstractNum w:abstractNumId="0">
        |<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>
        |<w:lvl w:ilvl="1"><w:numFmt w:val="decimal"/><w:lvlText w:val="%1.%2"/></w:lvl>
        |</w:abstractNum>
        |<w:abstractNum w:abstractNumId="1">
        |<w:lvl w:ilvl="0"><w:start w:val="27"/><w:numFmt w:val="lowerLetter"/><w:lvlText w:val="(%1)"/></w:lvl>
        |</w:abstractNum>
        |<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
        |<w:num w:numId="2"><w:abstractNumId w:val="0"/></w:num>
        |<w:num w:numId="3"><w:abstractNumId w:val="1"/></w:num>
        |</w:numbering>""".stripMargin
    def para(t: String, pr: String = ""): String =
      s"<w:p>$pr<w:r><w:t>$t</w:t></w:r></w:p>"
    def numPr(ilvl: Int, numId: Int): String =
      s"""<w:pPr><w:numPr><w:ilvl w:val="$ilvl"/><w:numId w:val="$numId"/></w:numPr></w:pPr>"""
    def doc(ps: String): String =
      s"<w:document><w:body>$ps</w:body></w:document>"
    // counters, multi-level, reset-on-parent-increment, numId
    // independence (1 vs 2 share an abstractNum but count apart),
    // lowerLetter rollover at 27 → "aa", numId 0 = no numbering
    val d = doc(
      para("i1", numPr(0, 1)) + para("s1", numPr(1, 1)) +
        para("s2", numPr(1, 1)) + para("i2", numPr(0, 1)) +
        para("s3", numPr(1, 1)) + para("other", numPr(0, 2)) +
        para("alpha", numPr(0, 3)) + para("plain") +
        para("none", numPr(0, 0)))
    val Right((np, nn, t)) = DocxNumExtract.parseR(zip2(d, Some(numbering)))
    assert(np == 9 && nn == 7)
    assert(t == Seq("1. i1", "1.1 s1", "1.2 s2", "2. i2", "2.1 s3",
      "1. other", "(aa) alpha", "plain", "none").mkString("\n"))
    // a document with no numbering part and no numPr is plain
    assert(DocxNumExtract.parseR(zip2(doc(para("x")), None)) ==
      Right((1, 0, "x")))
    // undefined numId / numPr without a numbering part / table: fail
    assert(DocxNumExtract.parseR(
      zip2(doc(para("x", numPr(0, 9))), Some(numbering))).isLeft)
    assert(DocxNumExtract.parseR(
      zip2(doc(para("x", numPr(0, 1))), None)).isLeft)
    assert(DocxNumExtract.parseR(zip2(doc(
      para("x") + "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r>" +
        "</w:p></w:tc></w:tr></w:tbl>"), Some(numbering))).isLeft)
    // %k referencing a bullet level: fail closed
    val badRef =
      """<w:numbering><w:abstractNum w:abstractNumId="0">
        |<w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/><w:lvlText w:val="-"/></w:lvl>
        |<w:lvl w:ilvl="1"><w:numFmt w:val="decimal"/><w:lvlText w:val="%1.%2"/></w:lvl>
        |</w:abstractNum>
        |<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num></w:numbering>""".stripMargin
    assert(DocxNumExtract.parseR(
      zip2(doc(para("x", numPr(1, 1))), Some(badRef))).isLeft)
  }

  test("rtf (r17): destinations never leak, delimiter space is " +
      "consumed, escapes decode, structure violations fail closed") {
    import DocText.RtfExtract.parseR
    def rtf(body: String): Array[Byte] =
      s"{\\rtf1\\ansi $body}".getBytes("ISO-8859-1")
    // header destinations + starred group: junk must not leak
    assert(parseR(rtf("{\\fonttbl{\\f0 Calibri;}}{\\info{\\title SECRET}}" +
      "{\\*\\generator gen;}hello")) == Right((0, "hello")))
    // {\b bold}: the control word eats exactly ONE space
    assert(parseR(rtf("{\\b bold} x")) == Right((0, "bold x")))
    assert(parseR(rtf("{\\b  two}")) == Right((0, " two")))
    // \par/\line/\tab/\~, source newlines ignored
    assert(parseR(rtf("a\\par b\\line c\\tab d\\~e\nf")) ==
      Right((1, "a\nb\nc\td ef")))
    // byte + brace + backslash escapes
    assert(parseR(rtf("caf\\'e9 \\{x\\} \\\\y")) ==
      Right((0, "café {x} \\y")))
    // unicode with fallback skip; \uc2 widens the skip; negative cp
    assert(parseR(rtf("\\u8364? ok")) == Right((0, "€ ok")))
    assert(parseR(rtf("{\\uc2 \\u8364\\'80? ok}")) ==
      Right((0, "€ ok")))
    assert(parseR(rtf("\\u-3813?")) ==
      Right((0, (-3813 + 65536).toChar.toString)))
    // nested skipped destination with inner braces
    assert(parseR(rtf("{\\info{\\title {deep} junk}}z")) ==
      Right((0, "z")))
    // failures: magic, unbalanced either way, bad hex, dangling \
    assert(parseR("not rtf at all".getBytes("ISO-8859-1")).isLeft)
    assert(parseR("{\\rtf1 x".getBytes("ISO-8859-1")).isLeft)
    assert(parseR("{\\rtf1 x}}".getBytes("ISO-8859-1")).isLeft)
    assert(parseR(rtf("caf\\'zq")).isLeft)
    assert(parseR("{\\rtf1 a\\".getBytes("ISO-8859-1")).isLeft)
  }

  test("eml (r17): transfer codings, multipart walls, rfc2047 " +
      "subjects, strict failures") {
    import DocText.MimeExtract.parseR
    def eml(s: String): Array[Byte] = s.getBytes("UTF-8")
    // qp with soft break + hard CRLF + =E9-style escapes
    val qp = parseR(eml(
      "From: a@b\r\nSubject: s\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
        "caf=C3=A9 lo=\r\nng\r\nnext"))
    assert(qp == Right((1, "s", "café long\nnext")))
    // base64 with wrap; strict: invalid byte fails
    assert(parseR(eml("From: a@b\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\nY2Fmw6k=")) ==
      Left("eml_charset")) // us-ascii default + non-ascii bytes
    assert(parseR(eml("From: a@b\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\nY2Fm\r\nw6k=")) ==
      Right((1, "", "café")))
    assert(parseR(eml("From: a@b\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\nY2*m")).isLeft)
    // multipart: preamble/attachment never leak; alternative picks
    // the plain sibling; missing closing delimiter fails
    val mp =
      "From: a@b\r\nContent-Type: multipart/mixed; boundary=\"bb\"\r\n" +
        "\r\npreamble\r\n--bb\r\n" +
        "Content-Type: multipart/alternative; boundary=ii\r\n\r\n" +
        "--ii\r\nContent-Type: text/html\r\n\r\n<p>x</p>\r\n" +
        "--ii\r\nContent-Type: text/plain\r\n\r\nplain wins\r\n" +
        "--ii--\r\n--bb\r\n" +
        "Content-Type: application/octet-stream\r\n" +
        "Content-Transfer-Encoding: base64\r\n\r\nanVuaw==\r\n"
    assert(parseR(eml(mp + "--bb--\r\n")) ==
      Right((1, "", "plain wins")))
    assert(parseR(eml(mp)).isLeft)
    // folded subject + B/Q encoded-words
    assert(parseR(eml("From: a@b\r\nSubject: doc\r\n" +
      " =?UTF-8?B?Y2Fmw6k=?= =?utf-8?Q?x_y?=\r\n\r\nhi")) ==
      Right((1, "doc café x y", "hi")))
    // malformed encoded-word, foreign charset, junk headers
    assert(parseR(eml(
      "From: a@b\r\nSubject: =?utf-8?X?zz?=\r\n\r\nhi")).isLeft)
    assert(parseR(eml("From: a@b\r\n" +
      "Content-Type: text/plain; charset=koi8-r\r\n\r\nhi")).isLeft)
    assert(parseR(eml("no colon line\r\n\r\nx")).isLeft)
    assert(parseR(eml("X-Other: no from or mime-version\r\n\r\nx"))
      .isLeft)
  }

  test("pdf ToUnicode (r17): glyph codes map through the font's " +
      "CMap; unmapped glyphs and undefined fonts fail closed") {
    import DocText.PdfTextExtract.{parsePagesR, parseToUnicode}
    val cmap = "begincmap 1 begincodespacerange <0000> <FFFF> " +
      "endcodespacerange 2 beginbfchar <0050> <00660069> " +
      "endbfchar 2 beginbfrange <0120> <017E> <0020> " +
      "<0060> <0062> [<0058> <0059> <005A>] endbfrange endcmap"
    val Some(m) = parseToUnicode(cmap)
    assert(m.codeBytes == 2)
    assert(m.lookup(0x50).contains("fi"))
    assert(m.lookup(0x155).contains("U")) // 0x55 + 0x100
    assert(m.lookup(0x61).contains("Y")) // array form
    assert(m.lookup(0xbb0).isEmpty)
    // 1-byte map + mixed-width rejection
    assert(parseToUnicode("begincodespacerange <00> <ff> " +
      "endcodespacerange beginbfchar <41> <0042> endbfchar")
      .exists(x => x.codeBytes == 1 && x.lookup(0x41).contains("B")))
    assert(parseToUnicode("begincodespacerange <00> <ff> " +
      "<0000> <ffff> endcodespacerange").isEmpty)
    assert(parseToUnicode("beginbfchar <41> <0042> endbfchar").isEmpty)
    // end-to-end through the page tree: glyphs translate, the Tf
    // switch to a no-CMap font restores identity, odd-length 2-byte
    // strings / unmapped glyphs / unknown fonts fail closed
    def doc(hex: String, font: String): Array[Byte] = {
      val content = s"BT /F1 12 Tf <$hex> Tj /$font 12 Tf (: t) Tj ET"
      bytes("%PDF-1.6\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [ 11 0 R ] /Count 1 >>\nendobj\n" +
        "11 0 obj\n<< /Type /Page /Resources << /Font " +
        "<< /F1 7 0 R /F2 8 0 R >> >> /Contents 20 0 R >>\nendobj\n" +
        "7 0 obj\n<< /Type /Font /ToUnicode 9 0 R >>\nendobj\n" +
        "8 0 obj\n<< /Type /Font /BaseFont /Helv >>\nendobj\n" +
        s"9 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\n" +
        "endstream\nendobj\n" +
        s"20 0 obj\n<< /Length ${content.length} >>\nstream\n" +
        content + "\nendstream\nendobj\n" +
        "trailer\n<< /Size 99 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    }
    assert(parsePagesR(doc("0050" + "0120" + "0060", "F2")) ==
      Right(Vector((2, "fi X: t"))))
    assert(parsePagesR(doc("0bb0", "F2")) ==
      Left("pdf_content_profile")) // unmapped glyph
    assert(parsePagesR(doc("00", "F2")) ==
      Left("pdf_content_profile")) // one byte: odd for a 2-byte font
    assert(parsePagesR(doc("0050", "F9")) ==
      Left("pdf_content_profile")) // undefined font
  }

  test("mbox (r17): separator split, terminator strip, mboxrd " +
      "quoting round trip, per-message isolation") {
    import DocText.MboxExtract.splitR
    def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // two messages; the second's body line would forge a separator
    // without quoting; ">>From" loses exactly one '>'
    val mbox = "From a Thu Jan  1 00:00:00 2026\n" +
      "From: a@b\r\n\r\nhello\n" +
      "From b Thu Jan  1 00:00:01 2026\n" +
      "From: b@b\r\n\r\n>From here\n>>From deeper\nEnd\n"
    val Right(msgs) = splitR(b(mbox))
    assert(msgs.length == 2)
    assert(new String(msgs(0), "ISO-8859-1") == "From: a@b\r\n\r\nhello")
    assert(new String(msgs(1), "ISO-8859-1") ==
      "From: b@b\r\n\r\nFrom here\n>From deeper\nEnd")
    // not an mbox / truncated separator line
    assert(splitR(b("not mbox\nFrom x")).isLeft)
    assert(splitR(b("From only-a-separator-no-newline")).isLeft)
  }

  test("epub (r17): spine order rules, covers and head junk never " +
      "leak, container/manifest violations fail closed") {
    import DocText.EpubExtract.{parseR, xhtmlText}
    assert(xhtmlText("<html><head><title>junk</title></head><body>" +
      "<p>One <b>bold</b> &amp; two</p><h2>Head</h2>" +
      "</body></html>") == Some((2, "One bold & two\nHead")))
    assert(xhtmlText("<body><p>a<p>b</p></p></body>").isEmpty) // nest
    assert(xhtmlText("<body><p>open</body>").isEmpty)
    def epub(spine: Seq[String], container: String =
        "<container><rootfiles><rootfile full-path=\"O/c.opf\"/>" +
          "</rootfiles></container>",
        mimetype: String = "application/epub+zip"): Array[Byte] = {
      val opf = "<package><manifest>" +
        "<item id=\"a\" href=\"a.xhtml\"/>" +
        "<item id=\"b\" href=\"b.xhtml\"/>" +
        "<item id=\"cover\" href=\"cv.xhtml\"/>" +
        "</manifest><spine>" +
        spine.map(s => s"""<itemref idref="$s"/>""").mkString +
        "</spine></package>"
      multiStoredZip(Seq(
        "mimetype" -> mimetype.getBytes("UTF-8"),
        "O/a.xhtml" ->
          "<body><p>alpha</p></body>".getBytes("UTF-8"),
        "O/b.xhtml" ->
          "<body><p>beta</p></body>".getBytes("UTF-8"),
        "O/cv.xhtml" ->
          "<body><p>COVER</p></body>".getBytes("UTF-8"),
        "META-INF/container.xml" -> container.getBytes("UTF-8"),
        "O/c.opf" -> opf.getBytes("UTF-8")))
    }
    // spine order wins; the cover never appears
    assert(parseR(epub(Seq("b", "a"))) ==
      Right(Vector((1, "beta"), (1, "alpha"))))
    // ghost idref, wrong mimetype, rootfile-less container
    assert(parseR(epub(Seq("a", "ghost"))) == Left("epub_opf"))
    assert(parseR(epub(Seq("a"), mimetype = "application/zip")) ==
      Left("epub_mimetype"))
    assert(parseR(epub(Seq("a"),
      container = "<container><rootfiles/></container>")) ==
      Left("epub_container"))
  }

  test("pdf fuzz: single-byte mutations never throw") {
    val base = pdf(streamObj("BT (Hello \\(w\\) world) Tj ET"))
    val rnd = new scala.util.Random(222)
    (0 until 300).foreach { _ =>
      val m = base.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      DocText.PdfTextExtract.parse(m)
    }
    // truncation at every byte
    (0 until base.length).foreach { n =>
      DocText.PdfTextExtract.parse(java.util.Arrays.copyOf(base, n))
    }
  }

  // ------------------------------------------------------------------
  // DOCX
  // ------------------------------------------------------------------

  /** Hand-rolled single-entry zip (stored) — independent of the
    * fixture's buildZip.
    */
  private def storedZip(name: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    val crc = new java.util.zip.CRC32; crc.update(data)
    val nameB = name.getBytes("UTF-8")
    out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04)); le16(20); le16(0)
    le16(0); le16(0); le16(0); le32(crc.getValue)
    le32(data.length.toLong); le32(data.length.toLong)
    le16(nameB.length); le16(0); out.write(nameB); out.write(data)
    val cdOff = out.size
    out.write(Array[Byte](0x50, 0x4b, 0x01, 0x02)); le16(20); le16(20)
    le16(0); le16(0); le16(0); le16(0); le32(crc.getValue)
    le32(data.length.toLong); le32(data.length.toLong)
    le16(nameB.length); le16(0); le16(0); le16(0); le16(0); le32(0L)
    le32(0L); out.write(nameB)
    val cdLen = out.size - cdOff
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06)); le16(0); le16(0)
    le16(1); le16(1); le32(cdLen.toLong); le32(cdOff.toLong); le16(0)
    out.toByteArray
  }

  /** Multi-entry stored zip (the storedZip shape, N entries). */
  private def multiStoredZip(entries: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val cd = new java.io.ByteArrayOutputStream
    def le16(v: Int, o: java.io.ByteArrayOutputStream): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def le32(v: Long, o: java.io.ByteArrayOutputStream): Unit =
      (0 until 4).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
    entries.foreach { case (name, data) =>
      val off = out.size
      val crc = new java.util.zip.CRC32; crc.update(data)
      val nameB = name.getBytes("UTF-8")
      out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04))
      le16(20, out); le16(0, out); le16(0, out); le16(0, out)
      le16(0, out); le32(crc.getValue, out)
      le32(data.length.toLong, out); le32(data.length.toLong, out)
      le16(nameB.length, out); le16(0, out)
      out.write(nameB); out.write(data)
      cd.write(Array[Byte](0x50, 0x4b, 0x01, 0x02))
      le16(20, cd); le16(20, cd); le16(0, cd); le16(0, cd)
      le16(0, cd); le16(0, cd); le32(crc.getValue, cd)
      le32(data.length.toLong, cd); le32(data.length.toLong, cd)
      le16(nameB.length, cd); le16(0, cd); le16(0, cd); le16(0, cd)
      le16(0, cd); le32(0L, cd); le32(off.toLong, cd)
      cd.write(nameB)
    }
    val cdOff = out.size
    val cdB = cd.toByteArray
    out.write(cdB)
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06))
    le16(0, out); le16(0, out)
    le16(entries.length, out); le16(entries.length, out)
    le32(cdB.length.toLong, out); le32(cdOff.toLong, out); le16(0, out)
    out.toByteArray
  }

  test("docx golden: runs concatenate, paragraphs join with newline, " +
      "entities decode, self-closing w:t is an empty run") {
    val xml = "<?xml version=\"1.0\"?><w:document><w:body>" +
      "<w:p><w:r><w:t>He said &quot;5 &lt; 7 &amp;</w:t></w:r>" +
      "<w:r><w:t xml:space=\"preserve\"> 9 &gt; 2&apos;\"</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t/></w:r><w:r><w:t>second</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    val Some((np, nr, t)) = DocText.DocxTextExtract.parse(
      storedZip("word/document.xml", xml.getBytes("UTF-8")))
    assert(np == 2 && nr == 4) // 2 + self-closing empty + 1
    assert(t == "He said \"5 < 7 & 9 > 2'\"\nsecond")
  }

  test("docx whitespace: in-run w:br/w:cr/w:tab render, tab-STOP " +
      "definitions contribute nothing, hyperlink runs are captured — " +
      "no two runs concatenate without their structural whitespace") {
    val xml = "<w:document><w:body><w:p>" +
      // tab-stop DEFINITION inside pPr: layout, not content
      "<w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/></w:tabs>" +
      "</w:pPr>" +
      "<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r>" +
      "<w:hyperlink r:id=\"rId1\"><w:r><w:t>link</w:t></w:r>" +
      "</w:hyperlink>" +
      "<w:r><w:cr/><w:t>d</w:t></w:r>" +
      "</w:p></w:body></w:document>"
    val Some((np, nr, t)) = DocText.DocxTextExtract.parse(
      storedZip("word/document.xml", xml.getBytes("UTF-8")))
    assert(np == 1 && nr == 5)
    assert(t == "a\tb\nclink\nd")
    // adjacent w:t runs with a break between them never glue: the
    // only places two letters touch is where the XML really has no
    // separator (c/link above) — pin the negative too
    assert(!t.contains("ab") && !t.contains("bc"))
  }

  test("docx aux parts: headers/footers/footnotes extract in part-name " +
      "order; footnoteRef never counts; one bad part fails closed") {
    def z(entries: (String, String)*): Array[Byte] = {
      // minimal stored multi-entry zip via the spec's own builder
      multiStoredZip(entries.map { case (n, x) =>
        (n, x.getBytes("UTF-8")) })
    }
    val doc = "<w:document><w:body><w:p><w:r><w:t>body</w:t></w:r>" +
      "</w:p></w:body></w:document>"
    val h1 = "<w:hdr><w:p><w:r><w:t>h-one</w:t></w:r></w:p></w:hdr>"
    val h2 = "<w:hdr><w:p><w:r><w:t>h-two</w:t></w:r></w:p></w:hdr>"
    val f1 = "<w:ftr><w:p><w:r><w:t>f-one</w:t></w:r></w:p></w:ftr>"
    // a footnoteRef INSIDE a run must not count as a footnote open
    val fn = "<w:footnotes>" +
      "<w:footnote w:id=\"0\"><w:p><w:r><w:footnoteRef/>" +
      "<w:t>n-zero</w:t></w:r></w:p></w:footnote>" +
      "<w:footnote w:id=\"1\"><w:p><w:r><w:t>n-one</w:t></w:r></w:p>" +
      "</w:footnote></w:footnotes>"
    val Right((nh, nf, nn, ht, ft, nt)) = DocText.DocxAuxExtract.parseR(
      z("word/document.xml" -> doc, "word/header2.xml" -> h2,
        "word/header1.xml" -> h1, "word/footer1.xml" -> f1,
        "word/footnotes.xml" -> fn))
    assert(nh == 2 && nf == 1 && nn == 2)
    assert(ht == "h-one\nh-two") // NAME order, not zip order
    assert(ft == "f-one" && nt == "n-zero\nn-one")
    // no part families at all: zero counts, empty texts
    val Right((nh2, nf2, nn2, ht2, _, _)) =
      DocText.DocxAuxExtract.parseR(z("word/document.xml" -> doc))
    assert(nh2 == 0 && nf2 == 0 && nn2 == 0 && ht2 == "")
    // header without the main document part: conformance reject
    assert(DocText.DocxAuxExtract.parseR(z("word/header1.xml" -> h1))
      == Left("docx_no_document_part"))
    // one malformed aux part fails the whole doc closed
    assert(DocText.DocxAuxExtract.parseR(
      z("word/document.xml" -> doc,
        "word/header1.xml" -> "<w:hdr><!-- x --></w:hdr>"))
      == Left("docx_xml_profile"))
  }

  test("docx: tag-name boundaries — w:pPr/w:tblPr noise never opens " +
      "paragraphs or runs") {
    val xml = "<w:document><w:body><w:p><w:pPr><w:jc/></w:pPr>" +
      "<w:r><w:t>only</w:t></w:r></w:p></w:body></w:document>"
    val Some((np, nr, t)) = DocText.DocxTextExtract.parse(
      storedZip("word/document.xml", xml.getBytes("UTF-8")))
    assert(np == 1 && nr == 1 && t == "only")
  }

  test("docx tables golden: cells route to the table, body text stays " +
      "clean, multi-paragraph cells join with newline") {
    val xml = "<w:document><w:body>" +
      "<w:p><w:r><w:t>before</w:t></w:r></w:p>" +
      "<w:tbl><w:tblPr/>" +
      "<w:tr><w:trPr/>" +
      "<w:tc><w:tcPr/><w:p><w:r><w:t>a1</w:t></w:r></w:p></w:tc>" +
      "<w:tc><w:p><w:r><w:t>b1x</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>b1y</w:t></w:r></w:p></w:tc></w:tr>" +
      "<w:tr><w:tc><w:p><w:r><w:t>a2</w:t></w:r></w:p></w:tc>" +
      "<w:tc><w:p><w:r><w:t>b&amp;2</w:t></w:r></w:p></w:tc></w:tr>" +
      "</w:tbl>" +
      "<w:p><w:r><w:t>after</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    val Some(d) = DocText.DocxTextExtract.parseFull(
      storedZip("word/document.xml", xml.getBytes("UTF-8")))
    // body flow excludes cell paragraphs
    assert(d.paragraphs == Vector("before", "after"))
    assert(d.tables == Vector(Vector(
      Vector("a1", "b1x\nb1y"),
      Vector("a2", "b&2"))))
    // parse() (the text view) agrees
    val Some((np, _, t)) = DocText.DocxTextExtract.parse(
      storedZip("word/document.xml", xml.getBytes("UTF-8")))
    assert(np == 2 && t == "before\nafter")
  }

  test("docx table structural defects fail closed") {
    def z(xml: String) = storedZip("word/document.xml",
      ("<w:document><w:body>" + xml + "</w:body></w:document>")
        .getBytes("UTF-8"))
    def cell(s: String) = s"<w:tc><w:p><w:r><w:t>$s</w:t></w:r></w:p></w:tc>"
    // nested table inside a cell
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>x</w:t></w:r></w:p>" +
        "<w:tbl><w:tr>" + cell("y") + "</w:tr></w:tbl>" +
        "</w:tc></w:tr></w:tbl>")).isEmpty)
    // empty table / empty row / empty cell (ECMA-376 wants a paragraph)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl></w:tbl>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr></w:tr></w:tbl>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr><w:tc></w:tc></w:tr></w:tbl>")).isEmpty)
    // self-closing tbl/tr/tc
    assert(DocText.DocxTextExtract.parseFull(z("<w:tbl/>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr/></w:tbl>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr><w:tc/></w:tr></w:tbl>")).isEmpty)
    // cell/row/table left open at EOF
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr>" + cell("x"))).isEmpty)
    // row outside a table, cell outside a row, table inside a paragraph
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tr>" + cell("x") + "</w:tr>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl>" + cell("x") + "</w:tbl>")).isEmpty)
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:p><w:tbl><w:tr>" + cell("x") + "</w:tr></w:tbl></w:p>"))
      .isEmpty)
    // close-tag mismatches
    assert(DocText.DocxTextExtract.parseFull(z(
      "<w:tbl><w:tr>" + cell("x") + "</w:tbl></w:tr>")).isEmpty)
  }

  test("docx profile violations and structural defects fail closed") {
    def z(xml: String) = storedZip("word/document.xml",
      xml.getBytes("UTF-8"))
    // unknown entity / numeric entity
    assert(DocText.DocxTextExtract.parse(z(
      "<w:p><w:r><w:t>&nbsp;</w:t></w:r></w:p>")).isEmpty)
    assert(DocText.DocxTextExtract.parse(z(
      "<w:p><w:r><w:t>&#65;</w:t></w:r></w:p>")).isEmpty)
    // comment
    assert(DocText.DocxTextExtract.parse(z(
      "<!-- c --><w:p><w:r><w:t>x</w:t></w:r></w:p>")).isEmpty)
    // run outside a paragraph / unclosed paragraph / nested paragraph
    assert(DocText.DocxTextExtract.parse(z(
      "<w:r><w:t>loose</w:t></w:r>")).isEmpty)
    assert(DocText.DocxTextExtract.parse(z(
      "<w:p><w:r><w:t>x</w:t></w:r>")).isEmpty)
    assert(DocText.DocxTextExtract.parse(z(
      "<w:p><w:p></w:p></w:p>")).isEmpty)
    // missing document part
    assert(DocText.DocxTextExtract.parse(
      storedZip("word/styles.xml", "<a/>".getBytes("UTF-8"))).isEmpty)
    // CRC mismatch
    val good = z("<w:p><w:r><w:t>x</w:t></w:r></w:p>")
    val bad = good.clone()
    // flip a payload byte (name + header = 30 + 17; payload follows)
    bad(30 + "word/document.xml".length + 2) =
      (bad(30 + "word/document.xml".length + 2) ^ 1).toByte
    assert(DocText.DocxTextExtract.parse(bad).isEmpty)
    // not a zip / empty / null
    assert(DocText.DocxTextExtract.parse("nope".getBytes).isEmpty)
    assert(DocText.DocxTextExtract.parse(Array.emptyByteArray).isEmpty)
    assert(DocText.DocxTextExtract.parse(null).isEmpty)
  }

  test("extractAnyText: magic-byte dispatch over a mixed corpus — " +
      "pdf/docx/html/txt each to their extractor, defects fail closed") {
    import org.apache.spark.sql.functions.col
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val docxXml = "<w:document><w:body><w:p><w:r><w:t>from docx" +
      "</w:t></w:r></w:p></w:body></w:document>"
    val rows = Seq(
      Multimodal.MediaRecord(1L, "application/pdf",
        pdf(streamObj("BT (from pdf) Tj ET"))),
      Multimodal.MediaRecord(2L, "wrong/mime", // dispatch ignores mime
        storedZip("word/document.xml", docxXml.getBytes("UTF-8"))),
      Multimodal.MediaRecord(3L, "text/plain", // '<' wins: html
        "<html><body><p>from html page body text</p></body></html>"
          .getBytes("UTF-8")),
      Multimodal.MediaRecord(4L, "text/plain",
        "just plain text".getBytes("UTF-8")),
      Multimodal.MediaRecord(5L, "application/pdf",
        bytes("%PDF-1.4\nno eof")), // corrupt pdf: fail closed
      Multimodal.MediaRecord(6L, "application/zip",
        bytes("PKgarbage"))) // corrupt zip: fail closed
    val got = DocText.extractAnyText(rows.toDS())
      .collect().map(a => a.media_id ->
        (a.format, a.raw, a.needs_html, a.ok)).toMap
    assert(got(1L) == (("pdf", "from pdf", false, true)))
    assert(got(2L) == (("docx", "from docx", false, true)))
    assert(got(3L)._1 == "html" && got(3L)._3 && got(3L)._4)
    assert(got(4L) == (("txt", "just plain text", false, true)))
    assert(!got(5L)._4 && !got(6L)._4)
    // the html row flows through the DataFrame extractor downstream
    val htmlText = HtmlText.htmlExtractText(
        DocText.extractAnyText(rows.toDS()).toDF()
          .filter(col("needs_html")),
        col("media_id"), col("raw"))
      .collect()
    assert(htmlText.length == 1 &&
      htmlText(0).getString(4) == "from html page body text")
  }

  test("extractAnyText: avro containers extract their string fields, " +
      "record-major; corrupt OCF fails closed") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"d","fields":[""" +
        """{"name":"id","type":"long"},""" +
        """{"name":"title","type":"string"},""" +
        """{"name":"body","type":"string"}]}""")
    val out = new java.io.ByteArrayOutputStream
    val fw = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    fw.create(schema, out)
    Seq((1L, "t1", "b1"), (2L, "t2", "b2")).foreach { case (i, t, b0) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("id", i); r.put("title", t); r.put("body", b0)
      fw.append(r)
    }
    fw.close()
    val rows = Seq(
      Multimodal.MediaRecord(1L, "avro/binary", out.toByteArray),
      // magic present, body truncated: fail closed, not a throw
      Multimodal.MediaRecord(2L, "avro/binary",
        java.util.Arrays.copyOf(out.toByteArray, 12)))
    val got = DocText.extractAnyText(rows.toDS())
      .collect().map(a => a.media_id -> (a.format, a.raw, a.ok)).toMap
    // string fields only (id skipped), record-major, joined \n
    assert(got(1L) == (("avro", "t1\nb1\nt2\nb2", true)))
    assert(!got(2L)._3 && got(2L)._1 == "")
  }

  test("extractAnyText: BOM/whitespace-led HTML routes to the html arm; " +
      "malformed UTF-8 fails closed (no silent U+FFFD)") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val rows = Seq(
      // leading whitespace before markup (ADVICE r15: used to route
      // to the txt arm as raw markup)
      Multimodal.MediaRecord(1L, "text/html",
        "\n  \t<html><body><p>ws led</p></body></html>".getBytes("UTF-8")),
      // BOM + whitespace before markup
      Multimodal.MediaRecord(2L, "text/html",
        bom ++ " <html><body><p>bom led</p></body></html>"
          .getBytes("UTF-8")),
      // BOM-led plain text: BOM stripped, leading whitespace KEPT
      Multimodal.MediaRecord(3L, "text/plain",
        bom ++ "  indented text".getBytes("UTF-8")),
      // malformed UTF-8 (lone continuation byte): fail closed
      Multimodal.MediaRecord(4L, "text/plain",
        Array[Byte]('a', 0x80.toByte, 'b')),
      // malformed UTF-8 behind a '<': html arm also fails closed
      Multimodal.MediaRecord(5L, "text/html",
        Array[Byte]('<', 'p', '>', 0xc3.toByte)),
      // valid multi-byte UTF-8 text survives strict decode
      Multimodal.MediaRecord(6L, "text/plain",
        "café naïve".getBytes("UTF-8")))
    val got = DocText.extractAnyText(rows.toDS())
      .collect().map(a => a.media_id ->
        (a.format, a.raw, a.needs_html, a.ok)).toMap
    assert(got(1L)._1 == "html" && got(1L)._3 && got(1L)._4)
    assert(got(1L)._2.startsWith("<html>"))
    assert(got(2L)._1 == "html" && got(2L)._4 &&
      got(2L)._2.startsWith("<html>"))
    assert(got(3L) == (("txt", "  indented text", false, true)))
    assert(!got(4L)._4 && got(4L)._1 == "")
    assert(!got(5L)._4 && got(5L)._1 == "")
    assert(got(6L) == (("txt", "café naïve", false, true)))
  }

  test("extractAnyText: UTF-16 BOM routes through strict UTF-16 decode " +
      "(both endiannesses, html dispatch on decoded chars, fail-closed)") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val core = "café № 7 → end"
    def be(s: String) = Array(0xfe.toByte, 0xff.toByte) ++
      s.getBytes("UTF-16BE")
    def le(s: String) = Array(0xff.toByte, 0xfe.toByte) ++
      s.getBytes("UTF-16LE")
    val rows = Seq(
      Multimodal.MediaRecord(1L, "text/plain", be(core)),
      Multimodal.MediaRecord(2L, "text/plain", le(core)),
      // whitespace-led markup in UTF-16: html arm from the first '<'
      Multimodal.MediaRecord(3L, "text/html",
        le("\n <html><body><p>x</p></body></html>")),
      // truncated mid-code-unit: fail closed, never U+FFFD
      Multimodal.MediaRecord(4L, "text/plain",
        java.util.Arrays.copyOf(be(core), be(core).length - 1)),
      // leading whitespace in UTF-16 TEXT stays content
      Multimodal.MediaRecord(5L, "text/plain", le("  indented")))
    val got = DocText.extractAnyText(rows.toDS())
      .collect().map(a => a.media_id -> (a.format, a.raw, a.ok)).toMap
    assert(got(1L) == (("txt", core, true)))
    assert(got(2L) == (("txt", core, true)))
    assert(got(3L)._1 == "html" && got(3L)._3 &&
      got(3L)._2.startsWith("<html>"))
    assert(!got(4L)._3 && got(4L)._1 == "")
    assert(got(5L) == (("txt", "  indented", true)))
  }

  test("docx fuzz: single-byte mutations and truncations never throw") {
    val xml = "<w:document><w:body><w:p><w:r><w:t>Hello &amp; bye" +
      "</w:t></w:r></w:p></w:body></w:document>"
    val base = storedZip("word/document.xml", xml.getBytes("UTF-8"))
    val rnd = new scala.util.Random(223)
    (0 until 300).foreach { _ =>
      val m = base.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      DocText.DocxTextExtract.parse(m)
    }
    (0 until base.length).foreach { n =>
      DocText.DocxTextExtract.parse(java.util.Arrays.copyOf(base, n))
    }
  }
}
