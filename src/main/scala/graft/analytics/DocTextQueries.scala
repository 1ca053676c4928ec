package graft.analytics

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.ext.{DocText, Multimodal}

/** Document TEXT extraction queries — the engine-side replacement for
  * the reference's one irreducible external dependency: Docling's
  * PDF/DOCX→text conversion (camel/file-pipeline.yaml:124-167 wraps
  * it over HTTP; q173/q174 parse each format's METADATA; these gates
  * extract the words). Fixtures are byte-real documents synthesized
  * per-row from doc_id formulas (deflate compression, CRC32s, split
  * text runs, escape/entity traps), and the oracle replays the SAME
  * text formulas — never parsing bytes in SQL — so the gates pin
  * inflate → operator/XML walk → escape decode → reassembly
  * end-to-end.
  */
object DocTextQueries {

  // ---------------------------------------------------------------
  // fixture synthesis (shared formulas with the oracle SQL below)
  // ---------------------------------------------------------------

  private def zlibDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def rawDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  /** Page p's text for doc m — the formula the oracle replays. */
  private def pdfPageText(m: Long, p: Int): String =
    s"Doc ($m) p$p: " + "ab " * (1 + ((m + p) % 7)).toInt + "A."

  /** One content stream showing [[pdfPageText]] split across a Tj and
    * a two-element TJ, parens escaped, the final 'A' as octal \101 —
    * the extractor must reassemble the formula string exactly.
    */
  private def pdfContentStream(m: Long, p: Int): String = {
    val tp = pdfPageText(m, p)
    val cut1 = tp.length / 3
    val cut2 = cut1 + (tp.length - cut1) / 2
    def esc(x: String): String = x.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
    val e3 = esc(tp.substring(cut2)).stripSuffix("A.") + "\\101."
    s"BT /F1 12 Tf (${esc(tp.substring(0, cut1))}) Tj " +
      s"[(${esc(tp.substring(cut1, cut2))}) -120 ($e3)] TJ ET"
  }

  /** Minimal but structurally real PDF: one content-stream object per
    * page (2 pages at m%3==0, FlateDecode at m%2==0), direct /Length,
    * trailer + %%EOF.
    */
  private def buildPdf(m: Long): Array[Byte] = {
    val pages = if (m % 3 == 0) 2 else 1
    val out = new java.io.ByteArrayOutputStream
    out.write(s"%PDF-1.${m % 8}\n".getBytes("ISO-8859-1"))
    (0 until pages).foreach { p =>
      val raw = pdfContentStream(m, p).getBytes("ISO-8859-1")
      val (data, filter) =
        if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      out.write((s"${p + 1} 0 obj\n<< /Length ${data.length}$filter " +
        ">>\nstream\n").getBytes("ISO-8859-1"))
      out.write(data)
      out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    }
    out.write((s"trailer\n<< /Size ${pages + 1} >>\nstartxref\n0\n" +
      "%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** Paragraph q's text for doc m — the formula the oracle replays.
    * Contains raw `&<>` so the XML runs must entity-encode/decode.
    */
  private def docxParaText(m: Long, q: Int): String =
    s"Para $q of $m &<> " + "cd " * (1 + ((m + q) % 5)).toInt + "end"

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }

  /** word/document.xml: 1 + m%4 paragraphs, each split across two
    * `<w:t>` runs (the second with xml:space) so the extractor must
    * concatenate runs and decode entities. The xmlns value is the
    * ECMA-376 standard's namespace IDENTIFIER (a format constant like
    * a magic number, required for a conformant part) — not a network
    * endpoint; nothing dereferences it.
    */
  private def documentXml(m: Long): String = {
    val np = (1 + m % 4).toInt
    val body = (0 until np).map { q =>
      val t = docxParaText(m, q)
      val cut = t.length / 2
      "<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>" +
        s"<w:r><w:t>${xmlEscape(t.substring(0, cut))}</w:t></w:r>" +
        "<w:r><w:t xml:space=\"preserve\">" +
        s"${xmlEscape(t.substring(cut))}</w:t></w:r></w:p>"
    }.mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body +
      "</w:body></w:document>"
  }

  /** Byte-real ZIP (local headers + central directory + EOCD, correct
    * CRC32s and sizes) over the given (name, data, deflate?) entries.
    */
  private def buildZip(entries: Seq[(String, Array[Byte], Boolean)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val cd = new java.io.ByteArrayOutputStream
    def le16(v: Int, o: java.io.ByteArrayOutputStream): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def le32(v: Long, o: java.io.ByteArrayOutputStream): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    entries.foreach { case (name, data, defl) =>
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val comp = if (defl) rawDeflate(data) else data
      val method = if (defl) 8 else 0
      val off = out.size
      val nameB = name.getBytes("UTF-8")
      out.write(Array[Byte](0x50, 0x4b, 0x03, 0x04))
      le16(20, out); le16(0, out); le16(method, out)
      le16(0, out); le16(0, out)
      le32(crc.getValue, out); le32(comp.length.toLong, out)
      le32(data.length.toLong, out)
      le16(nameB.length, out); le16(0, out)
      out.write(nameB); out.write(comp)
      cd.write(Array[Byte](0x50, 0x4b, 0x01, 0x02))
      le16(20, cd); le16(20, cd); le16(0, cd); le16(method, cd)
      le16(0, cd); le16(0, cd)
      le32(crc.getValue, cd); le32(comp.length.toLong, cd)
      le32(data.length.toLong, cd)
      le16(nameB.length, cd); le16(0, cd); le16(0, cd)
      le16(0, cd); le16(0, cd); le32(0L, cd); le32(off.toLong, cd)
      cd.write(nameB)
    }
    val cdOff = out.size
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    out.write(Array[Byte](0x50, 0x4b, 0x05, 0x06))
    le16(0, out); le16(0, out)
    le16(entries.length, out); le16(entries.length, out)
    le32(cdBytes.length.toLong, out); le32(cdOff.toLong, out)
    le16(0, out)
    out.toByteArray
  }

  private val ctXml =
    "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
      "openxmlformats.org/package/2006/content-types\">" +
      "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
      "</Types>"

  private def pdfFixture(spark: org.apache.spark.sql.SparkSession,
                         dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q222_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else
              Multimodal.MediaRecord(m, "application/pdf", buildPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  private def docxFixture(spark: org.apache.spark.sql.SparkSession,
                          dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q223_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else if (m % 29 == 0)
              // valid ZIP, but no word/document.xml: must fail closed
              Multimodal.MediaRecord(m, "application/zip",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false))))
            else
              Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false),
                  ("word/document.xml",
                    documentXml(m).getBytes("UTF-8"), m % 2 == 0))))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** One-stream PDF carrying exactly `c` (the q226 arm). */
  private def simplePdf(c: String, flate: Boolean): Array[Byte] = {
    val esc = c.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case ch => ch.toString
    }
    val raw = s"BT ($esc) Tj ET".getBytes("ISO-8859-1")
    val (data, filter) =
      if (flate) (zlibDeflate(raw), " /Filter /FlateDecode") else (raw, "")
    val out = new java.io.ByteArrayOutputStream
    out.write((s"%PDF-1.4\n1 0 obj\n<< /Length ${data.length}$filter " +
      ">>\nstream\n").getBytes("ISO-8859-1"))
    out.write(data)
    out.write(("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** One-paragraph DOCX carrying exactly `c` (the q226 arm). */
  private def simpleDocx(c: String, defl: Boolean): Array[Byte] =
    buildZip(Seq(
      ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false),
      ("word/document.xml",
        ("<?xml version=\"1.0\"?><w:document><w:body><w:p><w:r><w:t>" +
          xmlEscape(c) + "</w:t></w:r></w:p></w:body></w:document>")
          .getBytes("UTF-8"), defl)))

  /** Boilerplate-wrapped HTML page whose one kept block is `c`. */
  private def htmlPage(c: String): String =
    "<html><head><title>t</title></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
      "<a href=\"/c\">Contact</a></nav><p>" + c + "</p></body></html>"

  /** The q226 mixed-format corpus: the SAME content formula arrives as
    * PDF / DOCX / HTML / plain text by doc_id % 4 (keyed on doc_id %
    * 251, so cross-format exact duplicates exist by construction);
    * doc_id % 41 rows are corrupt PDFs (fail-closed arm).
    */
  private def mixedFixture(spark: org.apache.spark.sql.SparkSession,
                           dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q226_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val r = (m % 251).toInt
            val c = s"Shared content $r body " +
              "ef " * (1 + r % 6) + "tail."
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/pdf",
                "%PDF-1.4\nbroken, no eof marker".getBytes("ISO-8859-1"))
            else (m % 4) match {
              case 0 => Multimodal.MediaRecord(m, "application/pdf",
                simplePdf(c, m % 8 == 0))
              case 1 => Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                simpleDocx(c, m % 2 == 0))
              case 2 => Multimodal.MediaRecord(m, "text/html",
                htmlPage(c).getBytes("UTF-8"))
              case _ => Multimodal.MediaRecord(m, "text/plain",
                c.getBytes("UTF-8"))
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** One-paragraph RTF carrying exactly `c` (the q255 arm), with the
    * standard header destinations as per-doc noise.
    */
  private def simpleRtf(c: String, m: Long): Array[Byte] =
    (s"{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 F;}}" +
      s"{\\info{\\title noise $m}}\n$c}").getBytes("ISO-8859-1")

  private def mixed255Fixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q255_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val r = (m % 251).toInt
            val c = s"Penta content $r body " +
              "gh " * (1 + r % 6) + "tail."
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/rtf",
                "{\\rtf1\\ansi unbalanced".getBytes("ISO-8859-1"))
            else (m % 5) match {
              case 0 => Multimodal.MediaRecord(m, "application/pdf",
                simplePdf(c, m % 2 == 0))
              case 1 => Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                simpleDocx(c, m % 2 == 0))
              case 2 => Multimodal.MediaRecord(m, "text/html",
                htmlPage(c).getBytes("UTF-8"))
              case 3 => Multimodal.MediaRecord(m, "text/plain",
                c.getBytes("UTF-8"))
              case _ => Multimodal.MediaRecord(m, "application/rtf",
                simpleRtf(c, m))
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** The q228 Avro corpus — written with the REAL Avro library (the
    * jar ships with Spark; only the DataSource connector is absent),
    * so the from-scratch reader is pinned against genuine
    * library-encoded bytes: K = 1 + doc_id % 4 records of (id long,
    * body string), deflate codec on even ids, an explicit sync every
    * 2 records (deterministic block count = ceil(K/2)), deterministic
    * 16-byte sync marker derived from doc_id. Fail arm at %41.
    */
  private def avroFixture(spark: org.apache.spark.sql.SparkSession,
                          dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q228_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val schema = new org.apache.avro.Schema.Parser().parse(
            """{"type":"record","name":"doc","fields":[""" +
              """{"name":"id","type":"long"},""" +
              """{"name":"body","type":"string"}]}""")
          it.map { m =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                s"not avro $m".getBytes("UTF-8"))
            else {
              val k = (1 + m % 4).toInt
              val out = new java.io.ByteArrayOutputStream
              val fw = new org.apache.avro.file.DataFileWriter(
                new org.apache.avro.generic.GenericDatumWriter[
                  org.apache.avro.generic.GenericRecord](schema))
              if (m % 2 == 0)
                fw.setCodec(
                  org.apache.avro.file.CodecFactory.deflateCodec(6))
              val sync = java.security.MessageDigest.getInstance("MD5")
                .digest(s"graft-sync-$m".getBytes("UTF-8"))
              fw.create(schema, out, sync)
              (0 until k).foreach { i =>
                val r = new org.apache.avro.generic.GenericData.Record(
                  schema)
                r.put("id", m * 10 + i)
                r.put("body",
                  s"av-$m-$i-" + "x " * (1 + ((m + i) % 5)).toInt)
                fw.append(r)
                if (i % 2 == 1) fw.sync()
              }
              fw.close()
              Multimodal.MediaRecord(m, "avro/binary", out.toByteArray)
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** The q231 corpus: like [[mixedFixture]] but each format's copy of
    * the shared content carries a FORMAT-SPECIFIC tail (" via pdf."
    * etc.) so copies are near-identical, never byte-identical — the
    * shape real cross-format extraction produces. Word counts are
    * fixed (24 words, 22 distinct 3-gram shingles), so the Jaccard
    * landscape is exact and well-separated: same-content same-format
    * 1.0, same-content cross-format 21/23 ≈ 0.913, different-content
    * ≈ 0 — the 0.8 threshold cuts cleanly. The body words are
    * CONTENT-KEYED (w{r}_i, never shared across groups) deliberately:
    * a first cut shared them globally, which put every cross-group
    * pair at J ≈ 0.6 — correct (below threshold) but catastrophic for
    * the banded LSH cost model (at b=64, r=2 a 0.6-similar pair is a
    * candidate with probability ≈ 1, so the candidate set went
    * quadratic in the corpus: 109 s at sf0.1 vs ~3 s now). The lesson
    * generalizes: boilerplate must be stripped (q209) or the banding
    * re-tuned BEFORE pairing a corpus whose baseline similarity
    * approaches the threshold.
    */
  private def mixed231Fixture(spark: org.apache.spark.sql.SparkSession,
                              dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q231b_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val r = (m % 251).toInt
            val core = s"Shared content r$r stuff r$r body " +
              (0 to 15).map(i => s"w${r}_$i").mkString(" ")
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/pdf",
                "%PDF-1.4\nbroken, no eof marker".getBytes("ISO-8859-1"))
            else (m % 4) match {
              case 0 => Multimodal.MediaRecord(m, "application/pdf",
                simplePdf(core + " via pdf.", m % 8 == 0))
              case 1 => Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                simpleDocx(core + " via docx.", m % 2 == 0))
              case 2 => Multimodal.MediaRecord(m, "text/html",
                htmlPage(core + " via html.").getBytes("UTF-8"))
              case _ => Multimodal.MediaRecord(m, "text/plain",
                (core + " via txt.").getBytes("UTF-8"))
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Hex string for `t` in ISO-8859-1 bytes: uppercase digits at
    * m%3==0, interior whitespace every 8 digits when `ws`.
    */
  private def pdfHex(t: String, upper: Boolean, ws: Boolean): String = {
    val digits = t.getBytes("ISO-8859-1").flatMap { b =>
      val h = f"${b & 0xff}%02x"
      (if (upper) h.toUpperCase else h).toCharArray
    }
    val body =
      if (!ws) new String(digits)
      else digits.grouped(8).map(new String(_)).mkString(" ")
    s"<$body>"
  }

  /** Page text for the q232 hex-string corpus — ends in 'P' (0x50) so
    * the final hex string can exercise the odd-nibble pad rule
    * (`<…5>` padded with 0 → 0x50).
    */
  private def hexPageText(m: Long): String =
    s"Hex doc $m: " + "gh " * (1 + (m % 5)).toInt + "ZP"

  /** One content stream showing [[hexPageText]] as hex Tj + mixed
    * hex/literal TJ + an odd-nibble hex Tj — all three string forms
    * in one stream.
    */
  private def hexContentStream(m: Long): String = {
    val t = hexPageText(m)
    val cut1 = t.length / 3
    val cut2 = cut1 + (t.length - cut1) / 2
    val upper = m % 3 == 0
    // last char 'P' (0x50) rides the odd-nibble arm: "5" + implicit 0
    s"BT /F1 12 Tf ${pdfHex(t.substring(0, cut1), upper, ws = false)} " +
      s"Tj [${pdfHex(t.substring(cut1, cut2), upper, ws = true)} -120 " +
      s"(${t.substring(cut2, t.length - 1)})] TJ <5> Tj ET"
  }

  private def hexPdfFixture(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q232_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val content =
              if (m % 41 == 0) "BT <48g5> Tj ET" // non-hex digit: reject
              else hexContentStream(m)
            val raw = content.getBytes("ISO-8859-1")
            val (data, filter) =
              if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
              else (raw, "")
            val out = new java.io.ByteArrayOutputStream
            out.write(s"%PDF-1.${m % 8}\n".getBytes("ISO-8859-1"))
            out.write((s"1 0 obj\n<< /Length ${data.length}$filter " +
              ">>\nstream\n").getBytes("ISO-8859-1"))
            out.write(data)
            out.write(("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n" +
              "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1"))
            Multimodal.MediaRecord(m, "application/pdf", out.toByteArray)
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Page text for the q234 real-world-shaped corpus. */
  private def rwPageText(m: Long): String =
    s"Real doc $m body " + "jk " * (1 + (m % 6)).toInt + "end."

  /** A post-2010-shaped PDF: an xref STREAM (binary, /Type /XRef with
    * Flate+predictor filter chain), a font program (/Subtype binary),
    * an ObjStm, and ONE typeless content stream whose /Length is an
    * INDIRECT reference resolved from a trailing integer object — the
    * q222 profile rejected all four constructs; r16 extracts the text.
    * The %41 arm points the indirect length at a missing object.
    */
  private def buildRealWorldPdf(m: Long): Array[Byte] = {
    val raw = (s"BT /F1 12 Tf (${rwPageText(m)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")}" +
      ") Tj ET").getBytes("ISO-8859-1")
    val (data, filter) =
      if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
      else (raw, "")
    val lenObj = if (m % 41 == 0) 99 else 7 // 99 is never defined
    // deterministic binary payloads (never CR/LF/'e' so the length slice
    // is the only way through)
    def bin(seed: Long, k: Int): Array[Byte] =
      Array.tabulate(k)(i => (1 + (seed + i * 37) % 9).toByte)
    val xrefB = bin(m, 24)
    val fontB = bin(m + 1, 40)
    val objstmB = bin(m + 2, 16)
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w(s"%PDF-1.${4 + m % 4}\n")
    w(s"2 0 obj\n<< /Type /XRef /W [1 2 1] /Filter [ /FlateDecode ] " +
      s"/DecodeParms << /Predictor 12 >> /Length ${xrefB.length} " +
      ">>\nstream\n")
    out.write(xrefB); w("\nendstream\nendobj\n")
    w(s"3 0 obj\n<< /Subtype /OpenType /Length1 999 " +
      s"/Length ${fontB.length} >>\nstream\n")
    out.write(fontB); w("\nendstream\nendobj\n")
    w(s"1 0 obj\n<< /Length $lenObj 0 R$filter >>\nstream\n")
    out.write(data); w("\nendstream\nendobj\n")
    w(s"4 0 obj\n<< /Type /ObjStm /N 2 /First 11 " +
      s"/Length ${objstmB.length} >>\nstream\n")
    out.write(objstmB); w("\nendstream\nendobj\n")
    w(s"7 0 obj\n${data.length}\nendobj\n")
    w("trailer\n<< /Size 8 >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def realWorldPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q234_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf",
              buildRealWorldPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Page text for the q240 ObjStm corpus. */
  private def stmPageText(m: Long): String =
    s"Stm doc $m text " + "mn " * (1 + (m % 5)).toInt + "fin."

  /** One `/Type /ObjStm` object (ISO 32000-1 §7.5.7): pair table
    * `objnum offset …` before `/First`, member bodies space-joined
    * after it, optional FlateDecode. Members are (objnum, body)
    * pairs — integer bodies become resolvable objects, anything else
    * exercises the skip-non-integer path.
    */
  private def buildObjStm(objnum: Int, members: Seq[(Int, String)],
                          flate: Boolean): Array[Byte] = {
    val bodies = members.map(_._2)
    val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = members.zip(offs)
      .map { case ((n, _), o) => s"$n $o" }.mkString(" ") + " "
    val payload = (header + bodies.mkString(" ")).getBytes("ISO-8859-1")
    val (data, filter) =
      if (flate) (zlibDeflate(payload), " /Filter /FlateDecode")
      else (payload, "")
    val out = new java.io.ByteArrayOutputStream
    out.write((s"$objnum 0 obj\n<< /Type /ObjStm /N ${members.length} " +
      s"/First ${header.length} /Length ${data.length}$filter " +
      ">>\nstream\n").getBytes("ISO-8859-1"))
    out.write(data)
    out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** A modern-writer-shaped PDF whose content stream's `/Length`
    * target lives ONLY inside an object stream — no direct-integer
    * objects at all. Arms: content Flate at %2, ObjStm Flate at the
    * complementary parity, an EARLIER decoy ObjStm defining the same
    * object with a wrong value at %3 (later file offset must win), a
    * truncated Flate ObjStm at %41 (must fail the whole doc closed).
    */
  private def buildObjStmPdf(m: Long): Array[Byte] = {
    val raw = (s"BT (${stmPageText(m)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")}" +
      ") Tj ET").getBytes("ISO-8859-1")
    val (data, filter) =
      if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
      else (raw, "")
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w(s"%PDF-1.${5 + m % 3}\n")
    w(s"1 0 obj\n<< /Length 7 0 R$filter >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\n")
    if (m % 3 == 0)
      out.write(buildObjStm(4,
        Seq(7 -> (data.length + 3).toString), flate = false))
    if (m % 41 == 0) {
      val z = zlibDeflate(s"7 0 ${data.length}".getBytes("ISO-8859-1"))
      val cut = java.util.Arrays.copyOf(z, z.length / 2)
      w(s"5 0 obj\n<< /Type /ObjStm /N 1 /First 4 " +
        s"/Length ${cut.length} /Filter /FlateDecode >>\nstream\n")
      out.write(cut)
      w("\nendstream\nendobj\n")
    } else
      out.write(buildObjStm(5,
        Seq(7 -> data.length.toString, 8 -> "<< /K 3 >>"),
        flate = m % 2 == 1))
    w("trailer\n<< /Size 9 >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def objStmPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q240_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf",
              buildObjStmPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Page text for the q241 filter-chain corpus. */
  private def chainPageText(m: Long): String =
    s"Chain doc $m " + "pq " * (1 + (m % 6)).toInt + "done."

  /** ASCIIHex-encode with whitespace every 8 digits and the `>` EOD
    * marker; uppercase digits at %3==0.
    */
  private def hexEncode(data: Array[Byte], upper: Boolean): String = {
    val sb = new StringBuilder
    data.zipWithIndex.foreach { case (b, i) =>
      if (i > 0 && i % 4 == 0) sb.append(if (i % 8 == 0) '\n' else ' ')
      val h = f"${b & 0xff}%02x"
      sb.append(if (upper) h.toUpperCase else h)
    }
    sb.append('>').toString
  }

  /** PDFs exercising the r17 filter widening: a plain ASCIIHexDecode
    * stream (%3==0, uppercase digits), an `[/ASCIIHexDecode
    * /FlateDecode]` CHAIN applied in order (%3==1 — deflate then
    * hex-wrap, so decode must hex-strip then inflate), a one-element
    * `[ /FlateDecode ]` array (%3==2), and a bad hex digit at %41
    * (fail closed at the widened edge).
    */
  private def buildChainPdf(m: Long): Array[Byte] = {
    val raw = (s"BT (${chainPageText(m)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")}" +
      ") Tj ET").getBytes("ISO-8859-1")
    val (data, filter) =
      if (m % 41 == 0)
        ("48g5>".getBytes("ISO-8859-1"), " /Filter /ASCIIHexDecode")
      else (m % 3) match {
        case 0 => (hexEncode(raw, upper = true).getBytes("ISO-8859-1"),
          " /Filter /ASCIIHexDecode")
        case 1 => (hexEncode(zlibDeflate(raw), upper = false)
          .getBytes("ISO-8859-1"),
          " /Filter [ /ASCIIHexDecode /FlateDecode ]")
        case _ => (zlibDeflate(raw), " /Filter [/FlateDecode]")
      }
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w(s"%PDF-1.${m % 8}\n")
    w(s"1 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def chainPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q241_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf",
              buildChainPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Words of line l, doc m, for the q248 positioning corpus — the
    * formula the oracle replays (lines joined \n, words joined ' ').
    */
  private def posLineWords(m: Long, l: Int): Seq[String] =
    (0 until (2 + ((m + l) % 3)).toInt).map(k => s"w$m.$l.$k")

  /** A content stream that places EVERY word and line with
    * positioning operators — the writer shape that glued under the
    * show-ops-only profile. Word gaps are -333 TJ adjustments; word 0
    * is split by a -40 kern (below threshold: must NOT space) and
    * word 1 by a +250 adjustment (positive tightens: must NOT space).
    * Line breaks rotate through `0 -14 Td`, `T*`, and the `'`
    * next-line show by (m+l)%3; an `8 0 Td` horizontal move rides
    * (m+l)%5 lines and must emit nothing.
    */
  private def posContentStream(m: Long): String = {
    val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
    (0 until (2 + m % 2).toInt).foreach { l =>
      val words = posLineWords(m, l)
      val mech = ((m + l) % 3).toInt
      if (l > 0 && mech == 2) sb.append(s"(${words.mkString(" ")}) ' ")
      else {
        if (l > 0) sb.append(if (mech == 1) "T* " else "0 -14 Td ")
        if ((m + l) % 5 == 0) sb.append("8 0 Td ")
        sb.append("[")
        words.zipWithIndex.foreach { case (w, k) =>
          if (k > 0) sb.append(" -333 ")
          k match {
            case 0 => sb.append(
              s"(${w.substring(0, 1)}) -40 (${w.substring(1)})")
            case 1 => sb.append(
              s"(${w.substring(0, 2)}) 250 (${w.substring(2)})")
            case _ => sb.append(s"($w)")
          }
        }
        sb.append("] TJ ")
      }
    }
    sb.append("ET").toString
  }

  private def posPdfFixture(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q248_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val content =
              if (m % 41 == 0) "0 -14 Td BT (x) Tj ET" // Td outside BT
              else posContentStream(m)
            val raw = content.getBytes("ISO-8859-1")
            val (data, filter) =
              if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
              else (raw, "")
            val out = new java.io.ByteArrayOutputStream
            out.write(s"%PDF-1.${m % 8}\n".getBytes("ISO-8859-1"))
            out.write((s"1 0 obj\n<< /Length ${data.length}$filter " +
              ">>\nstream\n").getBytes("ISO-8859-1"))
            out.write(data)
            out.write(("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n" +
              "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1"))
            Multimodal.MediaRecord(m, "application/pdf", out.toByteArray)
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** A content stream interleaving text shows with 1+m%3 INLINE
    * images (`q BI …params… ID <binary> EI Q`). Payload bytes are
    * non-letter (1..9, so no false terminator can form) with a
    * spliced `XEI` trap — an `EI` without a whitespace flank must
    * NOT terminate the data. Text: "Img doc m head" + one " seg i
    * of m" after each image.
    */
  private def inlinePdfContent(m: Long): String = {
    val sb = new StringBuilder(s"BT (Img doc $m head) Tj ET ")
    (0 until (1 + m % 3).toInt).foreach { i =>
      sb.append("q BI /W 4 /H 2 /BPC 8 /CS /G ID ")
      val n = (8 + (m + i) % 5).toInt
      (0 until n / 2).foreach(k => sb.append((1 + (m + k) % 9).toChar))
      sb.append("XEI") // trap: not whitespace-preceded
      (n / 2 until n).foreach(k => sb.append((1 + (m + k) % 9).toChar))
      sb.append(s" EI Q BT ( seg $i of $m) Tj ET ")
    }
    sb.toString
  }

  private def inlinePdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q249_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val content =
              if (m % 41 == 0) // unterminated image data: no EI
                "BT (x) Tj ET q BI /W 2 /H 1 ID  Q"
              else if (m % 29 == 0) // BI inside a text object
                "BT BI /W 1 /H 1 ID  EI (y) Tj ET"
              else inlinePdfContent(m)
            val raw = content.getBytes("ISO-8859-1")
            val (data, filter) =
              if (m % 2 == 0) (zlibDeflate(raw), " /Filter /FlateDecode")
              else (raw, "")
            val out = new java.io.ByteArrayOutputStream
            out.write(s"%PDF-1.${m % 8}\n".getBytes("ISO-8859-1"))
            out.write((s"1 0 obj\n<< /Length ${data.length}$filter " +
              ">>\nstream\n").getBytes("ISO-8859-1"))
            out.write(data)
            out.write(("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\n" +
              "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1"))
            Multimodal.MediaRecord(m, "application/pdf", out.toByteArray)
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** PDF/TIFF-variant LZW encoder for the q250 fixture (§7.4.4):
    * MSB-first bit packing, 9→12-bit codes, leading ClearTable,
    * trailing EOD, EarlyChange=1 (the width bumps when the next free
    * entry reaches 2^w - 1) — the exact mirror of
    * [[graft.ext.DocText.PdfTextExtract.lzwDecode]].
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var acc = 0L
    var nbits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[String, Int]
    var next = 258
    def has(s: String): Boolean = s.length == 1 || dict.contains(s)
    def codeOf(s: String): Int =
      if (s.length == 1) s(0).toInt else dict(s)
    emit(256)
    var w = ""
    data.foreach { bb =>
      val ch = (bb & 0xff).toChar
      val wc = w + ch
      if (has(wc)) w = wc
      else {
        emit(codeOf(w))
        dict(wc) = next; next += 1
        w = ch.toString
        if (next == (1 << width) - 1) {
          if (width < 12) width += 1
          else { // table full (early change): clear — w is a single
            emit(256); dict.clear(); next = 258; width = 9
          }
        }
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Test hook: DocTextSpec roundtrips [[lzwEncode]] against the
    * engine's decoder across the 9→12-bit width range.
    */
  private[graft] def lzwEncodeForTest(d: Array[Byte]): Array[Byte] =
    lzwEncode(d)

  /** ASCII85 encoder for the q250 fixture (§7.4.3): 4-byte groups →
    * 5 chars `!`..`u` big-endian base 85, `z` for an all-zero full
    * group, zero-byte padding on the final partial group (k bytes →
    * k+1 chars), a newline every 8 groups (interior whitespace the
    * decoder must skip), `~>` EOD.
    */
  private def a85Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    var g = 0
    while (i < data.length) {
      val k = math.min(4, data.length - i)
      var v = 0L
      (0 until 4).foreach { j =>
        v = (v << 8) | (if (j < k) data(i + j) & 0xff else 0)
      }
      if (k == 4 && v == 0L) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var x = v
        (4 to 0 by -1).foreach { j =>
          cs(j) = ('!' + (x % 85).toInt).toChar; x /= 85
        }
        sb.appendAll(cs, 0, if (k == 4) 5 else k + 1)
      }
      g += 1
      if (g % 8 == 0) sb.append('\n')
      i += 4
    }
    sb.append("~>").toString
  }

  /** Page text for the q250 legacy-filter corpus. */
  private def lzwPageText(m: Long): String =
    s"Lzw doc $m " + "rs " * (1 + (m % 7)).toInt + "tail."

  /** PDFs exercising the r17 LEGACY filters: plain LZWDecode (%4==0),
    * plain ASCII85Decode (%4==1), `[/ASCII85Decode /LZWDecode]`
    * (%4==2 — 85-strip THEN LZW), `[/ASCIIHexDecode /LZWDecode]`
    * (%4==3 — cross-family chain). The %29 arm carries `/DecodeParms
    * << /EarlyChange 0 >>` (out of profile: parameters change byte
    * semantics — must fail closed, not mis-decode), the %41 arm an
    * invalid ASCII85 byte `v`.
    */
  private def buildLzwPdf(m: Long): Array[Byte] = {
    val raw = (s"BT (${lzwPageText(m)
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")}" +
      ") Tj ET").getBytes("ISO-8859-1")
    val (data, filter) =
      if (m % 41 == 0)
        ("9jvo^~>".getBytes("ISO-8859-1"), " /Filter /ASCII85Decode")
      else if (m % 29 == 0)
        (lzwEncode(raw),
          " /Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>")
      else (m % 4) match {
        case 0 => (lzwEncode(raw), " /Filter /LZWDecode")
        case 1 => (a85Encode(raw).getBytes("ISO-8859-1"),
          " /Filter /ASCII85Decode")
        case 2 => (a85Encode(lzwEncode(raw)).getBytes("ISO-8859-1"),
          " /Filter [ /ASCII85Decode /LZWDecode ]")
        case _ => (hexEncode(lzwEncode(raw), upper = m % 3 == 0)
          .getBytes("ISO-8859-1"),
          " /Filter [/ASCIIHexDecode /LZWDecode]")
      }
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w(s"%PDF-1.${m % 8}\n")
    w(s"1 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\ntrailer\n<< /Size 2 >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def lzwPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q250_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf", buildLzwPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Page g's text (1-based) for the q251 page-tree corpus. */
  private def pgText(m: Long, g: Int): String =
    s"Pg $g of doc $m: " + "uv " * (1 + ((m + g) % 5)).toInt + "Z."

  /** A structurally real multi-page PDF: catalog → Pages tree →
    * Page leaves with /Contents, plus an ORPHAN content stream
    * placed FIRST in the file (a file-order scan shows it; the
    * page-tree walk must not). 1+m%3 pages; the 3-page arm nests a
    * second /Pages level; at m%5==0 every object is emitted in
    * REVERSE file order (file order ≠ page order — the point);
    * (m+g)%7 pages have no /Contents (legal empty page); (m+g)%4
    * pages split their content across a two-part /Contents array
    * with the BT...ET spanning parts. %41: /Kids self-cycle; %29:
    * /Root's catalog points at a missing Pages object.
    */
  private def buildPagesPdf(m: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
    val np = (1 + m % 3).toInt
    val flate = m % 2 == 0
    def streamObjB(num: Int, content: String): Unit = {
      val raw = content.getBytes("ISO-8859-1")
      val (data, filter) =
        if (flate) (zlibDeflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      w(s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    w(s"%PDF-1.${4 + m % 4}\n")
    streamObjB(90, s"BT (orphan doc $m never shown) Tj ET")
    if (m % 41 == 0) {
      w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      w("2 0 obj\n<< /Type /Pages /Kids [ 2 0 R ] /Count 1 >>\nendobj\n")
    } else if (m % 29 == 0) {
      w("1 0 obj\n<< /Type /Catalog /Pages 77 0 R >>\nendobj\n")
    } else {
      val emits = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
      emits += (() =>
        w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
      val rootKids =
        if (np == 3) "3 0 R 13 0 R"
        else (1 to np).map(g => s"${10 + g} 0 R").mkString(" ")
      emits += (() => w(s"2 0 obj\n<< /Type /Pages /Kids [ $rootKids ]" +
        s" /Count $np >>\nendobj\n"))
      if (np == 3)
        emits += (() => w("3 0 obj\n<< /Type /Pages /Parent 2 0 R " +
          "/Kids [ 11 0 R 12 0 R ] /Count 2 >>\nendobj\n"))
      (1 to np).foreach { g =>
        val parent = if (np == 3 && g <= 2) 3 else 2
        val emptyPg = (m + g) % 7 == 0
        val splitPg = !emptyPg && (m + g) % 4 == 0
        val contents =
          if (emptyPg) ""
          else if (splitPg)
            s" /Contents [ ${20 + 2 * g} 0 R ${21 + 2 * g} 0 R ]"
          else s" /Contents ${20 + 2 * g} 0 R"
        emits += (() => w(s"${10 + g} 0 obj\n<< /Type /Page " +
          s"/Parent $parent 0 R$contents >>\nendobj\n"))
        if (!emptyPg) {
          val t = pgText(m, g) // no parens/backslash: safe unescaped
          if (splitPg) {
            val cut = t.length / 2
            emits += (() =>
              streamObjB(20 + 2 * g, s"BT (${t.substring(0, cut)}) Tj"))
            emits += (() =>
              streamObjB(21 + 2 * g, s"(${t.substring(cut)}) Tj ET"))
          } else emits += (() => streamObjB(20 + 2 * g, s"BT ($t) Tj ET"))
        }
      }
      (if (m % 5 == 0) emits.reverse else emits).foreach(_())
    }
    w("trailer\n<< /Size 99 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def pagesPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q251_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf",
              buildPagesPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** word/numbering.xml for the q252 corpus: abstractNum 0 = decimal
    * "%1." over a level-1 that is bullet "-" (or decimal "%1.%2" on
    * the m%3==0 arm — the multi-level reference + reset pin);
    * abstractNum 1 = lowerLetter "(%1)" starting at 1+m%4.
    */
  private def numberingXml(m: Long): String = {
    val lvl1 =
      if (m % 3 == 0)
        "<w:numFmt w:val=\"decimal\"/><w:lvlText w:val=\"%1.%2\"/>"
      else "<w:numFmt w:val=\"bullet\"/><w:lvlText w:val=\"-\"/>"
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<w:numbering xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\">" +
      "<w:abstractNum w:abstractNumId=\"0\">" +
      "<w:lvl w:ilvl=\"0\"><w:start w:val=\"1\"/>" +
      "<w:numFmt w:val=\"decimal\"/><w:lvlText w:val=\"%1.\"/></w:lvl>" +
      s"""<w:lvl w:ilvl="1">$lvl1</w:lvl>""" +
      "</w:abstractNum>" +
      "<w:abstractNum w:abstractNumId=\"1\">" +
      s"""<w:lvl w:ilvl="0"><w:start w:val="${1 + m % 4}"/>""" +
      "<w:numFmt w:val=\"lowerLetter\"/>" +
      "<w:lvlText w:val=\"(%1)\"/></w:lvl>" +
      "</w:abstractNum>" +
      "<w:num w:numId=\"1\"><w:abstractNumId w:val=\"0\"/></w:num>" +
      "<w:num w:numId=\"2\"><w:abstractNumId w:val=\"1\"/></w:num>" +
      "</w:numbering>"
  }

  /** word/document.xml for the q252 corpus: 7+m%3 paragraphs cycling
    * plain / numId-1-lvl-0 / numId-1-lvl-1 / numId-2-lvl-0 by q%4 —
    * the second Item (q=5) must RESET the sub-level so the q=6 Sub
    * renders x.1, not x.2, on the multi-level arm.
    */
  private def numDocumentXml(m: Long, badNum: Boolean,
                             withTable: Boolean): String = {
    val np = (7 + m % 3).toInt
    val body = (0 until np).map { q =>
      val (numPr, text) = (q % 4) match {
        case 0 => ("", s"Plain $q of $m")
        case 1 => (numPrXml(0, if (badNum && q == 1) 9 else 1),
          s"Item $q of $m")
        case 2 => (numPrXml(1, 1), s"Sub $q of $m")
        case _ => (numPrXml(0, 2), s"Alpha $q of $m")
      }
      s"<w:p>$numPr<w:r><w:t>$text</w:t></w:r></w:p>"
    }.mkString
    val tbl = if (withTable)
      "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p>" +
        "</w:tc></w:tr></w:tbl>"
    else ""
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body + tbl +
      "</w:body></w:document>"
  }

  private def numPrXml(ilvl: Int, numId: Int): String =
    "<w:pPr><w:numPr><w:ilvl w:val=\"" + ilvl + "\"/>" +
      "<w:numId w:val=\"" + numId + "\"/></w:numPr></w:pPr>"

  private def numDocxFixture(spark: org.apache.spark.sql.SparkSession,
                             dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q252_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else
              Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false),
                  ("word/document.xml",
                    numDocumentXml(m, badNum = m % 29 == 0,
                      withTable = m % 29 != 0 && m % 31 == 0)
                      .getBytes("UTF-8"), m % 2 == 0),
                  ("word/numbering.xml",
                    numberingXml(m).getBytes("UTF-8"), m % 2 == 1))))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** An RTF document for the q253 corpus: real header destinations
    * (fonttbl/colortbl/info/starred generator — all carrying junk
    * that must NOT leak), a `\'e9` byte escape mid-word, a `{\b …}`
    * group whose control-word delimiter space must be consumed,
    * escaped literal braces, and a Unicode euro escape (u8364 with its
    * fallback `?` skipped) on the m%3 arm. %41 drops the closing
    * brace (unbalanced), %29 corrupts the hex escape.
    */
  private def buildRtf(m: Long): Array[Byte] = {
    val esc = if (m % 29 == 0) "\\'zq" else "\\'e9"
    val euro =
      if (m % 3 == 0) s"\\par euro \\u8364? ok" else ""
    val doc =
      s"{\\rtf1\\ansi\\deff0" +
        "{\\fonttbl{\\f0\\fswiss Calibri;}}" +
        "{\\colortbl ;\\red255\\green0\\blue0;}" +
        s"{\\info{\\title secret title $m}}" +
        s"{\\*\\generator graftgen $m;}\n" +
        s"Rtf doc $m caf$esc ${m % 7}\\par " +
        s"{\\b bold${m % 5}} and plain tail \\{braces\\}$euro}"
    val full = if (m % 41 == 0) doc.dropRight(1) else doc
    full.getBytes("ISO-8859-1")
  }

  private def rtfFixture(spark: org.apache.spark.sql.SparkSession,
                         dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q253_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/rtf", buildRtf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Quoted-printable encode (RFC 2045 §6.7) for the q254 fixture:
    * printable ASCII straight through, `=` and non-ASCII as =XX
    * uppercase, LF as a HARD CRLF, a soft break `=CRLF` every ~24
    * output chars (vanishes on decode).
    */
  private def qpEncode(s: String): String = {
    val sb = new StringBuilder
    var col = 0
    s.getBytes("UTF-8").foreach { bb =>
      val v = bb & 0xff
      if (col > 24) { sb.append("=\r\n"); col = 0 }
      if (v == '\n') { sb.append("\r\n"); col = 0 }
      else if (v >= 33 && v <= 126 && v != '=') {
        sb.append(v.toChar); col += 1
      } else if (v == ' ') { sb.append(' '); col += 1 }
      else { sb.append(f"=${v}%02X"); col += 3 }
    }
    sb.toString
  }

  /** Single-part body text for the q254 corpus. */
  private def emlBodyText(m: Long): String =
    s"Mail body $m é one.\nSecond ${m % 7} tail."

  /** An RFC 5322 message: folded RFC 2047 subject (B form, Q at %5),
    * and a body arm by m%4 — 8bit, quoted-printable (soft breaks),
    * base64, or multipart/mixed carrying the qp text part, a base64
    * attachment that must NOT leak, and a multipart/alternative
    * whose html twin is skipped for its plain sibling. %41 plants an
    * invalid base64 byte; %29 drops the closing `--boundary--`.
    */
  private def buildEml(m: Long): Array[Byte] = {
    val subjWord =
      if (m % 5 == 0) "=?utf-8?Q?caf=C3=A9?="
      else "=?UTF-8?B?Y2Fmw6k=?="
    val subjHdr =
      if (m % 7 == 0) s"Subject: doc $m\r\n $subjWord end"
      else s"Subject: doc $m $subjWord end"
    val common = s"From: sender$m@example.com\r\nMIME-Version: 1.0\r\n" +
      subjHdr + "\r\n"
    def single(cte: String, body: String): String =
      common + "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Transfer-Encoding: $cte\r\n\r\n" + body
    val txt = emlBodyText(m)
    val msg =
      if (m % 41 == 0) single("base64", "!!!not*base64***")
      else if (m % 29 == 0)
        common + s"""Content-Type: multipart/mixed; boundary="x$m"""" +
          "\r\n\r\npreamble\r\n" + s"--x$m\r\n" +
          "Content-Type: text/plain; charset=utf-8\r\n\r\nnever closed"
      else (m % 4) match {
        case 0 => single("8bit", txt.replace("\n", "\r\n"))
        case 1 => single("quoted-printable", qpEncode(txt))
        case 2 => single("base64",
          java.util.Base64.getMimeEncoder
            .encodeToString(txt.getBytes("UTF-8")))
        case _ =>
          common +
            s"""Content-Type: multipart/mixed; boundary="out$m"""" +
            "\r\n\r\npreamble junk\r\n" +
            s"--out$m\r\n" +
            "Content-Type: text/plain; charset=utf-8\r\n" +
            "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
            qpEncode(txt) + "\r\n" +
            s"--out$m\r\n" +
            "Content-Type: application/octet-stream\r\n" +
            "Content-Transfer-Encoding: base64\r\n\r\n" +
            "QXR0YWNobWVudCBqdW5r\r\n" +
            s"--out$m\r\n" +
            s"Content-Type: multipart/alternative; boundary=in$m\r\n" +
            "\r\n" +
            s"--in$m\r\n" +
            "Content-Type: text/html; charset=utf-8\r\n\r\n" +
            s"<p>html twin $m</p>\r\n" +
            s"--in$m\r\n" +
            "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
            s"Alt plain $m.\r\n" +
            s"--in$m--\r\n" +
            s"--out$m--\r\nepilogue\r\n"
      }
    msg.getBytes("UTF-8")
  }

  private def emlFixture(spark: org.apache.spark.sql.SparkSession,
                         dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q254_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "message/rfc822", buildEml(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** The q256 /ToUnicode CMap: 2-byte codespace; ascii shifted by
    * +0x100 via an increment bfrange (so identity decoding is
    * VISIBLY wrong), an `fi` ligature bfchar (one glyph, two UTF-16
    * units), and an array-form bfrange mapping 0x60..0x62 → XYZ.
    */
  private def toUnicodeCMap: String =
    "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "2 beginbfchar\n<0050> <00660069>\n<0042> <0021>\nendbfchar\n" +
      "2 beginbfrange\n<0120> <017E> <0020>\n" +
      "<0060> <0062> [<0058> <0059> <005A>]\nendbfrange\n" +
      "endcmap\nend"

  /** A page-tree PDF whose text rides FONT GLYPH CODES: /F1 is a
    * Type0 font with the [[toUnicodeCMap]] (ascii+0x100, ligature,
    * array range), /F2 has no /ToUnicode (identity). /Resources is
    * inline, or an indirect object at m%3==0. %41 inserts an
    * unmapped glyph; %29 switches to an undefined /F9.
    */
  private def buildCMapPdf(m: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
    def streamObjB(num: Int, content: String, flate: Boolean): Unit = {
      val raw = content.getBytes("ISO-8859-1")
      val (data, filter) =
        if (flate) (zlibDeflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      w(s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    def g(cs: String): String =
      cs.map(c => f"${0x100 + c.toInt}%04x").mkString
    val hexStr = g(s"Uni $m: ") + "0050" + "0120" + "006000610062" +
      (if (m % 41 == 0) "0bb0" else "") // unmapped glyph arm
    val f1 = if (m % 29 == 0) "/F9" else "/F1"
    val content = s"BT $f1 12 Tf <$hexStr> Tj " +
      s"/F2 12 Tf ( plain $m.) Tj ET"
    val fontDict = "<< /F1 7 0 R /F2 8 0 R >>"
    val resources =
      if (m % 3 == 0) "12 0 R" else s"<< /Font $fontDict >>"
    w(s"%PDF-1.${5 + m % 3}\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 11 0 R ] /Count 1 >>\nendobj\n")
    w(s"11 0 obj\n<< /Type /Page /Parent 2 0 R " +
      s"/Resources $resources /Contents 20 0 R >>\nendobj\n")
    if (m % 3 == 0)
      w(s"12 0 obj\n<< /Font $fontDict >>\nendobj\n")
    w("7 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Graft " +
      "/ToUnicode 9 0 R >>\nendobj\n")
    w("8 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      ">>\nendobj\n")
    streamObjB(9, toUnicodeCMap, flate = m % 2 == 0)
    streamObjB(20, content, flate = m % 2 == 1)
    w("trailer\n<< /Size 99 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def cmapPdfFixture(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q256_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/pdf",
              buildCMapPdf(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Chapter c's XHTML for the q258 corpus: head/title junk, p/h2
    * block alternation, an inline `<b>` split mid-line, an `&amp;`
    * entity — text = block lines joined \n.
    */
  private def epubChapterXhtml(m: Long, c: Int): String = {
    val nl = (1 + (m + c) % 3).toInt
    val body = (0 until nl).map { l =>
      val tag = if (l % 2 == 0) "p" else "h2"
      s"<$tag>Ch $c.$l <b>of</b> $m &amp; more</$tag>"
    }.mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?><html><head>" +
      s"<title>junk $m</title></head><body>$body</body></html>"
  }

  /** An EPUB: stored `mimetype`, container.xml → OPF → spine over
    * 1+m%3 chapters (spine REVERSED vs entry/name order at m%5 —
    * reading order is the spine's, nothing else's), a cover.xhtml in
    * the manifest but NOT the spine (must not leak). Arms: %41 wrong
    * mimetype; %29 a ghost spine idref; %31 a container with no
    * rootfile.
    */
  private def buildEpub(m: Long): Array[Byte] = {
    val k = (1 + m % 3).toInt
    val mimetype =
      if (m % 41 == 0) "application/zip" else "application/epub+zip"
    val container =
      if (m % 41 != 0 && m % 29 != 0 && m % 31 == 0)
        "<?xml version=\"1.0\"?><container><rootfiles></rootfiles>" +
          "</container>"
      else
        "<?xml version=\"1.0\"?><container version=\"1.0\"><rootfiles>" +
          "<rootfile full-path=\"OEBPS/content.opf\" " +
          "media-type=\"application/oebps-package+xml\"/>" +
          "</rootfiles></container>"
    val spineIds =
      (if (m % 5 == 0) (0 until k).reverse else 0 until k)
        .map(c => s"ch$c")
    val ghost =
      if (m % 41 != 0 && m % 29 == 0) "<itemref idref=\"ghost\"/>"
      else ""
    val opf = "<?xml version=\"1.0\"?><package><manifest>" +
      (0 until k).map(c => s"""<item id="ch$c" href="ch$c.xhtml" """ +
        "media-type=\"application/xhtml+xml\"/>").mkString +
      "<item id=\"cover\" href=\"cover.xhtml\" " +
      "media-type=\"application/xhtml+xml\"/>" +
      "</manifest><spine>" + ghost +
      spineIds.map(id => s"""<itemref idref="$id"/>""").mkString +
      "</spine></package>"
    buildZip(
      Seq(("mimetype", mimetype.getBytes("UTF-8"), false)) ++
        (0 until k).map(c => (s"OEBPS/ch$c.xhtml",
          epubChapterXhtml(m, c).getBytes("UTF-8"), m % 2 == 0)) ++
        Seq(
          ("OEBPS/cover.xhtml",
            "<html><body><p>COVER JUNK</p></body></html>"
              .getBytes("UTF-8"), false),
          ("META-INF/container.xml", container.getBytes("UTF-8"),
            m % 2 == 1),
          ("OEBPS/content.opf", opf.getBytes("UTF-8"), m % 2 == 0)))
  }

  private def epubFixture(spark: org.apache.spark.sql.SparkSession,
                          dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q258_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/epub+zip",
              buildEpub(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** mbox writer for the q257 fixture: `From ` separators, one
    * terminating newline per message, `^>*From ` body lines quoted
    * with one more `>` (mboxrd).
    */
  private def mboxEscape(msg: String): String =
    msg.split("\n", -1).map { l =>
      if (l.matches("^>*From .*")) ">" + l else l
    }.mkString("\n")

  /** An mbox of 1+m%2 [[buildEml]] messages (mid = m*3+i — the
    * per-message bad arms land naturally where mid hits %41/%29,
    * pinning one-broken-message-is-one-failed-ROW isolation) plus a
    * final plain message whose body line `From here m` rides the
    * mboxrd quoting round trip. %41 files don't start with `From `
    * and fail whole.
    */
  private def buildMbox(m: Long): Array[Byte] = {
    if (m % 41 == 0)
      return s"not an mbox $m\nFrom nowhere".getBytes("UTF-8")
    val k = (1 + m % 2).toInt
    val sb = new StringBuilder
    (0 until k).foreach { i =>
      val msg = new String(buildEml(m * 3 + i), "ISO-8859-1")
      sb.append(s"From sender$i@example.com Thu Jan  1 00:00:0$i 2026\n")
      sb.append(mboxEscape(msg)).append('\n')
    }
    val qmsg = s"From: quoter$m@example.com\r\nMIME-Version: 1.0\r\n" +
      s"Subject: quote $m\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
      s"Begin\nFrom here $m\nEnd"
    sb.append(s"From quoter$m@example.com Thu Jan  1 00:01:00 2026\n")
    sb.append(mboxEscape(qmsg)).append('\n')
    sb.toString.getBytes("ISO-8859-1")
  }

  private def mboxFixture(spark: org.apache.spark.sql.SparkSession,
                          dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q257_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            Multimodal.MediaRecord(m, "application/mbox", buildMbox(m))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Paragraph q of doc m for the q242 whitespace corpus — the
    * formula the oracle replays: tab and break INSIDE the first run,
    * a hyperlink-wrapped run, a plain tail run, and a w:cr run on the
    * (m+q)%3 arm.
    */
  private def wsParaText(m: Long, q: Int): String =
    s"A$m.$q\tB${(m + q) % 9}\nC${m % 7} link ${m % 13} tail $q" +
      (if ((m + q) % 3 == 0) s"\nZ$q" else "")

  /** word/document.xml whose paragraphs carry `<w:tab/>`, `<w:br/>`,
    * `<w:cr/>` run content, a `w:hyperlink`-wrapped run, and a
    * tab-STOP definition trap (`<w:tab w:pos=…/>` inside
    * `w:pPr/w:tabs` — layout, must contribute NOTHING).
    */
  private def wsDocumentXml(m: Long): String = {
    val np = (1 + m % 3).toInt
    val body = (0 until np).map { q =>
      "<w:p><w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/>" +
        "</w:tabs></w:pPr>" +
        s"<w:r><w:t>A$m.$q</w:t><w:tab/><w:t>B${(m + q) % 9}</w:t>" +
        "<w:br/><w:t xml:space=\"preserve\">" +
        s"C${m % 7} </w:t></w:r>" +
        "<w:hyperlink r:id=\"rId4\"><w:r><w:t>" +
        s"link ${m % 13}</w:t></w:r></w:hyperlink>" +
        "<w:r><w:t xml:space=\"preserve\"> tail " + q + "</w:t>" +
        "</w:r>" +
        (if ((m + q) % 3 == 0)
          s"<w:r><w:cr/><w:t>Z$q</w:t></w:r>" else "") +
        "</w:p>"
    }.mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body +
      "</w:body></w:document>"
  }

  private def wsDocxFixture(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q242_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else
              Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false),
                  ("word/document.xml",
                    wsDocumentXml(m).getBytes("UTF-8"), m % 2 == 0))))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** The q243 hostile census corpus: fourteen arms by m%14 spanning
    * every dispatch family (RTF joined in r17 — arms 12/13), ok and
    * failing, with the %41 empty-bytes override — each arm
    * engineered to land on ONE stable reason code, so the census
    * histogram is exactly derivable from doc_id arithmetic.
    */
  private def censusFixture(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q243_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val b: Array[Byte] =
              if (m % 41 == 0) Array.emptyByteArray
              else (m % 14) match {
                case 0 => simplePdf(s"census $m ok", flate = m % 2 == 0)
                case 1 =>
                  // non-hex digit inside a content hex string
                  val c = "BT <48g5> Tj ET"
                  (s"%PDF-1.4\n1 0 obj\n<< /Length ${c.length} >>" +
                    s"\nstream\n$c\nendstream\nendobj\ntrailer\n" +
                    "<< /Size 2 >>\nstartxref\n0\n%%EOF\n")
                    .getBytes("ISO-8859-1")
                case 2 => // indirect /Length with no definition anywhere
                  ("%PDF-1.4\n1 0 obj\n<< /Length 9 0 R >>\nstream\n" +
                    "BT (x) Tj ET\nendstream\nendobj\ntrailer\n" +
                    "<< /Size 2 >>\nstartxref\n0\n%%EOF\n")
                    .getBytes("ISO-8859-1")
                case 3 => // DCT: out-of-profile filter (LZW joined the
                  // profile in r17/q250, so the census example moved)
                  ("%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter " +
                    "/DCTDecode >>\nstream\nabcd\nendstream\nendobj\n" +
                    "trailer\n<< /Size 2 >>\nstartxref\n0\n%%EOF\n")
                    .getBytes("ISO-8859-1")
                case 4 => simpleDocx(s"census $m ok", defl = m % 2 == 0)
                case 5 => buildZip(Seq( // no word/document.xml
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"),
                    false)))
                case 6 => buildZip(Seq( // self-closing w:tbl: violation
                  ("word/document.xml",
                    ("<w:document><w:body><w:tbl/></w:body>" +
                      "</w:document>").getBytes("UTF-8"), false)))
                case 7 => // ZIP magic, no central directory
                  Array[Byte](0x50, 0x4b, 0x03, 0x04) ++
                    s"truncated $m".getBytes("UTF-8")
                case 8 => // Avro magic, garbage container
                  Array[Byte]('O', 'b', 'j', 1) ++
                    s"garbage $m".getBytes("UTF-8")
                case 9 => s"plain text $m".getBytes("UTF-8")
                case 10 => // UTF-16BE BOM, truncated mid-code-unit
                  val be = Array(0xfe.toByte, 0xff.toByte) ++
                    s"utf16 $m".getBytes("UTF-16BE")
                  java.util.Arrays.copyOf(be, be.length - 1)
                case 11 => s"<p>html $m</p>".getBytes("UTF-8")
                case 12 => simpleRtf(s"census rtf $m ok", m)
                case _ => // unbalanced rtf (r17 dispatch family)
                  s"{\\rtf1\\ansi dangling $m".getBytes("ISO-8859-1")
              }
            Multimodal.MediaRecord(m, "application/octet-stream", b)
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** q245 aux-part text formulas — the oracle replays all three. */
  private def hdrText(m: Long, k: Int): String = s"Hdr $k of $m run&$k"
  private def ftrText(m: Long): String = s"Ftr of $m page"
  private def noteText(m: Long, i: Int): String = s"Note $i of $m"

  private def auxPartXml(root: String, paras: Seq[String]): String =
    s"<?xml version=${"\"1.0\""}?><w:$root xmlns:w=" +
      "\"http://schemas.openxmlformats.org/wordprocessingml/2006/" +
      "main\">" +
      paras.map(p =>
        s"<w:p><w:r><w:t>${xmlEscape(p)}</w:t></w:r></w:p>").mkString +
      s"</w:$root>"

  private def footnotesXml(m: Long, n: Int): String =
    "<?xml version=\"1.0\"?><w:footnotes xmlns:w=" +
      "\"http://schemas.openxmlformats.org/wordprocessingml/2006/" +
      "main\">" +
      (0 until n).map(i =>
        s"<w:footnote w:id=${"\"" + i + "\""}><w:p><w:r><w:t>" +
          xmlEscape(noteText(m, i)) +
          "</w:t></w:r></w:p></w:footnote>").mkString +
      "</w:footnotes>"

  /** The q245 corpus: headers/footers/footnotes parts alongside the
    * main document. Arms: two headers at %3, a footer at %2 (also the
    * deflate parity), footnotes (1+m%2 notes) at %5, raw reject at
    * %41, header-without-document conformance reject at %29, a
    * malformed header part (XML comment) at %31 — one bad aux part
    * fails the whole doc closed.
    */
  private def auxDocxFixture(spark: org.apache.spark.sql.SparkSession,
                             dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q245_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            val defl = m % 2 == 0
            def e(name: String, xml: String) =
              (name, xml.getBytes("UTF-8"), defl)
            val doc = e("word/document.xml",
              auxPartXml("document", Seq(s"Body of $m")))
            val h1 =
              if (m % 31 == 0)
                ("word/header1.xml",
                  ("<w:hdr><!-- bad --><w:p><w:r><w:t>x</w:t></w:r>" +
                    "</w:p></w:hdr>").getBytes("UTF-8"), defl)
              else e("word/header1.xml",
                auxPartXml("hdr", Seq(hdrText(m, 1))))
            val extras =
              (if (m % 3 == 0)
                Seq(e("word/header2.xml",
                  auxPartXml("hdr", Seq(hdrText(m, 2))))) else Nil) ++
              (if (m % 2 == 0)
                Seq(e("word/footer1.xml",
                  auxPartXml("ftr", Seq(ftrText(m))))) else Nil) ++
              (if (m % 5 == 0)
                Seq(e("word/footnotes.xml",
                  footnotesXml(m, (1 + m % 2).toInt))) else Nil)
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else if (m % 29 == 0)
              // header present, document part missing: conformance
              // reject even though aux parts exist
              Multimodal.MediaRecord(m, "application/zip",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"),
                    false), h1)))
            else
              Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"),
                    false), doc, h1) ++ extras))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Shared text formula for the q239 UTF-16 corpus — deliberately
    * multi-byte in both encodings (é U+00E9, № U+2116, → U+2192).
    */
  private def u16Text(m: Long): String =
    s"Unicode doc $m café № ${m % 7} → end"

  /** The q239 corpus: the same formula text arrives UTF-16BE (txt),
    * UTF-16LE (html, whitespace-led at %5), and UTF-8 (control) by
    * m%3; the %41 arm truncates a UTF-16 stream mid-code-unit — the
    * strict decoder must fail closed, never emit U+FFFD.
    */
  private def utf16Fixture(spark: org.apache.spark.sql.SparkSession,
                           dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q239_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val core = u16Text(m)
            val bytes: Array[Byte] =
              if (m % 41 == 0) {
                val be = Array(0xfe.toByte, 0xff.toByte) ++
                  core.getBytes("UTF-16BE")
                java.util.Arrays.copyOf(be, be.length - 1) // odd length
              } else (m % 3) match {
                case 0 => Array(0xfe.toByte, 0xff.toByte) ++
                  core.getBytes("UTF-16BE")
                case 1 =>
                  val page = (if (m % 5 == 0) "\n  " else "") +
                    s"<html><body><p>$core</p></body></html>"
                  Array(0xff.toByte, 0xfe.toByte) ++
                    page.getBytes("UTF-16LE")
                case _ => core.getBytes("UTF-8")
              }
            Multimodal.MediaRecord(m, "text/plain", bytes)
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Body paragraph q of doc m for the q233 corpus. */
  private def tblBodyText(m: Long, q: Int): String = s"Body $q of $m"

  /** Cell (t, r, c) of doc m — two paragraphs (joined `\n`) on the
    * (m+t+r+c)%4 arm.
    */
  private def tblCellText(m: Long, t: Int, r: Int, c: Int): String = {
    val base = s"cell $t.$r.$c of $m v" + ((m + r * 7 + c * 3) % 50)
    if ((m + t + r + c) % 4 == 0) base + "\nmore " + c else base
  }

  /** word/document.xml with m%3 tables after 1+m%3 body paragraphs;
    * table t: 1+(m+t)%3 rows × 1+(m+t)%2 cols, `<w:tblPr/>` noise,
    * multi-paragraph cells on the %4 arm. The %29 arm nests a table
    * inside a cell — out of profile, must fail closed.
    */
  private def tableDocumentXml(m: Long): String = {
    val body = (0 until (1 + m % 3).toInt).map { q =>
      s"<w:p><w:r><w:t>${xmlEscape(tblBodyText(m, q))}</w:t></w:r></w:p>"
    }.mkString
    def cellXml(t: Int, r: Int, c: Int): String = {
      val paras = tblCellText(m, t, r, c).split("\n", -1).map { p =>
        s"<w:p><w:r><w:t>${xmlEscape(p)}</w:t></w:r></w:p>"
      }.mkString
      val nested =
        if (m % 29 == 0 && t == 0 && r == 0 && c == 0)
          "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>x</w:t></w:r></w:p>" +
            "</w:tc></w:tr></w:tbl>"
        else ""
      s"<w:tc><w:tcPr/>$paras$nested</w:tc>"
    }
    val tables = (0 until (m % 3).toInt).map { t =>
      val rows = (0 until (1 + (m + t) % 3).toInt).map { r =>
        val cells = (0 until (1 + (m + t) % 2).toInt)
          .map(c => cellXml(t, r, c)).mkString
        s"<w:tr><w:trPr/>$cells</w:tr>"
      }.mkString
      s"<w:tbl><w:tblPr/>$rows</w:tbl>"
    }.mkString
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body + tables +
      "</w:body></w:document>"
  }

  private def docxTableFixture(spark: org.apache.spark.sql.SparkSession,
                               dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q233_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else
              Multimodal.MediaRecord(m,
                "application/vnd.openxmlformats-officedocument" +
                  ".wordprocessingml.document",
                buildZip(Seq(
                  ("[Content_Types].xml", ctXml.getBytes("UTF-8"), false),
                  ("word/document.xml",
                    tableDocumentXml(m).getBytes("UTF-8"), m % 2 == 0))))
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  // ---------------------------------------------------------------
  // queries
  // ---------------------------------------------------------------

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q222: PDF content-stream text extraction
    // ([[graft.ext.DocText.PdfTextExtract]]) — inflate(FlateDecode) →
    // Tj/TJ walk → escape decode → page reassembly, on byte-real PDFs
    // whose page text is a doc_id formula emitted SPLIT across a Tj
    // and a kerned TJ array with escaped parens and an octal \101: a
    // wrong escape table, a missed TJ element, a bad /Length read, or
    // an inflate defect all flip the md5. Arms: 2 pages at %3 (page
    // join = \n), Flate at %2 vs plain, raw-text reject at %41.
    GraftQuery(
      "q222_pdf_text",
      (spark, dir) => {
        DocText.extractPdfText(pdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS pages
          FROM documents),
        t AS (
          SELECT *, array_to_string(list_transform(range(0, pages),
              p -> 'Doc (' || m || ') p' || p || ': '
                || repeat('ab ', CAST(1 + (m + p) % 7 AS INT)) || 'A.'),
            chr(10)) AS txt
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/pdf' END AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE pages END AS INT)
                 AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 2 * pages END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q223: DOCX main-document text extraction
    // ([[graft.ext.DocText.DocxTextExtract]]) — ZIP central directory
    // → local header → raw-deflate inflate (exact consumption) →
    // CRC32 verify → <w:p>/<w:t> walk with entity decode, on
    // byte-real OOXML packages whose paragraph text is a doc_id
    // formula split across two runs containing raw `&<>` (so the
    // fixture entity-encodes and the extractor must decode). Arms:
    // deflated document.xml at %2 vs stored, a document-less ZIP at
    // %29 (conformance reject), raw text at %41.
    GraftQuery(
      "q223_docx_text",
      (spark, dir) => {
        DocText.extractDocxText(docxFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_paragraphs"),
            col("n_runs"), col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 doc_id % 41 <> 0 AND doc_id % 29 = 0 AS nopart,
                 CAST(1 + doc_id % 4 AS INT) AS np
          FROM documents),
        t AS (
          SELECT *, NOT bad AND NOT nopart AS good,
            array_to_string(list_transform(range(0, np),
              q -> 'Para ' || q || ' of ' || m || ' &<> '
                || repeat('cd ', CAST(1 + (m + q) % 5 AS INT)) || 'end'),
            chr(10)) AS txt
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    WHEN nopart THEN 'application/zip'
                    ELSE 'application/vnd.openxmlformats-officedocument'
                      || '.wordprocessingml.document' END AS mime,
               CAST(CASE WHEN good THEN np ELSE 0 END AS INT)
                 AS n_paragraphs,
               CAST(CASE WHEN good THEN 2 * np ELSE 0 END AS INT)
                 AS n_runs,
               CAST(CASE WHEN good THEN length(txt) ELSE 0 END AS BIGINT)
                 AS text_len,
               CASE WHEN good THEN md5(txt) ELSE '' END AS text_md5,
               good AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q226: mixed-format corpus unification
    // ([[graft.ext.DocText.extractAnyText]]) — the Docling-replacement
    // story end-to-end: the SAME logical content arrives as PDF, DOCX,
    // HTML, and plain text (magic-byte dispatch, never the mime
    // string), is extracted into ONE uniform text table
    // (PdfTextExtract / DocxTextExtract / htmlExtractText / identity),
    // and the unified table feeds a token census and a cross-format
    // EXACT dedup (aggregate on md5(text), keep-min-id canonical) —
    // catching the duplicate a single-format pipeline structurally
    // cannot (the same doc crawled as HTML and archived as PDF). The
    // fixture keys content on doc_id % 251 so cross-format dup groups
    // exist by construction; corrupt-PDF arm at %41 fails closed.
    // Scale shape: extraction map-side; ONE content-hash aggregation
    // + one hash-keyed join back (aggregate-then-join).
    GraftQuery(
      "q226_mixed_corpus_unify",
      (spark, dir) => {
        import graft.ext.HtmlText
        val any = DocText.extractAnyText(mixedFixture(spark, dir)).toDF()
        val htmlU = HtmlText.htmlExtractText(
            any.filter(col("needs_html")), col("media_id"), col("raw"))
          .select(col("doc_id").as("media_id"), lit("html").as("format"),
            coalesce(col("extracted"), lit("")).as("text"),
            col("extracted").isNotNull.as("ok"))
        val unified = any.filter(!col("needs_html"))
          .select(col("media_id"), col("format"),
            col("raw").as("text"), col("ok"))
          .unionByName(htmlU)
        val groups = unified.filter(col("ok"))
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("keeper"))
        unified
          .withColumn("text_md5",
            when(col("ok"), md5(col("text"))).otherwise(lit("")))
          .withColumn("n_tokens",
            when(col("ok"), size(split(col("text"), " ", -1)))
              .otherwise(lit(0)))
          .join(groups, Seq("text_md5"), "left")
          .select(col("media_id"), col("format"), col("ok"),
            col("n_tokens"), col("text_md5"),
            coalesce(col("n_copies"), lit(0L)).as("n_copies"),
            (col("ok") && col("media_id") === col("keeper"))
              .as("is_canonical"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(doc_id % 4 AS INT) AS arm,
                 CAST(doc_id % 251 AS INT) AS r
          FROM documents),
        t AS (
          SELECT *, 'Shared content ' || r || ' body '
            || repeat('ef ', CAST(1 + r % 6 AS INT)) || 'tail.' AS c
          FROM p),
        g AS (
          SELECT c, CAST(count(*) AS BIGINT) AS n_copies,
                 min(m) AS keeper
          FROM t WHERE NOT bad GROUP BY c)
        SELECT m AS media_id,
               CASE WHEN bad THEN ''
                    WHEN arm = 0 THEN 'pdf'
                    WHEN arm = 1 THEN 'docx'
                    WHEN arm = 2 THEN 'html'
                    ELSE 'txt' END AS format,
               NOT bad AS ok,
               CAST(CASE WHEN bad THEN 0
                         ELSE len(string_split(c, ' ')) END AS INT)
                 AS n_tokens,
               CASE WHEN bad THEN '' ELSE md5(c) END AS text_md5,
               CAST(CASE WHEN bad THEN 0 ELSE g.n_copies END AS BIGINT)
                 AS n_copies,
               NOT bad AND m = g.keeper AS is_canonical
        FROM t LEFT JOIN g USING (c)
        ORDER BY m""")),

    // ------------------------------------------------------------------
    // q228: Avro OCF ingestion ([[graft.ext.AvroOcf]]) — the third
    // from-scratch container walk (WARC q216, .warc.gz q221): magic,
    // metadata map, schema profile check, per-block count/size/sync
    // verification, null + raw-deflate codecs, exact byte consumption
    // per record and per file. The fixture is written by the REAL
    // Avro library (jar present; the Spark connector is not), so the
    // gate pins the reader against genuine library bytes; the oracle
    // replays every output from the record formulas. Arms: deflate at
    // %2 vs null codec, block count forced to ceil(K/2) by explicit
    // syncs, raw-text reject at %41. Scale shape: file-per-task
    // map-side walk (the q216 note).
    GraftQuery(
      "q228_avro_ingest",
      (spark, dir) => {
        graft.ext.AvroOcf.extractAvro(avroFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_blocks"),
            col("n_records"), col("codec"), col("sum_ids"),
            col("bodies_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(1 + doc_id % 4 AS INT) AS k
          FROM documents),
        t AS (
          SELECT *,
            list_transform(range(0, k), i -> m * 10 + i) AS ids,
            list_transform(range(0, k),
              i -> 'av-' || m || '-' || i || '-'
                || repeat('x ', CAST(1 + (m + i) % 5 AS INT))) AS bodies
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'avro/binary' END AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE (k + 1) // 2 END AS INT)
                 AS n_blocks,
               CAST(CASE WHEN bad THEN 0 ELSE k END AS BIGINT)
                 AS n_records,
               CASE WHEN bad THEN ''
                    WHEN m % 2 = 0 THEN 'deflate' ELSE 'null' END
                 AS codec,
               CAST(CASE WHEN bad THEN 0 ELSE list_sum(ids) END AS BIGINT)
                 AS sum_ids,
               CASE WHEN bad THEN ''
                    ELSE md5(array_to_string(bodies, chr(10))) END
                 AS bodies_md5,
               NOT bad AS ok
        FROM t ORDER BY m""")),

    // ------------------------------------------------------------------
    // q231: cross-format NEAR-dup census — the case q226's exact dedup
    // structurally cannot catch: the same logical document extracted
    // from different containers is near-identical, never
    // byte-identical (format-specific tails here; extraction noise in
    // production). Unify with [[graft.ext.DocText.extractAnyText]] +
    // [[graft.ext.HtmlText.htmlExtractText]], then
    // [[graft.ext.Dedup.minhashPairs]] over the unified TEXT, then a
    // (format, format) pair census. The fixture's Jaccard landscape is
    // exact and separated (1.0 / 0.913 / ≤0.63 vs the 0.8 threshold),
    // so the oracle derives the full pair census from per-(content,
    // format) group cardinalities alone — any recall miss, threshold
    // drift, or shingle disagreement flips a count. Scale shape:
    // extraction map-side; the pair stage is the q28 banded LSH; the
    // census is a tiny aggregate over pairs.
    GraftQuery(
      "q231_cross_format_near_dup",
      (spark, dir) => {
        import graft.ext.{Dedup, DocText, HtmlText}
        // derive-once (round-17 optimization): `any` feeds BOTH union
        // branches and `unified` feeds the LSH pass plus two format-tag
        // joins — without the two materializations the container
        // extraction kernels re-run up to 3× per query (the q88/q224
        // discipline)
        val any = DocText.extractAnyText(mixed231Fixture(spark, dir))
          .toDF().localCheckpoint(true)
        val htmlU = HtmlText.htmlExtractText(
            any.filter(col("needs_html")), col("media_id"), col("raw"))
          .select(col("doc_id").as("media_id"), lit("html").as("format"),
            col("extracted").as("text"))
          .filter(col("text").isNotNull)
        val unified = any.filter(!col("needs_html") && col("ok"))
          .select(col("media_id"), col("format"), col("raw").as("text"))
          .unionByName(htmlU)
          .localCheckpoint(true)
        val pairs = Dedup.minhashPairs(unified, col("media_id"),
          col("text"), n = 3, threshold = 0.8)
        val fmt = unified.select(col("media_id"), col("format"))
        pairs
          .join(fmt.select(col("media_id").as("id_a"),
            col("format").as("f_a")), Seq("id_a"))
          .join(fmt.select(col("media_id").as("id_b"),
            col("format").as("f_b")), Seq("id_b"))
          .groupBy(least(col("f_a"), col("f_b")).as("fa"),
            greatest(col("f_a"), col("f_b")).as("fb"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("fa"), col("fb"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, CAST(doc_id % 251 AS INT) AS r,
                 CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
                   WHEN 2 THEN 'html' ELSE 'txt' END AS f
          FROM documents WHERE doc_id % 41 <> 0),
        c AS (SELECT r, f, count(*) AS n FROM p GROUP BY 1, 2),
        np AS (
          SELECT f AS fa, f AS fb, n * (n - 1) / 2 AS k FROM c
          UNION ALL
          SELECT a.f, b.f, a.n * b.n
          FROM c a JOIN c b ON a.r = b.r AND a.f < b.f)
        SELECT fa, fb, CAST(SUM(k) AS BIGINT) AS n_pairs
        FROM np GROUP BY 1, 2
        HAVING SUM(k) > 0
        ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q232: PDF HEX-string text extraction — the first profile
    // widening of q222's parser (VERDICT r15 item 5: `<48656c6c6f>`
    // strings are ubiquitous in real PDFs and were a profile
    // violation). Each content stream shows its formula text through
    // all THREE string forms at once — a plain hex Tj, a TJ array
    // mixing a whitespace-interrupted hex string with a literal, and
    // an odd-nibble-count hex Tj (`<5>` → 0x50 'P', the §7.3.4.3 pad
    // rule) — with upper/lowercase digits by %3 and Flate by %2, so a
    // wrong nibble order, a dropped pad, case sensitivity, or
    // whitespace intolerance all flip the md5. The %41 arm plants a
    // non-hex digit inside the string: STILL a profile violation,
    // pinning that the widening stayed fail-closed at its new edge.
    GraftQuery(
      "q232_pdf_hex_text",
      (spark, dir) => {
        DocText.extractPdfText(hexPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad FROM documents),
        t AS (
          SELECT *, 'Hex doc ' || m || ': '
            || repeat('gh ', CAST(1 + m % 5 AS INT)) || 'ZP' AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 3 END AS INT) AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q233: DOCX TABLE extraction ([[graft.ext.DocText
    // .extractDocxTables]]) — the tables → rows → cells product the
    // reference's Docling emits (k8s/configmaps.yaml:20-26,
    // table_structure: true) and q159's cell analytics consume,
    // extracted from byte-real OOXML instead of synthesized JSON:
    // m%3 tables of 1+(m+t)%3 rows × 1+(m+t)%2 cols after 1+m%3 body
    // paragraphs, multi-paragraph cells on the %4 arm (joined \n),
    // tblPr/trPr/tcPr structural noise skipped. cells_md5 hashes the
    // canonical cell serialization (cells U+001F, rows U+001E, tables
    // U+001D — C0 separators XML text cannot carry, so the form is
    // injective even over multi-paragraph/tabbed cells; ADVICE r16), so
    // a transposed cell, a dropped row, or body/cell text bleeding
    // into each other all flip a hash. Arms: deflated document.xml at
    // %2, raw text at %41, and a NESTED table at %29 — out of
    // profile, must fail closed, pinning the walker's balance checks.
    GraftQuery(
      "q233_docx_tables",
      (spark, dir) => {
        DocText.extractDocxTables(docxTableFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_paragraphs"),
            col("n_tables"), col("n_rows"), col("n_cells"),
            col("text_md5"), col("cells_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 doc_id % 41 <> 0 AND doc_id % 29 = 0
                   AND doc_id % 3 > 0 AS nested,
                 CAST(1 + doc_id % 3 AS INT) AS np,
                 CAST(doc_id % 3 AS INT) AS nt
          FROM documents),
        f AS (
          SELECT *, NOT bad AND NOT nested AS good,
            array_to_string(list_transform(range(0, np),
              q -> 'Body ' || q || ' of ' || m), chr(10)) AS txt,
            list_transform(range(0, nt), t ->
              struct_pack(
                nr := 1 + (m + t) % 3,
                nc := 1 + (m + t) % 2,
                s := array_to_string(
                  list_transform(range(0, 1 + (m + t) % 3), r ->
                    array_to_string(
                      list_transform(range(0, 1 + (m + t) % 2), c ->
                        'cell ' || t || '.' || r || '.' || c || ' of '
                          || m || ' v' || ((m + r * 7 + c * 3) % 50)
                          || CASE WHEN (m + t + r + c) % 4 = 0
                             THEN chr(10) || 'more ' || c ELSE '' END),
                      chr(31))),
                  chr(30)))) AS tabs
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/vnd.openxmlformats-officedocument'
                      || '.wordprocessingml.document' END AS mime,
               CAST(CASE WHEN good THEN np ELSE 0 END AS INT)
                 AS n_paragraphs,
               CAST(CASE WHEN good THEN nt ELSE 0 END AS INT) AS n_tables,
               CAST(CASE WHEN good
                 THEN coalesce(list_sum(list_transform(tabs, t -> t.nr)), 0)
                 ELSE 0 END AS INT) AS n_rows,
               CAST(CASE WHEN good
                 THEN coalesce(
                   list_sum(list_transform(tabs, t -> t.nr * t.nc)), 0)
                 ELSE 0 END AS INT) AS n_cells,
               CASE WHEN good THEN md5(txt) ELSE '' END AS text_md5,
               CASE WHEN good AND nt > 0 THEN md5(array_to_string(
                 list_transform(tabs, t -> t.s), chr(29)))
                 ELSE '' END AS cells_md5,
               good AS ok
        FROM f ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q234: REAL-WORLD-shaped PDFs — the post-2010 constructs that made
    // the q222 profile answer ok=false for most of a real corpus
    // (VERDICT r15 "what's missing" #3): an xref STREAM (/Type /XRef,
    // binary, Flate+Predictor filter chain), a font program
    // (/Subtype + /Length1 trap), an object stream (/Type /ObjStm),
    // and a content stream whose /Length is an INDIRECT `7 0 R`
    // resolved from a trailing integer object. Typed streams are
    // length-skipped (never tokenized — §7.5.7: no content stream can
    // hide in an ObjStm), the typeless content stream extracts; the
    // %41 arm points the indirect length at a missing object and must
    // fail closed.
    GraftQuery(
      "q234_pdf_realworld",
      (spark, dir) => {
        DocText.extractPdfText(realWorldPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad FROM documents),
        t AS (
          SELECT *, 'Real doc ' || m || ' body '
            || repeat('jk ', CAST(1 + m % 6 AS INT)) || 'end.' AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q240: ObjStm-resident /Length resolution (VERDICT r16 item 1 —
    // the largest remaining real-corpus coverage cut): post-2010
    // writers keep the whole object table inside `/Type /ObjStm`
    // object streams, so q234's direct-integer scan finds NOTHING and
    // the doc failed closed. Now a direct miss inflates the object
    // streams (§7.5.7 pair table: `/N`, `/First`, `objnum offset …`)
    // and resolves from their integer members. The fixture has NO
    // direct-integer objects at all; arms: content Flate at %2 with
    // the ObjStm Flate at the complementary parity (all four codec
    // combos), an EARLIER decoy ObjStm defining the length object
    // with a wrong value at %3 (later-definition-wins — taking the
    // first mis-slices, trips the endstream check, flips ok), a
    // non-integer member object alongside the length (the skip path),
    // and a TRUNCATED Flate ObjStm at %41 — all-or-nothing fail
    // closed, because a broken ObjStm could shadow any object.
    GraftQuery(
      "q240_pdf_objstm",
      (spark, dir) => {
        DocText.extractPdfText(objStmPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad FROM documents),
        t AS (
          SELECT *, 'Stm doc ' || m || ' text '
            || repeat('mn ', CAST(1 + m % 5 AS INT)) || 'fin.' AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q241: PDF filter CHAINS + ASCIIHexDecode (VERDICT r16 item 3) —
    // `/Filter` as a plain ASCIIHexDecode name (uppercase digits,
    // interior whitespace, `>` EOD), as the common two-stage
    // `[/ASCIIHexDecode /FlateDecode]` chain (applied in order:
    // hex-strip THEN inflate — a reversed application order cannot
    // produce the text), and as a one-element `[ /FlateDecode ]`
    // array. LZW/DCT stay out of profile. The %41 arm plants a
    // non-hex digit — the widened edge must stay fail-closed.
    GraftQuery(
      "q241_pdf_filter_chain",
      (spark, dir) => {
        DocText.extractPdfText(chainPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad FROM documents),
        t AS (
          SELECT *, 'Chain doc ' || m || ' '
            || repeat('pq ', CAST(1 + m % 6 AS INT)) || 'done.' AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q242: DOCX run-level WHITESPACE (VERDICT r16 item 2) — real
    // documents separate words with `<w:br/>`, `<w:tab/>`, `<w:cr/>`
    // run content and wrap runs in `w:hyperlink`; the q223 walk
    // dropped all four, silently gluing adjacent words and corrupting
    // every downstream text operator (shingles, quality, tokens).
    // Each paragraph here carries a tab and a break INSIDE a run, a
    // hyperlink-wrapped run, a w:cr on the (m+q)%3 arm — and a
    // tab-STOP definition (`<w:tab w:pos=…/>` inside w:pPr/w:tabs)
    // that must contribute NOTHING: rendering it as a tab, dropping a
    // real one, or missing the hyperlink run all flip the md5 or a
    // run count. Arms: deflate at %2, raw reject at %41.
    GraftQuery(
      "q242_docx_whitespace",
      (spark, dir) => {
        DocText.extractDocxText(wsDocxFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_paragraphs"),
            col("n_runs"), col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(1 + doc_id % 3 AS INT) AS np
          FROM documents),
        t AS (
          SELECT *,
            array_to_string(list_transform(range(0, np), q ->
              'A' || m || '.' || q || chr(9) || 'B' || ((m + q) % 9)
                || chr(10) || 'C' || (m % 7) || ' link ' || (m % 13)
                || ' tail ' || q
                || CASE WHEN (m + q) % 3 = 0
                   THEN chr(10) || 'Z' || q ELSE '' END),
              chr(10)) AS txt,
            list_sum(list_transform(range(0, np), q ->
              5 + CASE WHEN (m + q) % 3 = 0 THEN 1 ELSE 0 END))
              AS nr
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/vnd.openxmlformats-officedocument'
                      || '.wordprocessingml.document' END AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE np END AS INT)
                 AS n_paragraphs,
               CAST(CASE WHEN bad THEN 0 ELSE nr END AS INT) AS n_runs,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q243: extraction-coverage CENSUS (VERDICT r16 item 4) — the
    // number a 100 TB ingest run reads first: per dispatched format,
    // what fraction of the corpus does the extraction profile cover,
    // and a STABLE failure-REASON histogram for the rest (the reason
    // vocabulary is documented at [[graft.ext.DocText
    // .extractionProbe]] and only grows). The fixture plants twelve
    // arms spanning every dispatch family — ok and failing PDFs
    // (content-profile, unresolved length, unsupported filter), ok
    // and failing DOCX (missing part, XML violation, broken ZIP),
    // malformed Avro, plain text, truncated UTF-16, HTML, empty — so
    // every reason code is derivable from doc_id arithmetic and a
    // drifted code, a mis-dispatched magic, or a silently-ok failure
    // all flip a row. Scale shape: probe map-side; census one
    // (format, reason) aggregate + a format-sized join.
    GraftQuery(
      "q243_extraction_census",
      (spark, dir) => {
        val probe = DocText.extractionProbe(censusFixture(spark, dir))
          .toDF()
        val perFmt = probe.groupBy(col("format")).agg(
          count(lit(1)).as("format_total"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("format_ok"))
        probe.groupBy(col("format"), col("reason"))
          .agg(count(lit(1)).as("n"))
          .join(perFmt, Seq("format"))
          .select(col("format"), col("reason"), col("n"),
            col("format_total"),
            (col("format_ok").cast("double") / col("format_total"))
              .as("ok_rate"))
          .orderBy(col("format"), col("reason"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
            CASE WHEN doc_id % 41 = 0 THEN 'unknown'
                 WHEN doc_id % 14 IN (0,1,2,3) THEN 'pdf'
                 WHEN doc_id % 14 IN (4,5,6,7) THEN 'docx'
                 WHEN doc_id % 14 = 8 THEN 'avro'
                 WHEN doc_id % 14 = 9 THEN 'txt'
                 WHEN doc_id % 14 = 10 THEN 'utf16'
                 WHEN doc_id % 14 = 11 THEN 'html'
                 ELSE 'rtf' END AS format,
            CASE WHEN doc_id % 41 = 0 THEN 'empty'
                 WHEN doc_id % 14 = 0 THEN 'ok'
                 WHEN doc_id % 14 = 1 THEN 'pdf_content_profile'
                 WHEN doc_id % 14 = 2 THEN 'pdf_length_unresolved'
                 WHEN doc_id % 14 = 3 THEN 'pdf_filter_unsupported'
                 WHEN doc_id % 14 = 4 THEN 'ok'
                 WHEN doc_id % 14 = 5 THEN 'docx_no_document_part'
                 WHEN doc_id % 14 = 6 THEN 'docx_xml_profile'
                 WHEN doc_id % 14 = 7 THEN 'docx_zip'
                 WHEN doc_id % 14 = 8 THEN 'avro_malformed'
                 WHEN doc_id % 14 = 9 THEN 'ok'
                 WHEN doc_id % 14 = 10 THEN 'utf16_malformed'
                 WHEN doc_id % 14 = 11 THEN 'ok'
                 WHEN doc_id % 14 = 12 THEN 'ok'
                 ELSE 'rtf_structure' END AS reason
          FROM documents),
        f AS (
          SELECT format,
                 CAST(count(*) AS BIGINT) AS format_total,
                 SUM(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END) AS fok
          FROM p GROUP BY 1)
        SELECT p.format, reason, CAST(count(*) AS BIGINT) AS n,
               format_total,
               CAST(fok AS DOUBLE) / format_total AS ok_rate
        FROM p JOIN f USING (format)
        GROUP BY p.format, reason, format_total, fok
        ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q245: DOCX header/footer/footnotes parts ([[graft.ext.DocText
    // .DocxAuxExtract]]) — the package parts Docling reads that the
    // q223 main-document walk did not (VERDICT r16 "what's missing"
    // #3 tail). Every word/headerN.xml / word/footerN.xml /
    // word/footnotes.xml part rides the generalized ZIP walk and the
    // SAME paragraph/run XML discipline; texts join in part-name
    // order; footnote count from <w:footnote> opens with a name
    // boundary (never w:footnoteRef). Arms: two headers at %3, a
    // footer at %2 (also deflate parity), 1+m%2 footnotes at %5, raw
    // reject %41, header-without-document conformance reject %29, a
    // malformed header at %31 (one bad aux part fails the doc
    // closed). A dropped part, wrong part order, a miscount, or
    // body/aux text bleeding all flip a hash.
    GraftQuery(
      "q245_docx_aux_parts",
      (spark, dir) => {
        DocText.extractDocxAux(auxDocxFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_headers"),
            col("n_footers"), col("n_footnotes"), col("headers_md5"),
            col("footers_md5"), col("footnotes_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 doc_id % 41 <> 0 AND doc_id % 29 = 0 AS nodoc,
                 doc_id % 41 <> 0 AND doc_id % 29 <> 0
                   AND doc_id % 31 = 0 AS badhdr
          FROM documents),
        t AS (
          SELECT *, NOT bad AND NOT nodoc AND NOT badhdr AS good,
            'Hdr 1 of ' || m || ' run&1'
              || CASE WHEN m % 3 = 0
                 THEN chr(10) || 'Hdr 2 of ' || m || ' run&2'
                 ELSE '' END AS htxt,
            'Ftr of ' || m || ' page' AS ftxt,
            CAST(CASE WHEN m % 5 = 0 THEN 1 + m % 2 ELSE 0 END AS INT)
              AS nn
          FROM p),
        f AS (
          SELECT *, CASE WHEN nn = 0 THEN ''
            ELSE array_to_string(list_transform(range(0, nn),
              i -> 'Note ' || i || ' of ' || m), chr(10)) END AS ntxt
          FROM t)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    WHEN nodoc THEN 'application/zip'
                    ELSE 'application/vnd.openxmlformats-officedocument'
                      || '.wordprocessingml.document' END AS mime,
               CAST(CASE WHEN good THEN 1 + CASE WHEN m % 3 = 0 THEN 1
                 ELSE 0 END ELSE 0 END AS INT) AS n_headers,
               CAST(CASE WHEN good AND m % 2 = 0 THEN 1 ELSE 0 END
                 AS INT) AS n_footers,
               CAST(CASE WHEN good THEN nn ELSE 0 END AS INT)
                 AS n_footnotes,
               CASE WHEN good THEN md5(htxt) ELSE '' END AS headers_md5,
               CASE WHEN good AND m % 2 = 0 THEN md5(ftxt) ELSE '' END
                 AS footers_md5,
               CASE WHEN good AND nn > 0 THEN md5(ntxt) ELSE '' END
                 AS footnotes_md5,
               good AS ok
        FROM f ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q236: Avro arm of the unified extraction dispatch
    // ([[graft.ext.DocText.extractAnyText]] r16) — a training corpus
    // routinely arrives as record CONTAINERS next to documents; the
    // text view of an OCF is every string-typed field's value,
    // record-major, joined \n (the PDF page-join convention). Reuses
    // the q228 library-written fixture, so the gate prices magic
    // dispatch (`Obj\x01`) + the from-scratch OCF walk + the text
    // join; the %41 raw-text arm routes to the txt arm (ok=true) —
    // pinning that dispatch boundaries moved correctly when the new
    // arm landed.
    GraftQuery(
      "q236_avro_text_unify",
      (spark, dir) => {
        DocText.extractAnyText(avroFixture(spark, dir)).toDF()
          .select(col("media_id"), col("format"),
            length(col("raw")).cast("long").as("text_len"),
            md5(col("raw")).as("text_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(1 + doc_id % 4 AS INT) AS k
          FROM documents),
        t AS (
          SELECT *, CASE WHEN bad THEN 'not avro ' || m
            ELSE array_to_string(list_transform(range(0, k),
              i -> 'av-' || m || '-' || i || '-'
                || repeat('x ', CAST(1 + (m + i) % 5 AS INT))),
              chr(10)) END AS txt
          FROM p)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'txt' ELSE 'avro' END AS format,
               CAST(length(txt) AS BIGINT) AS text_len,
               md5(txt) AS text_md5,
               TRUE AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q239: UTF-16 payloads in the unified dispatch
    // ([[graft.ext.DocText.extractAnyText]] r16) — real exports ship
    // UTF-16 with a BOM, which the strict UTF-8 arm rightly rejected;
    // now a BOM of either endianness routes through a strict UTF-16
    // decode with the same markup-vs-text dispatch on the DECODED
    // chars. The formula text is deliberately multi-byte in both
    // encodings (é № →), so a wrong endianness, a swallowed BOM, or a
    // code-unit slip all flip the md5 (hashes are over the decoded
    // string's UTF-8 bytes on both engines — the encoding boundary is
    // crossed exactly once). The %41 arm truncates mid-code-unit and
    // must fail closed, never U+FFFD.
    GraftQuery(
      "q239_utf16_unify",
      (spark, dir) => {
        DocText.extractAnyText(utf16Fixture(spark, dir)).toDF()
          .select(col("media_id"), col("format"),
            length(col("raw")).cast("long").as("text_len"),
            when(col("ok"), md5(col("raw"))).otherwise(lit(""))
              .as("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(doc_id % 3 AS INT) AS arm
          FROM documents),
        t AS (
          SELECT *, 'Unicode doc ' || m || ' café № ' || (m % 7)
            || ' → end' AS core
          FROM p),
        f AS (
          SELECT *, CASE WHEN bad THEN ''
            WHEN arm = 1 THEN '<html><body><p>' || core
              || '</p></body></html>'
            ELSE core END AS txt
          FROM t)
        SELECT m AS media_id,
               CASE WHEN bad THEN ''
                    WHEN arm = 1 THEN 'html' ELSE 'txt' END AS format,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM f ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q248: PDF text-POSITIONING whitespace — the PDF twin of q242's
    // DOCX word-gluing fix. Real writers place every word and line
    // with positioning operators (TJ adjustments, Td/TD/T*), which
    // the show-ops-only profile silently glued, corrupting every
    // downstream text operator exactly as the DOCX defect did. Now
    // T* and Td/TD with NEGATIVE ty render \n, and a TJ adjustment at
    // or below -180/1000 em renders one space ([[graft.ext.DocText
    // .PdfTextExtract.SpaceKern]] — the fixed-threshold profile of
    // pdftotext's width-aware rule). Every line here is placed, not
    // shown: -333 gaps between words, a -40 kern splitting word 0
    // (must NOT space), a +250 adjustment splitting word 1 (positive
    // tightens — must NOT space), line breaks rotating Td/T*/' by
    // (m+l)%3, an `8 0 Td` horizontal move on (m+l)%5 lines (ty=0 —
    // must emit nothing). The %41 arm runs `0 -14 Td` OUTSIDE BT:
    // positioning ops share the shows' BT discipline and must fail
    // closed. Profile note: this widening re-interpreted the
    // semantic-free -250 kerns the q222/q232 fixtures planted (a
    // -250 gap IS a space in a real PDF); both now plant -120.
    GraftQuery(
      "q248_pdf_pos_whitespace",
      (spark, dir) => {
        DocText.extractPdfText(posPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(2 + doc_id % 2 AS INT) AS L
          FROM documents),
        t AS (
          SELECT *, array_to_string(list_transform(range(0, L), l ->
              array_to_string(list_transform(
                range(0, 2 + (m + l) % 3), k ->
                  'w' || m || '.' || l || '.' || k), ' ')),
            chr(10)) AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE L END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q249: INLINE images in content streams (§8.9.7) — scanned-page
    // and logo-bearing PDFs embed image data directly between text
    // shows (`BI …params… ID <binary> EI`), which the tokenizer
    // rejected as unknown bytes, failing the whole document. The
    // segment is now skipped wholesale: the parameter dict ends at
    // the first whitespace-delimited ID, data ends at the first
    // whitespace-flanked EI — each payload here splices an `XEI`
    // (no whitespace flank: must NOT terminate) and is built from
    // non-letter bytes so no other terminator can form. Text shows
    // resume after each image and must survive untouched. Arms:
    // 1+m%3 images, Flate %2; %41 drops the EI (unterminated — fail
    // closed); %29 opens BI inside a BT text object (content-model
    // violation — fail closed).
    GraftQuery(
      "q249_pdf_inline_images",
      (spark, dir) => {
        DocText.extractPdfText(inlinePdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad,
                 CAST(1 + doc_id % 3 AS INT) AS k
          FROM documents),
        t AS (
          SELECT *, 'Img doc ' || m || ' head' ||
            array_to_string(list_transform(range(0, k),
              i -> ' seg ' || i || ' of ' || m), '') AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 1 + k END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q250: LEGACY filters — LZWDecode + ASCII85Decode (the r16
    // "what's missing" #2 tail beyond ASCIIHex): pre-Flate-era and
    // mail-gateway PDFs carry them, alone and in chains. LZW is the
    // §7.4.4 TIFF variant (MSB-first 9→12-bit codes, ClearTable/EOD,
    // EarlyChange=1 — NOT the GIF LSB-first decoder q207 ships);
    // ASCII85 enforces the `~>` EOD, `z` only at group boundaries,
    // group-value overflow, and the k→k-1 partial-group rule. Arms
    // by %4: plain LZW, plain ASCII85 (interior newlines), the
    // `[/ASCII85Decode /LZWDecode]` chain, and the cross-family
    // `[/ASCIIHexDecode /LZWDecode]` chain. %29 carries `/DecodeParms
    // << /EarlyChange 0 >>` — parameters change byte semantics, so
    // the stream must FAIL CLOSED, never mis-decode; %41 plants an
    // invalid ASCII85 byte.
    GraftQuery(
      "q250_pdf_legacy_filters",
      (spark, dir) => {
        DocText.extractPdfText(lzwPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_streams"),
            col("n_text_ops"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad
          FROM documents),
        t AS (
          SELECT *, 'Lzw doc ' || m || ' '
            || repeat('rs ', CAST(1 + m % 7 AS INT)) || 'tail.' AS txt
          FROM p)
        SELECT m AS media_id, 'application/pdf' AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS n_streams,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q251: PAGE-TREE-ordered, page-attributed extraction
    // ([[graft.ext.DocText.extractPdfPages]]) — q222–q250 extract in
    // FILE order, but a reader sees PAGE order: writers append
    // updated objects out of order, split page content across
    // /Contents arrays, and leave orphan streams behind. The walk
    // resolves trailer /Root → /Catalog → the /Pages tree depth-
    // first (two-level on the 3-page arm), emitting one row per
    // /Type /Page leaf. Discriminators a file-order scan fails: an
    // orphan content stream placed FIRST in every file (must not
    // appear), reverse object order at %5, a BT...ET spanning a
    // two-part /Contents array at (m+g)%4 (parts concatenate into
    // ONE logical stream — §7.8.2), a /Contents-less empty page at
    // (m+g)%7 (md5('') row). %41 plants a /Kids self-cycle and %29
    // a dangling /Pages ref — both fail closed to a single
    // page_no=0 row.
    GraftQuery(
      "q251_pdf_page_tree",
      (spark, dir) => {
        DocText.extractPdfPages(pagesPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("page_no"), col("n_text_ops"),
            col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"), col("page_no"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad,
                 CAST(1 + doc_id % 3 AS INT) AS np
          FROM documents),
        r AS (
          SELECT m, bad,
                 unnest(range(1, CASE WHEN bad THEN 2 ELSE np + 1 END))
                   AS g
          FROM p),
        f AS (
          SELECT m, bad, CAST(g AS INT) AS g,
                 (m + g) % 7 = 0 AS empty_pg,
                 (m + g) % 7 <> 0 AND (m + g) % 4 = 0 AS split_pg,
                 'Pg ' || g || ' of doc ' || m || ': '
                   || repeat('uv ', CAST(1 + (m + g) % 5 AS INT))
                   || 'Z.' AS txt
          FROM r)
        SELECT m AS media_id,
               CAST(CASE WHEN bad THEN 0 ELSE g END AS INT) AS page_no,
               CAST(CASE WHEN bad OR empty_pg THEN 0
                         WHEN split_pg THEN 2 ELSE 1 END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad OR empty_pg THEN 0
                         ELSE length(txt) END AS BIGINT) AS text_len,
               CASE WHEN bad THEN ''
                    WHEN empty_pg THEN md5('')
                    ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM f ORDER BY media_id, page_no""")),

    // ------------------------------------------------------------------
    // q252: DOCX LIST NUMBERING ([[graft.ext.DocText.DocxNumExtract]])
    // — every list in a real document loses its ordinals under the
    // q223 walk ("1."/"2."/"a)" are NOT in any w:t run; they render
    // from word/numbering.xml), flattening structure that dedup
    // shingles, quality scores, and chunkers then see differently
    // than a reader does. Paragraphs cycle plain / decimal item /
    // sub-item / lowerLetter item by q%4 over the w:num →
    // w:abstractNum → w:lvl resolution; the m%3==0 arm switches the
    // sub-level to the multi-level "%1.%2" form, where the SECOND
    // item (q=5) must reset the sub-counter — q=6 renders x.1, not
    // x.2; lowerLetter starts at 1+m%4 (w:start). Arms: deflate %2,
    // raw reject %41, an UNDEFINED numId at %29 (must fail closed,
    // not render unmarked), a w:tbl at %31 (table cells carry their
    // own numbering contexts — documented out-of-profile cut).
    GraftQuery(
      "q252_docx_numbering",
      (spark, dir) => {
        DocText.extractDocxNumbered(numDocxFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_paragraphs"),
            col("n_numbered"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0
                   OR doc_id % 31 = 0 AS bad,
                 CAST(7 + doc_id % 3 AS INT) AS np
          FROM documents),
        t AS (
          SELECT *, array_to_string(list_transform(range(0, np), q ->
            CASE CAST(q % 4 AS INT)
              WHEN 0 THEN 'Plain ' || q || ' of ' || m
              WHEN 1 THEN (q // 4 + 1) || '. Item ' || q || ' of ' || m
              WHEN 2 THEN CASE WHEN m % 3 = 0
                THEN (q // 4 + 1) || '.1 Sub ' || q || ' of ' || m
                ELSE '- Sub ' || q || ' of ' || m END
              ELSE '(' || chr(CAST(97 + m % 4 + q // 4 AS INT))
                || ') Alpha ' || q || ' of ' || m
            END), chr(10)) AS txt
          FROM p)
        SELECT m AS media_id,
               CASE WHEN m % 41 = 0 THEN 'application/octet-stream'
                    ELSE 'application/vnd.openxmlformats-officedocument'
                      || '.wordprocessingml.document' END AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE np END AS INT)
                 AS n_paragraphs,
               CAST(CASE WHEN bad THEN 0
                 ELSE np - ((np + 3) // 4) END AS INT) AS n_numbered,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q253: RTF extraction ([[graft.ext.DocText.RtfExtract]]) — the
    // Word-95-era format legacy corpora and mail gateways still ship.
    // Every document carries the real header destinations (fonttbl,
    // colortbl, an \info title, a starred \*\generator) whose junk
    // must NOT leak; the body pins the delimiter rules that garble
    // naive parsers: `{\b bold}`'s control-word space is CONSUMED
    // (not " bold"), `\'e9` is a byte escape mid-word, `\{braces\}`
    // are literal, the u8364 Unicode escape emits € and SKIPS its `?` fallback, source
    // newlines are never text, `\par` is. %41 drops the closing
    // brace (unbalanced — fail), %29 corrupts the hex escape.
    GraftQuery(
      "q253_rtf_text",
      (spark, dir) => {
        DocText.extractRtfText(rtfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_pars"),
            col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad
          FROM documents),
        t AS (
          SELECT *, 'Rtf doc ' || m || ' café ' || (m % 7) || chr(10)
            || 'bold' || (m % 5) || ' and plain tail {braces}'
            || CASE WHEN m % 3 = 0 THEN chr(10) || 'euro € ok'
               ELSE '' END AS txt
          FROM p)
        SELECT m AS media_id, 'application/rtf' AS mime,
               CAST(CASE WHEN bad THEN 0 WHEN m % 3 = 0 THEN 2
                    ELSE 1 END AS INT) AS n_pars,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q254: MIME / EML extraction ([[graft.ext.DocText.MimeExtract]])
    // — mail archives are a standing training-data source and every
    // body byte arrives transfer-encoded. Arms by m%4: 8bit, quoted-
    // printable (soft breaks vanish, =C3=A9 decodes, hard CRLF
    // normalizes), base64 (MIME line wrap), and multipart/mixed
    // whose preamble, epilogue, and base64 ATTACHMENT must not leak
    // while the nested multipart/alternative contributes its plain
    // sibling, not the html twin. Subjects pin RFC 2047 (B always, Q
    // at %5) and header FOLDING at %7 (the continuation line joins
    // before decoding). %41 plants an invalid base64 byte (the
    // strict decoder fails closed where the JDK MIME decoder skips);
    // %29 drops the closing --boundary-- (structure fail).
    GraftQuery(
      "q254_eml_text",
      (spark, dir) => {
        DocText.extractEmlText(emlFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_text_parts"),
            col("subject_md5"), col("text_len"), col("text_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad
          FROM documents),
        t AS (
          SELECT *,
            'Mail body ' || m || ' é one.' || chr(10) || 'Second '
              || (m % 7) || ' tail.'
              || CASE WHEN m % 4 = 3
                 THEN chr(10) || 'Alt plain ' || m || '.'
                 ELSE '' END AS txt,
            'doc ' || m || ' café end' AS subj
          FROM p)
        SELECT m AS media_id, 'message/rfc822' AS mime,
               CAST(CASE WHEN bad THEN 0 WHEN m % 4 = 3 THEN 2
                    ELSE 1 END AS INT) AS n_text_parts,
               CASE WHEN bad THEN '' ELSE md5(subj) END AS subject_md5,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q255: FIVE-format unification with the r17 RTF dispatch arm —
    // q226's cross-format exact-dedup census widened: the same
    // logical content now also arrives as RTF (`{\rtf` magic,
    // byte-0 anchored), which WITHOUT the new arm would pass the txt
    // arm as valid UTF-8 and leak `\fonttbl` control words into the
    // corpus — exactly the dup a content-hash census then misses
    // (the RTF copy's hash would differ from its PDF/DOCX/HTML/txt
    // twins). Content keys on doc_id % 251 so every group spans all
    // five formats by construction; per-doc `\info` noise pins that
    // header junk stays out of the hash; the %41 arm is an
    // UNBALANCED RTF — the dispatch arm must fail closed, never
    // fall through to txt. Scale shape unchanged from q226:
    // map-side extraction, one hash aggregation, one hash join.
    GraftQuery(
      "q255_penta_format_unify",
      (spark, dir) => {
        import graft.ext.HtmlText
        val any =
          DocText.extractAnyText(mixed255Fixture(spark, dir)).toDF()
        val htmlU = HtmlText.htmlExtractText(
            any.filter(col("needs_html")), col("media_id"), col("raw"))
          .select(col("doc_id").as("media_id"), lit("html").as("format"),
            coalesce(col("extracted"), lit("")).as("text"),
            col("extracted").isNotNull.as("ok"))
        val unified = any.filter(!col("needs_html"))
          .select(col("media_id"), col("format"),
            col("raw").as("text"), col("ok"))
          .unionByName(htmlU)
        val groups = unified.filter(col("ok"))
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(count(lit(1)).as("n_copies"),
            min(col("media_id")).as("keeper"))
        unified
          .withColumn("text_md5",
            when(col("ok"), md5(col("text"))).otherwise(lit("")))
          .join(groups, Seq("text_md5"), "left")
          .select(col("media_id"), col("format"), col("ok"),
            col("text_md5"),
            coalesce(col("n_copies"), lit(0L)).as("n_copies"),
            (col("ok") && col("media_id") === col("keeper"))
              .as("is_canonical"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CAST(doc_id % 5 AS INT) AS arm,
                 CAST(doc_id % 251 AS INT) AS r
          FROM documents),
        t AS (
          SELECT *, 'Penta content ' || r || ' body '
            || repeat('gh ', CAST(1 + r % 6 AS INT)) || 'tail.' AS c
          FROM p),
        g AS (
          SELECT c, CAST(count(*) AS BIGINT) AS n_copies,
                 min(m) AS keeper
          FROM t WHERE NOT bad GROUP BY c)
        SELECT m AS media_id,
               CASE WHEN bad THEN ''
                    WHEN arm = 0 THEN 'pdf'
                    WHEN arm = 1 THEN 'docx'
                    WHEN arm = 2 THEN 'html'
                    WHEN arm = 3 THEN 'txt'
                    ELSE 'rtf' END AS format,
               NOT bad AS ok,
               CASE WHEN bad THEN '' ELSE md5(c) END AS text_md5,
               CAST(CASE WHEN bad THEN 0 ELSE g.n_copies END AS BIGINT)
                 AS n_copies,
               NOT bad AND m = g.keeper AS is_canonical
        FROM t LEFT JOIN g USING (c)
        ORDER BY m""")),

    // ------------------------------------------------------------------
    // q256: /ToUnicode CMAP resolution ([[graft.ext.DocText
    // .PdfTextExtract.parseToUnicode]] through the q251 page-tree
    // path) — the largest remaining PDF coverage cut after ObjStm:
    // modern writers subset fonts and show GLYPH CODES, so without
    // the font's /ToUnicode CMap the "text" is garbage that no
    // downstream operator can use. Page /Resources → /Font (inline
    // dicts, or an indirect /Resources object at m%3) → per-font
    // CMaps; /F1 is a 2-byte Type0 font whose CMap shifts ascii by
    // +0x100 (an increment bfrange — identity decoding is VISIBLY
    // wrong), maps one glyph to the two-unit `fi` ligature (bfchar),
    // and an ARRAY-form bfrange to XYZ; /F2 has no CMap and stays
    // identity — the Tf switch mid-stream pins per-font state. %41
    // shows an UNMAPPED glyph (fail closed, never U+FFFD); %29
    // switches to an undefined /F9 (fail closed).
    GraftQuery(
      "q256_pdf_tounicode",
      (spark, dir) => {
        DocText.extractPdfPages(cmapPdfFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("page_no"), col("n_text_ops"),
            col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"), col("page_no"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0 AS bad
          FROM documents),
        t AS (
          SELECT *, 'Uni ' || m || ': fi XYZ plain ' || m || '.' AS txt
          FROM p)
        SELECT m AS media_id,
               CAST(CASE WHEN bad THEN 0 ELSE 1 END AS INT) AS page_no,
               CAST(CASE WHEN bad THEN 0 ELSE 2 END AS INT)
                 AS n_text_ops,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id, page_no""")),

    // ------------------------------------------------------------------
    // q257: MBOX archives ([[graft.ext.DocText.MboxExtract]] over
    // q254's message parser) — a mailbox on disk is ONE file of many
    // messages; training-data ingestion reads the archive, not
    // single .eml files. `From ` separator lines split messages
    // (each terminated by the writer's newline, stripped back), the
    // mboxrd `>From ` quoting round-trips a body line that would
    // otherwise FORGE a separator, and every message parses
    // independently: mids = m*3+i land on q254's %41/%29 bad arms
    // naturally, pinning that one broken message is one failed ROW,
    // never a failed archive (the per-page accountability
    // convention). %41 files don't start with `From ` → a single
    // msg_no=0 row.
    GraftQuery(
      "q257_mbox_archive",
      (spark, dir) => {
        DocText.extractMbox(mboxFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("msg_no"), col("n_text_parts"),
            col("subject_md5"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"), col("msg_no"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS filebad,
                 CAST(1 + doc_id % 2 AS INT) AS k
          FROM documents),
        fb AS (
          SELECT m, 0 AS msg_no, 0 AS n_text_parts,
                 '' AS subject_md5, '' AS text_md5, FALSE AS ok
          FROM p WHERE filebad),
        em AS (
          SELECT m, k, unnest(range(1, k + 1)) AS g
          FROM p WHERE NOT filebad),
        et AS (
          SELECT m, CAST(g AS INT) AS msg_no, m * 3 + g - 1 AS mid
          FROM em),
        r1 AS (
          SELECT m, msg_no,
                 CASE WHEN mid % 41 = 0 OR mid % 29 = 0 THEN 0
                      WHEN mid % 4 = 3 THEN 2 ELSE 1 END
                   AS n_text_parts,
                 CASE WHEN mid % 41 = 0 OR mid % 29 = 0 THEN ''
                      ELSE md5('doc ' || mid || ' café end') END
                   AS subject_md5,
                 CASE WHEN mid % 41 = 0 OR mid % 29 = 0 THEN ''
                      ELSE md5('Mail body ' || mid || ' é one.'
                        || chr(10) || 'Second ' || (mid % 7)
                        || ' tail.'
                        || CASE WHEN mid % 4 = 3 THEN chr(10)
                           || 'Alt plain ' || mid || '.' ELSE '' END)
                      END AS text_md5,
                 NOT (mid % 41 = 0 OR mid % 29 = 0) AS ok
          FROM et),
        r2 AS (
          SELECT m, k + 1 AS msg_no, 1 AS n_text_parts,
                 md5('quote ' || m) AS subject_md5,
                 md5('Begin' || chr(10) || 'From here ' || m
                   || chr(10) || 'End') AS text_md5,
                 TRUE AS ok
          FROM p WHERE NOT filebad)
        SELECT m AS media_id, CAST(msg_no AS INT) AS msg_no,
               CAST(n_text_parts AS INT) AS n_text_parts,
               subject_md5, text_md5, ok
        FROM (SELECT * FROM fb UNION ALL SELECT * FROM r1
              UNION ALL SELECT * FROM r2)
        ORDER BY media_id, msg_no""")),

    // ------------------------------------------------------------------
    // q258: EPUB extraction ([[graft.ext.DocText.EpubExtract]]) —
    // ebook corpora are book-length, high-quality text behind three
    // indirection layers: the OCF mimetype entry, container.xml's
    // rootfile → the OPF package, and the OPF spine ordering
    // manifest hrefs. One row per SPINE chapter in READING order —
    // the spine is reversed against entry/name order at m%5, so a
    // zip-order walk emits the book backwards; a cover.xhtml sits in
    // the manifest but not the spine and must not leak; head/title
    // junk, inline markup, and entities ride each chapter's XHTML.
    // %41 ships the wrong mimetype, %29 a ghost spine idref, %31 a
    // rootfile-less container — all fail closed to one chapter_no=0
    // row.
    GraftQuery(
      "q258_epub_chapters",
      (spark, dir) => {
        DocText.extractEpub(epubFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("chapter_no"), col("n_blocks"),
            col("text_len"), col("text_md5"), col("ok"))
          .orderBy(col("media_id"), col("chapter_no"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 OR doc_id % 29 = 0
                   OR doc_id % 31 = 0 AS bad,
                 CAST(1 + doc_id % 3 AS INT) AS k
          FROM documents),
        r AS (
          SELECT m, bad, k,
                 unnest(range(1, CASE WHEN bad THEN 2 ELSE k + 1 END))
                   AS g
          FROM p),
        f AS (
          SELECT m, bad, CAST(g AS INT) AS g,
                 CASE WHEN m % 5 = 0 THEN k - g ELSE g - 1 END AS sc
          FROM r),
        t AS (
          SELECT m, bad, g, sc,
                 CAST(1 + (m + sc) % 3 AS INT) AS nl,
                 array_to_string(list_transform(
                   range(0, 1 + (m + sc) % 3),
                   l -> 'Ch ' || sc || '.' || l || ' of ' || m
                     || ' & more'), chr(10)) AS txt
          FROM f)
        SELECT m AS media_id,
               CAST(CASE WHEN bad THEN 0 ELSE g END AS INT)
                 AS chapter_no,
               CAST(CASE WHEN bad THEN 0 ELSE nl END AS INT)
                 AS n_blocks,
               CAST(CASE WHEN bad THEN 0 ELSE length(txt) END AS BIGINT)
                 AS text_len,
               CASE WHEN bad THEN '' ELSE md5(txt) END AS text_md5,
               NOT bad AS ok
        FROM t ORDER BY media_id, chapter_no"""))
  )
}
