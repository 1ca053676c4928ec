package graft.ext

import org.apache.spark.sql.Dataset

/** Native document TEXT extraction — the one Docling capability the
  * engine can reproduce offline (the reference's entire purpose is
  * converting PDF/DOCX to text via an external HTTP service,
  * camel/file-pipeline.yaml:124-167; q173/q174 already parse the
  * METADATA of both formats, this module extracts the words). Two
  * restricted-profile parsers, both fail-closed (None on any
  * construct outside the profile — never a silently truncated or
  * garbled text):
  *
  * PDF (ISO 32000-1): walk `<< dict >> stream … endstream` objects
  * using the dict's `/Length` — direct integer, or (r16) an indirect
  * `N G R` resolved against the file's direct-integer objects —
  * length-skip TYPED streams (`/Type`//`/Subtype` in the dict: XRef,
  * ObjStm, FontFile, Image, Metadata — binary by design, never page
  * content; §7.5.7 guarantees no content stream hides inside an
  * object stream), decode typeless streams through their `/Filter`
  * chain — FlateDecode (zlib) and ASCIIHexDecode, singly or in
  * arrays like `[/ASCIIHexDecode /FlateDecode]` (r17) — or take
  * plain bytes, then interpret the content-stream text operators:
  * literal strings `(…)` with the full escape set (\n \r \t \b \f
  * \( \) \\ \ooo, backslash-EOL continuation, balanced unescaped
  * parens), hex strings `<…>` (even/odd-nibble rule, interior
  * whitespace tolerated — widened in r16, VERDICT item 5), shown by
  * `Tj`, array-`TJ` (string elements concatenated, kern numbers
  * skipped), and the `'`/`"` next-line forms (leading newline).
  * Unresolvable indirect lengths, filters beyond Flate/ASCIIHex on
  * typeless streams, inline dicts in content, and shows outside
  * BT/ET are profile violations. Byte→char mapping is
  * ISO-8859-1 (WinAnsi and Standard encoding agree with it on the
  * printable ASCII the profile targets). Streams are joined with
  * `\n`; intra-block positioning (Td/TD/Tm/T*) is deliberately NOT
  * rendered as line structure — that is layout reconstruction, out
  * of profile.
  *
  * DOCX (ECMA-376): locate the ZIP central directory (the q174
  * walk), find `word/document.xml`, read its LOCAL header, inflate
  * (method 8, raw deflate, exact input consumption) or slice
  * (method 0), verify CRC32 and size against the central directory,
  * then walk the XML: `<w:p>` opens a paragraph (joined with `\n`),
  * `<w:t>` runs contribute text with the five XML entities decoded
  * (`&amp; &lt; &gt; &quot; &apos;` — anything else entity-shaped is
  * a violation), and in-run `<w:br/>`/`<w:cr/>`/`<w:tab/>` render as
  * `\n`/`\n`/`\t` (r17). Missing `word/document.xml` is a violation:
  * a conformant DOCX must carry the main document part.
  *
  * Scale shape: both extractions are map-side per-document kernels —
  * O(bytes) work, no shuffle; the parallelism unit is the document,
  * same as the q216 archive discipline.
  */
object DocText {

  // ------------------------------------------------------------------
  // shared
  // ------------------------------------------------------------------

  private[ext] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Strict UTF-8 decode from `from` to the end: None on any
    * malformed or unmappable sequence (REPORT mode), never a silent
    * U+FFFD substitution — the fail-closed contract of
    * [[extractAnyText]]'s html/txt arms (ADVICE r15).
    */
  private[ext] def decodeUtf8Strict(b: Array[Byte], from: Int)
      : Option[String] = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(
      java.nio.ByteBuffer.wrap(b, from, b.length - from)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Strict UTF-16 decode (BOM-directed endianness, BOM stripped):
    * None on malformed input — the [[extractAnyText]] UTF-16 arm
    * (r16: a UTF-16 payload previously failed the UTF-8 strict
    * decode and was dropped, though real exports routinely ship it).
    */
  private[ext] def decodeUtf16Strict(b: Array[Byte]): Option[String] = {
    val dec = java.nio.charset.StandardCharsets.UTF_16.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** zlib-wrapped inflate, all-or-nothing with an output cap. */
  private def inflateZlib(data: Array[Byte], cap: Int)
      : Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return None
        } else {
          out.write(buf, 0, n)
          if (out.size > cap) return None
        }
      }
      Some(out.toByteArray)
    } finally inf.end()
  }

  // ------------------------------------------------------------------
  // PDF
  // ------------------------------------------------------------------

  final case class PdfText(
      media_id: Long,
      mime: String,
      n_streams: Int,
      n_text_ops: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  object PdfTextExtract {
    private val outputCap = 1 << 24

    /** (nContentStreams, nTextOps, text), or None on any profile
      * violation. Two r16 widenings toward the real-world corpus
      * (VERDICT r15 "what's missing" #3): indirect `/Length N G R`
      * resolves against the file's direct-integer objects (the form
      * every real writer gives Flate stream lengths), and TYPED
      * streams — any stream whose dict carries `/Type` or `/Subtype`
      * (XRef and ObjStm cross-reference/object streams, FontFile
      * programs, Image XObjects, Metadata) — are length-skipped
      * instead of tokenized: they are binary by design and are not
      * page content (content streams are the TYPELESS ones; object
      * streams cannot contain stream objects, so no content hides
      * inside them — ISO 32000-1 §7.5.7). A typeless stream must
      * still tokenize cleanly; unresolvable lengths fail closed.
      *
      * r17 widening (VERDICT r16 item 1): a `/Length` target that is
      * not a direct-integer object is looked up in the file's OBJECT
      * STREAMS (`/Type /ObjStm` — where post-2010 writers put the
      * whole object table). Resolution precedence: direct-integer
      * objects shadow ObjStm-resident ones (object streams are only
      * consulted on a direct miss); within each class, the later
      * file-offset definition wins (incremental updates append).
      * Because a single malformed object stream could shadow ANY
      * object, the ObjStm pass is all-or-nothing: once consulted, a
      * truncated or unparseable ObjStm fails the whole document
      * closed.
      */
    def parse(b: Array[Byte]): Option[(Int, Int, String)] =
      parseR(b).toOption

    /** [[parse]] with a stable failure-REASON code on the Left — the
      * vocabulary the extraction-coverage census (q243) reports:
      * pdf_magic, pdf_no_eof, pdf_stream_dict, pdf_no_length,
      * pdf_length_unresolved, pdf_objstm_malformed, pdf_stream_bounds,
      * pdf_filter_unsupported, pdf_decode_error, pdf_content_profile.
      */
    def parseR(b: Array[Byte]): Either[String, (Int, Int, String)] = {
      if (b == null || b.length < 16) return Left("pdf_magic")
      // ISO-8859-1 is byte-transparent: char offsets == byte offsets
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("%PDF-")) return Left("pdf_magic")
      if (!s.contains("%%EOF")) return Left("pdf_no_eof")
      // lazily-built object tables (only a file that actually uses an
      // indirect /Length pays the extra scans; object streams are
      // inflated only when a direct lookup misses)
      var ints: Map[Int, Int] = null
      var stmInts: Option[Map[Int, Int]] = null
      var cursor = 0
      var nStreams = 0
      var nOps = 0
      val text = new StringBuilder
      var found = true
      while (found) {
        val at = s.indexOf("stream", cursor)
        if (at < 0) found = false
        else {
          // a stream KEYWORD follows its dict's ">>" (possibly with
          // whitespace); "endstream" never qualifies (preceded by 'd')
          var q = at - 1
          while (q >= 0 && (s(q) == ' ' || s(q) == '\r' || s(q) == '\n' ||
            s(q) == '\t')) q -= 1
          if (q < 1 || s(q) != '>' || s(q - 1) != '>') cursor = at + 6
          else {
            val dict = dictBefore(s, q - 1) match {
              case Some(d) => d
              case None => return Left("pdf_stream_dict")
            }
            val len = directLength(dict) match {
              case Some(l) => l
              case None =>
                indirectLengthRef(dict) match {
                  case Some(obj) =>
                    if (ints == null) ints = intObjects(s, b.length)
                    ints.get(obj) match {
                      case Some(l) => l
                      case None =>
                        // direct miss → consult the object streams
                        if (stmInts == null)
                          stmInts = objStmObjects(s, b, ints)
                        stmInts match {
                          case Some(m2) => m2.get(obj) match {
                            case Some(l) => l
                            case None => // truly undefined
                              return Left("pdf_length_unresolved")
                          }
                          case None => // malformed ObjStm
                            return Left("pdf_objstm_malformed")
                        }
                    }
                  case None => return Left("pdf_no_length")
                }
            }
            // data starts after the keyword's EOL (CRLF or LF)
            var dataAt = at + 6
            if (dataAt < s.length && s(dataAt) == '\r') dataAt += 1
            if (dataAt >= s.length || s(dataAt) != '\n')
              return Left("pdf_stream_bounds")
            dataAt += 1
            if (dataAt + len > b.length || len < 0)
              return Left("pdf_stream_bounds")
            var after = dataAt + len
            if (after < s.length && s(after) == '\r') after += 1
            if (after < s.length && s(after) == '\n') after += 1
            if (!s.startsWith("endstream", after))
              return Left("pdf_stream_bounds")
            if (hasName(dict, "/Type") || hasName(dict, "/Subtype")) {
              // typed stream: structural/binary, never page text —
              // skip its (length-verified) payload wholesale
              cursor = after + 9
            } else {
              val raw =
                java.util.Arrays.copyOfRange(b, dataAt, dataAt + len)
              val content = filterOf(dict) match {
                case Right(fs) => decodeChain(raw, fs) match {
                  case Some(x) => x
                  case None => return Left("pdf_decode_error")
                }
                case Left(()) => return Left("pdf_filter_unsupported")
              }
              tokenizeContent(new String(content, "ISO-8859-1")) match {
                case Some((ops, t)) =>
                  if (nStreams > 0) text.append('\n')
                  text.append(t)
                  nStreams += 1
                  nOps += ops
                case None => return Left("pdf_content_profile")
              }
              cursor = after + 9
            }
          }
        }
      }
      Right((nStreams, nOps, text.toString))
    }

    // ----------------------------------------------------------------
    // page-tree-ordered extraction (r17/q251)
    // ----------------------------------------------------------------

    /** Per-page (nTextOps, text) in PAGE-TREE order — the document
      * order a reader sees, which is NOT the file order [[parseR]]
      * scans (writers append updated objects, split content across
      * parts, and leave orphan streams behind). The trailer's `/Root`
      * (last trailer dict defining one wins — incremental updates
      * append) leads to `/Type /Catalog` → `/Pages` → a `/Type
      * /Pages` tree whose `/Kids` arrays are walked depth-first in
      * order; each `/Type /Page` leaf contributes one page. A page's
      * `/Contents` may be a single ref, an ARRAY of refs — the parts
      * concatenate (newline-joined) into ONE logical stream before
      * tokenizing, so a BT...ET may span parts (§7.8.2) — or absent
      * (an empty page). Page-tree objects must be DIRECT objects
      * (a page tree living inside an ObjStm is out of profile —
      * documented cut); content-stream `/Length`s resolve through
      * the full direct → ObjStm machinery. Fail-closed reasons
      * extend [[parseR]]'s vocabulary with `pdf_no_root` (no
      * resolvable trailer /Root) and `pdf_page_tree` (missing or
      * non-Page/Pages node, empty or malformed /Kids, a ref cycle,
      * depth over 32, or a /Contents target without a stream).
      */
    def parsePagesR(b: Array[Byte])
        : Either[String, Vector[(Int, String)]] = {
      if (b == null || b.length < 16) return Left("pdf_magic")
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("%PDF-")) return Left("pdf_magic")
      if (!s.contains("%%EOF")) return Left("pdf_no_eof")
      val ranges = directPayloadRanges(s, b.length)
      def inPayload(at: Int): Boolean = {
        var i = 0
        while (i < ranges.length && ranges(i)._1 <= at) {
          if (at < ranges(i)._2) return true
          i += 1
        }
        false
      }
      // index just after the LAST top-level `n 0 obj` header (later
      // definitions win — incremental updates append)
      def objAfter(n: Int): Option[Int] = {
        val pat = s"$n 0 obj"
        var at = s.indexOf(pat)
        var best = -1
        while (at >= 0) {
          val preOk = at == 0 || {
            val c = s(at - 1)
            !c.isDigit && (isPdfWs(c) || "/()[]<>".contains(c))
          }
          val end = at + pat.length
          val postOk = end >= s.length || isPdfWs(s(end)) ||
            "/()[]<>".contains(s(end))
          if (preOk && postOk && !inPayload(at)) best = at
          at = s.indexOf(pat, at + 1)
        }
        if (best < 0) None else Some(best + pat.length)
      }
      // object body: up to endobj, cut at a stream keyword (dict part)
      def bodyOf(n: Int): Option[String] = objAfter(n).map { from =>
        val endO = s.indexOf("endobj", from)
        val to = if (endO < 0) s.length else endO
        val stK = s.indexOf("stream", from)
        s.substring(from, if (stK >= 0 && stK < to) stK else to)
      }
      // the last trailer dict that defines /Root wins
      var root = -1
      var tAt = s.indexOf("trailer")
      while (tAt >= 0) {
        if (!inPayload(tAt)) {
          val end0 = s.indexOf("startxref", tAt)
          val end = if (end0 < 0) s.length else end0
          namedRef(s.substring(tAt + 7, end), "/Root")
            .foreach(r => root = r)
        }
        tAt = s.indexOf("trailer", tAt + 7)
      }
      if (root < 0) return Left("pdf_no_root")
      val cat = bodyOf(root) match {
        case Some(x) => x
        case None => return Left("pdf_no_root")
      }
      val pagesRoot = namedRef(cat, "/Pages") match {
        case Some(p) => p
        case None => return Left("pdf_page_tree")
      }
      val pageContents = Vector.newBuilder[(List[Int], String)]
      val visited = scala.collection.mutable.HashSet.empty[Int]
      def walk(n: Int, depth: Int): Boolean = {
        if (depth > 32 || !visited.add(n)) return false
        bodyOf(n) match {
          case None => false
          case Some(body) => nameValue(body, "/Type") match {
            case Some("Pages") => namedRefs(body, "/Kids") match {
              case Some(kids) if kids.nonEmpty =>
                kids.forall(walk(_, depth + 1))
              case _ => false
            }
            case Some("Page") =>
              if (keyIndex(body, "/Contents") < 0) {
                pageContents += ((Nil, body)) // no content: legal
                true
              } else namedRefs(body, "/Contents") match {
                case Some(cs) if cs.nonEmpty =>
                  pageContents += ((cs, body)); true
                case _ => false
              }
            case _ => false
          }
        }
      }
      if (!walk(pagesRoot, 0)) return Left("pdf_page_tree")
      // shared lazy length tables (same machinery as parseR)
      var ints: Map[Int, Int] = null
      var stmInts: Option[Map[Int, Int]] = null
      def streamContent(cn: Int): Either[String, Array[Byte]] = {
        val from = objAfter(cn) match {
          case Some(x) => x
          case None => return Left("pdf_page_tree")
        }
        val at = s.indexOf("stream", from)
        val endO = s.indexOf("endobj", from)
        if (at < 0 || (endO >= 0 && endO < at))
          return Left("pdf_page_tree") // /Contents target: no stream
        var q = at - 1
        while (q >= 0 && (s(q) == ' ' || s(q) == '\r' || s(q) == '\n' ||
          s(q) == '\t')) q -= 1
        if (q < 1 || s(q) != '>' || s(q - 1) != '>')
          return Left("pdf_stream_dict")
        val dict = dictBefore(s, q - 1) match {
          case Some(d) => d
          case None => return Left("pdf_stream_dict")
        }
        if (hasName(dict, "/Type") || hasName(dict, "/Subtype"))
          return Left("pdf_content_profile") // typed stream as content
        val len = directLength(dict) match {
          case Some(l) => l
          case None => indirectLengthRef(dict) match {
            case Some(obj) =>
              if (ints == null) ints = intObjects(s, b.length)
              ints.get(obj) match {
                case Some(l) => l
                case None =>
                  if (stmInts == null) stmInts = objStmObjects(s, b, ints)
                  stmInts match {
                    case Some(m2) => m2.get(obj) match {
                      case Some(l) => l
                      case None => return Left("pdf_length_unresolved")
                    }
                    case None => return Left("pdf_objstm_malformed")
                  }
              }
            case None => return Left("pdf_no_length")
          }
        }
        var dataAt = at + 6
        if (dataAt < s.length && s(dataAt) == '\r') dataAt += 1
        if (dataAt >= s.length || s(dataAt) != '\n')
          return Left("pdf_stream_bounds")
        dataAt += 1
        if (dataAt + len > b.length || len < 0)
          return Left("pdf_stream_bounds")
        var after = dataAt + len
        if (after < s.length && s(after) == '\r') after += 1
        if (after < s.length && s(after) == '\n') after += 1
        if (!s.startsWith("endstream", after))
          return Left("pdf_stream_bounds")
        val raw = java.util.Arrays.copyOfRange(b, dataAt, dataAt + len)
        filterOf(dict) match {
          case Right(fs) => decodeChain(raw, fs) match {
            case Some(x) => Right(x)
            case None => Left("pdf_decode_error")
          }
          case Left(()) => Left("pdf_filter_unsupported")
        }
      }
      // r17/q256: page /Resources → /Font → per-font /ToUnicode CMaps
      // (inline dicts or indirect refs at every level; fonts without
      // a CMap are identity; font objects memoized across pages)
      val fontMemo = scala.collection.mutable.HashMap
        .empty[Int, Either[String, Option[ToUnicodeMap]]]
      def fontMapOf(ref: Int): Either[String, Option[ToUnicodeMap]] =
        fontMemo.getOrElseUpdate(ref, {
          bodyOf(ref) match {
            case None => Left("pdf_page_tree")
            case Some(fb) => namedRef(fb, "/ToUnicode") match {
              case None => Right(None) // no CMap: identity font
              case Some(tref) => streamContent(tref) match {
                case Right(bytes) =>
                  parseToUnicode(new String(bytes, "ISO-8859-1")) match {
                    case Some(m2) => Right(Some(m2))
                    case None => Left("pdf_cmap_malformed")
                  }
                case Left(e) => Left(e)
              }
            }
          }
        })
      def fontsOf(pageBody: String)
          : Either[String, Map[String, Option[ToUnicodeMap]]] = {
        def subDict(body: String, key: String)
            : Either[String, Option[String]] =
          dictValueOf(body, key) match {
            case Some(d) => Right(Some(d))
            case None => namedRef(body, key) match {
              case Some(ref) => bodyOf(ref) match {
                case Some(b2) => Right(Some(b2))
                case None => Left("pdf_page_tree")
              }
              case None =>
                // key present but neither dict nor ref: malformed
                if (keyIndex(body, key) >= 0) Left("pdf_page_tree")
                else Right(None)
            }
          }
        val res = subDict(pageBody, "/Resources") match {
          case Right(Some(r)) => r
          case Right(None) => return Right(Map.empty)
          case Left(e) => return Left(e)
        }
        val fd = subDict(res, "/Font") match {
          case Right(Some(f)) => f
          case Right(None) => return Right(Map.empty)
          case Left(e) => return Left(e)
        }
        val out2 = Map.newBuilder[String, Option[ToUnicodeMap]]
        var k = 0
        while (k < fd.length) {
          if (fd(k) == '/') {
            var e = k + 1
            while (e < fd.length && !isPdfWs(fd(e)) &&
              !"/()[]<>".contains(fd(e))) e += 1
            val nm = fd.substring(k + 1, e)
            parseRefAt(fd, e) match {
              case Some((ref, after)) =>
                fontMapOf(ref) match {
                  case Right(x) => out2 += (nm -> x)
                  case Left(err) => return Left(err)
                }
                k = after
              case None => return Left("pdf_page_tree")
            }
          } else k += 1
        }
        Right(out2.result())
      }
      val out = Vector.newBuilder[(Int, String)]
      val pages = pageContents.result()
      var pi = 0
      while (pi < pages.length) {
        val parts = new StringBuilder
        var ci = 0
        val (cs, pageBody) = pages(pi)
        while (ci < cs.length) {
          streamContent(cs(ci)) match {
            case Right(x) =>
              if (ci > 0) parts.append('\n')
              parts.append(new String(x, "ISO-8859-1"))
            case Left(e) => return Left(e)
          }
          ci += 1
        }
        val fonts = fontsOf(pageBody) match {
          case Right(f) => f
          case Left(e) => return Left(e)
        }
        tokenizeContent(parts.toString, fonts) match {
          case Some((ops, t)) => out += ((ops, t))
          case None => return Left("pdf_content_profile")
        }
        pi += 1
      }
      Right(out.result())
    }

    /** The balanced `<< … >>` dict VALUE of `key` (inner text), or
      * None when the value is not an inline dict.
      */
    private def dictValueOf(body: String, key: String)
        : Option[String] = {
      val at = keyIndex(body, key)
      if (at < 0) return None
      var j = at + key.length
      while (j < body.length && isPdfWs(body(j))) j += 1
      if (j + 1 >= body.length || body(j) != '<' || body(j + 1) != '<')
        return None
      val st = j
      var d = 0
      while (j + 1 < body.length) {
        if (body(j) == '<' && body(j + 1) == '<') { d += 1; j += 2 }
        else if (body(j) == '>' && body(j + 1) == '>') {
          d -= 1; j += 2
          if (d == 0) return Some(body.substring(st + 2, j - 2))
        } else j += 1
      }
      None
    }

    // ----------------------------------------------------------------
    // ToUnicode CMaps (r17/q256)
    // ----------------------------------------------------------------

    /** A font's /ToUnicode character map: glyph code → text. `single`
      * holds bfchar (and array-form bfrange) entries; `ranges` holds
      * increment-form bfranges as (lo, hi, dstBase) where the BASE
      * string's last UTF-16 unit increments with the code offset
      * (the CMap spec's rule).
      */
    final case class ToUnicodeMap(
        codeBytes: Int,
        single: Map[Int, String],
        ranges: Vector[(Int, Int, String)]) {
      def lookup(code: Int): Option[String] =
        single.get(code).orElse {
          ranges.collectFirst { case (lo, hi, base)
            if code >= lo && code <= hi =>
            base.dropRight(1) +
              (base.last + (code - lo)).toChar
          }
        }
    }

    /** Parse a decoded /ToUnicode CMap stream (PDF 32000-1 §9.10.3):
      * one codespacerange fixing the code width (1 or 2 bytes —
      * Identity-H fonts are 2), bfchar pairs, bfrange triples in both
      * the increment form and the array form; destination hex is
      * UTF-16BE (multi-unit destinations — ligatures — supported).
      * PostScript scaffolding tokens are skipped. Mixed code widths,
      * a missing codespacerange, odd destination hex, or a src of the
      * wrong width fail closed.
      */
    private[ext] def parseToUnicode(t: String): Option[ToUnicodeMap] = {
      // tokenizer: hex strings, brackets, bare words/numbers
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        val c = t(i)
        if (isPdfWs(c)) i += 1
        else if (c == '<') {
          val end = t.indexOf('>', i + 1)
          if (end < 0) return None
          toks += t.substring(i, end + 1)
          i = end + 1
        } else if (c == '[' || c == ']') { toks += c.toString; i += 1 }
        else {
          val st = i
          while (i < t.length && !isPdfWs(t(i)) && t(i) != '<' &&
            t(i) != '[' && t(i) != ']') i += 1
          toks += t.substring(st, i)
        }
      }
      def hexBytes(tok: String): Option[Array[Int]] = {
        if (tok.length < 2 || tok.head != '<' || tok.last != '>')
          return None
        val h = tok.substring(1, tok.length - 1)
        if (h.length % 2 != 0) return None
        val out = new Array[Int](h.length / 2)
        var k = 0
        while (k < out.length) {
          val hi = Character.digit(h(2 * k), 16)
          val lo = Character.digit(h(2 * k + 1), 16)
          if (hi < 0 || lo < 0) return None
          out(k) = (hi << 4) | lo
          k += 1
        }
        Some(out)
      }
      def codeOf(b: Array[Int], width: Int): Option[Int] =
        if (b.length != width) None
        else Some(b.foldLeft(0)((a, x) => (a << 8) | x))
      def utf16(b: Array[Int]): Option[String] = {
        if (b.length % 2 != 0 || b.isEmpty) return None
        val sb = new StringBuilder
        var k = 0
        while (k < b.length) {
          sb.append(((b(k) << 8) | b(k + 1)).toChar)
          k += 2
        }
        Some(sb.toString)
      }
      var width = 0
      val single = Map.newBuilder[Int, String]
      val ranges = Vector.newBuilder[(Int, Int, String)]
      var p = 0
      while (p < toks.length) {
        toks(p) match {
          case "begincodespacerange" =>
            p += 1
            while (p < toks.length &&
              toks(p) != "endcodespacerange") {
              if (p + 1 >= toks.length) return None
              val lo = hexBytes(toks(p)).getOrElse(return None)
              val hi = hexBytes(toks(p + 1)).getOrElse(return None)
              if (lo.length != hi.length ||
                (lo.length != 1 && lo.length != 2)) return None
              if (width == 0) width = lo.length
              else if (width != lo.length) return None // mixed widths
              p += 2
            }
            if (p >= toks.length) return None
            p += 1
          case "beginbfchar" =>
            if (width == 0) return None
            p += 1
            while (p < toks.length && toks(p) != "endbfchar") {
              if (p + 1 >= toks.length) return None
              val src = hexBytes(toks(p))
                .flatMap(codeOf(_, width)).getOrElse(return None)
              val dst = hexBytes(toks(p + 1)).flatMap(utf16)
                .getOrElse(return None)
              single += (src -> dst)
              p += 2
            }
            if (p >= toks.length) return None
            p += 1
          case "beginbfrange" =>
            if (width == 0) return None
            p += 1
            while (p < toks.length && toks(p) != "endbfrange") {
              if (p + 2 >= toks.length) return None
              val lo = hexBytes(toks(p))
                .flatMap(codeOf(_, width)).getOrElse(return None)
              val hi = hexBytes(toks(p + 1))
                .flatMap(codeOf(_, width)).getOrElse(return None)
              if (hi < lo) return None
              if (toks(p + 2) == "[") {
                var q = p + 3
                var code = lo
                while (q < toks.length && toks(q) != "]") {
                  val dst = hexBytes(toks(q)).flatMap(utf16)
                    .getOrElse(return None)
                  if (code > hi) return None // more dsts than codes
                  single += (code -> dst)
                  code += 1
                  q += 1
                }
                if (q >= toks.length || code != hi + 1) return None
                p = q + 1
              } else {
                val base = hexBytes(toks(p + 2)).flatMap(utf16)
                  .getOrElse(return None)
                ranges += ((lo, hi, base))
                p += 3
              }
            }
            if (p >= toks.length) return None
            p += 1
          case _ => p += 1 // PostScript scaffolding: skipped
        }
      }
      if (width == 0) None
      else Some(ToUnicodeMap(width, single.result(), ranges.result()))
    }

    /** First delimiter-terminated occurrence of dict key `key`, or
      * -1 (`/Length` never matches `/Length1` — the q232 lesson).
      */
    private def keyIndex(body: String, key: String): Int = {
      var at = body.indexOf(key)
      while (at >= 0) {
        val end = at + key.length
        if (end >= body.length || isPdfWs(body(end)) ||
          "/()[]<>".contains(body(end))) return at
        at = body.indexOf(key, at + 1)
      }
      -1
    }

    /** Parse `N G R` starting at `j0` (leading whitespace allowed):
      * (objnum, indexAfterR), or None.
      */
    private def parseRefAt(body: String, j0: Int): Option[(Int, Int)] = {
      var j = j0
      while (j < body.length && isPdfWs(body(j))) j += 1
      val s1 = j
      while (j < body.length && body(j).isDigit) j += 1
      if (j == s1 || j - s1 > 9) return None
      val num = body.substring(s1, j).toInt
      var k = j
      while (k < body.length && isPdfWs(body(k))) k += 1
      val s2 = k
      while (k < body.length && body(k).isDigit) k += 1
      if (k == s2 || k - s2 > 5) return None
      var r = k
      while (r < body.length && isPdfWs(body(r))) r += 1
      if (r >= body.length || body(r) != 'R') return None
      val after = r + 1
      if (after < body.length && !isPdfWs(body(after)) &&
        !"/()[]<>".contains(body(after))) return None
      Some((num, after))
    }

    /** The ref value `/Key N G R`, or None. */
    private[ext] def namedRef(body: String, key: String): Option[Int] = {
      val at = keyIndex(body, key)
      if (at < 0) None
      else parseRefAt(body, at + key.length).map(_._1)
    }

    /** `/Key [ N G R … ]` (possibly empty) or the single-ref form. */
    private[ext] def namedRefs(body: String, key: String)
        : Option[List[Int]] = {
      val at = keyIndex(body, key)
      if (at < 0) return None
      var j = at + key.length
      while (j < body.length && isPdfWs(body(j))) j += 1
      if (j < body.length && body(j) == '[') {
        j += 1
        val acc = List.newBuilder[Int]
        while (j < body.length) {
          var k = j
          while (k < body.length && isPdfWs(body(k))) k += 1
          if (k >= body.length) return None
          if (body(k) == ']') return Some(acc.result())
          parseRefAt(body, k) match {
            case Some((n2, after)) => acc += n2; j = after
            case None => return None
          }
        }
        None
      } else parseRefAt(body, j).map(p => List(p._1))
    }

    /** Name value of dict key `key` (`/Type /Page` → "Page"). */
    private[ext] def nameValue(body: String, key: String)
        : Option[String] = {
      val at = keyIndex(body, key)
      if (at < 0) return None
      var j = at + key.length
      while (j < body.length && isPdfWs(body(j))) j += 1
      if (j >= body.length || body(j) != '/') return None
      j += 1
      val st = j
      while (j < body.length && !isPdfWs(body(j)) &&
        !"/()[]<>".contains(body(j))) j += 1
      if (j > st) Some(body.substring(st, j)) else None
    }

    /** The payload ranges `[dataAt, dataAt+len)` of every stream whose
      * `/Length` is a DIRECT integer — knowable without any object
      * resolution, so the integer-object scan can exclude them
      * (ADVICE r16: payload bytes that happen to spell
      * `N G obj M endobj` must not shadow a real length object).
      * Indirect-length payloads are not knowable at this stage; for
      * those the endstream re-check in [[parse]] remains the
      * fail-closed backstop against a payload-injected wrong length.
      */
    private def directPayloadRanges(s: String, bLen: Int)
        : Array[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var cursor = 0
      var go = true
      while (go) {
        val at = s.indexOf("stream", cursor)
        if (at < 0) go = false
        else {
          var q = at - 1
          while (q >= 0 && (s(q) == ' ' || s(q) == '\r' || s(q) == '\n' ||
            s(q) == '\t')) q -= 1
          if (q < 1 || s(q) != '>' || s(q - 1) != '>') cursor = at + 6
          else {
            val range = for {
              dict <- dictBefore(s, q - 1)
              len <- directLength(dict)
            } yield {
              var dataAt = at + 6
              if (dataAt < s.length && s(dataAt) == '\r') dataAt += 1
              if (dataAt < s.length && s(dataAt) == '\n') dataAt += 1
              (dataAt, dataAt + len)
            }
            range match {
              case Some((from, to)) if to <= bLen && to > from =>
                out += ((from, to)); cursor = to
              case _ => cursor = at + 6
            }
          }
        }
      }
      out.toArray
    }

    /** All direct-integer objects `N G obj <int> endobj` — the form
      * real writers give out-of-line stream lengths. One linear scan,
      * SKIPPING matches that start inside a direct-length stream
      * payload (ADVICE r16); later definitions win
      * (incremental-update files append).
      */
    private[ext] def intObjects(s: String, bLen: Int): Map[Int, Int] = {
      val ranges = directPayloadRanges(s, bLen)
      val re = ("""(?s)(?<![0-9])([0-9]{1,9})[ \t\r\n]+[0-9]{1,5}""" +
        """[ \t\r\n]+obj[ \t\r\n]+([0-9]{1,9})[ \t\r\n]*endobj""").r
      var ri = 0 // ranges and match starts are both ascending
      re.findAllMatchIn(s).filter { m =>
        while (ri < ranges.length && ranges(ri)._2 <= m.start) ri += 1
        !(ri < ranges.length && m.start >= ranges(ri)._1)
      }.map(m => m.group(1).toInt -> m.group(2).toInt).toMap
    }

    /** Direct non-negative integer value of a dict `key`
      * (delimiter-terminated name, same discipline as
      * [[directLength]]); None when absent, non-integer, or indirect.
      */
    private def namedInt(dict: String, key: String): Option[Int] = {
      var at = dict.indexOf(key)
      while (at >= 0 && at + key.length < dict.length &&
        !isPdfWs(dict(at + key.length)))
        at = dict.indexOf(key, at + 1)
      if (at < 0) return None
      var j = at + key.length
      while (j < dict.length && isPdfWs(dict(j))) j += 1
      val start = j
      while (j < dict.length && dict(j).isDigit) j += 1
      if (j == start || j - start > 9) return None
      Some(dict.substring(start, j).toInt)
    }

    /** True when dict's `/Type` name value is `/ObjStm`. */
    private def isObjStm(dict: String): Boolean = {
      var at = dict.indexOf("/Type")
      while (at >= 0) {
        val end = at + 5
        if (end < dict.length && (isPdfWs(dict(end)) ||
          dict(end) == '/')) {
          var j = end
          while (j < dict.length && isPdfWs(dict(j))) j += 1
          if (dict.startsWith("/ObjStm", j)) {
            val e2 = j + 7
            return e2 >= dict.length || isPdfWs(dict(e2)) ||
              "/()[]<>".contains(dict(e2))
          }
          return false
        }
        at = dict.indexOf("/Type", at + 1)
      }
      false
    }

    /** Integer objects living inside `/Type /ObjStm` object streams —
      * where post-2010 writers keep the whole object table
      * (ISO 32000-1 §7.5.7: `/N` objects, pair table
      * `objnum offset …` before `/First`, offsets relative to it).
      * Some(map) with later-file-offset definitions winning; None
      * when ANY object stream is malformed (truncated payload, bad
      * pair table, unsupported filter, unresolvable own length) —
      * all-or-nothing, because a broken ObjStm could shadow any
      * object. Non-integer member objects (dicts, arrays, …) are
      * skipped: only integers can be /Length targets. An ObjStm's own
      * /Length must resolve directly (or from `direct`) — nesting the
      * length of one object stream inside another is out of profile.
      */
    private[ext] def objStmObjects(s: String, b: Array[Byte],
                                   direct: Map[Int, Int])
        : Option[Map[Int, Int]] = {
      val acc = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      var cursor = 0
      var go = true
      while (go) {
        val at = s.indexOf("stream", cursor)
        if (at < 0) go = false
        else {
          var q = at - 1
          while (q >= 0 && (s(q) == ' ' || s(q) == '\r' || s(q) == '\n' ||
            s(q) == '\t')) q -= 1
          if (q < 1 || s(q) != '>' || s(q - 1) != '>') cursor = at + 6
          else dictBefore(s, q - 1) match {
            case None => cursor = at + 6
            case Some(dict) if !isObjStm(dict) => cursor = at + 6
            case Some(dict) =>
              val len = directLength(dict).orElse(
                indirectLengthRef(dict).flatMap(direct.get)) match {
                case Some(l) => l
                case None => return None
              }
              var dataAt = at + 6
              if (dataAt < s.length && s(dataAt) == '\r') dataAt += 1
              if (dataAt >= s.length || s(dataAt) != '\n') return None
              dataAt += 1
              if (len < 0 || dataAt + len > b.length) return None
              val raw =
                java.util.Arrays.copyOfRange(b, dataAt, dataAt + len)
              val payload = filterOf(dict) match {
                case Right(fs) => decodeChain(raw, fs) match {
                  case Some(x) => x
                  case None => return None // truncated/corrupt: closed
                }
                case Left(()) => return None // unsupported filter
              }
              val n = namedInt(dict, "/N") match {
                case Some(v) => v
                case None => return None
              }
              val first = namedInt(dict, "/First") match {
                case Some(v) => v
                case None => return None
              }
              if (first < 0 || first > payload.length || n < 0)
                return None
              val p = new String(payload, "ISO-8859-1")
              // pair table: exactly N (objnum, offset) integer pairs
              // in [0, first)
              val nums = new Array[Int](2 * n)
              var i = 0
              var k = 0
              while (k < 2 * n) {
                while (i < first && isPdfWs(p(i))) i += 1
                val st = i
                while (i < first && p(i).isDigit) i += 1
                if (i == st || i - st > 9) return None
                nums(k) = p.substring(st, i).toInt
                k += 1
              }
              // member objects: [first+off, next ascending off) slices
              val offs = Array.tabulate(n)(j => nums(2 * j + 1))
              var j = 0
              while (j < n) {
                val from = first + offs(j)
                if (from < first || from > payload.length) return None
                var to = payload.length
                var x = 0
                while (x < n) {
                  val o = first + offs(x)
                  if (o > from && o < to) to = o
                  x += 1
                }
                val body = p.substring(from, to).trim
                if (body.nonEmpty && body.length <= 9 &&
                  body.forall(_.isDigit))
                  acc(nums(2 * j)) = body.toInt
                j += 1
              }
              cursor = dataAt + len
          }
        }
      }
      Some(acc.toMap)
    }

    /** The object number of an indirect `/Length N G R`, or None. */
    private[ext] def indirectLengthRef(dict: String): Option[Int] = {
      var at = dict.indexOf("/Length")
      while (at >= 0 && at + 7 < dict.length && !isPdfWs(dict(at + 7)))
        at = dict.indexOf("/Length", at + 1)
      if (at < 0) return None
      var j = at + 7
      while (j < dict.length && isPdfWs(dict(j))) j += 1
      val start = j
      while (j < dict.length && dict(j).isDigit) j += 1
      if (j == start || j - start > 9) return None
      var k = j
      while (k < dict.length && isPdfWs(dict(k))) k += 1
      val kd = k
      while (k < dict.length && dict(k).isDigit) k += 1
      if (k == kd) return None
      while (k < dict.length && isPdfWs(dict(k))) k += 1
      if (k < dict.length && dict(k) == 'R')
        Some(dict.substring(start, j).toInt)
      else None
    }

    /** True when `key` appears as a NAME key (delimiter-terminated —
      * the /Length1 lesson applies to /Type vs /TypeX too).
      */
    private[ext] def hasName(dict: String, key: String): Boolean = {
      var at = dict.indexOf(key)
      while (at >= 0) {
        val end = at + key.length
        if (end >= dict.length || isPdfWs(dict(end)) || dict(end) == '/' ||
          dict(end) == '(' || dict(end) == '<' || dict(end) == '[' ||
          dict(end) == '>') return true
        at = dict.indexOf(key, at + 1)
      }
      false
    }

    /** The balanced `<< … >>` whose closing `>>` starts at `ggAt-1`
      * (i.e. `s(ggAt-1) == s(ggAt) == '>'`), scanned backward.
      */
    private def dictBefore(s: String, ggAt: Int): Option[String] = {
      var depth = 1
      var j = ggAt - 1
      while (j >= 1 && depth > 0) {
        if (s(j) == '>' && s(j - 1) == '>') { depth += 1; j -= 2 }
        else if (s(j) == '<' && s(j - 1) == '<') {
          depth -= 1
          if (depth == 0) return Some(s.substring(j - 1, ggAt + 1))
          j -= 2
        } else j -= 1
      }
      None
    }

    private def isPdfWs(c: Char): Boolean =
      c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' ||
        c == 0.toChar

    /** Direct-integer /Length, or None (absent or indirect `N 0 R`).
      * The key match requires a delimiter after "Length": font-stream
      * dicts routinely carry /Length1 //Length2 /Length3 keys, and a
      * bare indexOf would read one of those as THE stream length and
      * mis-slice instead of cleanly rejecting (ADVICE r15).
      */
    private def directLength(dict: String): Option[Int] = {
      var at = dict.indexOf("/Length")
      while (at >= 0 && at + 7 < dict.length && !isPdfWs(dict(at + 7)))
        at = dict.indexOf("/Length", at + 1)
      if (at < 0) return None
      var j = at + 7
      while (j < dict.length && isPdfWs(dict(j))) j += 1
      val start = j
      while (j < dict.length && dict(j).isDigit) j += 1
      if (j == start || j - start > 9) return None
      // indirect reference "12 0 R" — the digits must NOT be followed
      // by " <gen> R"
      var k = j
      while (k < dict.length && isPdfWs(dict(k))) k += 1
      val kd = k
      while (k < dict.length && dict(k).isDigit) k += 1
      if (k > kd) {
        while (k < dict.length && isPdfWs(dict(k))) k += 1
        if (k < dict.length && dict(k) == 'R') return None
      }
      Some(dict.substring(start, j).toInt)
    }

    /** The `/Filter` decode chain in APPLICATION order (ISO 32000-1
      * §7.4: a name or an array of names, applied first-to-last to
      * decode): Right(Nil) = no filter, Right(names) restricted to
      * FlateDecode / ASCIIHexDecode (r17 widening — chains like
      * `[/ASCIIHexDecode /FlateDecode]` are common in hand-assembled
      * and mail-gateway PDFs), Left(()) = any other name
      * (LZW/DCT/ASCII85/…) or a malformed value. */
    private def filterOf(dict: String): Either[Unit, List[String]] = {
      def name(from: Int): Option[(String, Int)] = {
        if (from >= dict.length || dict(from) != '/') return None
        var k = from + 1
        while (k < dict.length && !isPdfWs(dict(k)) &&
          !"/()[]<>".contains(dict(k))) k += 1
        if (k == from + 1) None else Some((dict.substring(from + 1, k), k))
      }
      def validate(ns: List[String]): Either[Unit, List[String]] =
        if (ns.nonEmpty && ns.forall(n =>
          n == "FlateDecode" || n == "ASCIIHexDecode" ||
          n == "ASCII85Decode" || n == "LZWDecode")) Right(ns)
        else Left(())
      // decode parameters change the byte semantics (Flate/LZW
      // Predictor row filters, LZW EarlyChange 0) — a dict carrying
      // them on a stream we would DECODE is out of profile; typed
      // streams (q234's XRef + Predictor) are length-skipped before
      // any filter runs and never reach here
      if (dict.contains("/DecodeParms") || dict.contains("/DP"))
        return Left(())
      val at = dict.indexOf("/Filter")
      if (at < 0) return Right(Nil)
      var j = at + 7
      while (j < dict.length && isPdfWs(dict(j))) j += 1
      if (j < dict.length && dict(j) == '[') {
        j += 1
        val names = scala.collection.mutable.ListBuffer.empty[String]
        while (true) {
          while (j < dict.length && isPdfWs(dict(j))) j += 1
          if (j >= dict.length) return Left(())
          if (dict(j) == ']') return validate(names.toList)
          name(j) match {
            case Some((n, k)) => names += n; j = k
            case None => return Left(())
          }
        }
        Left(()) // unreachable
      } else name(j) match {
        case Some((n, _)) => validate(List(n))
        case None => Left(())
      }
    }

    /** Apply a decode chain in order; None on any stage failure. */
    private def decodeChain(raw: Array[Byte], filters: List[String])
        : Option[Array[Byte]] =
      filters.foldLeft(Option(raw)) {
        case (Some(d), "FlateDecode") => inflateZlib(d, outputCap)
        case (Some(d), "ASCIIHexDecode") => asciiHexDecode(d)
        case (Some(d), "ASCII85Decode") => ascii85Decode(d)
        case (Some(d), "LZWDecode") => lzwDecode(d, outputCap)
        case _ => None
      }

    /** ASCII85Decode (§7.4.3): groups of 5 chars `!`..`u` → 4 bytes
      * base 85 (big-endian), `z` → four zero bytes (only at a group
      * boundary), whitespace ignored, `~>` is the REQUIRED EOD. A
      * partial final group of n chars yields n-1 bytes (padded with
      * `u`); a 1-char remainder, a group value over 2^32-1, `z`
      * inside a group, any other byte, a missing EOD, or non-
      * whitespace trailing bytes fail closed.
      */
    private[ext] def ascii85Decode(d: Array[Byte])
        : Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream
      val grp = new Array[Int](5)
      var n = 0
      var i = 0
      def flush(k: Int): Boolean = { // k chars present (2..5)
        var v = 0L
        var j = 0
        while (j < 5) { v = v * 85 + (if (j < k) grp(j) else 84); j += 1 }
        if (v > 0xffffffffL) return false
        val keep = k - 1
        var s = 24
        var b = 0
        while (b < keep) { out.write(((v >> s) & 0xff).toInt); s -= 8; b += 1 }
        true
      }
      while (i < d.length) {
        val c = (d(i) & 0xff).toChar
        if (c == '~') {
          if (i + 1 >= d.length || (d(i + 1) & 0xff).toChar != '>')
            return None
          if (n == 1) return None // lone trailing digit
          if (n >= 2 && !flush(n)) return None
          var k = i + 2
          while (k < d.length && isPdfWs((d(k) & 0xff).toChar)) k += 1
          return if (k == d.length) Some(out.toByteArray) else None
        } else if (c == 'z') {
          if (n != 0) return None // only at a group boundary
          out.write(0); out.write(0); out.write(0); out.write(0)
        } else if (c >= '!' && c <= 'u') {
          grp(n) = c - '!'
          n += 1
          if (n == 5) { if (!flush(5)) return None; n = 0 }
        } else if (!isPdfWs(c)) return None
        i += 1
      }
      None // missing ~> EOD
    }

    /** LZWDecode (§7.4.4, the TIFF/GIF-on-its-side variant the GIF
      * decoder in [[graft.ext.ImageHash]] is NOT): MSB-first bit
      * packing, 9→12-bit codes, 256=ClearTable, 257=EOD, EarlyChange
      * 1 (the default — the code width bumps one entry early; a
      * `/DecodeParms` overriding it is out of profile and fails
      * closed in [[filterOf]]). Corrupt codes (beyond the next free
      * entry), a table overflowing 12 bits without a clear, or data
      * ending before EOD fail closed.
      */
    private[ext] def lzwDecode(d: Array[Byte], cap: Int)
        : Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream
      val dict = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
      var width = 9
      def reset(): Unit = {
        dict.clear()
        var b = 0
        while (b < 256) { dict += Array(b.toByte); b += 1 }
        dict += null; dict += null // 256 clear, 257 EOD
        width = 9
      }
      reset()
      var prev: Array[Byte] = null
      var acc = 0L
      var nbits = 0
      var i = 0
      while (true) {
        while (nbits < width && i < d.length) {
          acc = (acc << 8) | (d(i) & 0xff); nbits += 8; i += 1
        }
        if (nbits < width) return None // ran out before EOD
        val code = ((acc >> (nbits - width)) & ((1L << width) - 1)).toInt
        nbits -= width
        if (code == 256) { reset(); prev = null }
        else if (code == 257) return Some(out.toByteArray)
        else {
          val entry =
            if (code < dict.length) dict(code)
            else if (code == dict.length && prev != null) prev :+ prev(0)
            else return None
          if (entry == null) return None
          out.write(entry, 0, entry.length)
          if (out.size > cap) return None
          if (prev != null) {
            if (dict.length >= 4096) return None // needs a clear
            dict += (prev :+ entry(0))
            // EarlyChange=1: the encoder bumps when ITS next free
            // entry hits 2^w - 1; the decoder lags one entry behind
            if (dict.length + 1 == (1 << width) - 1 && width < 12)
              width += 1
          }
          prev = entry
        }
      }
      None // unreachable
    }

    /** ASCIIHexDecode (§7.4.2): hex digit pairs, interior whitespace
      * ignored, `>` is the REQUIRED EOD marker (odd final digit padded
      * with 0); any non-hex non-whitespace byte, a missing EOD, or
      * non-whitespace trailing bytes after it fail closed.
      */
    private[ext] def asciiHexDecode(d: Array[Byte])
        : Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream
      var hi = -1
      var i = 0
      while (i < d.length) {
        val c = (d(i) & 0xff).toChar
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4)
          var k = i + 1
          while (k < d.length && isPdfWs((d(k) & 0xff).toChar)) k += 1
          return if (k == d.length) Some(out.toByteArray) else None
        }
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else if (isPdfWs(c)) -1
          else return None
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
        i += 1
      }
      None // missing EOD marker
    }

    /** TJ adjustments at or below `-SpaceKern` (thousandths of text
      * space, §9.4.3) render as ONE space; smaller magnitudes are
      * kerning and contribute nothing. 180 sits between real kerns
      * (tens) and the inter-word gap every writer emits when it
      * positions words individually (a space glyph is ~250-333/1000 em
      * at text size) — the fixed-threshold profile of the width-aware
      * rule pdftotext/pdf.js apply.
      */
    private[ext] val SpaceKern = 180.0

    /** Interpret one decoded content stream: (nTextOps, text), or
      * None on a profile violation (show outside BT/ET, positioning op
      * outside BT, dict-in-text, unterminated string, malformed
      * number).
      *
      * r17 text-POSITIONING whitespace (the PDF twin of the q242 DOCX
      * word-gluing fix): writers that place every word and line with
      * positioning operators produced glued text under the show-ops-
      * only profile. Now `T*` and `Td`/`TD` with a NEGATIVE ty emit a
      * newline (moving down a line is how every real writer breaks
      * lines; a positive or zero ty — indents, superscript returns —
      * emits nothing), and a TJ array adjustment at or below
      * -[[SpaceKern]] emits one space (positive adjustments tighten
      * and never separate). `Tm` stays out of profile (an absolute
      * matrix carries no relative line semantics without tracking the
      * full text state — documented cut). Positioning ops outside a
      * BT/ET block are a profile violation, same discipline as shows.
      */
    private[ext] def tokenizeContent(c: String,
        fonts: Map[String, Option[ToUnicodeMap]] = Map.empty)
        : Option[(Int, String)] = {
      val out = new StringBuilder
      var i = 0
      var inBT = false
      var ops = 0
      var lastString: String = null
      var inArray = false
      val arrayItems = new StringBuilder
      var n2 = 0.0 // last operand-position number (Td/TD's ty)
      var nCount = 0 // numbers seen since the last operator token
      var lastName: String = null // last /Name operand (Tf's font)
      var cmap: Option[ToUnicodeMap] = None // current font's map
      // r17/q256: strings are GLYPH CODES when the current font has a
      // /ToUnicode CMap — translate at parse (no operator can change
      // the font between a string and its show op); fonts absent =
      // identity, the exact pre-font behavior
      def xlat(s: String): Option[String] = cmap match {
        case None => Some(s)
        case Some(m) =>
          val w = m.codeBytes
          if (s.length % w != 0) return None
          val sb = new StringBuilder
          var k = 0
          while (k < s.length) {
            val code =
              if (w == 1) s(k).toInt
              else (s(k).toInt << 8) | s(k + 1).toInt
            m.lookup(code) match {
              case Some(x) => sb.append(x)
              case None => return None // unmapped glyph: fail closed
            }
            k += w
          }
          Some(sb.toString)
      }
      while (i < c.length) {
        val ch = c(i)
        if (ch == ' ' || ch == '\r' || ch == '\n' || ch == '\t') i += 1
        else if (ch == '(') {
          parseLiteral(c, i) match {
            case Some((str0, next)) =>
              val str = xlat(str0) match {
                case Some(x) => x
                case None => return None
              }
              lastString = str
              if (inArray) arrayItems.append(str)
              i = next
            case None => return None
          }
        } else if (ch == '[') { inArray = true; arrayItems.clear(); i += 1 }
        else if (ch == ']') { inArray = false; i += 1 }
        else if (ch == '<') {
          // `<<` opens an inline dict — still out of profile; a single
          // `<` opens a hex string `<48656c6c6f>` (ISO 32000-1 §7.3.4.3)
          // — ubiquitous in real PDFs, decoded since r16.
          if (i + 1 < c.length && c(i + 1) == '<') return None
          parseHex(c, i) match {
            case Some((str0, next)) =>
              val str = xlat(str0) match {
                case Some(x) => x
                case None => return None
              }
              lastString = str
              if (inArray) arrayItems.append(str)
              i = next
            case None => return None
          }
        }
        else if (ch == '/') { // name: capture (Tf's operand), advance
          i += 1
          val nmStart = i
          while (i < c.length && !" \r\n\t()[]<>/".contains(c(i))) i += 1
          lastName = c.substring(nmStart, i)
        } else if (ch == '-' || ch == '+' || ch == '.' || ch.isDigit) {
          val start = i
          i += 1
          while (i < c.length && (c(i).isDigit || c(i) == '.')) i += 1
          val v =
            try c.substring(start, i).toDouble
            catch { case _: NumberFormatException => return None }
          if (inArray) {
            // TJ adjustment: a gap at/below -SpaceKern is a word break
            if (v <= -SpaceKern) arrayItems.append(' ')
          } else { n2 = v; nCount += 1 }
        } else if (ch == '\'' || ch == '"') { // next-line show forms
          if (!inBT || lastString == null) return None
          out.append('\n').append(lastString)
          ops += 1
          i += 1
        } else { // operator token
          val start = i
          while (i < c.length && (c(i).isLetter || c(i) == '*')) i += 1
          if (i == start) return None // unknown byte
          c.substring(start, i) match {
            case "BT" => if (inBT) return None else inBT = true
            case "ET" => if (!inBT) return None else inBT = false
            case "Tj" =>
              if (!inBT || lastString == null) return None
              out.append(lastString)
              ops += 1
            case "TJ" =>
              if (!inBT) return None
              out.append(arrayItems)
              ops += 1
            case "Td" | "TD" =>
              // tx ty: moving DOWN a line (ty<0) is a line break;
              // indents / superscript returns (ty>=0) are not
              if (!inBT || nCount < 2) return None
              if (n2 < 0) out.append('\n')
            case "T*" =>
              if (!inBT) return None
              out.append('\n')
            case "Tf" =>
              // font switch — meaningful only when the caller supplied
              // page resources (the page-tree path); with no resource
              // context Tf stays styling, the pre-font contract
              if (fonts.nonEmpty) {
                if (lastName == null) return None
                fonts.get(lastName) match {
                  case Some(cm) => cmap = cm
                  case None => return None // font not in resources
                }
              }
            case "BI" =>
              // inline image (§8.9.7): parameter dict → ID → binary
              // data → EI. Never page text; skipped wholesale. Not
              // allowed inside a text object (content model), and an
              // unterminated image fails closed.
              if (inBT) return None
              val dataAt = inlineImageData(c, i)
              if (dataAt < 0) return None
              val after = inlineImageEnd(c, dataAt)
              if (after < 0) return None
              i = after
            case _ => // Tf, Tm, graphics ops: styling / absolute
              // positioning, not text content (profile note above)
          }
          nCount = 0
        }
      }
      if (inBT) None else Some((ops, out.toString))
    }

    /** Index of the first inline-image data byte: the parameter dict
      * between `BI` and `ID` is skipped WITHOUT tokenizing (its
      * values are names/numbers the profile never needs), so the
      * boundary is the first whitespace-delimited `ID` token, whose
      * single following whitespace byte separates it from the data
      * (§8.9.7). -1 when no such token exists. Profile note: an `ID`
      * substring inside a parameter value would end the dict early —
      * the same documented first-token hazard as stream-payload
      * scanning, and conformant writers cannot produce it.
      */
    private def inlineImageData(c: String, from: Int): Int = {
      var j = from
      while (j + 2 < c.length) {
        if (c(j) == 'I' && c(j + 1) == 'D' &&
          (j == 0 || isPdfWs(c(j - 1)) || "/>])".contains(c(j - 1))) &&
          isPdfWs(c(j + 2))) return j + 3
        j += 1
      }
      -1
    }

    /** Index just past the `EI` that terminates inline-image data:
      * the first `EI` preceded by whitespace and followed by
      * whitespace/delimiter/end-of-stream — data bytes may spell `EI`
      * without a whitespace flank and do not terminate. -1 when
      * unterminated (fails the document closed).
      */
    private def inlineImageEnd(c: String, dataAt: Int): Int = {
      var j = dataAt + 1
      while (j + 1 < c.length) {
        if (c(j) == 'E' && c(j + 1) == 'I' && isPdfWs(c(j - 1)) &&
          (j + 2 >= c.length || isPdfWs(c(j + 2)) ||
            "()<>[]/%".contains(c(j + 2)))) return j + 2
        j += 1
      }
      -1
    }

    /** Hex string starting at `<`: (decoded, indexAfter). Even/odd
      * nibble rule — an odd final digit is padded with 0 (spec §7.3.4.3)
      * — and whitespace between digits is tolerated; any non-hex,
      * non-whitespace byte before the closing `>` is a violation, as is
      * an unterminated string. Byte→char is the same ISO-8859-1 identity
      * the literal-string path uses.
      */
    private[ext] def parseHex(c: String, open: Int)
        : Option[(String, Int)] = {
      val sb = new StringBuilder
      var hi = -1 // pending high nibble, or -1
      var i = open + 1
      while (i < c.length) {
        val ch = c(i)
        if (ch == '>') {
          if (hi >= 0) sb.append((hi << 4).toChar) // odd count: pad 0
          return Some((sb.toString, i + 1))
        }
        val v =
          if (ch >= '0' && ch <= '9') ch - '0'
          else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
          else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
          else if (ch == ' ' || ch == '\r' || ch == '\n' || ch == '\t' ||
            ch == '\f' || ch == 0.toChar) -1
          else return None
        if (v >= 0) {
          if (hi < 0) hi = v
          else { sb.append(((hi << 4) | v).toChar); hi = -1 }
        }
        i += 1
      }
      None // unterminated
    }

    /** Literal string starting at `(`: (decoded, indexAfter). Handles
      * balanced unescaped parens, the full escape set, octal (1-3
      * digits), and backslash-EOL continuation.
      */
    private[ext] def parseLiteral(c: String, open: Int)
        : Option[(String, Int)] = {
      val sb = new StringBuilder
      var i = open + 1
      var depth = 1
      while (i < c.length) {
        c(i) match {
          case '(' => depth += 1; sb.append('('); i += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return Some((sb.toString, i + 1))
            sb.append(')'); i += 1
          case '\\' =>
            if (i + 1 >= c.length) return None
            c(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '\n' => i += 2 // line continuation
              case '\r' =>
                i += 2
                if (i < c.length && c(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var n = 0; i += 1
                while (n < 3 && i < c.length &&
                  c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; n += 1
                }
                sb.append((v & 0xff).toChar)
              case other => sb.append(other); i += 2 // spec: drop the \
            }
          case ch => sb.append(ch); i += 1
        }
      }
      None // unterminated
    }
  }

  /** PDF text-extraction stage: per-partition map, unparseable or
    * out-of-profile payloads become zeroed ok=false rows, exceptions
    * become error rows — never task aborts.
    */
  def extractPdfText(media: Dataset[Multimodal.MediaRecord])
      : Dataset[PdfText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          PdfTextExtract.parse(r.media) match {
            case Some((ns, ops, t)) =>
              PdfText(r.media_id, r.mime, ns, ops, t.length.toLong,
                md5Hex(t), ok = true, None)
            case None =>
              PdfText(r.media_id, r.mime, 0, 0, 0L, "", ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            PdfText(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class PdfPage(
      media_id: Long,
      mime: String,
      page_no: Int,
      n_text_ops: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** PAGE-attributed PDF text extraction in page-tree order
    * ([[PdfTextExtract.parsePagesR]]): one row per page (page_no
    * 1-based); a document failing any profile check emits one
    * page_no=0 ok=false row — row counts stay per-document
    * accountable either way.
    */
  def extractPdfPages(media: Dataset[Multimodal.MediaRecord])
      : Dataset[PdfPage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try {
          PdfTextExtract.parsePagesR(r.media) match {
            case Right(pages) =>
              pages.zipWithIndex.map { case ((ops, t), i) =>
                PdfPage(r.media_id, r.mime, i + 1, ops, t.length.toLong,
                  md5Hex(t), ok = true, None)
              }
            case Left(_) =>
              Seq(PdfPage(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
                None))
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq(PdfPage(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // DOCX
  // ------------------------------------------------------------------

  final case class DocxText(
      media_id: Long,
      mime: String,
      n_paragraphs: Int,
      n_runs: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** A parsed DOCX main document: body paragraphs (tables excluded),
    * total `<w:t>` run count (body + cells), and tables as
    * rows-of-cells, each cell its paragraphs joined with `\n` — the
    * same tables → rows → cells nesting the reference's Docling emits
    * (k8s/configmaps.yaml:20-26, table_structure: true) and q159's
    * cell analytics consume.
    */
  final case class DocxDoc(
      paragraphs: Vector[String],
      runs: Int,
      tables: Vector[Vector[Vector[String]]]) {
    def text: String = paragraphs.mkString("\n")
  }

  object DocxTextExtract {
    private val outputCap = 1 << 24

    /** (nParagraphs, nRuns, text), or None on any structural defect
      * or profile violation. Body text only — table cells ride
      * [[parseFull]]'s `tables` (a doc that is ONLY a table extracts
      * as empty text plus its table, never as garbled flow).
      */
    def parse(b: Array[Byte]): Option[(Int, Int, String)] =
      parseFull(b).map(d => (d.paragraphs.length, d.runs, d.text))

    /** Full parse including `w:tbl`/`w:tr`/`w:tc` tables, or None on
      * any structural defect or profile violation.
      */
    def parseFull(b: Array[Byte]): Option[DocxDoc] =
      parseFullR(b).toOption

    /** [[parseFull]] with a stable failure-REASON code on the Left —
      * the q243 census vocabulary: docx_zip (container structure),
      * docx_no_document_part, docx_part_oversize, docx_part_corrupt
      * (inflate/CRC/size disagreement), docx_xml_profile (the walk's
      * structural/profile violations).
      */
    def parseFullR(b: Array[Byte]): Either[String, DocxDoc] = {
      val xml = documentXmlR(b) match {
        case Right(x) => x
        case Left(r) => return Left(r)
      }
      walkXml(new String(xml, "UTF-8")) match {
        case Some(d) => Right(d)
        case None => Left("docx_xml_profile")
      }
    }

    private def le16(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

    /** `word/document.xml` bytes, decompressed and CRC/size-verified
      * against the central directory, or a reason code.
      */
    private[ext] def documentXmlR(b: Array[Byte])
        : Either[String, Array[Byte]] =
      partsR(b, _ == "word/document.xml") match {
        case Left(r) => Left(r)
        // a DOCX must carry the document part
        case Right(Seq()) => Left("docx_no_document_part")
        case Right(parts) => Right(parts.head._2)
      }

    /** Every central-directory entry whose name satisfies `pred`,
      * inflated and CRC/size-verified, in central-directory order —
      * the generalized q174 walk ([[documentXmlR]] and the r17 aux
      * parts — headers/footers/footnotes — both ride it). Left codes:
      * docx_zip (container structure), docx_part_oversize,
      * docx_part_corrupt (inflate/CRC/size disagreement).
      */
    private[ext] def partsR(b: Array[Byte], pred: String => Boolean)
        : Either[String, Seq[(String, Array[Byte])]] = {
      if (b == null || b.length < 22) return Left("docx_zip")
      // EOCD scan (the q174 walk)
      var eocd = -1
      var i = b.length - 22
      val stop = math.max(0, b.length - 22 - 65535)
      while (eocd < 0 && i >= stop) {
        if (b(i) == 0x50 && b(i + 1) == 0x4b &&
          b(i + 2) == 0x05 && b(i + 3) == 0x06) eocd = i
        else i -= 1
      }
      if (eocd < 0) return Left("docx_zip")
      val nTotal = le16(b, eocd + 10)
      val cdOff = le32(b, eocd + 16)
      val cdEnd = (cdOff + le32(b, eocd + 12)).toInt
      if (cdOff < 0 || cdEnd > eocd) return Left("docx_zip")
      var at = cdOff.toInt
      var n = 0
      val hits = scala.collection.mutable.ArrayBuffer
        .empty[(String, Int, Long, Long, Long, Long)]
      while (at + 46 <= cdEnd &&
        b(at) == 0x50 && b(at + 1) == 0x4b &&
        b(at + 2) == 0x01 && b(at + 3) == 0x02) {
        val method = le16(b, at + 10)
        val crc = le32(b, at + 16)
        val comp = le32(b, at + 20)
        val uncomp = le32(b, at + 24)
        val nameLen = le16(b, at + 28)
        val extraLen = le16(b, at + 30)
        val commentLen = le16(b, at + 32)
        val localOff = le32(b, at + 42)
        if (at + 46 + nameLen > cdEnd) return Left("docx_zip")
        val name = new String(b, at + 46, nameLen, "UTF-8")
        if (pred(name))
          hits += ((name, method, comp, uncomp, crc, localOff))
        n += 1
        at += 46 + nameLen + extraLen + commentLen
      }
      if (n != nTotal) return Left("docx_zip")
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Array[Byte])]
      hits.foreach { case (name, method, comp, uncomp, crc, off) =>
        extractEntry(b, method, comp, uncomp, crc, off) match {
          case Right(data) => out += ((name, data))
          case Left(r) => return Left(r)
        }
      }
      Right(out.toSeq)
    }

    /** One entry's bytes via its local header: slice (method 0) or
      * raw-deflate inflate with exact consumption (method 8), CRC32
      * and size verified against the central directory.
      */
    private def extractEntry(b: Array[Byte], method: Int, comp: Long,
                             uncomp: Long, crc: Long, off: Long)
        : Either[String, Array[Byte]] = {
      if (uncomp > outputCap) return Left("docx_part_oversize")
      val lo = off.toInt
      if (lo < 0 || lo + 30 > b.length) return Left("docx_zip")
      if (!(b(lo) == 0x50 && b(lo + 1) == 0x4b &&
        b(lo + 2) == 0x03 && b(lo + 3) == 0x04))
        return Left("docx_zip")
      val dataAt = lo + 30 + le16(b, lo + 26) + le16(b, lo + 28)
      if (dataAt + comp > b.length) return Left("docx_zip")
      val data = method match {
        case 0 =>
          if (comp != uncomp) return Left("docx_part_corrupt")
          java.util.Arrays.copyOfRange(b, dataAt, (dataAt + comp).toInt)
        case 8 =>
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(b, dataAt, comp.toInt)
            val out = new Array[Byte](uncomp.toInt)
            var got = 0
            while (got < out.length && !inf.finished()) {
              val k =
                try inf.inflate(out, got, out.length - got)
                catch { case _: java.util.zip.DataFormatException =>
                  return Left("docx_part_corrupt") }
              if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
                return Left("docx_part_corrupt")
              got += k
            }
            // exact size both ways: all output produced, all input used
            if (got != out.length) return Left("docx_part_corrupt")
            if (!inf.finished() &&
              inf.inflate(new Array[Byte](1)) > 0)
              return Left("docx_part_corrupt")
            if (inf.getBytesRead != comp) return Left("docx_part_corrupt")
            out
          } finally inf.end()
        case _ => return Left("docx_part_corrupt")
      }
      val check = new java.util.zip.CRC32
      check.update(data)
      if (check.getValue != crc) Left("docx_part_corrupt")
      else Right(data)
    }

    /** Walk document.xml: `<w:p>` paragraphs joined with `\n`,
      * `<w:t>` run text with the five XML entities decoded, run-level
      * whitespace structure rendered (r17 — `<w:br/>`/`<w:cr/>` → \n,
      * `<w:tab/>` → \t when inside a run; the same names OUTSIDE a
      * run, e.g. tab-stop definitions in `w:pPr/w:tabs`, contribute
      * nothing), `w:hyperlink`-wrapped runs captured like any other
      * run, and
      * `w:tbl`/`w:tr`/`w:tc` tables (r16, VERDICT item 7) — cell
      * paragraphs route to the enclosing cell, never the body flow;
      * each structural level is balance-checked. Comments, CDATA, DTD
      * (`<!…`), processing instructions other than the prolog,
      * unknown entities, NESTED tables, self-closing tbl/tr/tc, empty
      * rows/tables, and cells without a paragraph (ECMA-376 requires
      * one) are profile violations.
      */
    private[ext] def walkXml(x: String): Option[DocxDoc] = {
      val paras = scala.collection.mutable.ArrayBuffer.empty[String]
      val tables =
        scala.collection.mutable.ArrayBuffer.empty[Vector[Vector[String]]]
      var rows: scala.collection.mutable.ArrayBuffer[Vector[String]] = null
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var cellParas: scala.collection.mutable.ArrayBuffer[String] = null
      var cur: StringBuilder = null
      var inRun = false
      var runs = 0
      var i = 0
      while (i < x.length) {
        val lt = x.indexOf('<', i)
        if (lt < 0) { i = x.length }
        else {
          val gt = x.indexOf('>', lt)
          if (gt < 0) return None
          val tag = x.substring(lt + 1, gt)
          if (tag.startsWith("?")) { i = gt + 1 } // prolog
          else if (tag.startsWith("!")) return None // comment/DTD/CDATA
          else {
            val selfClosing = tag.endsWith("/")
            val body = if (selfClosing) tag.dropRight(1) else tag
            val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
              ch != '\r' && ch != '\n')
            name match {
              case "w:p" if !selfClosing =>
                if (cur != null) return None // nested paragraphs
                cur = new StringBuilder
                i = gt + 1
              case "/w:p" =>
                if (cur == null) return None
                if (cellParas != null) cellParas += cur.toString
                else paras += cur.toString
                cur = null
                i = gt + 1
              case "w:tbl" =>
                // nested tables and tables inside an open paragraph
                // are out of profile; self-closing is malformed
                if (selfClosing || rows != null || cur != null) return None
                rows = scala.collection.mutable.ArrayBuffer.empty
                i = gt + 1
              case "/w:tbl" =>
                if (rows == null || cells != null || rows.isEmpty)
                  return None
                tables += rows.toVector
                rows = null
                i = gt + 1
              case "w:tr" =>
                if (selfClosing || rows == null || cells != null ||
                  cur != null) return None
                cells = scala.collection.mutable.ArrayBuffer.empty
                i = gt + 1
              case "/w:tr" =>
                if (cells == null || cellParas != null || cells.isEmpty)
                  return None
                rows += cells.toVector
                cells = null
                i = gt + 1
              case "w:tc" =>
                if (selfClosing || cells == null || cellParas != null ||
                  cur != null) return None
                cellParas = scala.collection.mutable.ArrayBuffer.empty
                i = gt + 1
              case "/w:tc" =>
                // ECMA-376: a cell must carry at least one paragraph
                if (cellParas == null || cur != null || cellParas.isEmpty)
                  return None
                cells += cellParas.mkString("\n")
                cellParas = null
                i = gt + 1
              case "w:r" if !selfClosing =>
                inRun = true
                i = gt + 1
              case "/w:r" =>
                inRun = false
                i = gt + 1
              // Run-content whitespace (ECMA-376 §17.3.3: w:br, w:cr,
              // w:tab inside a RUN are text content — r17, VERDICT r16
              // item 2: without them adjacent words glue together and
              // silently corrupt every downstream text operator).
              // OUTSIDE a run the same tag names are structure, never
              // text: <w:tab w:pos=…/> inside w:pPr/w:tabs is a
              // tab-STOP definition and must contribute nothing.
              case "w:br" | "w:cr" =>
                if (inRun && cur != null) cur.append('\n')
                i = gt + 1
              case "w:tab" =>
                if (inRun && cur != null) cur.append('\t')
                i = gt + 1
              case "w:t" =>
                if (cur == null) return None // run outside a paragraph
                runs += 1
                if (selfClosing) i = gt + 1
                else {
                  val end = x.indexOf("</w:t>", gt + 1)
                  if (end < 0) return None
                  unescape(x.substring(gt + 1, end)) match {
                    case Some(t) => cur.append(t)
                    case None => return None
                  }
                  i = end + 6
                }
              case _ => i = gt + 1 // other tags: structure, not text
            }
          }
          if (lt >= i) return None // safety: always advance
        }
      }
      if (cur != null || cellParas != null || cells != null || rows != null)
        None // unclosed paragraph/cell/row/table
      else Some(DocxDoc(paras.toVector, runs, tables.toVector))
    }

    /** The five XML 1.0 predefined entities; anything else
      * entity-shaped (including numeric refs) is out of profile.
      */
    private[ext] def unescape(t: String): Option[String] = {
      if (t.indexOf('&') < 0) return Some(t)
      val sb = new StringBuilder
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (c != '&') { sb.append(c); i += 1 }
        else {
          val semi = t.indexOf(';', i)
          if (semi < 0 || semi - i > 6) return None
          t.substring(i + 1, semi) match {
            case "amp" => sb.append('&')
            case "lt" => sb.append('<')
            case "gt" => sb.append('>')
            case "quot" => sb.append('"')
            case "apos" => sb.append('\'')
            case _ => return None
          }
          i = semi + 1
        }
      }
      Some(sb.toString)
    }
  }

  // ------------------------------------------------------------------
  // unified multi-format dispatch
  // ------------------------------------------------------------------

  final case class AnyText(
      media_id: Long,
      mime: String,
      format: String,
      raw: String,
      needs_html: Boolean,
      ok: Boolean,
      error: Option[String])

  /** Magic-byte format dispatch over a mixed-format corpus — the
    * unification step a real crawl+archive pipeline needs (the same
    * logical document arrives as PDF from a document store, DOCX from
    * an inbox, HTML from a crawl, plain text from an export):
    * `%PDF-` → [[PdfTextExtract]], `PK` → [[DocxTextExtract]],
    * `Obj` → [[AvroOcf]] (string-typed field values joined, the
    * container-to-text view), first non-whitespace byte `<` →
    * decoded as markup with
    * `needs_html = true` (the caller runs [[HtmlText.htmlExtractText]]
    * over those rows — boilerplate removal is DataFrame-expression
    * work, not a byte kernel), anything else valid-UTF-8 → plain text
    * as-is. Dispatch is structural (never the caller's mime string)
    * and tolerates a UTF-8 BOM and leading whitespace before markup
    * (real HTML routinely leads with both — ADVICE r15); a UTF-16 BOM
    * (either endianness) routes through a strict UTF-16 decode with
    * the same markup-vs-text dispatch on the decoded chars (r16); the
    * PDF/DOCX magics stay byte-0 anchored, matching the parsers' own
    * contracts.
    * The html/txt arms decode with a REPORT-mode CharsetDecoder:
    * malformed UTF-8 fails closed instead of silently becoming U+FFFD.
    * Per-format profile violations fail closed.
    */
  def extractAnyText(media: Dataset[Multimodal.MediaRecord])
      : Dataset[AnyText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val b = r.media
          // BOM + whitespace skip — for DISPATCH of the textual arms
          // only (the txt arm still decodes from just past the BOM, so
          // leading whitespace stays content; html decodes from the
          // first `<`)
          val bomEnd =
            if (b != null && b.length >= 3 && (b(0) & 0xff) == 0xef &&
              (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0
          var t0 = bomEnd
          while (b != null && t0 < b.length && (b(t0) == ' ' ||
            b(t0) == '\t' || b(t0) == '\r' || b(t0) == '\n')) t0 += 1
          if (b != null && b.length >= 5 && b(0) == '%' && b(1) == 'P' &&
            b(2) == 'D' && b(3) == 'F' && b(4) == '-')
            PdfTextExtract.parse(b) match {
              case Some((_, _, t)) =>
                AnyText(r.media_id, r.mime, "pdf", t,
                  needs_html = false, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else if (b != null && b.length >= 4 && b(0) == 'P' && b(1) == 'K')
            DocxTextExtract.parse(b) match {
              case Some((_, _, t)) =>
                AnyText(r.media_id, r.mime, "docx", t,
                  needs_html = false, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else if (b != null && b.length >= 4 && b(0) == 'O' &&
            b(1) == 'b' && b(2) == 'j' && b(3) == 1)
            // Avro OCF (r16): the text view is every string-typed
            // field's value, record-major, joined with \n — the same
            // page-join convention as the PDF arm
            AvroOcf.parse(b) match {
              case Some((fields, _, _, records)) =>
                val strIdx = fields.zipWithIndex
                  .collect { case ((_, "string"), i) => i }
                val t = records.iterator.flatMap(rec =>
                  strIdx.map(i => rec(i).asInstanceOf[String]))
                  .mkString("\n")
                AnyText(r.media_id, r.mime, "avro", t,
                  needs_html = false, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else if (b != null && b.length >= 5 && b(0) == '{' &&
            b(1) == '\\' && b(2) == 'r' && b(3) == 't' && b(4) == 'f')
            // RTF (r17): byte-0-anchored `{\rtf` magic, same contract
            // as the parser's own header check — without this arm an
            // RTF payload would pass the txt arm as valid UTF-8 and
            // leak control words into the corpus
            RtfExtract.parseR(b) match {
              case Right((_, t)) =>
                AnyText(r.media_id, r.mime, "rtf", t,
                  needs_html = false, ok = true, None)
              case Left(_) => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else if (b != null && b.length >= 2 &&
            (((b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) ||
              ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe))) {
            // UTF-16 BOM (either endianness): decode strictly, then
            // apply the same markup-vs-text dispatch to the DECODED
            // chars (html starts at the first '<'; txt keeps leading
            // whitespace as content)
            decodeUtf16Strict(b) match {
              case Some(t) =>
                val lead = t.indexWhere(c => !(c == ' ' || c == '\t' ||
                  c == '\r' || c == '\n'))
                if (lead >= 0 && t(lead) == '<')
                  AnyText(r.media_id, r.mime, "html", t.substring(lead),
                    needs_html = true, ok = true, None)
                else AnyText(r.media_id, r.mime, "txt", t,
                  needs_html = false, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          }
          else if (b != null && t0 < b.length && b(t0) == '<')
            decodeUtf8Strict(b, t0) match {
              case Some(t) => AnyText(r.media_id, r.mime, "html", t,
                needs_html = true, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else if (b != null && b.length >= 1)
            decodeUtf8Strict(b, bomEnd) match {
              case Some(t) => AnyText(r.media_id, r.mime, "txt", t,
                needs_html = false, ok = true, None)
              case None => AnyText(r.media_id, r.mime, "", "",
                needs_html = false, ok = false, None)
            }
          else AnyText(r.media_id, r.mime, "", "",
            needs_html = false, ok = false, None)
        } catch {
          case scala.util.control.NonFatal(e) =>
            AnyText(r.media_id, r.mime, "", "", needs_html = false,
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class ExtractProbe(
      media_id: Long,
      format: String,
      reason: String,
      ok: Boolean)

  /** Extraction-coverage CENSUS probe (VERDICT r16 item 4): the same
    * magic-byte dispatch as [[extractAnyText]], but per document it
    * reports the DISPATCHED format family and a STABLE failure-reason
    * code instead of the text — the input to the per-format ok-rate /
    * failure-histogram census a 100 TB ingest run reads first, to
    * know what fraction of the corpus the extraction profile covers
    * and WHY the rest is cut. Reason vocabulary (stable, additive
    * only): `ok`; `pdf_magic pdf_no_eof pdf_stream_dict pdf_no_length
    * pdf_length_unresolved pdf_objstm_malformed pdf_stream_bounds
    * pdf_filter_unsupported pdf_decode_error pdf_content_profile`
    * ([[PdfTextExtract.parseR]]); `docx_zip docx_no_document_part
    * docx_part_oversize docx_part_corrupt docx_xml_profile`
    * ([[DocxTextExtract.parseFullR]]); `avro_malformed`;
    * `utf16_malformed`; `utf8_malformed` (html and txt arms);
    * `empty`; `exception` (the catch-all backstop). Scale shape:
    * pure map-side, one probe per document, no shuffle.
    */
  /** One record's probe — the SINGLE dispatch copy the batch census
    * (q243) and its streaming twin share, so the two censuses cannot
    * drift apart.
    */
  def probeOne(media_id: Long, b: Array[Byte]): ExtractProbe = {
    try {
          val bomEnd =
            if (b != null && b.length >= 3 && (b(0) & 0xff) == 0xef &&
              (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0
          var t0 = bomEnd
          while (b != null && t0 < b.length && (b(t0) == ' ' ||
            b(t0) == '\t' || b(t0) == '\r' || b(t0) == '\n')) t0 += 1
          if (b != null && b.length >= 5 && b(0) == '%' && b(1) == 'P' &&
            b(2) == 'D' && b(3) == 'F' && b(4) == '-')
            PdfTextExtract.parseR(b) match {
              case Right(_) => ExtractProbe(media_id, "pdf", "ok",
                ok = true)
              case Left(code) => ExtractProbe(media_id, "pdf", code,
                ok = false)
            }
          else if (b != null && b.length >= 4 && b(0) == 'P' &&
            b(1) == 'K')
            DocxTextExtract.parseFullR(b) match {
              case Right(_) => ExtractProbe(media_id, "docx", "ok",
                ok = true)
              case Left(code) => ExtractProbe(media_id, "docx", code,
                ok = false)
            }
          else if (b != null && b.length >= 4 && b(0) == 'O' &&
            b(1) == 'b' && b(2) == 'j' && b(3) == 1)
            AvroOcf.parse(b) match {
              case Some(_) => ExtractProbe(media_id, "avro", "ok",
                ok = true)
              case None => ExtractProbe(media_id, "avro",
                "avro_malformed", ok = false)
            }
          else if (b != null && b.length >= 5 && b(0) == '{' &&
            b(1) == '\\' && b(2) == 'r' && b(3) == 't' && b(4) == 'f')
            // r17: mirrors extractAnyText's RTF arm position exactly
            RtfExtract.parseR(b) match {
              case Right(_) => ExtractProbe(media_id, "rtf", "ok",
                ok = true)
              case Left(code) => ExtractProbe(media_id, "rtf", code,
                ok = false)
            }
          else if (b != null && b.length >= 2 &&
            (((b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) ||
              ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)))
            decodeUtf16Strict(b) match {
              case Some(t) =>
                val lead = t.indexWhere(c => !(c == ' ' || c == '\t' ||
                  c == '\r' || c == '\n'))
                val fmt = if (lead >= 0 && t(lead) == '<') "html"
                  else "txt"
                ExtractProbe(media_id, fmt, "ok", ok = true)
              case None => ExtractProbe(media_id, "utf16",
                "utf16_malformed", ok = false)
            }
          else if (b != null && t0 < b.length && b(t0) == '<')
            decodeUtf8Strict(b, t0) match {
              case Some(_) => ExtractProbe(media_id, "html", "ok",
                ok = true)
              case None => ExtractProbe(media_id, "html",
                "utf8_malformed", ok = false)
            }
          else if (b != null && b.length >= 1)
            decodeUtf8Strict(b, bomEnd) match {
              case Some(_) => ExtractProbe(media_id, "txt", "ok",
                ok = true)
              case None => ExtractProbe(media_id, "txt",
                "utf8_malformed", ok = false)
            }
          else ExtractProbe(media_id, "unknown", "empty", ok = false)
        } catch {
          case scala.util.control.NonFatal(_) =>
            ExtractProbe(media_id, "unknown", "exception", ok = false)
    }
  }

  def extractionProbe(media: Dataset[Multimodal.MediaRecord])
      : Dataset[ExtractProbe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.map(r => probeOne(r.media_id, r.media)))
  }

  final case class DocxTables(
      media_id: Long,
      mime: String,
      n_paragraphs: Int,
      n_tables: Int,
      n_rows: Int,
      n_cells: Int,
      text_md5: String,
      cells_md5: String,
      ok: Boolean,
      error: Option[String])

  /** Canonical serialization of a parsed table set for hashing: cells
    * joined with U+001F (unit sep), rows with U+001E (record sep),
    * tables with U+001D (group sep) — C0 separators a CONFORMANT
    * document.xml cannot carry in text (XML 1.0 forbids them), so the
    * serialization is injective over parsed tables: multi-paragraph
    * cell text (which contains `\n`) and tab runs (which contain `\t`)
    * can never collide with a row or cell boundary (ADVICE r16 — the
    * old `\t`/`\n` delimiters let a two-paragraph cell hash like two
    * rows). The DuckDB oracle replays them with chr(31)/chr(30)/
    * chr(29). Empty table set hashes to the empty string, not
    * md5("").
    */
  private[ext] def cellsKey(tables: Vector[Vector[Vector[String]]])
      : String =
    tables.map(_.map(_.mkString("\u001f")).mkString("\u001e"))
      .mkString("\u001d")

  /** DOCX structure-extraction stage ([[DocxTextExtract.parseFull]]):
    * body text plus the tables → rows → cells product, per-partition
    * map, fail-closed rows on profile violations — the engine-side
    * equivalent of the reference Docling's table_structure: true
    * output (k8s/configmaps.yaml:20-26).
    */
  def extractDocxTables(media: Dataset[Multimodal.MediaRecord])
      : Dataset[DocxTables] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          DocxTextExtract.parseFull(r.media) match {
            case Some(d) =>
              val nRows = d.tables.map(_.length).sum
              val nCells = d.tables.map(_.map(_.length).sum).sum
              DocxTables(r.media_id, r.mime, d.paragraphs.length,
                d.tables.length, nRows, nCells, md5Hex(d.text),
                if (d.tables.isEmpty) "" else md5Hex(cellsKey(d.tables)),
                ok = true, None)
            case None =>
              DocxTables(r.media_id, r.mime, 0, 0, 0, 0, "", "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            DocxTables(r.media_id, r.mime, 0, 0, 0, 0, "", "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class DocxAux(
      media_id: Long,
      mime: String,
      n_headers: Int,
      n_footers: Int,
      n_footnotes: Int,
      headers_md5: String,
      footers_md5: String,
      footnotes_md5: String,
      ok: Boolean,
      error: Option[String])

  /** Header/footer/footnotes extraction (r17 — the VERDICT r16
    * "what's missing" #3 tail: the package parts Docling reads that
    * the q223 main-document walk did not). Every `word/headerN.xml`
    * and `word/footerN.xml` part and the `word/footnotes.xml` part
    * is walked with the SAME paragraph/run discipline as the main
    * document (entity decode, run whitespace, fail-closed
    * violations); part texts join with `\n` in part-NAME order — the
    * deterministic serialization (real header APPLICATION order
    * needs sectPr references: layout, out of profile).
    * `n_footnotes` counts `<w:footnote>` elements (separator notes
    * count like any other — conformant producers emit two separators
    * plus the content notes; the fixture exercises plain ones). A
    * package without the main document part stays a conformance
    * reject even when aux parts exist; one malformed aux part fails
    * the whole doc closed.
    */
  object DocxAuxExtract {

    /** (nHeaders, nFooters, nFootnotes, headersText, footersText,
      * footnotesText) or the [[DocxTextExtract.parseFullR]] reason
      * vocabulary.
      */
    def parseR(b: Array[Byte])
        : Either[String, (Int, Int, Int, String, String, String)] = {
      val parts = DocxTextExtract.partsR(b, n =>
        n == "word/document.xml" || n == "word/footnotes.xml" ||
          (n.startsWith("word/header") && n.endsWith(".xml")) ||
          (n.startsWith("word/footer") && n.endsWith(".xml"))) match {
        case Right(p) => p
        case Left(r) => return Left(r)
      }
      if (!parts.exists(_._1 == "word/document.xml"))
        return Left("docx_no_document_part")
      def textsOf(pred: String => Boolean)
          : Either[String, Seq[String]] = {
        val sel = parts.filter(p => pred(p._1)).sortBy(_._1)
        val out = sel.map { case (_, bytes) =>
          DocxTextExtract.walkXml(new String(bytes, "UTF-8")) match {
            case Some(d) => d.text
            case None => return Left("docx_xml_profile")
          }
        }
        Right(out)
      }
      val headers = textsOf(n => n.startsWith("word/header")) match {
        case Right(t) => t
        case Left(r) => return Left(r)
      }
      val footers = textsOf(n => n.startsWith("word/footer")) match {
        case Right(t) => t
        case Left(r) => return Left(r)
      }
      val fnParts = parts.filter(_._1 == "word/footnotes.xml")
      val (nNotes, fnText) = fnParts.headOption match {
        case None => (0, "")
        case Some((_, bytes)) =>
          val x = new String(bytes, "UTF-8")
          DocxTextExtract.walkXml(x) match {
            case Some(d) =>
              // count <w:footnote> OPENS with a name boundary (never
              // <w:footnoteRef/>)
              var cnt = 0
              var at = x.indexOf("<w:footnote")
              while (at >= 0) {
                val e = at + 11
                if (e < x.length && (x(e) == ' ' || x(e) == '>' ||
                  x(e) == '\t' || x(e) == '\r' || x(e) == '\n'))
                  cnt += 1
                at = x.indexOf("<w:footnote", at + 1)
              }
              (cnt, d.text)
            case None => return Left("docx_xml_profile")
          }
      }
      Right((headers.length, footers.length, nNotes,
        headers.mkString("\n"), footers.mkString("\n"), fnText))
    }
  }

  /** DOCX aux-parts stage: same per-partition discipline as
    * [[extractDocxText]]; absent part families hash to the empty
    * string (the cells_md5 convention), never md5("").
    */
  def extractDocxAux(media: Dataset[Multimodal.MediaRecord])
      : Dataset[DocxAux] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          DocxAuxExtract.parseR(r.media) match {
            case Right((nh, nf, nn, ht, ft, nt)) =>
              DocxAux(r.media_id, r.mime, nh, nf, nn,
                if (nh == 0) "" else md5Hex(ht),
                if (nf == 0) "" else md5Hex(ft),
                if (nn == 0) "" else md5Hex(nt),
                ok = true, None)
            case Left(_) =>
              DocxAux(r.media_id, r.mime, 0, 0, 0, "", "", "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            DocxAux(r.media_id, r.mime, 0, 0, 0, "", "", "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // RTF (r17/q253)
  // ------------------------------------------------------------------

  final case class RtfText(
      media_id: Long,
      mime: String,
      n_pars: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** RTF 1.x text extraction (the Word-95-era format legacy corpora
    * still carry): control words `\word[-]N` with their single-space
    * delimiter CONSUMED (`{\b bold}` is "bold", not " bold"), groups
    * `{…}` balanced, `\par`/`\line` → \n, `\tab` → \t, `\~` → space,
    * `\'hh` byte escapes (ISO-8859-1 identity — the same
    * byte-transparent convention the PDF parser uses), `\uN` Unicode
    * (negative N + 65536) with its `\ucN`-scoped fallback item(s)
    * skipped (group-inherited, default 1), escaped `\{` `\}` `\\`
    * literals, source CR/LF ignored. Destination groups never leak
    * into text: `{\*…}` (starred) and `{\fonttbl/\colortbl/
    * \stylesheet/\info/\pict …}` skip to their matching brace
    * (escape-aware). Unbalanced braces, a truncated escape, bad hex
    * digits, or a missing `{\rtf` header fail closed.
    */
  object RtfExtract {
    private val destinations =
      Set("fonttbl", "colortbl", "stylesheet", "info", "pict")

    /** (nPars, text) or a stable reason: rtf_magic, rtf_structure. */
    def parseR(b: Array[Byte]): Either[String, (Int, String)] = {
      if (b == null || b.length < 6) return Left("rtf_magic")
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("{\\rtf")) return Left("rtf_magic")
      val out = new StringBuilder
      var nPars = 0
      var depth = 0
      var i = 0
      var justOpened = false
      // group-scoped \uc values (fallback items to skip after \u)
      val ucStack = scala.collection.mutable.ArrayBuffer[Int](1)
      // skip a group raw from position `at` (depth already counts
      // its brace): escape-aware brace scan to the matching close
      def skipGroup(at: Int): Option[Int] = {
        var j = at
        var d = 1
        while (j < s.length && d > 0) {
          s(j) match {
            case '\\' => j += 2
            case '{' => d += 1; j += 1
            case '}' => d -= 1; j += 1
            case _ => j += 1
          }
        }
        if (d == 0) Some(j) else None
      }
      def hex(c: Char): Int =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      while (i < s.length) {
        val c = s(i)
        c match {
          case '{' =>
            depth += 1
            ucStack += ucStack.last
            justOpened = true
            i += 1
          case '}' =>
            depth -= 1
            if (depth < 0 || ucStack.length <= 1)
              return Left("rtf_structure")
            ucStack.remove(ucStack.length - 1)
            justOpened = false
            i += 1
          case '\\' =>
            if (i + 1 >= s.length) return Left("rtf_structure")
            val n = s(i + 1)
            if (n == '\'') {
              if (i + 3 >= s.length) return Left("rtf_structure")
              val h1 = hex(s(i + 2)); val h2 = hex(s(i + 3))
              if (h1 < 0 || h2 < 0) return Left("rtf_structure")
              out.append(((h1 << 4) | h2).toChar)
              i += 4
            } else if (n == '{' || n == '}' || n == '\\') {
              out.append(n); i += 2
            } else if (n == '~') { out.append(' '); i += 2 }
            else if (n == '*') {
              if (justOpened) {
                skipGroup(i) match {
                  case Some(j) =>
                    depth -= 1
                    ucStack.remove(ucStack.length - 1)
                    i = j
                  case None => return Left("rtf_structure")
                }
              } else i += 2
            } else if (n >= 'a' && n <= 'z') {
              var j = i + 1
              while (j < s.length && s(j) >= 'a' && s(j) <= 'z') j += 1
              val word = s.substring(i + 1, j)
              var neg = false
              if (j < s.length && s(j) == '-') { neg = true; j += 1 }
              val ps = j
              while (j < s.length && s(j).isDigit && j - ps < 7) j += 1
              val param =
                if (j == ps) None
                else Some {
                  val v = s.substring(ps, j).toInt
                  if (neg) -v else v
                }
              if (j < s.length && s(j) == ' ') j += 1 // delimiter
              if (justOpened && destinations.contains(word)) {
                skipGroup(i) match {
                  case Some(k) =>
                    depth -= 1
                    ucStack.remove(ucStack.length - 1)
                    j = k
                  case None => return Left("rtf_structure")
                }
              } else word match {
                case "par" => out.append('\n'); nPars += 1
                case "line" => out.append('\n')
                case "tab" => out.append('\t')
                case "uc" =>
                  ucStack(ucStack.length - 1) =
                    math.max(0, param.getOrElse(1))
                case "u" =>
                  val v0 = param.getOrElse(
                    return Left("rtf_structure"))
                  val cp = if (v0 < 0) v0 + 65536 else v0
                  if (cp < 0 || cp > 0xffff)
                    return Left("rtf_structure")
                  out.append(cp.toChar)
                  // skip the \ucN fallback items (char or \'hh each)
                  var k = ucStack.last
                  while (k > 0 && j < s.length) {
                    if (s(j) == '\\' && j + 3 < s.length &&
                      s(j + 1) == '\'') j += 4
                    else if (s(j) == '{' || s(j) == '}')
                      k = 0 // group edge ends fallback early
                    else j += 1
                    if (k > 0) k -= 1
                  }
                case _ => // formatting / header words: no text
              }
              justOpened = false
              i = j
            } else { i += 2 } // other control symbols: no text
            justOpened = false
          case '\r' | '\n' => i += 1 // source line breaks: never text
          case _ =>
            if (depth >= 1) out.append(c)
            justOpened = false
            i += 1
        }
      }
      if (depth != 0) return Left("rtf_structure")
      Right((nPars, out.toString))
    }
  }

  /** RTF stage: same per-partition discipline as [[extractPdfText]]. */
  def extractRtfText(media: Dataset[Multimodal.MediaRecord])
      : Dataset[RtfText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          RtfExtract.parseR(r.media) match {
            case Right((np, t)) =>
              RtfText(r.media_id, r.mime, np, t.length.toLong,
                md5Hex(t), ok = true, None)
            case Left(_) =>
              RtfText(r.media_id, r.mime, 0, 0L, "", ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            RtfText(r.media_id, r.mime, 0, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // EPUB (r17/q258)
  // ------------------------------------------------------------------

  final case class EpubChapter(
      media_id: Long,
      mime: String,
      chapter_no: Int,
      n_blocks: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** EPUB (OCF/OPF) extraction — ebook corpora are book-length,
    * high-quality text behind three layers of indirection: the ZIP
    * container's `mimetype` entry must read `application/epub+zip`,
    * `META-INF/container.xml`'s first `rootfile` names the OPF
    * package document, and the OPF's `spine` orders `manifest` item
    * hrefs (resolved against the OPF's directory) — READING order,
    * which is not ZIP entry order, and manifest items outside the
    * spine (covers, style sheets) are not content. Chapters are
    * XHTML: `body`-scoped block elements (p, h1–h6, li) each yield
    * one line, inline markup is transparent, head/title junk and
    * text outside blocks contribute nothing, the five XML entities
    * decode. Wrong mimetype, a container without a rootfile, a
    * spine idref missing from the manifest, a missing chapter entry,
    * or malformed chapter XHTML fail closed.
    */
  object EpubExtract {
    private val blocks =
      Set("p", "h1", "h2", "h3", "h4", "h5", "h6", "li")

    /** One chapter's (nBlocks, text): block lines joined \n. */
    private[ext] def xhtmlText(x: String): Option[(Int, String)] = {
      val lines = Vector.newBuilder[String]
      var n = 0
      var cur: StringBuilder = null
      var inBody = false
      var i = 0
      while (i < x.length) {
        val lt = x.indexOf('<', i)
        if (lt < 0) i = x.length
        else {
          if (cur != null && lt > i) {
            DocxTextExtract.unescape(x.substring(i, lt)) match {
              case Some(t) => cur.append(t)
              case None => return None
            }
          }
          val gt = x.indexOf('>', lt)
          if (gt < 0) return None
          val tag = x.substring(lt + 1, gt)
          if (tag.startsWith("?")) i = gt + 1
          else if (tag.startsWith("!")) return None
          else {
            val closing = tag.startsWith("/")
            val body0 = if (closing) tag.substring(1) else tag
            val body = if (body0.endsWith("/")) body0.dropRight(1)
              else body0
            val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
              ch != '\r' && ch != '\n').toLowerCase
            if (name == "body") {
              if (closing) { inBody = false; i = x.length }
              else { inBody = true; i = gt + 1 }
            } else if (blocks.contains(name)) {
              if (closing) {
                if (cur == null) return None
                lines += cur.toString
                n += 1
                cur = null
              } else {
                if (!inBody || cur != null) return None // no nesting
                cur = new StringBuilder
              }
              i = gt + 1
            } else i = gt + 1 // inline / head / structural: transparent
          }
          if (i <= lt) return None
        }
      }
      if (cur != null) return None // unclosed block
      val ls = lines.result()
      Some((n, ls.mkString("\n")))
    }

    /** Per-chapter (nBlocks, text) in SPINE order, or a reason code:
      * epub_zip / docx_part_* (container), epub_mimetype,
      * epub_container, epub_opf, epub_chapter_missing,
      * epub_xhtml_profile.
      */
    def parseR(b: Array[Byte])
        : Either[String, Vector[(Int, String)]] = {
      val parts = DocxTextExtract.partsR(b, _ => true) match {
        case Right(p) => p
        case Left(r) => return Left(r)
      }
      val byName = parts.toMap
      byName.get("mimetype") match {
        case Some(mt)
          if new String(mt, "UTF-8") == "application/epub+zip" =>
        case _ => return Left("epub_mimetype")
      }
      val container = byName.get("META-INF/container.xml") match {
        case Some(x) => new String(x, "UTF-8")
        case None => return Left("epub_container")
      }
      // first <rootfile …full-path="…"…> — name-boundary guarded so
      // the <rootfiles> wrapper can never match
      var rfAt = container.indexOf("<rootfile")
      while (rfAt >= 0 && rfAt + 9 < container.length && {
        val c = container(rfAt + 9)
        !(c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
          c == '/' || c == '>')
      }) rfAt = container.indexOf("<rootfile", rfAt + 1)
      if (rfAt < 0) return Left("epub_container")
      val rfEnd = container.indexOf('>', rfAt)
      if (rfEnd < 0) return Left("epub_container")
      val opfPath = DocxNumExtract.attrVal(
        container.substring(rfAt + 1, rfEnd), "full-path") match {
        case Some(p) if p.nonEmpty => p
        case _ => return Left("epub_container")
      }
      val opfDir = {
        val cut = opfPath.lastIndexOf('/')
        if (cut < 0) "" else opfPath.substring(0, cut + 1)
      }
      val opf = byName.get(opfPath) match {
        case Some(x) => new String(x, "UTF-8")
        case None => return Left("epub_opf")
      }
      // manifest items (id → href) and spine idrefs, in order
      val items = scala.collection.mutable.HashMap.empty[String, String]
      val spine = Vector.newBuilder[String]
      var i = 0
      while (i < opf.length) {
        val lt = opf.indexOf('<', i)
        if (lt < 0) i = opf.length
        else {
          val gt = opf.indexOf('>', lt)
          if (gt < 0) return Left("epub_opf")
          val tag = opf.substring(lt + 1, gt)
          val body = if (tag.endsWith("/")) tag.dropRight(1) else tag
          val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
            ch != '\r' && ch != '\n')
          if (name == "item") {
            (DocxNumExtract.attrVal(body, "id"),
              DocxNumExtract.attrVal(body, "href")) match {
              case (Some(id), Some(href)) => items(id) = href
              case _ => return Left("epub_opf")
            }
          } else if (name == "itemref") {
            DocxNumExtract.attrVal(body, "idref") match {
              case Some(id) => spine += id
              case None => return Left("epub_opf")
            }
          }
          i = gt + 1
        }
      }
      val order = spine.result()
      if (order.isEmpty) return Left("epub_opf")
      val out = Vector.newBuilder[(Int, String)]
      var c = 0
      while (c < order.length) {
        val href = items.get(order(c)) match {
          case Some(h) => h
          case None => return Left("epub_opf") // idref not in manifest
        }
        val chapter = byName.get(opfDir + href) match {
          case Some(x) => new String(x, "UTF-8")
          case None => return Left("epub_chapter_missing")
        }
        xhtmlText(chapter) match {
          case Some(r) => out += r
          case None => return Left("epub_xhtml_profile")
        }
        c += 1
      }
      Right(out.result())
    }
  }

  /** EPUB stage: one row per spine chapter (1-based); a failing book
    * emits one chapter_no=0 row.
    */
  def extractEpub(media: Dataset[Multimodal.MediaRecord])
      : Dataset[EpubChapter] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try {
          EpubExtract.parseR(r.media) match {
            case Right(chs) =>
              chs.zipWithIndex.map { case ((nb, t), i) =>
                EpubChapter(r.media_id, r.mime, i + 1, nb,
                  t.length.toLong, md5Hex(t), ok = true, None)
              }
            case Left(_) =>
              Seq(EpubChapter(r.media_id, r.mime, 0, 0, 0L, "",
                ok = false, None))
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq(EpubChapter(r.media_id, r.mime, 0, 0, 0L, "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // MIME / EML (r17/q254)
  // ------------------------------------------------------------------

  final case class EmlText(
      media_id: Long,
      mime: String,
      n_text_parts: Int,
      subject_md5: String,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** RFC 5322/2045/2046/2047 message extraction — mail archives are a
    * standing training-data source and every body byte is
    * transfer-encoded. Headers unfold (continuation lines join with
    * one space); the body decodes by Content-Transfer-Encoding
    * (7bit/8bit/binary identity, quoted-printable with soft breaks,
    * base64 — hand-rolled STRICT: an invalid byte fails closed where
    * the JDK MIME decoder would silently skip it), then by charset
    * (us-ascii / utf-8 strict / iso-8859-1), then CRLF normalizes to
    * \n. A multipart container walks parts between `--boundary`
    * delimiters —
    * the CLOSING `--boundary--` is required, the preamble/epilogue
    * and non-text parts (attachments) never leak — recursively to
    * depth 8; multipart/alternative contributes its FIRST text/plain
    * child (the plain rendition of the html twin), other multiparts
    * every text/plain child in order, joined \n. Subjects decode
    * their RFC 2047 encoded-words (B and Q forms, `_` = space in Q).
    * Missing closing delimiter, malformed transfer coding, foreign
    * charsets, or a malformed encoded-word fail closed.
    */
  object MimeExtract {

    private def b64Strict(s: String): Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream
      var acc = 0
      var nbits = 0
      var pad = 0
      var i = 0
      while (i < s.length) {
        val c = s(i)
        val v =
          if (c >= 'A' && c <= 'Z') c - 'A'
          else if (c >= 'a' && c <= 'z') c - 'a' + 26
          else if (c >= '0' && c <= '9') c - '0' + 52
          else if (c == '+') 62
          else if (c == '/') 63
          else if (c == '=') { pad += 1; -1 }
          else if (c == '\r' || c == '\n' || c == ' ' || c == '\t') -2
          else return None
        if (v >= 0) {
          if (pad > 0) return None // data after padding
          acc = (acc << 6) | v
          nbits += 6
          if (nbits >= 8) {
            nbits -= 8
            out.write((acc >> nbits) & 0xff)
          }
        }
        i += 1
      }
      // valid tails: whole groups (no pad), 2 chars + '==' (4 bits
      // over), 3 chars + '=' (2 bits over); leftover bits must be 0
      val okTail = (nbits, pad) match {
        case (0, 0) => true
        case (4, 2) => true
        case (2, 1) => true
        case _ => false
      }
      if (!okTail) return None
      if (nbits > 0 && (acc & ((1 << nbits) - 1)) != 0) return None
      Some(out.toByteArray)
    }

    private def qpDecode(s: String): Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream
      def hex(c: Char): Int =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else -1
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c == '=') {
          if (i + 1 < s.length && s(i + 1) == '\n') i += 2 // soft LF
          else if (i + 2 < s.length && s(i + 1) == '\r' &&
            s(i + 2) == '\n') i += 3 // soft CRLF
          else if (i + 2 < s.length) {
            val h1 = hex(s(i + 1)); val h2 = hex(s(i + 2))
            if (h1 < 0 || h2 < 0) return None
            out.write((h1 << 4) | h2)
            i += 3
          } else return None
        } else { out.write(c.toInt & 0xff); i += 1 }
      }
      Some(out.toByteArray)
    }

    private def charsetDecode(b: Array[Byte], cs: String)
        : Option[String] = cs.toLowerCase match {
      case "utf-8" | "us-ascii" =>
        val d = decodeUtf8Strict(b, 0)
        if (cs.equalsIgnoreCase("us-ascii") &&
          b.exists(x => (x & 0x80) != 0)) None
        else d
      case "iso-8859-1" | "latin1" => Some(new String(b, "ISO-8859-1"))
      case _ => None
    }

    /** Header map (lowercased name → unfolded value, first wins) and
      * the body start offset.
      */
    private def headers(s: String)
        : Option[(Map[String, String], Int)] = {
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, String]
      var i = 0
      var curName: String = null
      val curVal = new StringBuilder
      def flush(): Unit = if (curName != null) {
        if (!acc.contains(curName)) acc(curName) = curVal.toString.trim
        curName = null
        curVal.clear()
      }
      while (i < s.length) {
        val eol0 = s.indexOf('\n', i)
        val eol = if (eol0 < 0) s.length else eol0
        val rawLine = s.substring(i, eol)
        val line =
          if (rawLine.endsWith("\r")) rawLine.dropRight(1) else rawLine
        if (line.isEmpty) { // blank line: body starts after it
          flush()
          return Some((acc.toMap, eol + 1))
        }
        if (line(0) == ' ' || line(0) == '\t') {
          if (curName == null) return None // continuation of nothing
          curVal.append(' ').append(line.trim)
        } else {
          flush()
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          curName = line.substring(0, colon).trim.toLowerCase
          curVal.append(line.substring(colon + 1).trim)
        }
        i = eol + 1
      }
      flush()
      Some((acc.toMap, s.length)) // headers-only message: empty body
    }

    /** (type/subtype lowercased, params lowercased-key map). */
    private[ext] def contentType(v: String)
        : Option[(String, Map[String, String])] = {
      val parts = v.split(';')
      val tpe = parts(0).trim.toLowerCase
      if (!tpe.contains('/')) return None
      val params = scala.collection.mutable.HashMap.empty[String, String]
      var i = 1
      while (i < parts.length) {
        val p = parts(i).trim
        if (p.nonEmpty) {
          val eq = p.indexOf('=')
          if (eq <= 0) return None
          val k = p.substring(0, eq).trim.toLowerCase
          var value = p.substring(eq + 1).trim
          if (value.length >= 2 && value.startsWith("\"") &&
            value.endsWith("\""))
            value = value.substring(1, value.length - 1)
          params(k) = value
        }
        i += 1
      }
      Some((tpe, params.toMap))
    }

    /** Decode one entity body to text if it is text/plain. */
    private def decodeTextBody(hdrs: Map[String, String], body: String)
        : Either[String, Option[String]] = {
      val (tpe, params) =
        contentType(hdrs.getOrElse("content-type",
          "text/plain; charset=us-ascii")) match {
          case Some(x) => x
          case None => return Left("eml_content_type")
        }
      if (tpe != "text/plain") return Right(None)
      val cte = hdrs.getOrElse("content-transfer-encoding", "7bit")
        .trim.toLowerCase
      val rawBytes = cte match {
        case "7bit" | "8bit" | "binary" =>
          Some(body.getBytes("ISO-8859-1"))
        case "quoted-printable" => qpDecode(body)
        case "base64" => b64Strict(body)
        case _ => None
      }
      val bytes = rawBytes match {
        case Some(x) => x
        case None => return Left("eml_transfer_encoding")
      }
      charsetDecode(bytes, params.getOrElse("charset", "us-ascii")) match {
        case Some(t) => Right(Some(t.replace("\r\n", "\n")))
        case None => return Left("eml_charset")
      }
    }

    /** Walk one entity; Right(text parts in order). */
    private def walkEntity(hdrs: Map[String, String], body: String,
                           depth: Int)
        : Either[String, Vector[String]] = {
      if (depth > 8) return Left("eml_structure")
      val (tpe, params) =
        contentType(hdrs.getOrElse("content-type",
          "text/plain; charset=us-ascii")) match {
          case Some(x) => x
          case None => return Left("eml_content_type")
        }
      if (!tpe.startsWith("multipart/"))
        return decodeTextBody(hdrs, body).map(_.toVector)
      val boundary = params.get("boundary") match {
        case Some(b) if b.nonEmpty => b
        case _ => return Left("eml_structure")
      }
      // split on delimiter lines; the closing delimiter is REQUIRED
      val delim = "--" + boundary
      val lines = body.split("\n", -1)
      val partAcc = Vector.newBuilder[Vector[String]]
      var cur: StringBuilder = null
      var closed = false
      var li = 0
      def finishPart(): Either[String, Unit] = {
        if (cur != null) {
          // the CRLF before a delimiter belongs to the delimiter: its
          // LF was the split point, its CR is still on the last line
          val raw = cur.toString
          val trimmed =
            if (raw.endsWith("\r")) raw.dropRight(1) else raw
          headers(trimmed) match {
            case Some((ph, off)) =>
              walkEntity(ph, trimmed.substring(off), depth + 1) match {
                case Right(ts) => partAcc += ts
                case Left(e) => return Left(e)
              }
            case None => return Left("eml_headers")
          }
        }
        Right(())
      }
      while (li < lines.length && !closed) {
        val line0 = lines(li)
        val line =
          if (line0.endsWith("\r")) line0.dropRight(1) else line0
        if (line == delim + "--") {
          finishPart() match {
            case Left(e) => return Left(e)
            case _ =>
          }
          cur = null
          closed = true
        } else if (line == delim) {
          finishPart() match {
            case Left(e) => return Left(e)
            case _ =>
          }
          cur = new StringBuilder
        } else if (cur != null) {
          if (cur.nonEmpty) cur.append('\n')
          cur.append(line0) // keep original \r for the part's decoder
        }
        li += 1
      }
      if (!closed) return Left("eml_structure")
      val parts = partAcc.result()
      if (tpe == "multipart/alternative")
        Right(parts.find(_.nonEmpty).map(_.take(1)).getOrElse(Vector()))
      else Right(parts.flatten)
    }

    /** RFC 2047 encoded-word decoding for header values. */
    private[ext] def decodeWords(v: String): Option[String] = {
      val out = new StringBuilder
      var i = 0
      while (i < v.length) {
        val at = v.indexOf("=?", i)
        if (at < 0) { out.append(v.substring(i)); i = v.length }
        else {
          out.append(v.substring(i, at))
          val q1 = v.indexOf('?', at + 2)
          if (q1 < 0) return None
          val q2 = v.indexOf('?', q1 + 1)
          if (q2 < 0 || q2 != q1 + 2) return None
          val end = v.indexOf("?=", q2 + 1)
          if (end < 0) return None
          val cs = v.substring(at + 2, q1)
          val enc = v.substring(q1 + 1, q2).toLowerCase
          val data = v.substring(q2 + 1, end)
          val bytes = enc match {
            case "b" => b64Strict(data) match {
              case Some(x) => x
              case None => return None
            }
            case "q" =>
              qpDecode(data.replace('_', ' ')) match {
                case Some(x) => x
                case None => return None
              }
            case _ => return None
          }
          charsetDecode(bytes, cs) match {
            case Some(t) => out.append(t)
            case None => return None
          }
          i = end + 2
        }
      }
      Some(out.toString)
    }

    /** (nTextParts, decodedSubject, text) or a stable reason code:
      * eml_headers, eml_content_type, eml_transfer_encoding,
      * eml_charset, eml_structure, eml_subject.
      */
    def parseR(b: Array[Byte]): Either[String, (Int, String, String)] = {
      if (b == null || b.length == 0) return Left("eml_headers")
      val s = new String(b, "ISO-8859-1")
      val (hdrs, bodyAt) = headers(s) match {
        case Some(x) => x
        case None => return Left("eml_headers")
      }
      if (!hdrs.contains("from") && !hdrs.contains("mime-version"))
        return Left("eml_headers") // not message-shaped
      val subject = decodeWords(hdrs.getOrElse("subject", "")) match {
        case Some(x) => x
        case None => return Left("eml_subject")
      }
      walkEntity(hdrs, s.substring(bodyAt), 0) match {
        case Right(parts) =>
          Right((parts.length, subject, parts.mkString("\n")))
        case Left(e) => Left(e)
      }
    }
  }

  final case class MboxMsg(
      media_id: Long,
      mime: String,
      msg_no: Int,
      n_text_parts: Int,
      subject_md5: String,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** mbox mail-archive container (the file one mailbox IS on disk):
    * messages separated by `From ` lines at column 0; the writer
    * terminates every message with one newline (stripped back on
    * read — only the LAST message carries it inside its slice, the
    * others end at the separator's preceding newline), and quotes
    * body lines matching `^>*From ` with one extra `>` (mboxrd) —
    * the reader strips one. A file not starting with `From ` fails
    * whole (mbox_magic); each message then parses independently
    * through [[MimeExtract]] — one broken message is one failed ROW,
    * not a failed archive (the per-page accountability convention).
    */
  object MboxExtract {
    private val quoted = java.util.regex.Pattern.compile("^>+From .*")

    def splitR(b: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
      if (b == null || b.length < 6) return Left("mbox_magic")
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("From ")) return Left("mbox_magic")
      val seps = scala.collection.mutable.ArrayBuffer[Int](0)
      var at = s.indexOf("\nFrom ")
      while (at >= 0) {
        seps += at + 1
        at = s.indexOf("\nFrom ", at + 1)
      }
      val msgs = Vector.newBuilder[Array[Byte]]
      var idx = 0
      while (idx < seps.length) {
        val start = seps(idx)
        val hdrEnd = s.indexOf('\n', start)
        if (hdrEnd < 0) return Left("mbox_truncated")
        var content =
          if (idx + 1 < seps.length)
            s.substring(hdrEnd + 1, seps(idx + 1) - 1)
          else {
            val tail = s.substring(hdrEnd + 1)
            if (tail.endsWith("\n")) tail.dropRight(1) else tail
          }
        if (content.nonEmpty) {
          val unq = content.split("\n", -1).map { l =>
            if (quoted.matcher(l).matches()) l.substring(1) else l
          }
          content = unq.mkString("\n")
        }
        msgs += content.getBytes("ISO-8859-1")
        idx += 1
      }
      Right(msgs.result())
    }
  }

  /** mbox stage: one row per message (msg_no 1-based); a file-level
    * failure emits one msg_no=0 row.
    */
  def extractMbox(media: Dataset[Multimodal.MediaRecord])
      : Dataset[MboxMsg] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try {
          MboxExtract.splitR(r.media) match {
            case Right(msgs) =>
              msgs.zipWithIndex.map { case (mb, i) =>
                MimeExtract.parseR(mb) match {
                  case Right((np, subj, t)) =>
                    MboxMsg(r.media_id, r.mime, i + 1, np,
                      md5Hex(subj), md5Hex(t), ok = true, None)
                  case Left(_) =>
                    MboxMsg(r.media_id, r.mime, i + 1, 0, "", "",
                      ok = false, None)
                }
              }
            case Left(_) =>
              Seq(MboxMsg(r.media_id, r.mime, 0, 0, "", "", ok = false,
                None))
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq(MboxMsg(r.media_id, r.mime, 0, 0, "", "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
    }
  }

  /** EML stage: same per-partition discipline as [[extractPdfText]]. */
  def extractEmlText(media: Dataset[Multimodal.MediaRecord])
      : Dataset[EmlText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          MimeExtract.parseR(r.media) match {
            case Right((np, subj, t)) =>
              EmlText(r.media_id, r.mime, np, md5Hex(subj),
                t.length.toLong, md5Hex(t), ok = true, None)
            case Left(_) =>
              EmlText(r.media_id, r.mime, 0, "", 0L, "", ok = false,
                None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            EmlText(r.media_id, r.mime, 0, "", 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // DOCX list numbering (r17/q252)
  // ------------------------------------------------------------------

  final case class DocxNumbered(
      media_id: Long,
      mime: String,
      n_paragraphs: Int,
      n_numbered: Int,
      text_len: Long,
      text_md5: String,
      ok: Boolean,
      error: Option[String])

  /** List-numbering-aware main-document extraction: paragraphs
    * carrying `w:pPr/w:numPr` render their ECMA-376 §17.9 marker —
    * `word/numbering.xml`'s `w:num` → `w:abstractNum` → `w:lvl`
    * (numFmt + lvlText + start) resolution — ahead of the text, so
    * "1. / 2. / a) / -" list structure survives into the corpus
    * instead of silently flattening (every list in a real document
    * loses its ordinals under q223's walk).
    *
    * Counter semantics (the Word-observable subset, documented):
    * one counter per (numId, ilvl) — two nums sharing an
    * abstractNum count independently; a level's first use renders
    * its `w:start` (default 1); incrementing a level RESETS all
    * deeper levels of the same numId; `%k` in lvlText renders level
    * k-1's current counter (its start if unreferenced yet) in THAT
    * level's numFmt. Profile: numFmt ∈ {decimal, bullet,
    * lowerLetter} (lowerLetter rolls over a..z, aa..); `numId 0`
    * removes numbering (plain paragraph, no increment); an
    * unresolvable numId/ilvl, a non-name numFmt, `%k` referencing a
    * bullet level, or a `w:tbl` (table cells carry their own
    * numbering contexts — out of this operator's profile) fail the
    * document closed.
    */
  object DocxNumExtract {

    /** numId → ilvl → (numFmt, lvlText, start). */
    private[ext] def numDefsR(xml: String)
        : Either[String, Map[Int, Map[Int, (String, String, Int)]]] = {
      val absLvls = scala.collection.mutable.HashMap
        .empty[Int, Map[Int, (String, String, Int)]]
      val numAbs = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      var curAbs = -1
      var curLvls = Map.empty[Int, (String, String, Int)]
      var curLvl = -1
      var fmt: String = null
      var lvlText: String = null
      var start = 1
      var curNum = -1
      var i = 0
      while (i < xml.length) {
        val lt = xml.indexOf('<', i)
        if (lt < 0) i = xml.length
        else {
          val gt = xml.indexOf('>', lt)
          if (gt < 0) return Left("docx_xml_profile")
          val tag = xml.substring(lt + 1, gt)
          if (tag.startsWith("?")) i = gt + 1
          else if (tag.startsWith("!")) return Left("docx_xml_profile")
          else {
            val selfClosing = tag.endsWith("/")
            val body = if (selfClosing) tag.dropRight(1) else tag
            val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
              ch != '\r' && ch != '\n')
            name match {
              case "w:abstractNum" =>
                attrInt(body, "w:abstractNumId") match {
                  case Some(a) if curAbs < 0 && !selfClosing =>
                    curAbs = a; curLvls = Map.empty
                  case _ => return Left("docx_xml_profile")
                }
              case "/w:abstractNum" =>
                if (curAbs < 0 || curLvl >= 0)
                  return Left("docx_xml_profile")
                absLvls(curAbs) = curLvls
                curAbs = -1
              case "w:lvl" =>
                attrInt(body, "w:ilvl") match {
                  case Some(l) if curAbs >= 0 && curLvl < 0 &&
                    !selfClosing =>
                    curLvl = l; fmt = null; lvlText = null; start = 1
                  case _ => return Left("docx_xml_profile")
                }
              case "/w:lvl" =>
                if (curLvl < 0 || fmt == null || lvlText == null)
                  return Left("docx_xml_profile")
                curLvls += (curLvl -> ((fmt, lvlText, start)))
                curLvl = -1
              case "w:numFmt" if curLvl >= 0 =>
                fmt = attrVal(body, "w:val").orNull
                if (fmt == null) return Left("docx_xml_profile")
              case "w:lvlText" if curLvl >= 0 =>
                lvlText = attrVal(body, "w:val").orNull
                if (lvlText == null) return Left("docx_xml_profile")
              case "w:start" if curLvl >= 0 =>
                start = attrInt(body, "w:val") match {
                  case Some(v) if v >= 0 => v
                  case _ => return Left("docx_xml_profile")
                }
              case "w:num" =>
                attrInt(body, "w:numId") match {
                  case Some(n) if curNum < 0 && !selfClosing => curNum = n
                  case _ => return Left("docx_xml_profile")
                }
              case "/w:num" =>
                if (curNum < 0 || !numAbs.contains(curNum))
                  return Left("docx_xml_profile")
                curNum = -1
              case "w:abstractNumId" if curNum >= 0 =>
                attrInt(body, "w:val") match {
                  case Some(a) => numAbs(curNum) = a
                  case None => return Left("docx_xml_profile")
                }
              case _ => // lvlJc, pPr presentation noise: skipped
            }
            i = gt + 1
          }
        }
      }
      if (curAbs >= 0 || curNum >= 0 || curLvl >= 0)
        return Left("docx_xml_profile")
      val out = Map.newBuilder[Int, Map[Int, (String, String, Int)]]
      numAbs.foreach { case (num, abs) =>
        absLvls.get(abs) match {
          case Some(lvls) => out += (num -> lvls)
          case None => return Left("docx_xml_profile")
        }
      }
      Right(out.result())
    }

    /** Attribute value `name="…"` inside a tag body (entity-decoded
      * via the five-entity profile).
      */
    private[ext] def attrVal(body: String, name: String)
        : Option[String] = {
      val pat = name + "=\""
      var at = body.indexOf(pat)
      while (at > 0 && !" \t\r\n".contains(body(at - 1)))
        at = body.indexOf(pat, at + 1)
      if (at < 0) return None
      val st = at + pat.length
      val end = body.indexOf('"', st)
      if (end < 0) None
      else DocxTextExtract.unescape(body.substring(st, end))
    }

    private def attrInt(body: String, name: String): Option[Int] =
      attrVal(body, name).flatMap { v =>
        if (v.nonEmpty && v.length <= 9 && v.forall(_.isDigit))
          Some(v.toInt)
        else None
      }

    /** Render counter value `n` in `fmt`. */
    private def render(fmt: String, n: Int): Option[String] = fmt match {
      case "decimal" => Some(n.toString)
      case "lowerLetter" if n >= 1 =>
        val ch = ('a' + ((n - 1) % 26)).toChar
        Some(ch.toString * (1 + (n - 1) / 26))
      case _ => None // bullet levels cannot be referenced by %k
    }

    /** (nParagraphs, nNumbered, renderedText). */
    def parseR(b: Array[Byte]): Either[String, (Int, Int, String)] = {
      val parts = DocxTextExtract.partsR(b, n =>
        n == "word/document.xml" || n == "word/numbering.xml") match {
        case Right(p) => p
        case Left(r) => return Left(r)
      }
      val docXml = parts.find(_._1 == "word/document.xml") match {
        case Some((_, x)) => new String(x, "UTF-8")
        case None => return Left("docx_no_document_part")
      }
      val defs = parts.find(_._1 == "word/numbering.xml") match {
        case Some((_, x)) => numDefsR(new String(x, "UTF-8")) match {
          case Right(d) => d
          case Left(r) => return Left(r)
        }
        case None => Map.empty[Int, Map[Int, (String, String, Int)]]
      }
      // walk document.xml: per-paragraph text + numPr
      val paras = scala.collection.mutable.ArrayBuffer
        .empty[(String, Int, Int)] // (text, ilvl, numId; -1 = plain)
      var cur: StringBuilder = null
      var inRun = false
      var inPPr = false
      var inNumPr = false
      var pIlvl = 0
      var pNumId = -1
      var i = 0
      while (i < docXml.length) {
        val lt = docXml.indexOf('<', i)
        if (lt < 0) i = docXml.length
        else {
          val gt = docXml.indexOf('>', lt)
          if (gt < 0) return Left("docx_xml_profile")
          val tag = docXml.substring(lt + 1, gt)
          if (tag.startsWith("?")) i = gt + 1
          else if (tag.startsWith("!")) return Left("docx_xml_profile")
          else {
            val selfClosing = tag.endsWith("/")
            val body = if (selfClosing) tag.dropRight(1) else tag
            val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
              ch != '\r' && ch != '\n')
            name match {
              case "w:p" if !selfClosing =>
                if (cur != null) return Left("docx_xml_profile")
                cur = new StringBuilder
                pIlvl = 0; pNumId = -1
              case "/w:p" =>
                if (cur == null) return Left("docx_xml_profile")
                paras += ((cur.toString, pIlvl, pNumId))
                cur = null
              case "w:pPr" if !selfClosing => inPPr = true
              case "/w:pPr" => inPPr = false
              case "w:numPr" if !selfClosing =>
                if (!inPPr) return Left("docx_xml_profile")
                inNumPr = true
              case "/w:numPr" => inNumPr = false
              case "w:ilvl" if inNumPr =>
                pIlvl = attrInt(body, "w:val") match {
                  case Some(v) => v
                  case None => return Left("docx_xml_profile")
                }
              case "w:numId" if inNumPr =>
                pNumId = attrInt(body, "w:val") match {
                  case Some(v) => v
                  case None => return Left("docx_xml_profile")
                }
              case "w:tbl" =>
                return Left("docx_xml_profile") // out of this profile
              case "w:r" if !selfClosing => inRun = true
              case "/w:r" => inRun = false
              case "w:br" | "w:cr" =>
                if (inRun && cur != null) cur.append('\n')
              case "w:tab" =>
                if (inRun && cur != null) cur.append('\t')
              case "w:t" =>
                if (cur == null) return Left("docx_xml_profile")
                if (!selfClosing) {
                  val end = docXml.indexOf("</w:t>", gt + 1)
                  if (end < 0) return Left("docx_xml_profile")
                  DocxTextExtract.unescape(
                    docXml.substring(gt + 1, end)) match {
                    case Some(t) => cur.append(t)
                    case None => return Left("docx_xml_profile")
                  }
                }
              case _ =>
            }
            i = if (name == "w:t" && !selfClosing)
              docXml.indexOf("</w:t>", gt + 1) + 6
            else gt + 1
          }
        }
      }
      if (cur != null) return Left("docx_xml_profile")
      // render
      val counters = scala.collection.mutable.HashMap
        .empty[(Int, Int), Int]
      val outText = new StringBuilder
      var nNum = 0
      var pi = 0
      while (pi < paras.length) {
        val (t, ilvl, numId) = paras(pi)
        if (pi > 0) outText.append('\n')
        if (numId < 0 || numId == 0) outText.append(t)
        else {
          val lvls = defs.get(numId) match {
            case Some(l) => l
            case None => return Left("docx_xml_profile")
          }
          val (fmt, lvlText, startV) = lvls.get(ilvl) match {
            case Some(x) => x
            case None => return Left("docx_xml_profile")
          }
          val cur2 = counters.getOrElse((numId, ilvl), startV - 1) + 1
          counters((numId, ilvl)) = cur2
          // incrementing a level resets all deeper levels of the num
          lvls.keysIterator.filter(_ > ilvl)
            .foreach(l => counters.remove((numId, l)))
          if (fmt != "decimal" && fmt != "bullet" &&
            fmt != "lowerLetter") return Left("docx_xml_profile")
          // marker: lvlText with %k → level k-1's counter in ITS fmt
          val marker = new StringBuilder
          var mi = 0
          while (mi < lvlText.length) {
            val c = lvlText(mi)
            if (c == '%' && mi + 1 < lvlText.length &&
              lvlText(mi + 1).isDigit) {
              val l = lvlText(mi + 1) - '0' - 1
              val (rf, _, rs) = lvls.get(l) match {
                case Some(x) => x
                case None => return Left("docx_xml_profile")
              }
              render(rf, counters.getOrElse((numId, l), rs)) match {
                case Some(x) => marker.append(x)
                case None => return Left("docx_xml_profile")
              }
              mi += 2
            } else { marker.append(c); mi += 1 }
          }
          nNum += 1
          outText.append(marker).append(' ').append(t)
        }
        pi += 1
      }
      Right((paras.length, nNum, outText.toString))
    }
  }

  /** Numbering-aware DOCX stage: same per-partition discipline as
    * [[extractDocxText]].
    */
  def extractDocxNumbered(media: Dataset[Multimodal.MediaRecord])
      : Dataset[DocxNumbered] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          DocxNumExtract.parseR(r.media) match {
            case Right((np, nn, t)) =>
              DocxNumbered(r.media_id, r.mime, np, nn, t.length.toLong,
                md5Hex(t), ok = true, None)
            case Left(_) =>
              DocxNumbered(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
                None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            DocxNumbered(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** DOCX text-extraction stage: same per-partition discipline as
    * [[extractPdfText]].
    */
  def extractDocxText(media: Dataset[Multimodal.MediaRecord])
      : Dataset[DocxText] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          DocxTextExtract.parse(r.media) match {
            case Some((np, nr, t)) =>
              DocxText(r.media_id, r.mime, np, nr, t.length.toLong,
                md5Hex(t), ok = true, None)
            case None =>
              DocxText(r.media_id, r.mime, 0, 0, 0L, "", ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            DocxText(r.media_id, r.mime, 0, 0, 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }
}
