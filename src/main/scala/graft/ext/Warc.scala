package graft.ext

import org.apache.spark.sql.Dataset

/** WARC (ISO 28500) container walking — the format web corpora
  * actually arrive in (Common Crawl ships .warc/.warc.gz): a sequence
  * of records, each a `WARC/1.x` version line, named headers, an
  * exact `Content-Length` payload, and a CRLF CRLF terminator. For
  * `response` records the payload is an HTTP/1.x message whose status
  * line, headers, and body are split out — the step that turns a
  * crawl archive into the (uri, status, content-type, html) rows the
  * q209 extractor and everything downstream consume.
  *
  * Same discipline as the other container parsers ([[Multimodal]]):
  * bounded (line length ≤ 8 KiB, ≤ 64 headers per record, payload
  * slices validated against the buffer), fail-closed (None on any
  * malformed byte), exact-size contract (the buffer must end exactly
  * at the last record's terminator). Strict profile: WARC/1.0 or 1.1,
  * no header folding, mandatory Content-Length (the format permits
  * none of these to be absent in practice — Common Crawl satisfies
  * all three).
  *
  * Scale note: at 100 TB the unit of parallelism is the WARC FILE
  * (Common Crawl shards at ~1 GB); per-record gzip members (the
  * .warc.gz layout) decompress per file on the scan side — the same
  * file-per-task shape as q212's gzip reader. Parsing is pure
  * map-side byte walking; archive bytes never cross a shuffle.
  */
object Warc {

  final case class WarcDoc(
      media_id: Long,
      mime: String,
      n_records: Int,
      target_uri: String,
      warc_date: String,
      http_status: Int,
      content_type: String,
      body_len: Long,
      body_md5: String,
      ok: Boolean,
      error: Option[String])

  private val MaxLine = 8192
  private val MaxHeaders = 64

  /** CRLF-terminated line starting at `pos`; None past bounds/cap. */
  private def line(b: Array[Byte], pos: Int): Option[(String, Int)] = {
    var i = pos
    val cap = math.min(b.length - 1, pos + MaxLine)
    while (i < cap) {
      if (b(i) == '\r' && b(i + 1) == '\n')
        return Some((new String(b, pos, i - pos, "UTF-8"), i + 2))
      i += 1
    }
    None
  }

  /** Header block starting at `pos`: lowercased names → values, and
    * the offset just past the blank line. No folding (strict profile).
    */
  private def headers(b: Array[Byte], pos: Int)
      : Option[(Map[String, String], Int)] = {
    var p = pos
    var n = 0
    val m = scala.collection.mutable.Map.empty[String, String]
    while (n <= MaxHeaders) {
      line(b, p) match {
        case None => return None
        case Some(("", next)) => return Some((m.toMap, next))
        case Some((l, next)) =>
          val colon = l.indexOf(':')
          if (colon <= 0) return None
          m(l.substring(0, colon).trim.toLowerCase) =
            l.substring(colon + 1).trim
          p = next
          n += 1
      }
    }
    None // header count cap
  }

  /** One parsed record: (type, headers, payloadStart, payloadLen,
    * nextRecordOffset).
    */
  private def record(b: Array[Byte], pos: Int)
      : Option[(String, Map[String, String], Int, Int, Int)] =
    for {
      (version, afterV) <- line(b, pos)
      if version == "WARC/1.0" || version == "WARC/1.1"
      (hs, afterH) <- headers(b, afterV)
      typ <- hs.get("warc-type")
      lenS <- hs.get("content-length")
      len <- lenS.toLongOption
      if len >= 0 && len <= Int.MaxValue &&
        afterH.toLong + len + 4 <= b.length &&
        b(afterH + len.toInt) == '\r' && b(afterH + len.toInt + 1) == '\n' &&
        b(afterH + len.toInt + 2) == '\r' && b(afterH + len.toInt + 3) == '\n'
    } yield (typ, hs, afterH, len.toInt, afterH + len.toInt + 4)

  /** Split an HTTP/1.x response payload: (status, lowercased headers,
    * bodyStart, bodyLen) — offsets relative to the payload slice.
    */
  private def httpResponse(b: Array[Byte], start: Int, len: Int)
      : Option[(Int, Map[String, String], Int, Int)] =
    for {
      (status, afterS) <- line(b, start)
      if afterS <= start + len && status.startsWith("HTTP/1.") &&
        status.length >= 12
      code <- status.substring(9, 12).toIntOption
      if status.charAt(8) == ' '
      (hs, afterH) <- headers(b, afterS)
      if afterH <= start + len
    } yield (code, hs, afterH, start + len - afterH)

  /** Parse a whole WARC file within the strict profile; None on
    * anything else. Surfaces the FIRST response record's URI, date,
    * status, declared content type, and body bytes (length + md5).
    */
  def parse(b: Array[Byte])
      : Option[(Int, String, String, Int, String, Long, String)] = {
    if (b == null || b.length < 4) return None
    var pos = 0
    var n = 0
    var resp: Option[(String, String, Int, String, Long, String)] = None
    while (pos < b.length) {
      record(b, pos) match {
        case None => return None
        case Some((typ, hs, pStart, pLen, next)) =>
          n += 1
          if (n > 10000) return None
          if (typ == "response" && resp.isEmpty) {
            httpResponse(b, pStart, pLen) match {
              case None => return None
              case Some((code, httpHs, bodyStart, bodyLen)) =>
                if (bodyLen < 0) return None
                val md = java.security.MessageDigest.getInstance("MD5")
                md.update(b, bodyStart, bodyLen)
                val hex = md.digest().map(x => f"$x%02x").mkString
                resp = Some((
                  hs.getOrElse("warc-target-uri", ""),
                  hs.getOrElse("warc-date", ""),
                  code,
                  httpHs.getOrElse("content-type", ""),
                  bodyLen.toLong,
                  hex))
            }
          }
          pos = next
      }
    }
    resp.map { case (uri, date, code, ct, blen, bmd5) =>
      (n, uri, date, code, ct, blen, bmd5)
    }
  }

  /** Bounded multi-member gunzip — the `.warc.gz` layout: Common
    * Crawl gzips each RECORD as its own member and concatenates, so a
    * reader can random-access records by member offset while a
    * sequential reader just inflates the concatenation. Walks the
    * members by hand (RFC 1952 header fields, raw-deflate
    * [[java.util.zip.Inflater]], CRC32 + ISIZE trailer check per
    * member) rather than via GZIPInputStream, which silently treats a
    * malformed next-member header or trailing garbage as EOF — a
    * truncated prefix could then end exactly on a record boundary and
    * pass downstream parsing with records silently dropped. Here
    * EVERY input byte must be accounted for by a well-formed member
    * (header CRC16 verified when present) or the whole parse is None;
    * the output cap keeps hostile bombs bounded (None rather than
    * OOM).
    */
  def gunzipAll(b: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[Array[Byte]] =
    gzMembers(b, maxBytes).map { ms =>
      val out = new java.io.ByteArrayOutputStream
      ms.foreach { case (_, _, data) => out.write(data) }
      out.toByteArray
    }

  /** The member walk behind [[gunzipAll]] and [[cdxIndex]]: one
    * (byteOffset, compressedLength, inflatedBytes) per gzip member,
    * with the same all-bytes-accounted fail-closed contract. Offsets
    * and lengths are the random-access handles a CDX index records —
    * `b[offset, offset+length)` is a self-contained gzip member.
    */
  def gzMembers(b: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[Seq[(Long, Long, Array[Byte])]] = {
    if (b == null || b.length < 2 ||
      (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return None
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val members =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    var total = 0L
    var pos = 0
    while (pos < b.length) {
      // --- member header (RFC 1952 §2.3) ---
      if (pos + 10 > b.length) return None
      if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b ||
        (b(pos + 2) & 0xff) != 8) return None // magic + CM=deflate
      val flg = b(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved flag bits
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (p + 2 > b.length) return None
        p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
        if (p > b.length) return None
      }
      if ((flg & 8) != 0) { // FNAME, NUL-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT, NUL-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return None
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC: CRC32 low 16 bits over the header
        if (p + 2 > b.length) return None
        val hc = new java.util.zip.CRC32
        hc.update(b, pos, p - pos)
        if (((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)) !=
          (hc.getValue & 0xffff)) return None
        p += 2
      }
      // --- raw deflate body, exact consumption tracked ---
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val crc = new java.util.zip.CRC32
        val buf = new Array[Byte](8192)
        val mout = new java.io.ByteArrayOutputStream
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              return None }
          if (n == 0) {
            // not finished yet but no progress: truncated stream or
            // a preset-dictionary demand — both defects here
            if (inf.needsInput() || inf.needsDictionary()) return None
          } else {
            crc.update(buf, 0, n)
            mout.write(buf, 0, n)
            total += n
            if (total > maxBytes) return None
          }
        }
        p += inf.getBytesRead.toInt
        // --- trailer: CRC32 + ISIZE (length mod 2^32) ---
        if (p + 8 > b.length) return None
        if (le32(p) != crc.getValue) return None
        if (le32(p + 4) != (mout.size.toLong & 0xffffffffL)) return None
        members += ((pos.toLong, (p + 8 - pos).toLong, mout.toByteArray))
        pos = p + 8
      } finally inf.end()
    }
    Some(members.toSeq)
  }

  /** Random-access member fetch — the CDX SERVING path: inflate
    * EXACTLY the member at `(offset, length)` from the index, never
    * touching the rest of the file (at crawl scale this is the range
    * request a record reader issues against the archive store). The
    * slice must be one whole well-formed member; anything else is
    * fail-closed None.
    */
  def fetchMember(b: Array[Byte], offset: Long, length: Long,
                  maxBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || offset < 0 || length < 18 ||
      offset + length > b.length) return None
    val slice = java.util.Arrays.copyOfRange(
      b, offset.toInt, (offset + length).toInt)
    gzMembers(slice, maxBytes) match {
      case Some(Seq((0L, l, data))) if l == length => Some(data)
      case _ => None
    }
  }

  final case class CdxRow(
      media_id: Long,
      mime: String,
      member_idx: Int,
      offset: Long,
      member_len: Long,
      record_type: String,
      target_uri: String,
      payload_len: Long,
      ok: Boolean,
      error: Option[String])

  /** CDX-style member index of a `.warc.gz` — the random-access side
    * table Common Crawl publishes next to each archive: one row per
    * gzip member with its byte offset + compressed length (the range
    * a reader fetches to decompress exactly one record without
    * touching the rest of the file) and the contained record's type,
    * target URI, and payload length. Restricted profile: exactly ONE
    * record per member (the CC layout — it is what makes member
    * offsets usable as record addresses); a multi-record member or
    * any walk defect is fail-closed None.
    */
  def cdxIndex(b: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[Seq[(Int, Long, Long, String, String, Long)]] =
    gzMembers(b, maxBytes).flatMap { ms =>
      val out = Vector.newBuilder[(Int, Long, Long, String, String, Long)]
      var idx = 0
      val it = ms.iterator
      while (it.hasNext) {
        val (off, clen, data) = it.next()
        record(data, 0) match {
          case Some((typ, hs, _, pLen, next)) if next == data.length =>
            out += ((idx, off, clen, typ,
              hs.getOrElse("warc-target-uri", ""), pLen.toLong))
          case _ => return None
        }
        idx += 1
      }
      Some(out.result())
    }

  /** CDX extraction stage over `.warc.gz` payloads: one row per
    * member for parseable archives, one ok=false row otherwise —
    * the same per-partition discipline as [[extractWarc]].
    */
  def extractCdx(media: Dataset[Multimodal.MediaRecord])
      : Dataset[CdxRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      try {
        cdxIndex(r.media) match {
          case Some(rows) => rows.map { case (i, off, clen, typ, uri, plen) =>
            CdxRow(r.media_id, r.mime, i, off, clen, typ, uri, plen,
              ok = true, None)
          }
          case None =>
            Seq(CdxRow(r.media_id, r.mime, 0, 0L, 0L, "", "", 0L,
              ok = false, None))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          Seq(CdxRow(r.media_id, r.mime, 0, 0L, 0L, "", "", 0L,
            ok = false,
            Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
      }
    }
  }

  /** Parse a `.warc.gz` (per-record gzip members or one whole-file
    * member — both inflate to the same byte stream): gunzip, then the
    * strict [[parse]].
    */
  def parseGz(b: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[(Int, String, String, Int, String, Long, String)] =
    gunzipAll(b, maxBytes).flatMap(parse)

  /** Gzip each record of an encoded WARC as its own member and
    * concatenate — the Common Crawl shard layout (fixture side).
    */
  def encodeGz(records: Seq[(String, Seq[(String, String)], Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(encode(Seq(r)))
      gz.close() // finishes the member; closing the BAOS is a no-op
    }
    out.toByteArray
  }

  /** Extraction stage over `.warc.gz` payloads. */
  def extractWarcGz(media: Dataset[Multimodal.MediaRecord])
      : Dataset[WarcDoc] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          parseGz(r.media) match {
            case Some((n, uri, date, code, ct, blen, bmd5)) =>
              WarcDoc(r.media_id, r.mime, n, uri, date, code, ct, blen,
                bmd5, ok = true, None)
            case None =>
              WarcDoc(r.media_id, r.mime, 0, "", "", 0, "", 0L, "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            WarcDoc(r.media_id, r.mime, 0, "", "", 0, "", 0L, "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Extraction stage: per-partition typed loop, fail-closed rows. */
  def extractWarc(media: Dataset[Multimodal.MediaRecord])
      : Dataset[WarcDoc] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          parse(r.media) match {
            case Some((n, uri, date, code, ct, blen, bmd5)) =>
              WarcDoc(r.media_id, r.mime, n, uri, date, code, ct, blen,
                bmd5, ok = true, None)
            case None =>
              WarcDoc(r.media_id, r.mime, 0, "", "", 0, "", 0L, "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            WarcDoc(r.media_id, r.mime, 0, "", "", 0, "", 0L, "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Fixture-side WARC writer (the encoder the spec's hand-built
    * golden never uses): records as (type, extra headers, payload).
    */
  def encode(records: Seq[(String, Seq[(String, String)], Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    records.foreach { case (typ, extra, payload) =>
      val sb = new StringBuilder
      sb ++= "WARC/1.0\r\n"
      sb ++= s"WARC-Type: $typ\r\n"
      extra.foreach { case (k, v) => sb ++= s"$k: $v\r\n" }
      sb ++= s"Content-Length: ${payload.length}\r\n"
      sb ++= "\r\n"
      out.write(sb.toString.getBytes("UTF-8"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    out.toByteArray
  }
}
