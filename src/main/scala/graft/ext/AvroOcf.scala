package graft.ext

import org.apache.spark.sql.Dataset

/** Avro Object Container File (OCF) walking — the third real
  * interchange format the engine ingests from scratch (after WARC
  * q216 and gzip q212; the ORC/CSV/JSONL paths ride Spark's native
  * readers, but no Avro connector exists in this deployment, so the
  * reader is the engine's own). Format per the Avro 1.12 spec: magic
  * `Obj\x01`, file-metadata map (avro.schema JSON, avro.codec),
  * 16-byte sync marker, then data blocks of (record count, byte
  * size, payload, sync) until EOF — every block's sync must equal
  * the header's, payloads decode against the schema with EXACT byte
  * consumption, and the file must end exactly on a block boundary
  * (the fail-closed discipline of [[Warc.gzMembers]]).
  *
  * Restricted profile: codec `null` or `deflate` (raw RFC 1951, the
  * spec's required+common pair), schema a FLAT record of
  * long/int/string/boolean/double fields (no unions, no nesting, no
  * logical types) — the shape tabular interchange actually uses.
  * Anything else is None, never a guess.
  *
  * Scale shape: file-per-task map-side walk, same as the WARC note —
  * container bytes never cross a shuffle.
  */
object AvroOcf {

  private val Magic = Array[Byte]('O', 'b', 'j', 1)
  private val AllowedTypes =
    Set("long", "int", "string", "boolean", "double")

  /** zigzag varint long at `pos`: (value, nextPos). */
  private[ext] def readLong(b: Array[Byte], pos: Int)
      : Option[(Long, Int)] = {
    var v = 0L
    var shift = 0
    var p = pos
    while (p < b.length && shift <= 63) {
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return Some(((v >>> 1) ^ -(v & 1L), p))
      shift += 7
    }
    None
  }

  private def readSized(b: Array[Byte], pos: Int)
      : Option[(Array[Byte], Int)] =
    readLong(b, pos).flatMap { case (len, p) =>
      if (len < 0 || p + len > b.length) None
      else Some((java.util.Arrays.copyOfRange(b, p, p + len.toInt),
        p + len.toInt))
    }

  private def readString(b: Array[Byte], pos: Int)
      : Option[(String, Int)] =
    readSized(b, pos).map { case (bs, p) => (new String(bs, "UTF-8"), p) }

  /** Flat-record schema JSON → ordered (fieldName, type) pairs, or
    * None outside the profile. The JSON is engine-profile-checked by
    * structure: a `"fields":[...]` array of flat objects whose
    * `"type"` is one of the five primitive names.
    */
  private[ext] def parseSchema(json: String)
      : Option[Seq[(String, String)]] = {
    if (!json.contains("\"record\"")) return None
    val fAt = json.indexOf("\"fields\"")
    if (fAt < 0) return None
    val open = json.indexOf('[', fAt)
    if (open < 0) return None
    val fields = Vector.newBuilder[(String, String)]
    var i = open + 1
    var done = false
    while (!done) {
      while (i < json.length && (json(i) == ' ' || json(i) == ',')) i += 1
      if (i >= json.length) return None
      if (json(i) == ']') done = true
      else if (json(i) == '{') {
        val close = json.indexOf('}', i)
        if (close < 0) return None
        val obj = json.substring(i, close + 1)
        // nested structure inside a field object = out of profile
        if (obj.indexOf('{', 1) >= 0 || obj.contains("[")) return None
        val name = strField(obj, "name")
        val typ = strField(obj, "type")
        (name, typ) match {
          case (Some(n), Some(t)) if AllowedTypes(t) => fields += ((n, t))
          case _ => return None
        }
        i = close + 1
      } else return None
    }
    val out = fields.result()
    if (out.isEmpty) None else Some(out)
  }

  private def strField(obj: String, name: String): Option[String] = {
    val key = "\"" + name + "\""
    val at = obj.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < obj.length && (obj(i) == ' ' || obj(i) == ':')) i += 1
    if (i >= obj.length || obj(i) != '"') return None
    val end = obj.indexOf('"', i + 1)
    if (end < 0) None else Some(obj.substring(i + 1, end))
  }

  private def rawInflate(data: Array[Byte], cap: Int)
      : Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
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
      if (inf.getBytesRead != data.length) return None
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** One decoded record: field values aligned to the schema order. */
  private def readRecord(b: Array[Byte], pos: Int,
                         fields: Seq[(String, String)])
      : Option[(Seq[Any], Int)] = {
    var p = pos
    val out = Vector.newBuilder[Any]
    fields.foreach { case (_, t) =>
      t match {
        case "long" | "int" =>
          readLong(b, p) match {
            case Some((v, np)) => out += v; p = np
            case None => return None
          }
        case "string" =>
          readString(b, p) match {
            case Some((s, np)) => out += s; p = np
            case None => return None
          }
        case "boolean" =>
          if (p >= b.length || (b(p) != 0 && b(p) != 1)) return None
          out += (b(p) == 1); p += 1
        case "double" =>
          if (p + 8 > b.length) return None
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
          out += java.lang.Double.longBitsToDouble(bits); p += 8
        case _ => return None
      }
    }
    Some((out.result(), p))
  }

  /** Parse a whole OCF: (schemaFields, codec, nBlocks, records), or
    * None on any structural defect or profile violation.
    */
  def parse(b: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[(Seq[(String, String)], String, Int, Vector[Seq[Any]])] = {
    if (b == null || b.length < 20) return None
    if (!(b(0) == Magic(0) && b(1) == Magic(1) &&
      b(2) == Magic(2) && b(3) == Magic(3))) return None
    // file metadata map: positive-count blocks, 0-terminated
    var p = 4
    val meta = scala.collection.mutable.Map.empty[String, String]
    var metaDone = false
    while (!metaDone) {
      readLong(b, p) match {
        case None => return None
        case Some((0L, np)) => p = np; metaDone = true
        case Some((count, np)) if count > 0 && count <= 1024 =>
          p = np
          var i = 0L
          while (i < count) {
            val kv = for {
              (k, p1) <- readString(b, p)
              (v, p2) <- readSized(b, p1)
            } yield (k, v, p2)
            kv match {
              case Some((k, v, p2)) =>
                meta(k) = new String(v, "UTF-8"); p = p2
              case None => return None
            }
            i += 1
          }
        case _ => return None // negative-count map blocks: out of profile
      }
    }
    val codec = meta.getOrElse("avro.codec", "null")
    if (codec != "null" && codec != "deflate") return None
    val fields = meta.get("avro.schema").flatMap(parseSchema) match {
      case Some(f) => f
      case None => return None
    }
    if (p + 16 > b.length) return None
    val sync = java.util.Arrays.copyOfRange(b, p, p + 16)
    p += 16
    // data blocks until exact EOF
    val records = Vector.newBuilder[Seq[Any]]
    var nBlocks = 0
    var total = 0L
    while (p < b.length) {
      val hdr = for {
        (cnt, p1) <- readLong(b, p)
        (sz, p2) <- readLong(b, p1)
      } yield (cnt, sz, p2)
      val (cnt, sz, dataAt) = hdr match {
        case Some(h) => h
        case None => return None
      }
      if (cnt <= 0 || sz < 0 || dataAt + sz > b.length) return None
      val raw = java.util.Arrays.copyOfRange(b, dataAt, dataAt + sz.toInt)
      val data =
        if (codec == "deflate") rawInflate(raw, maxBytes) match {
          case Some(d) => d
          case None => return None
        } else raw
      total += data.length
      if (total > maxBytes) return None
      var q = 0
      var i = 0L
      while (i < cnt) {
        readRecord(data, q, fields) match {
          case Some((vals, nq)) => records += vals; q = nq
          case None => return None
        }
        i += 1
      }
      if (q != data.length) return None // undeclared trailing bytes
      val syncAt = dataAt + sz.toInt
      if (syncAt + 16 > b.length) return None
      var j = 0
      while (j < 16) {
        if (b(syncAt + j) != sync(j)) return None
        j += 1
      }
      p = syncAt + 16
      nBlocks += 1
    }
    Some((fields, codec, nBlocks, records.result()))
  }

  final case class AvroDoc(
      media_id: Long,
      mime: String,
      n_blocks: Int,
      n_records: Long,
      codec: String,
      sum_ids: Long,
      bodies_md5: String,
      ok: Boolean,
      error: Option[String])

  /** Extraction stage for the (id long, body string) tabular profile:
    * per file, block/record counts, codec, Σid, md5 of the bodies
    * joined with `\n`. Files whose schema lacks those two fields (or
    * any walk defect) fail closed.
    */
  def extractAvro(media: Dataset[Multimodal.MediaRecord])
      : Dataset[AvroDoc] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          parse(r.media) match {
            case Some((fields, codec, nb, recs)) =>
              val idAt = fields.indexWhere(_._1 == "id")
              val bodyAt = fields.indexWhere(_._1 == "body")
              if (idAt < 0 || fields(idAt)._2 != "long" ||
                bodyAt < 0 || fields(bodyAt)._2 != "string")
                AvroDoc(r.media_id, r.mime, 0, 0L, "", 0L, "",
                  ok = false, None)
              else {
                var sum = 0L
                val bodies = new StringBuilder
                var first = true
                recs.foreach { v =>
                  sum += v(idAt).asInstanceOf[Long]
                  if (!first) bodies.append('\n')
                  bodies.append(v(bodyAt).asInstanceOf[String])
                  first = false
                }
                AvroDoc(r.media_id, r.mime, nb, recs.length.toLong,
                  codec, sum, DocText.md5Hex(bodies.toString),
                  ok = true, None)
              }
            case None =>
              AvroDoc(r.media_id, r.mime, 0, 0L, "", 0L, "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            AvroDoc(r.media_id, r.mime, 0, 0L, "", 0L, "", ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }
}
