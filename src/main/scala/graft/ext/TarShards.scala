package graft.ext

import org.apache.spark.sql.Dataset

/** USTAR tar-shard walking for the WebDataset layout — the standard
  * container for multimodal training data: a corpus ships as many
  * ~1 GB `.tar` shards, each holding samples as adjacent files that
  * share a basename key and differ by extension (`000123.jpg`,
  * `000123.txt`, `000123.cls`, …). Loaders stream shards
  * sequentially; a curation engine needs to ENUMERATE them — entries,
  * sample grouping, completeness against a required-extension set,
  * payload accounting — without decoding payloads.
  *
  * Pure 512-byte-block USTAR walking (POSIX.1-1988 layout): octal
  * size field, header checksum verified (checksum bytes counted as
  * spaces), `prefix` + `name` joining, regular files vs directories
  * by typeflag, data rounded up to block size, two zero blocks then
  * EOF (strict profile — no GNU long-name extensions, no sparse
  * files; everything else fails closed). Same discipline as the other
  * container parsers: bounded, None on any malformed byte, never
  * throws. Scale shape: per-shard map-side walking; shard bytes never
  * cross a shuffle.
  */
object TarShards {

  final case class TarShard(
      media_id: Long,
      mime: String,
      n_entries: Int,
      n_dirs: Int,
      n_samples: Int,
      n_complete: Int,
      payload_bytes: Long,
      first_sample: String,
      first_txt_md5: String,
      ok: Boolean,
      error: Option[String])

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xff
      if (c == 0 || c == ' ') {
        if (seen) i = end - 1 // stop at terminator
      } else if (c >= '0' && c <= '7') {
        v = v * 8 + (c - '0')
        if (v < 0) return None
        seen = true
      } else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val cap = off + len
    while (end < cap && b(end) != 0) end += 1
    new String(b, off, end - off, "US-ASCII")
  }

  /** One header at `off`: (path, size, isDir, nextOffset); None on a
    * malformed header, Some(null) convention avoided — the zero-block
    * probe happens in [[parse]].
    */
  private def entry(b: Array[Byte], off: Int)
      : Option[(String, Long, Boolean, Int)] = {
    if (off + 512 > b.length) return None
    val magic = str(b, off + 257, 6)
    if (magic != "ustar" && magic != "ustar ") return None
    for {
      size <- octal(b, off + 124, 12)
      stored <- octal(b, off + 148, 8)
      if size <= Int.MaxValue
      sum = {
        var s = 0L
        var i = 0
        while (i < 512) {
          s += (if (i >= 148 && i < 156) ' ' else b(off + i) & 0xff)
          i += 1
        }
        s
      }
      if sum == stored
      typeflag = b(off + 156) & 0xff
      if typeflag == '0' || typeflag == 0 || typeflag == '5'
      dataBlocks = ((size + 511) / 512).toInt
      next = off + 512 + dataBlocks * 512
      if next <= b.length
    } yield {
      val prefix = str(b, off + 345, 155)
      val name = str(b, off, 100)
      val path = if (prefix.isEmpty) name else prefix + "/" + name
      (path, size, typeflag == '5', next)
    }
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    if (off + 512 > b.length) return false
    var i = off
    while (i < off + 512) {
      if (b(i) != 0) return false
      i += 1
    }
    true
  }

  /** Walk a whole shard; `required` is the extension set a sample
    * needs to count as complete. Returns (entries, dirs, samples,
    * complete, payloadBytes, firstSampleKey, md5-of-first-.txt).
    */
  def parse(b: Array[Byte], required: Set[String])
      : Option[(Int, Int, Int, Int, Long, String, String)] = {
    if (b == null || b.length < 1024 || b.length % 512 != 0) return None
    var off = 0
    var entries = 0
    var dirs = 0
    var payload = 0L
    val exts = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.Set[String]]
    var firstSample: String = null
    var firstTxtMd5 = ""
    while (!isZeroBlock(b, off)) {
      entry(b, off) match {
        case None => return None
        case Some((path, size, isDir, next)) =>
          if (entries + dirs > 100000) return None
          if (isDir) dirs += 1
          else {
            entries += 1
            payload += size
            val base = path.substring(path.lastIndexOf('/') + 1)
            val dot = base.indexOf('.')
            if (dot > 0) {
              val key = base.substring(0, dot)
              val ext = base.substring(dot + 1)
              val s = exts.getOrElseUpdate(key,
                scala.collection.mutable.Set.empty[String])
              s += ext
              if (firstSample == null) firstSample = key
              if (ext == "txt" && firstTxtMd5.isEmpty) {
                val md = java.security.MessageDigest.getInstance("MD5")
                md.update(b, off + 512, size.toInt)
                firstTxtMd5 = md.digest().map(x => f"$x%02x").mkString
              }
            }
          }
          off = next
      }
    }
    // strict terminator: exactly two zero blocks, then EOF
    if (!isZeroBlock(b, off) || !isZeroBlock(b, off + 512)) return None
    if (off + 1024 != b.length) return None
    val complete = exts.valuesIterator.count(s => required.subsetOf(s.toSet))
    Some((entries, dirs, exts.size, complete, payload,
      Option(firstSample).getOrElse(""), firstTxtMd5))
  }

  /** Extraction stage: per-partition typed loop, fail-closed rows. */
  def extractTar(media: Dataset[Multimodal.MediaRecord],
                 required: Set[String]): Dataset[TarShard] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          parse(r.media, required) match {
            case Some((e, d, s, c, p, fs, md5)) =>
              TarShard(r.media_id, r.mime, e, d, s, c, p, fs, md5,
                ok = true, None)
            case None =>
              TarShard(r.media_id, r.mime, 0, 0, 0, 0, 0L, "", "",
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            TarShard(r.media_id, r.mime, 0, 0, 0, 0, 0L, "", "",
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Fixture-side USTAR writer (specs pin the decoder against
    * hand-built headers, not this): (path, isDir, payload) entries.
    */
  def encode(files: Seq[(String, Boolean, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    files.foreach { case (path, isDir, payload) =>
      val h = new Array[Byte](512)
      val nameB = path.getBytes("US-ASCII")
      require(nameB.length <= 100, "fixture names fit the name field")
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off,
          len - 1)
        h(off + len - 1) = 0
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(if (isDir) 0L else payload.length.toLong, 124, 12)
      oct(0, 136, 12)
      h(156) = if (isDir) '5' else '0'
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
      h(263) = '0'; h(264) = '0' // version "00"
      // checksum: field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      if (!isDir) {
        out.write(payload)
        val pad = (512 - payload.length % 512) % 512
        out.write(new Array[Byte](pad))
      }
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
