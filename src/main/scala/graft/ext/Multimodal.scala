package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata, plus per-partition decode / feature-extraction
  * stages.
  *
  * The decode itself is STUBBED — no image/audio codecs exist in this
  * environment — behind the [[MediaDecoder]] trait: [[StubDecoder]] is a
  * deterministic function of the bytes with the same signature a real
  * (javacv/ImageIO/ffmpeg) decoder would have. Everything AROUND the stub
  * is real and load-bearing: the schema, the typed per-partition batch
  * loop (one decoder instance per partition, not per row), and the rule
  * that media bytes are projected away before any wide transform (the
  * pipeline carries `(mediaKey, meta)` across shuffles, never the bytes —
  * same discipline as the file-transfer body, SURVEY.md §7.4.4).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      mime: String,
      media: Array[Byte])

  final case class MediaMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      sha256: String,
      width: Int,
      height: Int,
      nFrames: Int,
      ok: Boolean,
      error: Option[String])

  /** Decoder contract: bytes in, (width, height, frames) out. */
  trait MediaDecoder extends Serializable {
    def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic fake: dimensions derived from payload length only, so
    * an external oracle can replicate them; a real decoder drops in
    * without touching the pipeline.
    */
  final class StubDecoder extends MediaDecoder {
    override def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int) = {
      val len = bytes.length
      val width = 64 + (len % 16) * 32
      val height = 64 + ((len * 7) % 12) * 32
      val frames = if (mime.startsWith("video/")) 1 + len % 240 else 1
      (width, height, frames)
    }
  }

  /** REAL container-header parsing for the common still-image formats —
    * pure byte slicing, no codec: PNG (IHDR width/height, big-endian
    * 32-bit at offsets 16/20), JPEG (marker-segment scan to the first
    * SOF frame header; height then width, big-endian 16-bit), and GIF
    * (logical screen descriptor, little-endian 16-bit at offsets 6/8).
    * Detection is by MAGIC BYTES, never the caller's mime string —
    * mislabeled media is the norm in crawled corpora. Anything
    * unrecognized (video, audio, truncated headers) falls through to
    * `fallback` (the stub by default), so the codec-free formats stay
    * stubbed while the three ubiquitous image containers report true
    * dimensions.
    */
  final class HeaderDecoder(fallback: MediaDecoder = new StubDecoder)
      extends MediaDecoder {

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    private val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    private def png(b: Array[Byte]): Option[(Int, Int)] =
      // signature(8) + IHDR length(4) + "IHDR"(4) + width(4) + height(4)
      if (b.length >= 24 && b.startsWith(pngMagic) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0) Some((w, h)) else None
      } else None

    private def jpeg(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 9 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost marker sync
        var m = b(i + 1) & 0xff
        // fill bytes: 0xFF may be repeated before the marker code
        while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
        // fill bytes advanced i past the loop-entry bound: re-check before
        // any fixed-offset reads below, else a truncated stream ending in
        // fill bytes + SOF reads out of bounds
        if (i + 9 > b.length) return None
        if (m >= 0xd0 && m <= 0xd9) i += 2 // RSTn/SOI/EOI: no length field
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn frame header: len(2) precision(1) height(2) width(2)
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          return if (w > 0 && h > 0) Some((w, h)) else None
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return None
          i += 2 + segLen
        }
      }
      None
    }

    private def gif(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        val w = le16(b, 6); val h = le16(b, 8)
        if (w > 0 && h > 0) Some((w, h)) else None
      } else None

    private def le24(b: Array[Byte], i: Int): Int =
      ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

    /** WebP (RFC 9649): RIFF container, dimensions from the FIRST
      * payload chunk — `VP8X` (extended: 24-bit LE canvas width−1 /
      * height−1), `VP8 ` (lossy: 0x9D012A start code then 14-bit LE
      * width/height), or `VP8L` (lossless: 0x2F signature then two
      * 14-bit fields packed little-endian, each stored −1). Chunk
      * SIZES are deliberately not trusted — crawled files lie; only
      * magics and bounds gate the reads, like every parser here.
      */
    private def webp(b: Array[Byte]): Option[(Int, Int)] = {
      def fourcc(i: Int, s: String) = s.zipWithIndex.forall {
        case (c, j) => b(i + j) == c.toByte
      }
      if (b.length < 25 || !fourcc(0, "RIFF") || !fourcc(8, "WEBP"))
        return None
      val dims =
        if (fourcc(12, "VP8X") && b.length >= 30)
          Some((le24(b, 24) + 1, le24(b, 27) + 1))
        else if (fourcc(12, "VP8 ") && b.length >= 30 &&
                 (b(23) & 0xff) == 0x9d &&
                 (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a)
          Some((le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff))
        else if (fourcc(12, "VP8L") && (b(20) & 0xff) == 0x2f) {
          val bits = (b(21) & 0xff).toLong | ((b(22) & 0xff).toLong << 8) |
            ((b(23) & 0xff).toLong << 16) | ((b(24) & 0xff).toLong << 24)
          Some((((bits & 0x3fff) + 1).toInt,
            (((bits >> 14) & 0x3fff) + 1).toInt))
        } else None
      dims.filter { case (w, h) => w > 0 && h > 0 }
    }

    override def decode(mime: String, bytes: Array[Byte]): (Int, Int, Int) =
      png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes))
        .orElse(webp(bytes)) match {
        case Some((w, h)) => (w, h, 1)
        case None => fallback.decode(mime, bytes)
      }
  }

  final case class AudioMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long,
      durationMs: Long,
      ok: Boolean,
      error: Option[String])

  /** RIFF/WAVE container-header parsing — the audio twin of
    * [[HeaderDecoder]]: pure byte slicing, no codec. Walks the chunk
    * list ("fmt " → channels/rate/byteRate/bits at fixed little-endian
    * offsets; "data" → payload size), honoring RIFF word alignment
    * (odd-sized chunks pad one byte). Works on header-only prefixes —
    * the declared data size is used, so metadata extraction never needs
    * the (possibly huge) payload bytes in memory. Detection is by magic
    * bytes, never the caller's mime string.
    */
  object WavHeader {
    private def le16(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

    /** (channels, sampleRate, bitsPerSample, nSamples, durationMs), or
      * None if the bytes are not a parseable RIFF/WAVE header.
      */
    def parse(b: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
      if (b.length < 12 ||
          b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
          b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
        return None
      var i = 12L
      var fmt: Option[(Int, Int, Long, Int)] = None
      var dataSize: Option[Long] = None
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val at = i.toInt
        val id = new String(b, at, 4, "US-ASCII")
        val size = le32(b, at + 4)
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          fmt = Some((le16(b, at + 10), le32(b, at + 12).toInt,
            le32(b, at + 16), le16(b, at + 22)))
        } else if (id == "data") {
          dataSize = Some(size)
        }
        i += 8L + size + (size & 1L) // RIFF chunks are word-aligned
      }
      for {
        (ch, rate, byteRate, bits) <- fmt
        ds <- dataSize
        if ch > 0 && rate > 0 && byteRate > 0 && bits > 0 && bits % 8 == 0
      } yield {
        val blockAlign = ch.toLong * (bits / 8)
        (ch, rate, bits, ds / blockAlign, ds * 1000L / byteRate)
      }
    }
  }

  /** Audio-metadata extraction stage: same per-partition discipline as
    * [[extractMeta]]; unparseable payloads become (zeros, ok=false)
    * rows, exceptions become error rows — never task aborts.
    */
  def extractAudioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          WavHeader.parse(r.media) match {
            case Some((ch, rate, bits, n, dur)) =>
              AudioMeta(r.media_id, r.mime, r.media.length.toLong,
                ch, rate, bits, n, dur, ok = true, None)
            case None =>
              AudioMeta(r.media_id, r.mime, r.media.length.toLong,
                0, 0, 0, 0L, 0L, ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            AudioMeta(r.media_id, r.mime, r.media.length.toLong,
              0, 0, 0, 0L, 0L, ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class Mp3Meta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      version: Int,       // 1 = MPEG-1, 2 = MPEG-2, 25 = MPEG-2.5
      layer: Int,         // 1..3
      bitrateKbps: Int,   // first frame's
      sampleRate: Int,
      channels: Int,
      nFrames: Long,
      durationMs: Long,
      vbr: Boolean,
      hasId3v2: Boolean,
      ok: Boolean,
      error: Option[String])

  /** MPEG-audio (MP3 family) frame-header walking — the compressed-
    * audio sibling of [[WavHeader]]: pure big-endian bit slicing over
    * the frame sequence, no codec. An optional ID3v2 tag (syncsafe
    * size, optional footer) is skipped structurally; each frame's
    * 4-byte header is then re-validated and the walk jumps by the
    * layer/version frame-length formula (payload bytes are never
    * scanned, so a frame's content can contain sync-like bytes).
    * Every frame must share the first frame's version/layer/sample
    * rate (a real decoder's constraint); the bitrate may vary per
    * frame (VBR — surfaced as a flag). Strict profile: the first
    * frame must start immediately after the (optional) tag — no junk
    * scanning — and after the last frame only an optional 128-byte
    * ID3v1 "TAG" trailer may remain (the exact-size contract).
    * Duration is exact integer math: frames × samples-per-frame ×
    * 1000 / rate. The ISO bitrate/sample-rate tables are public spec
    * data (ISO 11172-3 / 13818-3).
    */
  object Mp3Header {
    // bitrate tables in kbps, index 1..14 (0 = free, 15 = invalid)
    private val V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256,
      288, 320, 352, 384, 416, 448)
    private val V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320, 384)
    private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 160, 192, 224, 256, 320)
    private val V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128,
      144, 160, 176, 192, 224, 256)
    private val V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
      80, 96, 112, 128, 144, 160)

    private def bitrateKbps(version: Int, layer: Int, idx: Int): Int =
      (version, layer) match {
        case (1, 1) => V1L1(idx)
        case (1, 2) => V1L2(idx)
        case (1, 3) => V1L3(idx)
        case (_, 1) => V2L1(idx)
        case _ => V2L23(idx)
      }

    private def sampleRate(version: Int, idx: Int): Int = {
      val v1 = Array(44100, 48000, 32000)
      version match {
        case 1 => v1(idx)
        case 2 => v1(idx) / 2
        case _ => v1(idx) / 4
      }
    }

    private def samplesPerFrame(version: Int, layer: Int): Int =
      layer match {
        case 1 => 384
        case 2 => 1152
        case _ => if (version == 1) 1152 else 576
      }

    /** Whole-frame byte length including the 4 header bytes. */
    private def frameLen(version: Int, layer: Int, brKbps: Int,
                         rate: Int, pad: Int): Int = layer match {
      case 1 => (12 * brKbps * 1000 / rate + pad) * 4
      case 2 => 144 * brKbps * 1000 / rate + pad
      case _ =>
        if (version == 1) 144 * brKbps * 1000 / rate + pad
        else 72 * brKbps * 1000 / rate + pad
    }

    /** (version, layer, brKbps, rate, channels, pad) of one header. */
    private def header(b: Array[Byte], at: Int)
        : Option[(Int, Int, Int, Int, Int, Int)] = {
      if (at + 4 > b.length) return None
      val b1 = b(at) & 0xff; val b2 = b(at + 1) & 0xff
      val b3 = b(at + 2) & 0xff; val b4 = b(at + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None
      val version = (b2 >> 3) & 3 match {
        case 3 => 1
        case 2 => 2
        case 0 => 25
        case _ => return None // reserved
      }
      val layer = (b2 >> 1) & 3 match {
        case 1 => 3
        case 2 => 2
        case 3 => 1
        case _ => return None // reserved
      }
      val brIdx = (b3 >> 4) & 0xf
      val rateIdx = (b3 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || rateIdx == 3) return None
      val pad = (b3 >> 1) & 1
      if ((b4 & 3) == 2) return None // reserved emphasis
      val mode = (b4 >> 6) & 3
      val channels = if (mode == 3) 1 else 2
      Some((version, layer,
        bitrateKbps(if (version == 1) 1 else 2, layer, brIdx),
        sampleRate(version, rateIdx), channels, pad))
    }

    /** (version, layer, firstBitrateKbps, rate, channels, frames,
      * durationMs, vbr, hasId3v2), or None on anything outside the
      * strict profile.
      */
    def parse(b: Array[Byte])
        : Option[(Int, Int, Int, Int, Int, Long, Long, Boolean, Boolean)] = {
      if (b == null || b.length < 4) return None
      var pos = 0
      var hasId3 = false
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val flags = b(5) & 0xff
        // syncsafe 28-bit size (no byte may have its high bit set),
        // excluding the 10-byte header
        if ((b(6) | b(7) | b(8) | b(9)) < 0) return None
        val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        pos = 10 + size + (if ((flags & 0x10) != 0) 10 else 0)
        if (pos >= b.length) return None
        hasId3 = true
      }
      val first = header(b, pos) match {
        case Some(h) => h
        case None => return None
      }
      val (ver, layer, br0, rate, ch, _) = first
      var frames = 0L
      var vbr = false
      var done = false
      while (!done) {
        header(b, pos) match {
          case Some((v2, l2, br, r2, c2, pad)) =>
            // all frames must agree on everything but the bitrate
            if (v2 != ver || l2 != layer || r2 != rate || c2 != ch)
              return None
            if (br != br0) vbr = true
            val len = frameLen(ver, layer, br, rate, pad)
            if (len <= 4 || pos + len > b.length) return None
            frames += 1
            pos += len
          case None => done = true
        }
        if (pos >= b.length) done = true
      }
      // exact-size contract: nothing after the last frame but an
      // optional ID3v1 trailer
      val rest = b.length - pos
      if (rest != 0 &&
          !(rest == 128 && b(pos) == 'T' && b(pos + 1) == 'A' &&
            b(pos + 2) == 'G')) return None
      if (frames == 0) return None
      val spf = samplesPerFrame(ver, layer)
      Some((ver, layer, br0, rate, ch, frames,
        frames * spf * 1000L / rate, vbr, hasId3))
    }
  }

  /** MP3 metadata extraction stage: same per-partition discipline as
    * [[extractAudioMeta]]; unparseable payloads become zero rows with
    * ok=false, exceptions error rows — never task aborts.
    */
  def extractMp3Meta(media: Dataset[MediaRecord]): Dataset[Mp3Meta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          Mp3Header.parse(r.media) match {
            case Some((v, l, br, rate, ch, n, dur, vbr, id3)) =>
              Mp3Meta(r.media_id, r.mime, r.media.length.toLong,
                v, l, br, rate, ch, n, dur, vbr, id3, ok = true, None)
            case None =>
              Mp3Meta(r.media_id, r.mime, r.media.length.toLong,
                0, 0, 0, 0, 0, 0L, 0L, vbr = false, hasId3v2 = false,
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Mp3Meta(r.media_id, r.mime, r.media.length.toLong,
              0, 0, 0, 0, 0, 0L, 0L, vbr = false, hasId3v2 = false,
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class VideoMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      brand: String,
      timescale: Int,
      durationTicks: Long,
      durationMs: Long,
      width: Int,
      height: Int,
      ok: Boolean,
      error: Option[String])

  /** ISO-BMFF (MP4) box-structure parsing — the video twin of
    * [[WavHeader]]: pure byte slicing over the big-endian box tree
    * ([size u32][4cc type][payload], containers nest), no codec.
    * `ftyp` yields the major brand; `moov/mvhd` (version 0) yields
    * timescale + duration; the first `moov/trak/tkhd` with a nonzero
    * width yields the 16.16 fixed-point display dimensions. Works on
    * header-only prefixes — `mdat` (the payload box, possibly huge) is
    * skipped by its declared size and never needs to be present, so
    * metadata extraction reads O(header) bytes per file. Detection is
    * structural, never the caller's mime string. 64-bit largesize
    * boxes (size==1) and to-end boxes (size==0, legal only as the last
    * top-level box) terminate the walk — header metadata precedes them
    * in every normal writer layout.
    */
  object Mp4Header {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** (brand, timescale, durationTicks, width, height), or None if the
      * bytes are not a parseable MP4 header (no ftyp+mvhd).
      */
    def parse(b: Array[Byte]): Option[(String, Int, Long, Int, Int)] = {
      if (b.length < 8 || fourcc(b, 4) != "ftyp") return None
      var brand: Option[String] = None
      var mvhd: Option[(Int, Long)] = None
      var dims: Option[(Int, Int)] = None

      def walk(from: Long, to: Long, depth: Int): Unit = {
        var i = from
        while (i + 8 <= to && depth < 8) {
          val at = i.toInt
          val size = be32(b, at)
          val typ = fourcc(b, at + 4)
          if (size < 8) return // largesize/to-end/corrupt: stop the walk
          val end = math.min(i + size, to)
          typ match {
            case "ftyp" if i + 12 <= to =>
              brand = Some(fourcc(b, at + 8))
            // length bound FIRST: the version-byte read b(at+8) is only
            // in bounds once the box is known to fit the buffer
            case "mvhd" if i + 28 <= to && b(at + 8) == 0 =>
              // version 0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
              mvhd = Some((be32(b, at + 20).toInt, be32(b, at + 24)))
            case "tkhd" if i + 92 <= to && b(at + 8) == 0
                && dims.isEmpty =>
              // version 0: width/height are 16.16 fixed at offsets 84/88
              val w = (be32(b, at + 84) >> 16).toInt
              val h = (be32(b, at + 88) >> 16).toInt
              if (w > 0 && h > 0) dims = Some((w, h))
            case "moov" | "trak" => walk(i + 8, end, depth + 1)
            case _ => // skip (mdat, free, udta, …) by declared size
          }
          i += size
        }
      }
      walk(0L, b.length.toLong, 0)
      for ((ts, dur) <- mvhd if ts > 0) yield {
        val (w, h) = dims.getOrElse((0, 0))
        (brand.getOrElse(""), ts, dur, w, h)
      }
    }
  }

  /** Video-metadata extraction stage: same per-partition discipline as
    * [[extractAudioMeta]]; unparseable payloads become (zeros, ok=false)
    * rows, exceptions become error rows — never task aborts.
    */
  def extractVideoMeta(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          Mp4Header.parse(r.media) match {
            case Some((brand, ts, dur, w, h)) =>
              VideoMeta(r.media_id, r.mime, r.media.length.toLong, brand,
                ts, dur, dur * 1000L / ts, w, h, ok = true, None)
            case None =>
              VideoMeta(r.media_id, r.mime, r.media.length.toLong, "",
                0, 0L, 0L, 0, 0, ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            VideoMeta(r.media_id, r.mime, r.media.length.toLong, "",
              0, 0L, 0L, 0, 0, ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class PdfMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      version: String,
      linearized: Boolean,
      encrypted: Boolean,
      nObjects: Int,
      startxref: Long,
      ok: Boolean,
      error: Option[String])

  /** PDF metadata from bounded header/trailer windows — the document
    * twin of [[WavHeader]]/[[Mp4Header]], and the first of the two
    * payload formats the reference pipeline actually transfers
    * (goanywhere-config.md:123 monitors `*.pdf;*.docx`;
    * camel/file-pipeline.yaml:87-107 stores and routes them). Pure
    * byte/text slicing, no PDF library: the `%PDF-x.y` header comment
    * (ISO 32000-1 §7.5.2), a `/Linearized` probe in the first-KB
    * window (the fast-web-view first object, Annex F), and the LAST
    * trailer dictionary's `/Size` (total indirect objects) +
    * `/Encrypt` presence + `startxref` byte offset from a bounded
    * SUFFIX window (§7.5.5: readers locate the trailer by scanning
    * backward from `%%EOF` — the same O(header+trailer) discipline,
    * never a full-file parse; `mdat`-style content streams are never
    * read). Incremental-update files repeat trailers; taking the last
    * occurrences in the suffix window matches reader behavior (the
    * most recent update wins). Detection is structural, never the
    * caller's mime string.
    */
  object PdfHeader {
    private val headWindow = 2048
    private val tailWindow = 2048

    /** (version, linearized, encrypted, nObjects, startxref), or None
      * if the bytes are not a parseable PDF (no header or no trailer
      * machinery in the suffix window).
      */
    def parse(b: Array[Byte]): Option[(String, Boolean, Boolean, Int, Long)] = {
      if (b.length < 8) return None
      // ISO-8859-1: byte-transparent, so text offsets == byte offsets
      val head = new String(b, 0, math.min(headWindow, b.length), "ISO-8859-1")
      if (!head.startsWith("%PDF-")) return None
      val ver = head.drop(5).takeWhile(c => c.isDigit || c == '.')
      if (!ver.matches("""\d+\.\d+""")) return None
      val linearized = head.contains("/Linearized")
      val tailFrom = math.max(0, b.length - tailWindow)
      val tail = new String(b, tailFrom, b.length - tailFrom, "ISO-8859-1")
      if (!tail.contains("%%EOF")) return None
      val sxAt = tail.lastIndexOf("startxref")
      if (sxAt < 0) return None
      val sxDigits = tail.drop(sxAt + "startxref".length)
        .dropWhile(c => c == '\r' || c == '\n' || c == ' ')
        .takeWhile(_.isDigit)
      if (sxDigits.isEmpty || sxDigits.length > 18) return None
      // last-trailer-wins applies to /Encrypt too: an incremental update
      // that REMOVES encryption must not report the superseded trailer's
      // /Encrypt, so the probe is scoped to the last trailer dictionary.
      // Cross-reference-stream PDFs (ISO 32000 §7.5.8 — no 'trailer'
      // keyword; /Encrypt lives in the stream dict) fall back to the
      // whole suffix window.
      val trAt = tail.lastIndexOf("trailer")
      val encrypted =
        (if (trAt >= 0) tail.substring(trAt) else tail).contains("/Encrypt")
      val sizeAt = tail.lastIndexOf("/Size")
      val nObjects =
        if (sizeAt < 0) 0
        else {
          val ds = tail.drop(sizeAt + "/Size".length)
            .dropWhile(_ == ' ').takeWhile(_.isDigit)
          if (ds.isEmpty || ds.length > 9) 0 else ds.toInt
        }
      Some((ver, linearized, encrypted, nObjects, sxDigits.toLong))
    }
  }

  /** PDF-metadata extraction stage: same per-partition discipline as
    * [[extractAudioMeta]]; unparseable payloads become (zeros,
    * ok=false) rows, exceptions become error rows — never task aborts.
    */
  def extractPdfMeta(media: Dataset[MediaRecord]): Dataset[PdfMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          PdfHeader.parse(r.media) match {
            case Some((ver, lin, enc, n, sx)) =>
              PdfMeta(r.media_id, r.mime, r.media.length.toLong,
                ver, lin, enc, n, sx, ok = true, None)
            case None =>
              PdfMeta(r.media_id, r.mime, r.media.length.toLong,
                "", linearized = false, encrypted = false, 0, 0L,
                ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            PdfMeta(r.media_id, r.mime, r.media.length.toLong,
              "", linearized = false, encrypted = false, 0, 0L,
              ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class DocxMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      nParts: Int,
      hasContentTypes: Boolean,
      compressedBytes: Long,
      uncompressedBytes: Long,
      ok: Boolean,
      error: Option[String])

  /** OOXML (DOCX) part census via the ZIP central directory — the
    * second reference payload format. A DOCX is a ZIP (ECMA-376 §9 /
    * APPNOTE.TXT): locate the end-of-central-directory record by
    * scanning BACKWARD from the tail for its signature (EOCD is ≤ 22 +
    * 65535-byte-comment — a bounded suffix read), then walk the
    * central directory it points at: per-part compressed/uncompressed
    * sizes and names, `[Content_Types].xml` presence (the part every
    * valid OOXML package must carry, ECMA-376 §10.1.2). The LOCAL file
    * headers — and the (possibly huge) deflate payloads — are never
    * touched: at 100 TB this is two bounded range-reads per object,
    * same as [[Mp4Header]] skipping `mdat`. The entry count is
    * validated against the EOCD's total; a mismatch (truncated CD)
    * surfaces as unparseable, not a partial answer.
    */
  object DocxParts {
    private def le16(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

    /** (nParts, hasContentTypes, compressedBytes, uncompressedBytes),
      * or None if the bytes are not a parseable ZIP container.
      */
    def parse(b: Array[Byte]): Option[(Int, Boolean, Long, Long)] = {
      if (b.length < 22) return None
      // EOCD: last occurrence of PK\x05\x06 within comment range
      var eocd = -1
      var i = b.length - 22
      val stop = math.max(0, b.length - 22 - 65535)
      while (eocd < 0 && i >= stop) {
        if (b(i) == 0x50 && b(i + 1) == 0x4b &&
            b(i + 2) == 0x05 && b(i + 3) == 0x06) eocd = i
        else i -= 1
      }
      if (eocd < 0) return None
      val nTotal = le16(b, eocd + 10)
      val cdSize = le32(b, eocd + 12)
      val cdOff = le32(b, eocd + 16)
      if (cdOff + cdSize > eocd || cdOff < 0) return None
      var at = cdOff.toInt
      val cdEnd = (cdOff + cdSize).toInt
      var n = 0
      var hasCt = false
      var comp = 0L
      var uncomp = 0L
      while (at + 46 <= cdEnd &&
             b(at) == 0x50 && b(at + 1) == 0x4b &&
             b(at + 2) == 0x01 && b(at + 3) == 0x02) {
        comp += le32(b, at + 20)
        uncomp += le32(b, at + 24)
        val nameLen = le16(b, at + 28)
        val extraLen = le16(b, at + 30)
        val commentLen = le16(b, at + 32)
        if (at + 46 + nameLen > cdEnd) return None
        val name = new String(b, at + 46, nameLen, "UTF-8")
        if (name == "[Content_Types].xml") hasCt = true
        n += 1
        at += 46 + nameLen + extraLen + commentLen
      }
      // truncated or mis-declared central directory: refuse, don't guess
      if (n != nTotal) return None
      Some((n, hasCt, comp, uncomp))
    }
  }

  /** DOCX-part-census extraction stage: same per-partition discipline
    * as [[extractPdfMeta]]; unparseable payloads become (zeros,
    * ok=false) rows, exceptions become error rows — never task aborts.
    */
  def extractDocxMeta(media: Dataset[MediaRecord]): Dataset[DocxMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          DocxParts.parse(r.media) match {
            case Some((n, hasCt, comp, uncomp)) =>
              DocxMeta(r.media_id, r.mime, r.media.length.toLong,
                n, hasCt, comp, uncomp, ok = true, None)
            case None =>
              DocxMeta(r.media_id, r.mime, r.media.length.toLong,
                0, hasContentTypes = false, 0L, 0L, ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            DocxMeta(r.media_id, r.mime, r.media.length.toLong,
              0, hasContentTypes = false, 0L, 0L, ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  final case class ExifMeta(
      media_id: Long,
      mime: String,
      byteLen: Long,
      endian: String,
      orientation: Int,
      hasMake: Boolean,
      hasModel: Boolean,
      hasGpsIfd: Boolean,
      gpsLatPresent: Boolean,
      gpsLonPresent: Boolean,
      ok: Boolean,
      error: Option[String])

  /** JPEG APP1 / Exif TIFF-IFD metadata — the image-governance twin of
    * [[PdfHeader]]: crawled JPEG routinely carries camera identity
    * (Make/Model, IFD0 tags 0x010F/0x0110) and GPS coordinates (GPS IFD
    * via IFD0 tag 0x8825; latitude 0x0002 / longitude 0x0004) — location
    * PII that q57's text redaction never sees and an erasure/release
    * audit (q187/q189 family) must detect. Presence-only by design: the
    * auditor needs "this file pins a location", never the coordinates
    * themselves, so RATIONAL value arrays are deliberately not
    * dereferenced.
    *
    * Structure per Exif 2.3 / TIFF 6.0: marker-segment scan to APP1
    * ("Exif\0\0"), then the TIFF header — "II"*42 little-endian or
    * "MM"*42 big-endian, BOTH honored for every 16/32-bit read — and a
    * bounded IFD0 walk ([count u16][12-byte entries][next u32]; SHORT
    * values inline left-justified, LONG values the full 4 bytes).
    *
    * Bounds discipline (the house rule): every read is window-checked
    * against the APP1 segment end, entry counts are capped at
    * [[ExifHeader.MaxIfdEntries]] so a hostile count cannot widen the
    * walk, an IFD whose declared entries cross the segment boundary is
    * a parse FAILURE (None → ok=false), and the walk reads O(header)
    * bytes — `mdat`-style payload never matters because everything sits
    * in the first marker segments. Unparseable/truncated → None; the
    * fuzz spec holds the never-throw line.
    */
  object ExifHeader {

    /** Hostile-input cap on declared IFD entry counts (a real IFD0 has
      * dozens of entries; 512 bounds the walk at 6 KiB per IFD).
      */
    val MaxIfdEntries = 512

    final case class Parsed(endian: String, orientation: Int,
        hasMake: Boolean, hasModel: Boolean, hasGpsIfd: Boolean,
        gpsLatPresent: Boolean, gpsLonPresent: Boolean)

    def parse(b: Array[Byte]): Option[Parsed] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) {
          i += 1 // spec-legal fill byte (repeated 0xFF padding before a
                 // marker, ITU T.81 §B.1.1.2) — skip, don't misread it
                 // as a marker whose "length" is the real marker byte
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers carry no length field
        } else if (marker == 0xda) {
          return None // SOS: entropy-coded data follows; no Exif past here
        } else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2) return None
          val segEnd = i + 2 + len
          if (segEnd > b.length) return None
          if (marker == 0xe1 && i + 10 <= segEnd &&
              b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
              b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
            return parseTiff(b, i + 10, segEnd)
          i = segEnd
        }
      }
      None
    }

    /** TIFF-header entry point (also valid for bare .tif files): `t` is
      * the header start, `end` the exclusive window bound — for Exif,
      * the APP1 segment end (IFD offsets are relative to `t`).
      */
    def parseTiff(b: Array[Byte], t: Int, end: Int): Option[Parsed] = {
      if (t + 8 > end || end > b.length) return None
      val le = b(t) == 'I' && b(t + 1) == 'I'
      val be = b(t) == 'M' && b(t + 1) == 'M'
      if (!le && !be) return None
      def u16(i: Int): Int =
        if (le) ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
        else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      def u32(i: Int): Long =
        if (le) ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
          ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
        else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      if (u16(t + 2) != 42) return None

      // walks one IFD; yields (tag -> entry offset) for the tags of
      // interest, or None if the declared entries cross the window
      def walkIfd(off: Long, want: Set[Int]): Option[Map[Int, Int]] = {
        if (off < 8 || t + off + 2 > end) return None
        val at = (t + off).toInt
        val n = math.min(u16(at), MaxIfdEntries)
        if (at + 2 + 12L * n + 4 > end) return None
        var found = Map.empty[Int, Int]
        var i = 0
        while (i < n) {
          val e = at + 2 + 12 * i
          val tag = u16(e)
          if (want.contains(tag)) found += (tag -> e)
          i += 1
        }
        Some(found)
      }

      walkIfd(u32(t + 4),
          Set(0x010f, 0x0110, 0x0112, 0x8825)).flatMap { ifd0 =>
        val orientation = ifd0.get(0x0112)
          .filter(e => u16(e + 2) == 3 && u32(e + 4) >= 1L)
          .map(e => u16(e + 8)).getOrElse(0)
        val gps = ifd0.get(0x8825) match {
          case None => Some(Map.empty[Int, Int]) // no GPS IFD: fine
          case Some(e) => walkIfd(u32(e + 8), Set(0x0002, 0x0004))
        }
        gps.map { g =>
          Parsed(if (le) "le" else "be", orientation,
            hasMake = ifd0.contains(0x010f),
            hasModel = ifd0.contains(0x0110),
            hasGpsIfd = ifd0.contains(0x8825),
            gpsLatPresent = g.contains(0x0002),
            gpsLonPresent = g.contains(0x0004))
        }
      }
    }
  }

  /** Exif extraction stage: same per-partition discipline as
    * [[extractAudioMeta]]; unparseable payloads become
    * (empty-endian, zeros, ok=false) rows, exceptions error rows —
    * never task aborts.
    */
  def extractExifMeta(media: Dataset[MediaRecord]): Dataset[ExifMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        try {
          ExifHeader.parse(r.media) match {
            case Some(p) =>
              ExifMeta(r.media_id, r.mime, r.media.length.toLong,
                p.endian, p.orientation, p.hasMake, p.hasModel,
                p.hasGpsIfd, p.gpsLatPresent, p.gpsLonPresent,
                ok = true, None)
            case None =>
              ExifMeta(r.media_id, r.mime, r.media.length.toLong,
                "", 0, hasMake = false, hasModel = false,
                hasGpsIfd = false, gpsLatPresent = false,
                gpsLonPresent = false, ok = false, None)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            ExifMeta(r.media_id, r.mime, r.media.length.toLong,
              "", 0, hasMake = false, hasModel = false,
              hasGpsIfd = false, gpsLatPresent = false,
              gpsLonPresent = false, ok = false,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Decode/feature-extract stage: typed mapPartitions so the decoder is
    * instantiated once per partition (real decoders are expensive to
    * construct); failures become rows, not task aborts.
    */
  def extractMeta(media: Dataset[MediaRecord], decoder: MediaDecoder)
      : Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val sha = graft.functions.SketchKernels.hex(digest.digest(r.media))
        digest.reset()
        try {
          val (w, h, f) = decoder.decode(r.mime, r.media)
          MediaMeta(r.media_id, r.mime, r.media.length.toLong, sha,
                    w, h, f, ok = true, None)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaMeta(r.media_id, r.mime, r.media.length.toLong, sha,
                      0, 0, 0, ok = false,
                      Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Deterministic frame sampling plan for video payloads: every
    * ceil(n/target) frames — the plan (indices) is computed relationally;
    * only the consuming edge would touch pixels.
    */
  def frameSamplePlan(meta: DataFrame, targetFrames: Int): DataFrame =
    meta.filter(col("nFrames") > 1)
      .withColumn("stride",
        ceil(col("nFrames").cast("double") / targetFrames).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nFrames") - 1, col("stride"))))
      .select(col("media_id"), col("frame_idx"), col("stride"))
}
