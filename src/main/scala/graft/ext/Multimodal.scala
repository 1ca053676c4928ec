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
