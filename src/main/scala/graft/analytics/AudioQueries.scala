package graft.analytics

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ext.{AudioHash, Multimodal}

/** Round-14 widening: audio CONTENT decode + near-dup fingerprint
  * ([[graft.ext.AudioHash]]) — the audio sibling of the q202/q207
  * pixel-decode family: real RIFF/WAVE walk + little-endian PCM16
  * decode, 65-frame integer energy profile, 64-bit gradient hash.
  * q95 parses WAV HEADERS; this is the first audio SAMPLE decode.
  *
  * Fixture discipline (q202): documents carry no audio column, so
  * WAVs are synthesized per document from a pristine integer sample
  * formula, and the oracle replays samples → frame energies →
  * gradient bits → hex packing straight from that formula — any
  * defect in the chunk walk, fmt parse, or signed little-endian
  * sample decode desynchronizes the replayed hash. Sample counts are
  * exact multiples of 65, so each frame energy is a constant-size
  * integer sum. Even doc_ids carry a LIST(INFO) chunk the decoder
  * must skip; doc_id % 37 rows carry raw text (the fail-closed arm).
  * Pairing needs no new query: [[graft.ext.ImageHash.dhashPairs]] is
  * format-agnostic banded Hamming over 64-bit signatures (q203).
  */
object AudioQueries {

  /** Synthesized WAV corpus, built once per (sf, partition regime) in
    * Bench's untimed warm-up (FixtureCache). Sample formula:
    * s(i) = ((17·b + 3·i² + (i % 7)·m11) % 2003) − 1001
    *        + (2 if i % 13 == m13)
    * with b = doc_id % 7 fixing length (650 + 130·b samples) and
    * sample rate (8000 + 1000·b); documents sharing (b, m11) differ
    * only in the sparse m13 perturbation — frame energies move by at
    * most 2·⌈w/13⌉, the near-dup locality the gradient hash leans on.
    */
  private def wavFixture(spark: SparkSession, dir: String)
      : Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q208_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 37 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else {
              val b = (m % 7).toInt
              val n = 650 + 130 * b
              val m11 = (m % 11).toInt
              val m13 = (m % 13).toInt
              val samples = Array.tabulate(n) { i =>
                (17 * b + 3 * i * i + (i % 7) * m11) % 2003 - 1001 +
                  (if (i % 13 == m13) 2 else 0)
              }
              Multimodal.MediaRecord(m, "audio/wav",
                AudioHash.Wav.encode(8000 + 1000 * b, samples,
                  withList = m % 2 == 0))
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q208: WAV PCM decode + frame-energy fingerprint
    // ([[graft.ext.AudioHash.extractWavFp]]) — per-file RIFF walk,
    // PCM16 sample decode, 65-frame integer energy gradient hash;
    // non-WAV payloads surface as ok=false zero rows (fail-closed,
    // never task aborts). Map-side only: media bytes never cross a
    // shuffle.
    GraftQuery(
      "q208_wav_fingerprint",
      (spark, dir) => {
        AudioHash.extractWavFp(wavFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("sample_rate"),
            col("n_samples"), col("fp_hex"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id,
                 doc_id % 7 AS b, doc_id % 11 AS m11, doc_id % 13 AS m13,
                 doc_id % 37 = 0 AS bad,
                 650 + 130 * (doc_id % 7) AS n
          FROM documents),
        en AS (
          SELECT *, list_transform(range(0, 65), f ->
                   list_sum(list_transform(
                     range(f * (n // 65), (f + 1) * (n // 65)), i ->
                     abs((17 * b + 3 * i * i + (i % 7) * m11) % 2003 - 1001
                         + CASE WHEN i % 13 = m13 THEN 2 ELSE 0 END))))
                 AS e
          FROM img),
        bits AS (
          SELECT *,
            CAST(list_sum(list_transform(range(0, 32), f ->
              CASE WHEN e[f + 2] > e[f + 1]
                   THEN (1::BIGINT << f) ELSE 0 END)) AS BIGINT) AS lo,
            CAST(list_sum(list_transform(range(32, 64), f ->
              CASE WHEN e[f + 2] > e[f + 1]
                   THEN (1::BIGINT << (f - 32)) ELSE 0 END)) AS BIGINT)
              AS hi
          FROM en)
        SELECT doc_id AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'audio/wav' END AS mime,
               CAST(CASE WHEN bad THEN 0
                         ELSE 8000 + 1000 * b END AS INT) AS sample_rate,
               CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_samples,
               CASE WHEN bad THEN ''
                    ELSE upper(lpad(hex(hi), 8, '0')
                               || lpad(hex(lo), 8, '0')) END AS fp_hex,
               NOT bad AS ok
        FROM bits""")),

    // ------------------------------------------------------------------
    // q213: MPEG-audio frame-header walk
    // ([[graft.ext.Multimodal.Mp3Header]]) — compressed-audio metadata
    // for the dominant real-corpus audio container: structural ID3v2
    // skip (syncsafe size), per-frame header re-validation, the ISO
    // bitrate/sample-rate/frame-length tables, VBR detection, exact
    // integer duration, optional ID3v1 trailer. The oracle replays
    // EVERY formula — including the per-frame VBR frame-length sum
    // that must land the walk exactly at the container's last byte
    // (`byte_len`), so one mis-sized frame anywhere desynchronizes
    // the walk and flips ok=false against the oracle. Variants sweep
    // MPEG-1/2 × Layers I/II/III × 3 sample rates × CBR/VBR ×
    // mono/stereo × tag layouts; doc_id % 23 rows carry raw text
    // (fail-closed arm). Map-side only.
    GraftQuery(
      "q213_mp3_meta",
      (spark, dir) => {
        Multimodal.extractMp3Meta(mp3Fixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"),
            // container length only when parsed: for fail-arm rows the
            // oracle cannot know the UTF-8 byte count (DuckDB length()
            // counts characters), and a zero keeps the gate on the
            // walk-consumed-everything property, which is what matters
            when(col("ok"), col("byteLen")).otherwise(0L).as("byte_len"),
            col("version"), col("layer"),
            col("bitrateKbps").as("bitrate_kbps"),
            col("sampleRate").as("sample_rate"), col("channels"),
            col("nFrames").as("n_frames"),
            col("durationMs").as("duration_ms"),
            col("vbr"), col("hasId3v2").as("has_id3v2"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, doc_id % 23 = 0 AS bad,
                 CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS ver,
                 CAST(doc_id % 3 AS INT) + 1 AS layer,
                 CAST(doc_id % 3 AS INT) AS rate_idx,
                 CAST(doc_id % 4 AS INT) AS mode,
                 3 + CAST(doc_id % 9 AS INT) AS n,
                 doc_id % 4 = 0 AS vbr,
                 doc_id % 5 = 0 AS has_id3,
                 doc_id % 7 = 0 AS has_tag
          FROM documents),
        d AS (
          SELECT *,
            (CASE rate_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
                           ELSE 32000 END)
              // (CASE WHEN ver = 1 THEN 1 ELSE 2 END) AS rate,
            CASE WHEN mode = 3 THEN 1 ELSE 2 END AS ch,
            CASE WHEN layer = 1 THEN 384
                 WHEN layer = 2 THEN 1152
                 WHEN ver = 1 THEN 1152 ELSE 576 END AS spf,
            CASE WHEN ver = 1 AND layer = 1 THEN list_value(32, 64, 96,
                   128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
                 WHEN ver = 1 AND layer = 2 THEN list_value(32, 48, 56,
                   64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
                 WHEN ver = 1 THEN list_value(32, 40, 48, 56, 64, 80,
                   96, 112, 128, 160, 192, 224, 256, 320)
                 WHEN layer = 1 THEN list_value(32, 48, 56, 64, 80, 96,
                   112, 128, 144, 160, 176, 192, 224, 256)
                 ELSE list_value(8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
                   112, 128, 144, 160) END AS brt
          FROM p),
        f AS (
          SELECT *,
            brt[1 + CAST(doc_id % 14 AS INT)] AS br0,
            list_sum(list_transform(range(0, n), j ->
              (CASE WHEN layer = 1 THEN 4 ELSE 1 END) *
              ((CASE WHEN layer = 1 THEN 12 ELSE
                  CASE WHEN layer = 2 OR ver = 1 THEN 144 ELSE 72 END
                END) * 1000 *
               (CASE WHEN vbr THEN brt[1 + CAST((doc_id + j) % 14 AS INT)]
                     ELSE brt[1 + CAST(doc_id % 14 AS INT)] END) // rate
               + CAST((doc_id + j) % 2 AS INT)))) AS frames_len
          FROM d)
        SELECT doc_id AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'audio/mpeg' END AS mime,
               CAST(CASE WHEN bad THEN 0
                    ELSE (CASE WHEN has_id3
                               THEN 20 + CAST(doc_id % 100 AS INT)
                               ELSE 0 END)
                         + frames_len
                         + (CASE WHEN has_tag THEN 128 ELSE 0 END) END
                 AS BIGINT) AS byte_len,
               CAST(CASE WHEN bad THEN 0 ELSE ver END AS INT) AS version,
               CAST(CASE WHEN bad THEN 0 ELSE layer END AS INT) AS layer,
               CAST(CASE WHEN bad THEN 0 ELSE br0 END AS INT)
                 AS bitrate_kbps,
               CAST(CASE WHEN bad THEN 0 ELSE rate END AS INT)
                 AS sample_rate,
               CAST(CASE WHEN bad THEN 0 ELSE ch END AS INT) AS channels,
               CAST(CASE WHEN bad THEN 0 ELSE n END AS BIGINT) AS n_frames,
               CAST(CASE WHEN bad THEN 0
                         ELSE n * spf * 1000 // rate END AS BIGINT)
                 AS duration_ms,
               (NOT bad) AND vbr AS vbr,
               (NOT bad) AND has_id3 AS has_id3v2,
               NOT bad AS ok
        FROM f
        ORDER BY media_id"""))
  )

  /** Synthesized MPEG-audio corpus for q213: headers + deterministic
    * filler payloads assembled from the same integer formulas the
    * oracle replays (frame length, tag sizes — see the q213 comment).
    * The fixture builder intentionally re-derives the ISO tables
    * inline rather than calling the parser's — encoder and decoder
    * sharing one table would hide a transposed entry.
    */
  private def mp3Fixture(spark: SparkSession, dir: String)
      : Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q213_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val v1 = Array(Array(0), // layer index 1..3
            Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
              384, 416, 448),
            Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
              256, 320, 384),
            Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
              224, 256, 320))
          val v2 = Array(Array(0),
            Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
              192, 224, 256),
            Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
              144, 160),
            Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
              144, 160))
          it.map { case (m, text) =>
            if (m % 23 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else {
              val ver = if (m % 2 == 0) 1 else 2
              val layer = (m % 3).toInt + 1
              val rateIdx = (m % 3).toInt
              val rate = Array(44100, 48000, 32000)(rateIdx) /
                (if (ver == 1) 1 else 2)
              val mode = (m % 4).toInt
              val n = 3 + (m % 9).toInt
              val vbr = m % 4 == 0
              val brTab = if (ver == 1) v1(layer) else v2(layer)
              val out = new java.io.ByteArrayOutputStream
              if (m % 5 == 0) { // ID3v2, syncsafe size, no footer
                val s = (m % 100).toInt + 10
                out.write('I'); out.write('D'); out.write('3')
                out.write(3); out.write(0); out.write(0)
                out.write(0); out.write(0); out.write(0); out.write(s)
                var z = 0
                while (z < s) { out.write(0); z += 1 }
              }
              var j = 0
              while (j < n) {
                val brIdx =
                  if (vbr) 1 + ((m + j) % 14).toInt else 1 + (m % 14).toInt
                val br = brTab(brIdx)
                val pad = ((m + j) % 2).toInt
                val len =
                  if (layer == 1) (12 * br * 1000 / rate + pad) * 4
                  else if (layer == 2 || ver == 1)
                    144 * br * 1000 / rate + pad
                  else 72 * br * 1000 / rate + pad
                val verBits = if (ver == 1) 3 else 2
                val layerBits = 4 - layer // L1=3, L2=2, L3=1
                out.write(0xff)
                out.write(0xe0 | (verBits << 3) | (layerBits << 1) | 1)
                out.write((brIdx << 4) | (rateIdx << 2) | (pad << 1))
                out.write(mode << 6)
                var k = 4
                while (k < len) {
                  out.write(((m + j * 31 + k) % 251).toInt); k += 1
                }
                j += 1
              }
              if (m % 7 == 0) { // ID3v1 trailer
                out.write('T'); out.write('A'); out.write('G')
                var z = 0
                while (z < 125) { out.write(0); z += 1 }
              }
              Multimodal.MediaRecord(m, "audio/mpeg", out.toByteArray)
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }
}
