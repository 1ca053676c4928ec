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
        FROM bits"""))
  )
}
