package graft.analytics

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ext.{ImageHash, Multimodal}

/** Round-13 widening: pixel-level image near-dup (VERDICT r12 item 2)
  * — a REAL decode path for one format (PNG via the JVM's zlib),
  * integer 9×8 box-average downsample, 64-bit dHash, and banded
  * Hamming pairing ([[graft.ext.ImageHash]]).
  *
  * Fixture discipline (q173/q174): testdata has no image column, so
  * PNGs are synthesized per document from a PRISTINE integer pixel
  * formula — encoded with row-rotating scanline filters (all five
  * PNG filter types) and per-doc color types (gray/RGB/RGBA). The
  * oracle cannot run zlib, and does not need to: it replays
  * luma → box means → gradient bits → hex packing STRAIGHT FROM the
  * pixel formula, so the whole Spark-side decode chain (chunk walk,
  * CRC, inflate, unfilter, channel layout, luma) is verified
  * end-to-end — any decode bug would desynchronize the replayed
  * dHash. Channels are set r=g=b so the BT.601 integer luma is
  * exactly the formula value (77+150+29 = 256), keeping the oracle
  * in pure integer arithmetic; RGBA alpha varies per pixel and must
  * be ignored by a correct decoder.
  *
  * Image dimensions are exact multiples of the 9×8 grid, so each box
  * mean is a constant-size integer sum — SQL-expressible with nested
  * list_transform. The deflate-dependent container length is NOT in
  * the output (raw_len, the decoded scanline byte count, is the
  * derivable size surrogate).
  */
object ImageQueries {

  /** Hamming radius for q203: small enough that only perturbation
    * variants of the same base pattern pair up.
    */
  private val MaxDistance = 2

  /** Synthesized PNG corpus, built once per (sf, partition regime) in
    * Bench's untimed warm-up (FixtureCache) so bench rows price
    * decode+hash, not Deflater. doc_id % 29 == 0 rows carry the raw
    * document text instead — the fail-closed arm. Pixel value:
    * v = (23·b + 5·px² + 3·py² + (px+py)·(m%11)) % 251
    *     + (2 if (px·py) % 13 == m%13)
    * with b = m%7 fixing the base pattern and dimensions — documents
    * sharing (m%7, m%11) differ only in the sparse m%13 perturbation
    * cells, giving true NEAR-dup clusters (box means move by at most
    * 2/area per cell), while different bases stay far apart.
    */
  private def pngFixture(spark: SparkSession, dir: String)
      : Dataset[Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q202_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 29 == 0)
              Multimodal.MediaRecord(m, "application/octet-stream",
                text.getBytes("UTF-8"))
            else {
              val b = (m % 7).toInt
              val w = 18 + (b % 3) * 9
              val h = 16 + (b % 2) * 8
              val ct = (m % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
              val m11 = (m % 11).toInt
              val m13 = (m % 13).toInt
              def v(px: Int, py: Int): Int =
                (23 * b + 5 * px * px + 3 * py * py + (px + py) * m11) % 251 +
                  (if ((px * py) % 13 == m13) 2 else 0)
              val bytes = ImageHash.Png.encode(w, h, ct, (x, y) => {
                val vv = v(x, y)
                ct match {
                  case 0 => Array(vv)
                  case 2 => Array(vv, vv, vv)
                  case _ => Array(vv, vv, vv, ((m + x) % 256).toInt)
                }
              })
              Multimodal.MediaRecord(m, "image/png", bytes)
            }
          }
        }.toDF()
    }.as[Multimodal.MediaRecord]
  }

  /** Shared oracle CTE: pristine pixel formula → 9×8 box means →
    * dHash gradient bits as two 32-bit halves (hi/lo — BIGINT-safe;
    * bit 63 would overflow a signed shift-packed value). Lists are
    * 1-based in DuckDB, hence the [gy+1][gx+2] vs [gy+1][gx+1]
    * neighbor indexing.
    */
  private val dhashSql = """
    WITH img AS (
      SELECT doc_id,
             doc_id % 7 AS b, doc_id % 3 AS ct3,
             doc_id % 11 AS m11, doc_id % 13 AS m13,
             doc_id % 29 = 0 AS bad,
             18 + ((doc_id % 7) % 3) * 9 AS w,
             16 + ((doc_id % 7) % 2) * 8 AS h
      FROM documents),
    means AS (
      SELECT *, list_transform(range(0, 8), gy ->
                list_transform(range(0, 9), gx ->
                  list_sum(flatten(list_transform(
                    range(gy * (h // 8), (gy + 1) * (h // 8)), py ->
                    list_transform(
                      range(gx * (w // 9), (gx + 1) * (w // 9)), px ->
                      (23 * b + 5 * px * px + 3 * py * py
                        + (px + py) * m11) % 251
                        + CASE WHEN (px * py) % 13 = m13
                               THEN 2 ELSE 0 END))))
                  // ((w // 9) * (h // 8)))) AS mm
      FROM img),
    bits AS (
      SELECT *,
        CAST(list_sum(flatten(list_transform(range(0, 4), gy ->
          list_transform(range(0, 8), gx ->
            CASE WHEN mm[gy + 1][gx + 2] > mm[gy + 1][gx + 1]
                 THEN (1::BIGINT << (gy * 8 + gx)) ELSE 0 END))))
          AS BIGINT) AS lo,
        CAST(list_sum(flatten(list_transform(range(4, 8), gy ->
          list_transform(range(0, 8), gx ->
            CASE WHEN mm[gy + 1][gx + 2] > mm[gy + 1][gx + 1]
                 THEN (1::BIGINT << ((gy - 4) * 8 + gx)) ELSE 0 END))))
          AS BIGINT) AS hi
      FROM means)"""

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q202: PNG decode + dHash ([[graft.ext.ImageHash.extractPngHash]])
    // — per-image decode through the real zlib/unfilter path, then the
    // integer 9×8 box-average dHash; non-PNG payloads surface as
    // ok=false zero rows (fail-closed, never task aborts). Map-side
    // only: media bytes never cross a shuffle.
    GraftQuery(
      "q202_png_dhash",
      (spark, dir) => {
        ImageHash.extractPngHash(pngFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("width"), col("height"),
            col("color_type"), col("raw_len"), col("dhash_hex"), col("ok"))
          .orderBy(col("media_id"))
      },
      Some(dhashSql + """
        SELECT doc_id AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'image/png' END AS mime,
               CAST(CASE WHEN bad THEN 0 ELSE w END AS INT) AS width,
               CAST(CASE WHEN bad THEN 0 ELSE h END AS INT) AS height,
               CAST(CASE WHEN bad THEN 0
                         ELSE (CASE WHEN ct3 = 0 THEN 0
                                    WHEN ct3 = 1 THEN 2 ELSE 6 END) END
                 AS INT) AS color_type,
               CAST(CASE WHEN bad THEN 0
                         ELSE h * (1 + w * (CASE WHEN ct3 = 0 THEN 1
                                                 WHEN ct3 = 1 THEN 3
                                                 ELSE 4 END)) END
                 AS BIGINT) AS raw_len,
               CASE WHEN bad THEN ''
                    ELSE upper(lpad(hex(hi), 8, '0')
                               || lpad(hex(lo), 8, '0')) END AS dhash_hex,
               NOT bad AS ok
        FROM bits""")),

    // ------------------------------------------------------------------
    // q203: dHash near-dup pairs ([[graft.ext.ImageHash.dhashPairs]])
    // — pigeonhole-banded candidate join (the q29 SimHash shape) +
    // exact Hamming verify at radius 2. The oracle joins all pairs
    // (SQL evidence twin — exactness is cheap at oracle scale); the
    // Spark path is the banded one that survives 100 TB.
    GraftQuery(
      "q203_png_dhash_pairs",
      (spark, dir) => {
        val hashes = ImageHash.extractPngHash(pngFixture(spark, dir))
          .toDF().filter(col("ok"))
          .select(col("media_id"), col("dhash"))
        ImageHash.dhashPairs(hashes, col("media_id"), col("dhash"),
            MaxDistance)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(dhashSql + s"""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
        FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        WHERE NOT a.bad AND NOT b.bad
          AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
              <= $MaxDistance""")))
}
