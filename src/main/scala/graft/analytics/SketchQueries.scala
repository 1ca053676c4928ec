package graft.analytics

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.BottomKByMd5

/** Approximate sketches and sampling. q37's HLL/quantile-sketch values
  * are approximate by construction — no external engine reproduces
  * Spark's HLL++ bit-for-bit, so it is a rows-only check with its
  * accuracy asserted against exact values in SketchSpec. q38's sample is
  * deterministic (bottom-k by md5) and therefore fully oracle-checked.
  */
object SketchQueries {

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q37: the approximate-aggregate surface — HLL++ distinct counts and
    // approximate percentiles. At 100 TB these replace their exact
    // counterparts (q11/q17): single-pass, bounded memory, no sort.
    // Oracle-gated since round 11 (was rows-only): the sketch VALUES are
    // engine-specific and never hash-comparable, so the output carries
    // the exact twins (count_distinct, count) plus error-bound
    // PREDICATES over the sketches — `users_within_rsd` (3σ of the 2%
    // rsd) and `p95_rank_ok` (the picked p95's true CDF inside
    // [0.94, 0.96]) — which the oracle pins to literal TRUE; a sketch
    // drifting out of its accuracy contract flips the hash red.
    GraftQuery(
      "q37_approx_sketches",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val agg = t.events
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id"), rsd = 0.02)
              .as("approx_users"),
            percentile_approx(col("value"), lit(0.95), lit(10000))
              .as("approx_p95"),
            count_distinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n_events"))
        // true rank of the sketch's p95 pick: one broadcast of the tiny
        // per-type agg back over events, no second shuffle of the values
        val cdf = t.events.select(col("event_type").as("et"), col("value"))
          .join(broadcast(agg.select(col("event_type").as("et"),
            col("approx_p95"))), "et")
          .groupBy(col("et"))
          .agg(avg((col("value") <= col("approx_p95")).cast("double"))
            .as("cdf"))
        agg.join(broadcast(cdf), agg("event_type") === cdf("et"))
          .select(col("event_type"), col("exact_users"), col("n_events"),
            (abs(col("approx_users") - col("exact_users")).cast("double")
              <= col("exact_users").cast("double") * 0.06 + lit(3.0))
              .as("users_within_rsd"),
            (col("cdf") >= 0.94 && col("cdf") <= 0.96).as("p95_rank_ok"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               TRUE AS users_within_rsd,
               TRUE AS p95_rank_ok
        FROM events GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q38: deterministic bottom-k sample per event type via the typed
    // Aggregator (bounded k-element partial buffers through the shuffle).
    GraftQuery(
      "q38_deterministic_sample",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        import spark.implicits._
        val agg = new BottomKByMd5[(String, Long)](20, _._2).toColumn
        t.events.select(col("event_type"), col("event_id"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .agg(agg.name("sample_ids"))
          .toDF("event_type", "sample_ids")
          .select(col("event_type"),
                  explode(col("sample_ids")).as("event_id"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""
        SELECT event_type, event_id FROM (
          SELECT event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
          FROM events)
        WHERE rn <= 20
        ORDER BY event_type, event_id""")),

    // ------------------------------------------------------------------
    // q215: mergeable count-min sketch store ([[graft.ext.CmsStore]]) —
    // the frequency member of the sketch-store family (q63 HLL
    // distinct-counts, q198 log-linear quantiles): per-source d×w count
    // matrices whose merge is cell-wise addition. The gate pins the
    // LINEARITY identity cell-by-cell (union-of-shard-sketches ≡
    // direct sketch of the union — `union_consistent`), the one-sided
    // guarantee (estimate ≥ exact, structural) on the top-20 exact
    // twin, and — because the oracle replays poly_hash as a power sum
    // with interpolated 31^j mod p constants plus the same affine row
    // maps — every cell count and every estimate bit-for-bit.
    GraftQuery(
      "q215_cms_sketch_store",
      (spark, dir) => {
        import graft.ext.CmsStore
        val t = new Tables(spark, dir)
        val words = CmsStore.tokens(t.documents, col("text"))
        val perShard = CmsStore.sketchCells(words, col("source"))
        val merged = perShard.groupBy(col("row"), col("col"))
          .agg(sum(col("cnt")).as("cnt"))
        val direct = CmsStore.sketchCells(words, lit("all"))
          .select(col("row"), col("col"), col("cnt").as("d_cnt"))
        val consistent = merged.join(direct, Seq("row", "col"), "full_outer")
          .agg(sum(when(col("cnt") <=> col("d_cnt"), 0L).otherwise(1L))
            .as("mismatch"))
          .select((col("mismatch") === 0L).as("union_consistent"))
        val top = words.groupBy(col("word"))
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("word"))
          .limit(20)
        CmsStore.estimate(merged, top.select(col("word")))
          .join(top, "word")
          .crossJoin(broadcast(consistent)) // 1-row scalar broadcast
          .select(col("word"), col("exact_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("exact_cnt")).as("overestimate_ok"),
            col("union_consistent"))
          .orderBy(col("exact_cnt").desc, col("word"))
      },
      Some(s"""
        WITH pwt AS (SELECT ${duckPow31List} AS pw),
        w0 AS (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents),
        words AS (
          SELECT source, word FROM w0
          WHERE word <> '' AND octet_length(encode(word)) < 64),
        wh AS (
          SELECT word,
                 list_sum(list_transform(
                   range(0, octet_length(encode(word))), k ->
                   ((strpos('0123456789ABCDEF',
                            substr(hex(encode(word)),
                                   CAST(2 * k + 1 AS INT), 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF',
                              substr(hex(encode(word)),
                                     CAST(2 * k + 2 AS INT), 1)) - 1))
                   * pw[CAST(octet_length(encode(word)) - k AS INT)]))
                 % 1000000007 AS h
          FROM words, pwt),
        rows_ AS (SELECT * FROM (VALUES (0, 31, 17), (1, 271, 193),
                                        (2, 631, 409), (3, 877, 751))
                  t(i, a, b)),
        cells AS (
          SELECT t.i AS row, CAST((wh.h * t.a + t.b) % 1000000007 % 1024
                   AS INT) AS col, COUNT(*) AS cnt
          FROM wh CROSS JOIN rows_ t
          GROUP BY 1, 2),
        top AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_cnt
          FROM words GROUP BY 1
          ORDER BY exact_cnt DESC, word LIMIT 20),
        probes AS (
          SELECT DISTINCT tp.word, tp.exact_cnt, wh.h
          FROM top tp JOIN wh ON tp.word = wh.word),
        est AS (
          SELECT p.word, p.exact_cnt, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
          FROM probes p CROSS JOIN rows_ t
          JOIN cells c ON c.row = t.i
            AND c.col = CAST((p.h * t.a + t.b) % 1000000007 % 1024 AS INT)
          GROUP BY 1, 2)
        SELECT word, exact_cnt, est_cnt,
               est_cnt >= exact_cnt AS overestimate_ok,
               TRUE AS union_consistent
        FROM est
        ORDER BY exact_cnt DESC, word"""))
  )

  /** `list_value(31^0 mod p, …, 31^63 mod p)` for the q215 oracle's
    * power-sum replay of poly_hash (the house constant-interpolation
    * discipline: the constants are powers of the published base, not
    * values computed by the kernel under test).
    */
  private def duckPow31List: String =
    graft.ext.CmsStore.pow31(64).mkString("list_value(", ", ", ")")
}
