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
        ORDER BY event_type, event_id"""))
  )
}
