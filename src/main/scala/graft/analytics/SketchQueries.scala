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
    GraftQuery(
      "q37_approx_sketches",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id"), rsd = 0.02)
              .as("approx_users"),
            percentile_approx(col("value"), lit(0.95), lit(10000))
              .as("approx_p95"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
      },
      None),

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
