package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.SketchFns

/** Streaming benchmark-contamination report — the online twin of
  * [[graft.ext.Dedup.contaminationReport]]: documents arrive as a
  * stream, the benchmark (eval-suite) side is STATIC, and every ingest
  * window emits each document's count of distinct word n-grams shared
  * with the benchmark. This is the decontamination check run
  * continuously at ingest time instead of as a pre-training batch sweep.
  *
  * Execution shape (the part that matters at ingest-pipeline scale):
  * a stream-static inner join where the static side is the benchmark's
  * distinct n-gram HASHES — megabytes of eval data against an unbounded
  * stream — explicitly `broadcast()` so every micro-batch joins map-side
  * against the same reused broadcast; the stream is never shuffled for
  * the join itself. The only stateful node is the windowed per-document
  * count of (rare) matches, bounded by one window's distinct contaminated
  * documents. N-grams cross as 8-byte xxhash64 values
  * ([[SketchFns.hashed_shingles]] — the identical kernel the batch
  * operator uses, so batch and stream flag the SAME n-grams), never as
  * strings.
  */
object StreamingContamination {

  final case class DocText(docId: Long, text: String, eventTime: Timestamp)

  /** One row per (ingest window, contaminated document): shared-n-gram
    * count and contamination ratio. Documents with zero shared n-grams
    * do not appear (inner join), matching the batch report.
    */
  def report(docs: Dataset[DocText], benchmark: DataFrame, benchText: Column,
             n: Int = 5, windowLen: String = "1 hour",
             watermarkDelay: String = "10 minutes"): DataFrame = {
    val benchSet = benchmark
      .select(explode(SketchFns.hashed_shingles(benchText, n)).as("s"))
      .distinct()
    docs.toDF()
      // plan-edge null guard (house rule for every streaming operator):
      // null eventTime is not reliably dropped by the watermark; null
      // text has no shingles
      .filter(col("eventTime").isNotNull && col("text").isNotNull)
      .withWatermark("eventTime", watermarkDelay)
      // at-least-once delivery guard: a redelivered document would count
      // its shingles twice into the same window (ratio > 1.0); dedup by
      // docId within the watermark — TTL'd state, sized to the
      // redelivery horizon, not stream lifetime
      .dropDuplicatesWithinWatermark("docId")
      .select(col("docId"), col("eventTime"),
        SketchFns.hashed_shingles(col("text"), n).as("sh"))
      .select(col("docId"), col("eventTime"),
        size(col("sh")).as("n_shingles"), explode(col("sh")).as("s"))
      .join(broadcast(benchSet), "s")
      .groupBy(window(col("eventTime"), windowLen), col("docId"),
               col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("contamination_ratio",
        col("n_shared").cast("double") / col("n_shingles"))
      .select(col("window").getField("start").as("window_start"),
              col("docId"), col("n_shingles"), col("n_shared"),
              col("contamination_ratio"))
  }
}
