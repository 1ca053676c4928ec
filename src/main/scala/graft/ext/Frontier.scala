package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two criteria: the rows for which no
  * other row is at-least-as-good on both axes and strictly better on
  * one — the shape of every "best trade-off" curation question (cost vs
  * quality, length vs perplexity, price vs volume). Minimizes `x`,
  * maximizes `y`; flip signs at the call site for other orientations.
  *
  * The naive formulation is a quadratic NOT-EXISTS self-join; the sorted
  * formulation is a single window: order by (x asc, y desc) and keep a
  * row iff its y strictly exceeds the running max of y over all earlier
  * rows. But one global ordered window is ONE task — wrong at scale. The
  * fix exploits skyline decomposability, skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)): phase 1 runs the window PER
  * PARTITION-BUCKET (any deterministic bucketing works — local
  * domination implies global domination, so pre-filtering only discards
  * rows the global pass would discard), shrinking each bucket to its
  * own frontier; phase 2 runs the same window once over the tiny union
  * of survivors. Total: one hash exchange + per-bucket sort, then one
  * final window over ~frontier-sized data — the same two-level shape as
  * every map-side-combine aggregation here.
  *
  * Inputs are deduplicated on (x, y) first (distinct points make
  * "dominates" = (≤, ≥) with inequality, so the strict running-max test
  * and NOT EXISTS agree exactly — coincident points are all on the
  * frontier together or all off it).
  */
object Frontier {

  private def localFrontier(df: DataFrame, part: Seq[Column]): DataFrame = {
    // the partition-less phase-2 call runs over the frontier-sized
    // union of phase-1 survivors — bounded by design
    val spec = if (part.isEmpty)
      graft.functions.BoundedWindow.orderBy(col("x").asc, col("y").desc)
    else Window.partitionBy(part: _*).orderBy(col("x").asc, col("y").desc)
    val w = spec.rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__my", max(col("y")).over(w))
      .filter(col("__my").isNull || col("y") > col("__my"))
      .drop("__my")
  }

  /** Distinct (x, y) points on the minimize-x / maximize-y frontier.
    * `buckets` controls phase-1 parallelism; bucketing hashes x so the
    * per-bucket window sorts ~1/buckets of the data.
    */
  def pareto2d(df: DataFrame, x: Column, y: Column,
               buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val pts = df.select(x.as("x"), y.as("y")).distinct()
    val local = localFrontier(
      pts.withColumn("__b", pmod(hash(col("x")), lit(buckets))),
      Seq(col("__b"))).drop("__b")
    localFrontier(local, Nil)
  }

  /** POLITE fetch schedule (VERDICT r16 item 5): turn a prioritized
    * candidate list into something a rate-limited crawler can
    * execute. Per domain, candidates are ranked by (priority, url) —
    * q230's fetch order — and fetch k is scheduled at
    * `(k-1) × crawl_delay` seconds; `in_window` marks the fetches
    * that fit the first `horizonSec` seconds, i.e. the per-domain
    * fetches-per-window budget `ceil(horizon / delay)` the q230
    * schedule lacked. `delays(domain, delay_s)` comes from
    * [[Robots.crawlDelayFor]]; missing domains get `defaultDelay`.
    *
    * Output: url, domain, priority, fetch_rank, delay_s, fetch_at,
    * in_window. Scale shape: one domain-partitioned window (row_number
    * over a domain's candidates — bounded by that domain's frontier,
    * the unit a polite crawler serializes on anyway) plus one
    * domain-keyed equi-join against the domain-sized delay table,
    * unhinted (AQE broadcasts it when small).
    */
  def politeSchedule(cand: DataFrame, delays: DataFrame,
                     horizonSec: Int, defaultDelay: Int): DataFrame = {
    require(horizonSec > 0 && defaultDelay > 0,
      "horizon and default delay must be positive")
    val ranked = cand.withColumn("fetch_rank",
      row_number().over(Window.partitionBy(col("domain"))
        .orderBy(col("priority"), col("url"))))
    ranked.join(delays, Seq("domain"), "left")
      .withColumn("delay_s",
        coalesce(col("delay_s"), lit(defaultDelay)))
      .withColumn("fetch_at",
        (col("fetch_rank") - 1).cast("long") * col("delay_s"))
      .withColumn("in_window", col("fetch_at") < horizonSec)
  }
}
