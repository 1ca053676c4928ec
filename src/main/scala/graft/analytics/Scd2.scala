package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.ext.Cdc

/** Incremental SCD2 maintenance — the daily-merge twin of the q108 full
  * rebuild. The reference's pipeline lands one day of files per dated
  * S3 prefix (`camel/file-pipeline.yaml:80`); the warehouse question is
  * how the slowly-changing history table tracks that daily cadence.
  * q108 answers it the batch way: recompute every validity range from
  * all history. At 100 TB that rebuild rereads the full event log daily
  * — O(all days) of scan and O(users × days) of window state for a
  * day's worth of change. [[merge]] is the incremental answer: apply
  * ONE day's per-user snapshot to the EXISTING history with a single
  * user-keyed full-outer join — no window functions, no scan of any
  * event older than the snapshot day, cost O(|history| + |day|).
  *
  * Merge semantics (day D strictly after every day already in the
  * history — the daily-cadence invariant, asserted here):
  *   - user only in history: rows pass through untouched (closed rows
  *     always do — they are immutable once closed).
  *   - user only in snapshot: open a new current range
  *     (valid_from = D, n_days = 1).
  *   - both, same value: the open range absorbs the day
  *     (n_days + 1; valid_from keeps its original start).
  *   - both, changed value: the open range CLOSES at D (valid_to = D,
  *     is_current = false) and a new current range opens at D.
  *
  * Equivalence is the whole contract: `merge(build(days < D), day D)`
  * must be row-identical to `build(days ≤ D)` — q126 pins exactly that,
  * running the merge path in Spark against the full-rebuild SQL in the
  * oracle, so any drift between the two formulations is a hash
  * mismatch, not a code-review judgment call.
  *
  * Scale shape: both sides of the join hash-partition on user_id — the
  * same key the history table would be bucketed by in a warehouse — so
  * the daily merge is one co-partitioned shuffle of the history plus a
  * day-sized snapshot, and the closed-row passthrough is a filter that
  * never joins at all.
  */
object Scd2 {

  /** Per-user per-day integer micro-sums over `events` — the snapshot
    * grain both [[build]] and [[merge]] consume. Integer accumulation
    * with a single quantization per value keeps Spark and the oracle
    * bit-identical (house rule: floor(x*1e6) at ingest, sum longs).
    */
  def dailyProfiles(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1000000d).cast("long"))
        .as("value_micro"))

  /** Full SCD2 rebuild from daily profiles — q108's gaps-and-islands
    * formulation, factored so q126 can build the day-(D-1) starting
    * history from the same code the equivalence is measured against.
    */
  def build(daily: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val seg = daily
      .withColumn("chg",
        when(lag(col("value_micro"), 1).over(wDay).isNull
          || lag(col("value_micro"), 1).over(wDay) =!= col("value_micro"),
          1L).otherwise(0L))
      .withColumn("seg", sum(col("chg"))
        .over(wDay.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val spans = seg.groupBy(col("user_id"), col("seg"))
      .agg(min(col("day")).as("valid_from"),
        first(col("value_micro")).as("value_micro"),
        count(lit(1)).as("n_days"))
    val wSeg = Window.partitionBy(col("user_id")).orderBy(col("seg"))
    spans
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("valid_from"), col("valid_to"),
        col("value_micro"), col("n_days"), col("is_current"))
  }

  /** Apply one day's snapshot (`user_id`, `day`, `value_micro`; at most
    * one row per user, every `day` equal and strictly after the
    * history's days) to an SCD2 `history` shaped like [[build]]'s
    * output. Closed rows pass through; open rows full-outer-join the
    * snapshot on user_id.
    */
  def merge(history: DataFrame, snapshot: DataFrame): DataFrame = {
    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))
      .select(col("user_id"), col("valid_from"),
        col("value_micro").as("cur_micro"), col("n_days"))
    val snap = snapshot.select(col("user_id"), col("day"),
      col("value_micro").as("new_micro"))
    val j = open.join(snap, Seq("user_id"), "full_outer")
    val unchanged = col("day").isNull || col("cur_micro") === col("new_micro")

    // the surviving current row: untouched open range (user absent from
    // the snapshot), absorbed day (same value), or freshly opened range
    // (new user or changed value)
    val currentRows = j.select(
      col("user_id"),
      when(col("valid_from").isNotNull && unchanged, col("valid_from"))
        .otherwise(col("day")).as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      coalesce(col("new_micro"), col("cur_micro")).as("value_micro"),
      when(col("valid_from").isNull, 1L) // brand-new user
        .when(unchanged && col("day").isNotNull, col("n_days") + 1L)
        .when(unchanged, col("n_days")) // absent from snapshot
        .otherwise(1L).as("n_days"), // changed value
      lit(true).as("is_current"))

    // ranges the snapshot closes: open row exists AND the value changed
    val closures = j
      .filter(col("valid_from").isNotNull && col("day").isNotNull &&
        col("cur_micro") =!= col("new_micro"))
      .select(col("user_id"), col("valid_from"), col("day").as("valid_to"),
        col("cur_micro").as("value_micro"), col("n_days"),
        lit(false).as("is_current"))

    closed.unionByName(closures).unionByName(currentRows)
  }

  /** q126's Spark side: rebuild history through day D-1, merge day D's
    * snapshot, return the merged table — which the oracle checks against
    * a FULL rebuild through day D. `maxDay` stays in-plan (a broadcast
    * one-row cross join), so nothing is collected to the driver.
    */
  private def mergeLastDay(daily: DataFrame): DataFrame = {
    val lastDay = daily.agg(max(col("day")).as("last_day"))
    val withLast = daily.crossJoin(broadcast(lastDay))
    val history = build(
      withLast.filter(col("day") < col("last_day"))
        .select(col("user_id"), col("day"), col("value_micro")))
    val snapshot = withLast.filter(col("day") === col("last_day"))
      .select(col("user_id"), col("day"), col("value_micro"))
    merge(history, snapshot)
  }

  val queries: Seq[GraftQuery] = Seq(
    // q126: incremental SCD2 merge ≡ full rebuild — the Spark side runs
    // build(days < D) + merge(day D); the oracle runs q108's rebuild SQL
    // over ALL days. A hash match means the incremental path reproduces
    // the batch semantics exactly (close-at-D, absorb-same-value,
    // open-new-user), which is the property that lets a warehouse stop
    // rebuilding history daily.
    GraftQuery(
      "q126_scd2_merge",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        mergeLastDay(dailyProfiles(t.events))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS value_micro
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        seg AS (
          SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS seg
          FROM (SELECT *, CASE WHEN lag(value_micro) OVER
                    (PARTITION BY user_id ORDER BY day) IS DISTINCT FROM
                    value_micro THEN 1 ELSE 0 END AS chg
                FROM daily)),
        spans AS (
          SELECT user_id, seg, min(day) AS valid_from,
                 first(value_micro ORDER BY day) AS value_micro,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM seg GROUP BY 1, 2)
        SELECT user_id, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
                 AS valid_to,
               value_micro, n_days,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
                 IS NULL AS is_current
        FROM spans ORDER BY user_id, valid_from""")),

    // q158: general MERGE INTO ([[graft.ext.Cdc.merge]]) — the ANSI
    // upsert q126 hand-builds for SCD2, as a reusable operator with
    // clause-list semantics, exercised across all four paths at once:
    // target = account balances of 2-of-3 customers (cents), source =
    // per-customer order activity. WHEN MATCHED AND n_orders >= 20 THEN
    // DELETE (churn-close heavy accounts); WHEN MATCHED THEN UPDATE
    // bal += total (clause ORDER matters: the delete must shadow the
    // catch-all update); WHEN NOT MATCHED THEN INSERT a synthesized
    // account. The oracle states the same semantics as the textbook
    // three-branch union (inner ∖ delete / anti-target / anti-source);
    // the Spark plan is the ONE-exchange tagged-union reduce — a hash
    // match pins their equivalence. Money in integer cents throughout.
    GraftQuery(
      "q158_merge_into",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val target = t.customer.filter(col("c_custkey") % 3 =!= 0)
          .select(col("c_custkey"), col("c_name"),
            floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
              .as("bal_cents"))
        val source = t.orders.groupBy(col("o_custkey").as("c_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
              .as("total_cents"))
        Cdc.merge(target, source, Seq("c_custkey"),
            whenMatched = Seq(
              Cdc.Delete(Some(expr("s.n_orders >= 20"))),
              Cdc.Update(Map(
                "bal_cents" -> expr("t.bal_cents + s.total_cents")))),
            whenNotMatched = Seq(Cdc.Insert(Map(
              "c_name" -> concat(lit("new#"), col("c_custkey").cast("string")),
              "bal_cents" -> expr("s.total_cents")))))
          .orderBy(col("c_custkey"))
      },
      Some("""
        WITH tgt AS (
          SELECT c_custkey, c_name,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
          FROM customer WHERE c_custkey % 3 <> 0),
        src AS (
          SELECT o_custkey AS c_custkey,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS total_cents
          FROM orders GROUP BY 1),
        merged AS (
          SELECT t.c_custkey, t.c_name,
                 t.bal_cents + s.total_cents AS bal_cents
          FROM tgt t JOIN src s USING (c_custkey)
          WHERE s.n_orders < 20
          UNION ALL
          SELECT t.c_custkey, t.c_name, t.bal_cents
          FROM tgt t WHERE NOT EXISTS (
            SELECT 1 FROM src s WHERE s.c_custkey = t.c_custkey)
          UNION ALL
          SELECT s.c_custkey, 'new#' || CAST(s.c_custkey AS VARCHAR),
                 s.total_cents
          FROM src s WHERE NOT EXISTS (
            SELECT 1 FROM tgt t WHERE t.c_custkey = s.c_custkey))
        SELECT c_custkey, c_name, bal_cents
        FROM merged ORDER BY c_custkey""")))
}
