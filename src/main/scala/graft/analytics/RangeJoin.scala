package graft.analytics

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Range-join and grouping-set coverage (SURVEY.md §2B "joins —
  * range/as-of" and "grouping sets/cube/rollup").
  */
object RangeJoin {

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q39: time-range join — for every purchase, how many clicks the same
    // user made in the preceding 30 minutes. A naive implementation is a
    // per-user cross join with a range predicate; this one buckets both
    // sides into 30-minute cells and joins each purchase to its own and
    // the previous cell only (banded range join): the range condition
    // then prunes within ≤2 cells, turning an O(n·m) nested loop into an
    // equi-join Spark executes as a hash join — the standard way to make
    // range joins scale.
    GraftQuery(
      "q39_range_join_clicks_before_purchase",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events
        val bucket = (c: org.apache.spark.sql.Column) =>
          floor(unix_micros(c) / (30L * 60 * 1000000)).cast("long")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts").as("pts"),
                  bucket(col("ts")).as("pb"))
          // each purchase probes its own and the previous 30-min cell
          .withColumn("cell", explode(array(col("pb"), col("pb") - 1)))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"),
                  bucket(col("ts")).as("cell"))
        // the range predicate lives in the aggregate, not a filter: a
        // filter would drop purchases whose joined clicks are all
        // out-of-range, losing their zero-count rows
        purchases.join(clicks, Seq("user_id", "cell"), "left")
          .groupBy(col("event_id"))
          .agg(count(when(
            col("cts") < col("pts") &&
            col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES"), 1))
            .as("clicks_30m"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id,
               CAST(count(c.ts) AS BIGINT) AS clicks_30m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
          AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        GROUP BY p.event_id
        ORDER BY p.event_id""")),

    // ------------------------------------------------------------------
    // q40: CUBE — all grouping-set combinations of (returnflag,
    // linestatus) with grouping ids, the full grouping-sets surface on
    // top of q10's ROLLUP.
    GraftQuery(
      "q40_cube_flag_status",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.lineitem
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_items"),
               sum(col("l_extendedprice").cast("decimal(12,2)"))
                 .cast("double").as("sum_price"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n_items"), col("sum_price"))
          .orderBy(col("returnflag"), col("linestatus"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ------------------------------------------------------------------
    // q45: PIVOT — daily event counts spread into one column per event
    // type (explicit value list, so the plan is a single pass — an
    // unlisted-values pivot needs an extra distinct job).
    GraftQuery(
      "q45_pivot_event_types",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("day"))
      },
      Some("""
        SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY 1
        ORDER BY day""")),

    // ------------------------------------------------------------------
    // q46: UNPIVOT (melt) — lineitem money measures to long form, then a
    // keyed aggregate per measure.
    GraftQuery(
      "q46_unpivot_measures",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.lineitem
          .select(col("l_returnflag"),
                  col("l_extendedprice").cast("decimal(12,2)").as("price"),
                  col("l_discount").cast("decimal(12,2)").as("discount"),
                  col("l_tax").cast("decimal(12,2)").as("tax"))
          .unpivot(
            ids = Array(col("l_returnflag")),
            values = Array(col("price"), col("discount"), col("tax")),
            variableColumnName = "measure",
            valueColumnName = "amount")
          .groupBy(col("l_returnflag"), col("measure"))
          .agg(sum(col("amount")).cast("double").as("total"),
               count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("measure"))
      },
      Some("""
        WITH long_form AS (
          SELECT l_returnflag, 'price' AS measure,
                 CAST(l_extendedprice AS DECIMAL(12,2)) AS amount FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'discount', CAST(l_discount AS DECIMAL(12,2)) FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'tax', CAST(l_tax AS DECIMAL(12,2)) FROM lineitem)
        SELECT l_returnflag, measure,
               CAST(SUM(amount) AS DOUBLE) AS total, COUNT(*) AS n
        FROM long_form
        GROUP BY 1, 2
        ORDER BY l_returnflag, measure"""))
  )
}
