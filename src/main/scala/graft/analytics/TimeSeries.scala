package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{GraftQuery, Tables}

/** Time-windowed analytics over the `events` stream table — the batch form
  * of the reference's monitoring queries (SURVEY.md §2C: sliding-window
  * failure ratios and latency percentiles, k8s/monitoring/alerts.yaml) plus
  * the canonical streaming-window operators (tumbling / hopping / session
  * windows, as-of join). Each query uses the exact same `window()` /
  * `session_window()` constructs the streaming pipeline uses, so batch
  * verification covers the streaming transform logic too.
  */
object TimeSeries {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Format a window-start timestamp deterministically for output. */
  private def fmt(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q15: tumbling 1-hour windows via the streaming `window()` function
    // (epoch-aligned, so it equals date_trunc('hour') in the oracle).
    GraftQuery(
      "q15_hourly_window",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
               sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(fmt(col("window.start")).as("window_start"),
                  col("event_type"), col("n_events"), col("sum_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""
        SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type""")),

    // ------------------------------------------------------------------
    // q16: hopping (sliding) windows — 60 min width, 10 min hop: the
    // reference's failure-ratio alert (alerts.yaml:28-38) as a continuous
    // aggregation. Each event lands in 6 windows; the oracle expands them
    // with generate_series.
    GraftQuery(
      "q16_sliding_error_ratio",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(window(col("ts"), "60 minutes", "10 minutes"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_errors"))
          .select(fmt(col("window.start")).as("window_start"),
                  col("n_events"), col("n_errors"),
                  (col("n_errors").cast("double") / col("n_events"))
                    .as("error_ratio"))
          .orderBy(col("window_start"))
      },
      Some("""
        WITH expanded AS (
          SELECT unnest(generate_series(
                   time_bucket(INTERVAL '10 minutes', ts) - INTERVAL 50 MINUTE,
                   time_bucket(INTERVAL '10 minutes', ts),
                   INTERVAL 10 MINUTE)) AS window_start,
                 event_type
          FROM events),
        windows AS (
          SELECT window_start, COUNT(*) AS n_events,
                 SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
          FROM expanded
          GROUP BY 1)
        SELECT STRFTIME(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(n_errors AS BIGINT) AS n_errors,
               CAST(n_errors AS DOUBLE) / n_events AS error_ratio
        FROM windows
        ORDER BY window_start""")),

    // ------------------------------------------------------------------
    // q17: exact percentiles per key — the p95 latency SLO queries
    // (alerts.yaml:51-60,76-85). Exact `percentile` (not approx) so the
    // oracle can match; both engines use linear interpolation between
    // order statistics. The approx variant (percentile_approx) is
    // exercised in Bench where no hash-match is required.
    GraftQuery(
      "q17_value_percentiles",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(col("event_type"))
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"),
            expr("percentile(value, 0.99)").as("p99"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               quantile_cont("value", 0.5) AS p50,
               quantile_cont("value", 0.95) AS p95,
               quantile_cont("value", 0.99) AS p99,
               MIN("value") AS min_value,
               MAX("value") AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q18: as-of join — each purchase matched to the latest click by the
    // same user at-or-before it. Spark lacks a native as-of join; rather
    // than a range cross-join (quadratic at scale) we union the two sides
    // and take `last(..., ignoreNulls)` over a single user-partitioned
    // window — one shuffle on user_id, linear work, and the same plan
    // shape works under watermarks in streaming.
    GraftQuery(
      "q18_asof_purchase_click",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events
        val purchases = ev.filter(col("event_type") === "purchase")
        val clicks = ev.filter(col("event_type") === "click")
        // side=0 sorts clicks before purchases at identical timestamps,
        // matching ASOF JOIN's >= (at-or-before) semantics.
        val tagged = clicks
          .select(col("user_id"), col("ts"), lit(0).as("side"),
                  lit(null).cast("long").as("event_id"),
                  lit(null).cast("double").as("value"),
                  col("ts").as("click_ts"))
          .unionByName(purchases
            .select(col("user_id"), col("ts"), lit(1).as("side"),
                    col("event_id"), col("value"),
                    lit(null).cast("timestamp").as("click_ts")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"))
          .rowsBetween(Window.unboundedPreceding, 0)
        tagged
          .withColumn("last_click_ts",
            last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("side") === 1 && col("last_click_ts").isNotNull)
          .select(col("event_id"), col("user_id"),
                  fmt(col("ts")).as("purchase_ts"),
                  fmt(col("last_click_ts")).as("click_ts"),
                  dec2(col("value")).cast("double").as("value"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT p.event_id,
               p.user_id,
               STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               CAST(CAST(p."value" AS DECIMAL(12,2)) AS DOUBLE) AS "value"
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // ------------------------------------------------------------------
    // q19: session windows (gap-based sessionization) via the streaming
    // `session_window()` construct; the oracle is the classic
    // gaps-and-islands rewrite. 30-minute inactivity gap.
    GraftQuery(
      "q19_user_sessions",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
               sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(col("user_id"),
                  fmt(col("session_window.start")).as("session_start"),
                  col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts, "value",
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 30 MINUTE
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        numbered AS (
          SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked)
        SELECT user_id,
               STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start""")),

    // ------------------------------------------------------------------
    // q20: grouped top-k with analytic functions — each user's 3 largest
    // purchases with their share of the user's total spend.
    GraftQuery(
      "q20_user_top_purchases",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val purchases = t.events.filter(col("event_type") === "purchase")
        val byUser = Window.partitionBy(col("user_id"))
        val rankW = byUser.orderBy(col("value").desc, col("event_id"))
        purchases
          .withColumn("rk", row_number().over(rankW))
          .withColumn("user_total", sum(dec2(col("value"))).over(byUser))
          .filter(col("rk") <= 3)
          .select(col("user_id"), col("rk"), col("event_id"),
                  dec2(col("value")).cast("double").as("value"),
                  (dec2(col("value")).cast("double")
                    / col("user_total").cast("double")).as("share"))
          .orderBy(col("user_id"), col("rk"))
      },
      Some("""
        SELECT user_id, CAST(rk AS INT) AS rk, event_id, "value",
               "value" / user_total AS share
        FROM (
          SELECT user_id, event_id,
                 CAST(CAST("value" AS DECIMAL(12,2)) AS DOUBLE) AS "value",
                 CAST(SUM(CAST("value" AS DECIMAL(12,2)))
                      OVER (PARTITION BY user_id) AS DOUBLE) AS user_total,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY "value" DESC, event_id) AS rk
          FROM events WHERE event_type = 'purchase')
        WHERE rk <= 3
        ORDER BY user_id, rk""")),

    // ------------------------------------------------------------------
    // q54: RANGE-framed window — per-user rolling 1-hour value sum and
    // event count by EVENT TIME (range frames bound by the ordering
    // value, not row counts: the frame that ROWS BETWEEN cannot express
    // when events are irregularly spaced). Epoch seconds as the exact
    // integer ordering key; cents quantization for exact sums.
    GraftQuery(
      "q54_rolling_range_frame",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(-3600L, 0L)
        t.events
          .select(col("user_id"), col("event_id"),
                  unix_timestamp(col("ts")).as("sec"),
                  floor(col("value") * 100 + 0.5).cast("long").as("cents"))
          .withColumn("rolling_value_1h",
            sum(col("cents")).over(w).cast("double") / 100)
          .withColumn("rolling_events_1h", count(lit(1)).over(w))
          .select(col("user_id"), col("event_id"),
                  col("rolling_value_1h"), col("rolling_events_1h"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        WITH e AS (SELECT user_id, event_id,
                          CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                          CAST(FLOOR("value"*100 + 0.5) AS BIGINT) AS cents
                   FROM events)
        SELECT user_id, event_id,
               CAST(SUM(cents) OVER w AS DOUBLE) / 100 AS rolling_value_1h,
               CAST(COUNT(*) OVER w AS BIGINT) AS rolling_events_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // ------------------------------------------------------------------
    // q72: funnel analysis — how far each user progresses through the
    // view → click → purchase sequence (events must occur in time
    // order, not merely all exist). ONE shuffle: groupBy(user) collects
    // the user's (ts, type) events, array_sort puts them in event order,
    // and a higher-order aggregate() fold advances the stage machine —
    // no self-joins, no per-stage passes over the fact table. Per-user
    // state is that user's event list; at 100 TB the same fold runs per
    // session (q19's session_window keys) to bound it, documented here
    // rather than hidden. (ts, user_id) is verified unique in the
    // testdata, so the sort needs no tie-break and "after" is strict.
    GraftQuery(
      "q72_funnel_stages",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val perUser = t.events
          .select(col("user_id"), col("ts"), col("event_type"))
          .groupBy(col("user_id"))
          .agg(array_sort(collect_list(struct(col("ts"), col("event_type"))))
            .as("evs"))
          .select(col("user_id"), expr(
            """aggregate(evs, 0,
                 (stage, e) -> CASE
                   WHEN stage = 0 AND e.event_type = 'view' THEN 1
                   WHEN stage = 1 AND e.event_type = 'click' THEN 2
                   WHEN stage = 2 AND e.event_type = 'purchase' THEN 3
                   ELSE stage END)""").as("funnel_stage"))
        perUser.groupBy(col("funnel_stage"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("funnel_stage"))
      },
      Some("""
        WITH fv AS (SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS v
                    FROM events GROUP BY user_id),
        fc AS (SELECT f.user_id, MIN(e.ts) AS c
               FROM events e JOIN fv f ON e.user_id = f.user_id
               WHERE e.event_type = 'click' AND e.ts > f.v
               GROUP BY f.user_id),
        fp AS (SELECT f.user_id, MIN(e.ts) AS p
               FROM events e JOIN fc f ON e.user_id = f.user_id
               WHERE e.event_type = 'purchase' AND e.ts > f.c
               GROUP BY f.user_id),
        stages AS (SELECT fv.user_id,
                          CASE WHEN fp.p IS NOT NULL THEN 3
                               WHEN fc.c IS NOT NULL THEN 2
                               WHEN fv.v IS NOT NULL THEN 1
                               ELSE 0 END AS funnel_stage
                   FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id
                           LEFT JOIN fp ON fv.user_id = fp.user_id)
        SELECT CAST(funnel_stage AS INT) AS funnel_stage,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM stages GROUP BY funnel_stage
        ORDER BY funnel_stage""")),

    // ------------------------------------------------------------------
    // q90: date-spine gap filling with last-observation-carried-forward —
    // the standard shape for turning a sparse event series into a dense
    // reporting series. The spine is GENERATED (sequence of 30 date
    // literals × 5 types), never scanned; the LOCF window is keyed by
    // event_type, and its frame is bounded by the spine length by
    // construction, so nothing here degrades with corpus size. Leading
    // gaps (before a series' first observation) stay null — LOCF has
    // nothing to carry.
    GraftQuery(
      "q90_gap_fill_locf",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val spine = spark.range(1)
          .select(explode(sequence(
            to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
            expr("INTERVAL 1 DAY"))).as("day"))
        val grid = t.events.select(col("event_type")).distinct()
          .crossJoin(spine)
        val actual = t.events.filter(col("value") > 300)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1000000d).cast("long")).as("sum_micro"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(actual, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"), col("sum_micro"),
            last(col("sum_micro"), ignoreNulls = true).over(w)
              .as("locf_sum_micro"),
            col("n").isNull.as("is_gap"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""
        WITH spine AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                         DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT event_type, day FROM types CROSS JOIN spine),
        actual AS (SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro
                   FROM events WHERE value > 300 GROUP BY 1, 2)
        SELECT g.event_type, g.day, COALESCE(a.n, 0) AS n, a.sum_micro,
               last_value(a.sum_micro IGNORE NULLS) OVER (
                 PARTITION BY g.event_type ORDER BY g.day
                 ROWS UNBOUNDED PRECEDING) AS locf_sum_micro,
               (a.n IS NULL) AS is_gap
        FROM grid g LEFT JOIN actual a
          ON g.event_type = a.event_type AND g.day = a.day
        ORDER BY g.event_type, g.day""")),

    // ------------------------------------------------------------------
    // q91: cumulative distinct users per day — deliberately NOT the
    // expanding-window COUNT(DISTINCT) (which reprocesses every prior day
    // per output row: quadratic, and unshardable). The identity
    // cum_distinct(day) = Σ first-touches ≤ day turns it into one
    // per-user min, one daily count, and a prefix sum over the 30-row
    // spine — each step keyed and partial-aggregated; the only
    // unpartitioned window is over the generated spine, bounded by
    // construction.
    GraftQuery(
      "q91_cumulative_distinct",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val spine = spark.range(1)
          .select(explode(sequence(
            to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
            expr("INTERVAL 1 DAY"))).as("day"))
        val firstTouch = t.events
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("day"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("new_users"))
        val w = graft.functions.BoundedWindow.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(firstTouch, Seq("day"), "left")
          .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
          .withColumn("cum_users", sum(col("new_users")).over(w))
          .orderBy(col("day"))
      },
      Some("""
        WITH spine AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                         DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
        ft AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day
               FROM events GROUP BY user_id),
        daily AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
                  FROM ft GROUP BY day)
        SELECT s.day, COALESCE(d.new_users, 0) AS new_users,
               CAST(SUM(COALESCE(d.new_users, 0)) OVER (ORDER BY s.day
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        ORDER BY s.day""")),

    // ------------------------------------------------------------------
    // q92: weekly retention cohorts — cohort = ISO week of a user's
    // first event; each (cohort, week-offset) cell counts distinct users
    // active that week. Classic cohort matrix, all-integer: week
    // truncation is Monday-aligned in both engines and the offset is an
    // exact day-difference division (both operands Mondays).
    GraftQuery(
      "q92_retention_cohorts",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ud = t.events
          .select(col("user_id"),
            to_date(date_trunc("week", to_date(col("ts")))).as("week"))
          .distinct()
        val cohort = ud.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        ud.join(cohort, "user_id")
          .select(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7)
              .cast("int").as("week_offset"),
            col("user_id"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""
        WITH ud AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
                    FROM events),
        cohort AS (SELECT user_id, MIN(week) AS cohort_week
                   FROM ud GROUP BY user_id)
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, u.week) // 7 AS INT) AS week_offset,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users
        FROM ud u JOIN cohort c ON u.user_id = c.user_id
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q93: event-transition matrix — per-user ordered event_type bigrams
    // (lag over (ts, event_id) — the id tie-break makes the sequence
    // deterministic), counted per (prev, next) with the per-prev total
    // as one additional keyed window; probability is a single double
    // division at output. The sequencing window is keyed by user_id —
    // thousands of small independent partitions, no global sort.
    GraftQuery(
      "q93_event_transitions",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = t.events
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
        val counts = trans.groupBy(col("prev_type"),
            col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val wt = Window.partitionBy(col("prev_type"))
        counts
          .withColumn("prob",
            col("n").cast("double") / sum(col("n")).over(wt).cast("double"))
          .orderBy(col("prev_type"), col("next_type"))
      },
      Some("""
        WITH seq AS (SELECT user_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_type
                     FROM events),
        counts AS (SELECT prev_type, event_type AS next_type,
                     CAST(COUNT(*) AS BIGINT) AS n
                   FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type)
                 AS DOUBLE) AS prob
        FROM counts
        ORDER BY prev_type, next_type""")),

    // ------------------------------------------------------------------
    // q99: FORWARD as-of join — each purchase paired with the NEXT click
    // (at-or-after, ≤24 h), the time-reversed twin of q18. Same
    // single-pass shape: one union, one keyed window over
    // (ts, side, id) with a following frame — no join, no per-row probe;
    // the oracle is the equivalent range join + ROW_NUMBER, which must
    // agree exactly (first-then-filter ≡ filter-then-first because the
    // earliest following click inside the horizon is the earliest
    // overall whenever one exists).
    GraftQuery(
      "q99_asof_forward",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events
        // purchases side=0: a click at the identical timestamp sorts
        // after its purchase, so the following frame sees it (>= match)
        val tagged = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("side"),
            col("event_id"),
            lit(null).cast("struct<ts:timestamp,id:bigint>").as("click"))
          .unionByName(ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), lit(1).as("side"),
              col("event_id"),
              struct(col("ts"), col("event_id").as("id")).as("click")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("side"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        tagged
          .withColumn("next_click",
            first(col("click"), ignoreNulls = true).over(w))
          .filter(col("side") === 0 && col("next_click").isNotNull &&
            unix_micros(col("next_click.ts")) - unix_micros(col("ts"))
              <= 86400000000L)
          .select(col("event_id").as("purchase_id"),
            col("user_id"),
            col("next_click.id").as("next_click_id"),
            (unix_micros(col("next_click.ts")) - unix_micros(col("ts")))
              .as("gap_us"))
          .orderBy(col("purchase_id"))
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        j AS (SELECT p.event_id AS purchase_id, p.user_id,
                c.event_id AS next_click_id,
                date_diff('microseconds', p.ts, c.ts) AS gap_us,
                ROW_NUMBER() OVER (PARTITION BY p.event_id
                  ORDER BY c.ts, c.event_id) AS rn
              FROM p JOIN c ON p.user_id = c.user_id
                AND c.ts >= p.ts
                AND date_diff('microseconds', p.ts, c.ts) <= 86400000000)
        SELECT purchase_id, user_id, next_click_id, CAST(gap_us AS BIGINT) AS gap_us
        FROM j WHERE rn = 1
        ORDER BY purchase_id"""))
  )
}
