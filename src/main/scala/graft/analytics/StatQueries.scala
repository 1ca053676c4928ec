package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ext.Stats

/** Round-8 widening, part 2: distribution statistics — autocorrelation,
  * robust (median/MAD) anomaly detection, the exact two-sample KS test
  * on the decomposed-prefix-sum ECDF ([[graft.ext.Stats]]), and Gini
  * concentration. The drift/health checks that run BETWEEN pipeline
  * stages: "is today's corpus shaped like yesterday's".
  *
  * Exactness: integer/decimal accumulation everywhere a sum's fold
  * order could differ between engines, medians relied on as exact
  * (both engines interpolate identically on the same doubles — the
  * q101 precedent), and single integer→double divisions at output.
  */
object StatQueries {

  val queries: Seq[GraftQuery] = Seq(

    // q141: autocorrelation (ACF) of the corpus-wide daily total event
    // value at lags 1..7 — the seasonality probe. The daily series is
    // bounded (#days rows: a decade is ~3650), so the lag windows and
    // the centering mean run on a deliberately tiny single-partition
    // table — the same "small side" posture as q134's bucket offsets.
    // Exactness: daily totals quantized to integer CENTS (the only
    // fold-order-sensitive sums), the center c is the cent-average
    // rounded to an integer cent (identical single division in both
    // engines), deviations are exact integers, and num/den are
    // decimal(38,0) sums of integer products — acf = num/den is one
    // double division.
    GraftQuery(
      "q141_autocorrelation",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val dec = "decimal(38,0)"
        val daily = t.events
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(floor(sum(col("value")) * 100 + lit(0.5)).cast("long")
            .as("cents"))
        val c = daily.agg(
          floor(sum(col("cents")).cast("double") / count(lit(1L)) + lit(0.5))
            .cast("long").as("c"),
          count(lit(1L)).as("n_days"))
        val dev = daily.crossJoin(broadcast(c))
          .select(col("day"), (col("cents") - col("c")).as("d"),
            col("n_days"))
        val w = graft.functions.BoundedWindow.orderBy(col("day"))
        // all 7 lags in ONE select so the analyzer extracts a single
        // Window node (chained withColumn would give each lag its own
        // partition-key attribute, defeating CollapseWindow)
        val lagged = dev.select(
          col("*") +: (1 to 7).map(k =>
            lag(col("d"), k).over(w).as(s"d_$k")): _*)
        val den = lagged.agg(sum(col("d").cast(dec) * col("d")).as("den"))
        val acfs = (1 to 7).map { k =>
          sum(when(col(s"d_$k").isNotNull,
            col("d").cast(dec) * col(s"d_$k")).otherwise(lit(0).cast(dec)))
            .as(s"num_$k")
        }
        lagged.groupBy(col("n_days")).agg(acfs.head, acfs.tail: _*)
          .selectExpr("n_days",
            s"stack(7, ${(1 to 7).map(k => s"$k, num_$k").mkString(", ")})" +
              " AS (lag, num)")
          .crossJoin(broadcast(den))
          .select(col("lag").cast("int").as("lag"), col("n_days"),
            (floor(col("num").cast("double") / col("den").cast("double")
              * lit(1e9) + lit(0.5)) / lit(1e9)).as("acf"))
          .orderBy(col("lag"))
      },
      Some("""
        WITH daily AS (
          SELECT date_trunc('day', ts) AS day,
                 CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS cents
          FROM events GROUP BY date_trunc('day', ts)),
        c AS (
          SELECT CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*) + 0.5)
                   AS BIGINT) AS c,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM daily),
        dev AS (
          SELECT day, cents - c AS d, n_days FROM daily, c),
        lagged AS (
          SELECT day, d, n_days,
                 lag(d, 1) OVER w AS d_1, lag(d, 2) OVER w AS d_2,
                 lag(d, 3) OVER w AS d_3, lag(d, 4) OVER w AS d_4,
                 lag(d, 5) OVER w AS d_5, lag(d, 6) OVER w AS d_6,
                 lag(d, 7) OVER w AS d_7
          FROM dev WINDOW w AS (ORDER BY day)),
        den AS (
          SELECT sum(CAST(d AS DECIMAL(38,0)) * d) AS den FROM lagged),
        nums AS (
          SELECT n_days,
                 sum(CASE WHEN d_1 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_1
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_1,
                 sum(CASE WHEN d_2 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_2
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_2,
                 sum(CASE WHEN d_3 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_3
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_3,
                 sum(CASE WHEN d_4 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_4
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_4,
                 sum(CASE WHEN d_5 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_5
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_5,
                 sum(CASE WHEN d_6 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_6
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_6,
                 sum(CASE WHEN d_7 IS NOT NULL
                   THEN CAST(d AS DECIMAL(38,0)) * d_7
                   ELSE CAST(0 AS DECIMAL(38,0)) END) AS num_7
          FROM lagged GROUP BY n_days),
        stacked AS (
          SELECT 1 AS lag, n_days, num_1 AS num FROM nums
          UNION ALL SELECT 2, n_days, num_2 FROM nums
          UNION ALL SELECT 3, n_days, num_3 FROM nums
          UNION ALL SELECT 4, n_days, num_4 FROM nums
          UNION ALL SELECT 5, n_days, num_5 FROM nums
          UNION ALL SELECT 6, n_days, num_6 FROM nums
          UNION ALL SELECT 7, n_days, num_7 FROM nums)
        SELECT CAST(lag AS INT) AS lag, n_days,
               floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 * 1000000000.0 + 0.5) / 1000000000.0 AS acf
        FROM stacked, den ORDER BY lag""")),

    // q142: robust per-user anomaly detection — median/MAD, the
    // outlier rule that doesn't move when the outliers do (unlike
    // mean/stddev z-scores). Two keyed median aggregations with the
    // per-user stats broadcast-joined back between them; the flag
    // compares |x − med| > 3·MAD in exact double space (both engines
    // interpolate medians identically on the same parquet doubles —
    // the q101/q103 precedent — and the products mirror op-for-op).
    GraftQuery(
      "q142_mad_anomalies",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events.select(col("user_id"), col("value"))
        val med = ev.groupBy(col("user_id"))
          .agg(median(col("value")).as("med"), count(lit(1L)).as("n_events"))
        // per-user stat tables join back on the key the events are
        // already hashed by; cardinality = #users, so the join method
        // is AQE's call (broadcast when small, shuffle when not) — no
        // hint, unlike genuinely tiny broadcast sides
        val dev = ev.join(med, "user_id")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("user_id"))
          .agg(median(col("adev")).as("mad"))
        dev.join(mad, "user_id")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            max(col("med")).as("med"), max(col("mad")).as("mad"),
            sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH ev AS (SELECT user_id, value FROM events),
        med AS (
          SELECT user_id, median(value) AS med,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM ev GROUP BY user_id),
        dev AS (
          SELECT ev.user_id, med.n_events, med.med,
                 abs(ev.value - med.med) AS adev
          FROM ev JOIN med ON ev.user_id = med.user_id),
        mad AS (
          SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id)
        SELECT dev.user_id,
               max(dev.n_events) AS n_events,
               max(dev.med) AS med, max(mad.mad) AS mad,
               CAST(sum(CASE WHEN dev.adev > 3.0 * mad.mad
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.user_id = mad.user_id
        GROUP BY dev.user_id ORDER BY dev.user_id""")),

    // q143: exact two-sample KS between click and purchase value
    // distributions via [[Stats.ksTest]] — the oracle computes the
    // same ECDFs with ONE global window, pinning the two-phase
    // decomposition (bucket offsets + local prefixes) to the global
    // prefix sum on real data.
    GraftQuery(
      "q143_ks_test",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Stats.ksTest(t.events, col("value"),
          col("event_type") === "click", col("event_type") === "purchase")
      },
      Some("""
        WITH pts AS (
          SELECT value AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
        byv AS (
          SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
          FROM pts GROUP BY v),
        cum AS (
          SELECT v, sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb
          FROM byv WINDOW w AS (ORDER BY v)),
        tot AS (
          SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
          FROM byv),
        d AS (
          SELECT n_a, n_b,
                 CAST(max(abs(CAST(cca AS DECIMAL(38,0)) * n_b
                   - CAST(ccb AS DECIMAL(38,0)) * n_a)) AS DOUBLE) AS d_num
          FROM cum, tot GROUP BY n_a, n_b)
        SELECT n_a, n_b, d_num,
               d_num / (CAST(n_a AS DOUBLE) * n_b) AS d
        FROM d""")),

    // q144: Gini concentration of document length within each source —
    // "is src3 a few huge pages or many small ones". Keyed rank window
    // (per-source sort only), decimal-exact rank·length sums, one
    // double division ([[Stats.gini]]); tie ranks provably don't
    // affect G, so no quantization is needed anywhere.
    GraftQuery(
      "q144_gini_concentration",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Stats.gini(t.documents, col("source"), col("n_chars"), col("doc_id"))
          .withColumnRenamed("g", "source")
          .orderBy(col("source"))
      },
      Some("""
        WITH r AS (
          SELECT source AS g, CAST(n_chars AS BIGINT) AS x,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars ASC, doc_id ASC) AS r
          FROM documents)
        SELECT g AS source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS total,
               CAST(2 * sum(CAST(r AS DECIMAL(38,0)) * x)
                   - (count(*) + 1) * sum(CAST(x AS DECIMAL(38,0)))
                 AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                 AS gini
        FROM r GROUP BY g ORDER BY source""")),

    // q148: Benford first-digit audit of order totals — the classic
    // fabricated-data screen. The first significant digit comes from
    // the INTEGER part's decimal string (integer→string is exact in
    // both engines; double→string formatting is NOT and never touches
    // this query). Expected Benford mass log10(1+1/d) is floor-
    // quantized at 1e9 — d is one of nine small integers, so the
    // values sit far from quantization boundaries in both libms.
    // One hash aggregate on a 9-value key.
    GraftQuery(
      "q148_benford_digits",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val d = t.orders
          .filter(col("o_totalprice") > 0)
          .select(substring(floor(col("o_totalprice")).cast("long")
            .cast("string"), 1, 1).cast("int").as("digit"))
        val tot = d.agg(count(lit(1L)).as("n_total"))
        d.groupBy(col("digit")).agg(count(lit(1L)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            (col("n").cast("double") / col("n_total")).as("observed"),
            (floor(log(10.0, lit(1.0) + lit(1.0) / col("digit"))
              * lit(1e9) + lit(0.5)) / lit(1e9)).as("benford"))
          .orderBy(col("digit"))
      },
      Some("""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS digit
          FROM orders WHERE o_totalprice > 0),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d)
        SELECT digit, CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) / n_total AS observed,
               floor(log10(1.0 + 1.0 / digit) * 1000000000.0 + 0.5)
                 / 1000000000.0 AS benford
        FROM d, tot GROUP BY digit, n_total ORDER BY digit""")),

    // q149: contribution analysis (ratio-to-report) — per-nation
    // revenue with its share of region, share of grand total, and rank
    // within region. Revenue folds as integer cents per row (exact,
    // partitioning-invariant); the share windows run over the
    // ~#nations-row AGGREGATED table, not the fact table — the
    // aggregate-then-window shape that keeps report ratios off the
    // scan path. Shares are single exact-integer divisions.
    GraftQuery(
      "q149_contribution",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val o = t.orders
        val c = t.customer
        val rev = o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(t.nation),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("regionkey"),
            col("n_name").as("nation"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("cents"), count(lit(1L)).as("n_orders"))
        val wr = Window.partitionBy(col("regionkey"))
        // whole-frame share over the ~#nations-row aggregate — bounded
        val wAll = graft.functions.BoundedWindow.all(col("cents"))
        rev
          .withColumn("region_cents", sum(col("cents")).over(wr))
          .withColumn("total_cents", sum(col("cents")).over(wAll))
          .withColumn("rank_in_region", rank().over(
            Window.partitionBy(col("regionkey"))
              .orderBy(col("cents").desc, col("nation"))).cast("long"))
          .select(col("regionkey"), col("nation"), col("n_orders"),
            col("cents"),
            (col("cents").cast("double") / col("region_cents"))
              .as("share_of_region"),
            (col("cents").cast("double") / col("total_cents"))
              .as("share_of_total"),
            col("rank_in_region"))
          .orderBy(col("regionkey"), col("rank_in_region"))
      },
      Some("""
        WITH rev AS (
          SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
                 CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS cents,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_regionkey, n.n_name)
        SELECT regionkey, nation, n_orders, cents,
               CAST(cents AS DOUBLE) /
                 sum(cents) OVER (PARTITION BY regionkey) AS share_of_region,
               CAST(cents AS DOUBLE) / sum(cents) OVER () AS share_of_total,
               rank() OVER (PARTITION BY regionkey
                 ORDER BY cents DESC, nation) AS rank_in_region
        FROM rev ORDER BY regionkey, rank_in_region""")),

    // q150: population stability index (PSI) — the drift score between
    // the first and second half of the observed date range, per value
    // bucket. The industry-standard "did the distribution move" gate
    // (PSI < 0.1 stable, > 0.25 shifted) a model-serving pipeline runs
    // between training and serving windows. Discipline: the period
    // split and the 10 fixed-width buckets derive from exact
    // integer/epoch arithmetic; counts are Laplace-smoothed integers;
    // each (pa−pb)·ln(pa/pb) term is nano-quantized to an INTEGER
    // before summation (q139) so the per-bucket terms and their sum
    // are engine-exact. One aggregation over (bucket, period) + a
    // 10-row window for the total.
    GraftQuery(
      "q150_psi_drift",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events.filter(col("value").isNotNull)
          .select(to_date(col("ts")).as("day"), col("value"))
        val rng = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        val bucketed = ev.crossJoin(broadcast(rng))
          .withColumn("mid",
            date_add(col("d0"),
              floor(datediff(col("d1"), col("d0")) / 2).cast("int")))
          .withColumn("bkt", least(lit(9),
            floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
              .cast("int")))
          .withColumn("p", when(col("day") <= col("mid"), "a").otherwise("b"))
        val cnt = bucketed.groupBy(col("bkt")).pivot("p", Seq("a", "b"))
          .agg(count(lit(1L)))
          .na.fill(0L, Seq("a", "b"))
        val tot = cnt.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
        val smoothed = cnt.crossJoin(broadcast(tot))
          .withColumn("pa",
            (col("a") + 1).cast("double") / (col("na") + 10))
          .withColumn("pb",
            (col("b") + 1).cast("double") / (col("nb") + 10))
          .withColumn("term_nano",
            floor((col("pa") - col("pb")) * log(col("pa") / col("pb"))
              * lit(1e9) + lit(0.5)).cast("long"))
        smoothed
          .withColumn("psi_nano",  // 10-bucket frame — bounded
            sum(col("term_nano")).over(
              graft.functions.BoundedWindow.all(col("term_nano"))))
          .select(col("bkt").as("bucket"), col("a").as("n_a"),
            col("b").as("n_b"), col("term_nano"), col("psi_nano"))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH ev AS (
          SELECT CAST(ts AS DATE) AS day, value
          FROM events WHERE value IS NOT NULL),
        rng AS (
          SELECT min(day) AS d0, max(day) AS d1,
                 min(value) AS lo, max(value) AS hi
          FROM ev),
        bucketed AS (
          SELECT least(9, CAST(floor((value - lo) / (hi - lo) * 10)
                   AS INT)) AS b,
                 CASE WHEN day <= d0 + CAST(floor(datediff('day', d0, d1)
                   / 2) AS INT) THEN 'a' ELSE 'b' END AS p
          FROM ev, rng),
        cnt AS (
          SELECT b,
                 CAST(sum(CASE WHEN p = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
                 CAST(sum(CASE WHEN p = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                   AS bc
          FROM bucketed GROUP BY b),
        tot AS (SELECT sum(a) AS na, sum(bc) AS nb FROM cnt),
        sm AS (
          SELECT b, a, bc,
                 CAST(a + 1 AS DOUBLE) / (na + 10) AS pa,
                 CAST(bc + 1 AS DOUBLE) / (nb + 10) AS pb
          FROM cnt, tot)
        SELECT CAST(b AS INT) AS bucket, a AS n_a, bc AS n_b,
               CAST(floor((pa - pb) * ln(pa / pb) * 1000000000.0 + 0.5)
                 AS BIGINT) AS term_nano,
               CAST(sum(CAST(floor((pa - pb) * ln(pa / pb) * 1000000000.0
                 + 0.5) AS BIGINT)) OVER () AS BIGINT) AS psi_nano
        FROM sm ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // q168: Poisson-bootstrap 95% CI for the mean event value
    // ([[graft.ext.Stats.poissonBootstrapMeanCI]]) — the uncertainty
    // companion to the point statistics (q101/q128): classic bootstrap
    // resampling is driver-bound at corpus scale; the Poisson bootstrap
    // emits every row's 96 replicate multiplicities MAP-SIDE (one
    // content-addressed md5 seed per row, a Lehmer/MINSTD multiplier
    // per replicate — all-integer, codegen-resident — and the integer
    // Poisson(1) threshold ladder) so only 96 partial sums per task
    // cross the shuffle. Replicate means are exact integer ratios; the
    // CI is nearest-rank order statistics over one bounded 96-row
    // window — every double hash-matches the oracle, whose multiplier
    // VALUES list is interpolated from the same Scala constants.
    GraftQuery(
      "q168_bootstrap_ci",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Stats.poissonBootstrapMeanCI(
          t.events, col("event_id"),
          floor(col("value") * 1000000 + 0.5).cast("long"),
          reps = 96, alphaPct = 5)
      },
      Some {
        val lehmerValues = Stats.lehmerMultipliers(96).zipWithIndex
          .map { case (g, b) => s"($b, $g)" }.mkString(", ")
        val md5Decode13 = (1 to 13).map { p =>
          s"(strpos('0123456789abcdef', substr(h, $p, 1)) - 1) * ${1L << (4 * (13 - p))}"
        }.mkString("\n                 + ")
        s"""
        WITH base AS (
          SELECT CAST(event_id AS VARCHAR) AS id,
                 CAST(FLOOR("value" * 1000000 + 0.5) AS BIGINT) AS v
          FROM events),
        hx AS (SELECT v, md5('boot:' || id) AS h FROM base),
        seeds AS (
          SELECT v,
                 1 + ($md5Decode13) % 2147483646 AS seed
          FROM hx),
        g(b, gm) AS (VALUES $lehmerValues),
        u AS (
          SELECT b, v, ((seed * gm) % 2147483647) % 1048576 AS u
          FROM seeds CROSS JOIN g),
        c AS (
          SELECT b, v,
                 CASE WHEN u < 385749 THEN 0 WHEN u < 771499 THEN 1
                      WHEN u < 964373 THEN 2 WHEN u < 1028665 THEN 3
                      WHEN u < 1044738 THEN 4 WHEN u < 1047952 THEN 5
                      WHEN u < 1048488 THEN 6 WHEN u < 1048565 THEN 7
                      ELSE 8 END AS c
          FROM u),
        m AS (
          -- all-zero replicate pinned to +inf in BOTH engines (Spark side
          -- does the same) so the rank order never hinges on NULL placement
          SELECT b, CASE WHEN SUM(c) = 0 THEN 'infinity'::DOUBLE
                         ELSE CAST(SUM(c * v) AS DOUBLE)
                              / CAST(SUM(c) AS DOUBLE) END AS mean
          FROM c GROUP BY b),
        r AS (SELECT b, mean, ROW_NUMBER() OVER (ORDER BY mean, b) AS rn
              FROM m),
        ci AS (SELECT max(CASE WHEN rn = 3 THEN mean END) AS ci_lo_micro,
                      max(CASE WHEN rn = 94 THEN mean END) AS ci_hi_micro
               FROM r),
        pt AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                      CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                        AS point_mean_micro
               FROM base)
        SELECT pt.n_rows, pt.point_mean_micro, ci.ci_lo_micro,
               ci.ci_hi_micro, CAST(96 AS INT) AS reps
        FROM pt, ci"""
      }),

    // ------------------------------------------------------------------
    // q171: seasonal-naive forecast backtest with a skill score
    // ([[graft.ext.Stats.seasonalBacktest]]) — the EVALUATION loop the
    // descriptive series stats (q141 ACF, q153 trend) feed: forecast
    // each event type's daily cents volume by the value 7 calendar
    // days earlier (a d = d′+7 join, gap-day-safe — not a 7-row lag),
    // score MAE/sMAPE against the persistence baseline, and report
    // skill = 1 − MAE₇/MAE₁. Positive skill = weekly seasonality is
    // real; that number, not the raw ACF, is what decides a
    // volume-anomaly monitor's forecast model. Integer cents error
    // sums, integer-ppm per-day sMAPE, one double division per output.
    GraftQuery(
      "q171_seasonal_backtest",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Stats.seasonalBacktest(t.events, col("event_type"),
            date_trunc("day", col("ts")).cast("date"),
            floor(col("value") * 100 + 0.5).cast("long"))
          .withColumnRenamed("g", "event_type")
          .orderBy(col("event_type"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type AS g, CAST(ts AS DATE) AS d,
                 CAST(SUM(CAST(FLOOR("value" * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        j AS (
          SELECT a.g, a.d, a.x, b.x AS f7, c.x AS f1
          FROM daily a
          JOIN daily b ON a.g = b.g AND a.d = b.d + 7
          JOIN daily c ON a.g = c.g AND a.d = c.d + 1),
        agg AS (
          SELECT g AS event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(SUM(abs(x - f7)) AS BIGINT) AS abs_err7_cents,
                 CAST(SUM(abs(x - f1)) AS BIGINT) AS abs_err1_cents,
                 CAST(SUM(CASE WHEN x + f7 > 0
                   THEN (2000000 * abs(x - f7)) // (x + f7) ELSE 0 END)
                   AS BIGINT) AS smape7_sum
          FROM j GROUP BY 1)
        SELECT event_type, n_days, abs_err7_cents, abs_err1_cents,
               CAST(abs_err7_cents AS DOUBLE) / CAST(n_days AS DOUBLE)
                 AS mae7_cents,
               CAST(abs_err1_cents AS DOUBLE) / CAST(n_days AS DOUBLE)
                 AS mae1_cents,
               CAST(smape7_sum AS DOUBLE) / CAST(n_days AS DOUBLE)
                 AS smape7_ppm,
               CASE WHEN abs_err1_cents > 0 THEN
                 1.0 - CAST(abs_err7_cents AS DOUBLE)
                         / CAST(abs_err1_cents AS DOUBLE)
               END AS skill_vs_persistence
        FROM agg ORDER BY event_type"""))
  )
}
