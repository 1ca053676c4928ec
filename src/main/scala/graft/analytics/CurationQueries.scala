package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ext.{Cdc, Frontier, Profile, SweepLine}

/** Round-8 widening: the table-admission surface (profiling +
  * constraint audit), changelog compaction, sweep-line concurrency,
  * Pareto frontiers, sequence-pattern analytics, independence testing,
  * source-distribution divergence, and int8 embedding quantization.
  * All oracle-checkable in DuckDB.
  *
  * Float-vs-oracle discipline (same as [[SurfaceQueries]]): outputs
  * whose arithmetic is bit-identical across engines (integer counts,
  * single divisions of exact integers, expression trees mirrored
  * operation-for-operation) are emitted raw or floor-quantized at fine
  * scale; outputs that fold doubles in engine-specific order (avg, a
  * 35-term chi-square sum) are floor-quantized at a step that dwarfs
  * the ~1e-11 relative fold error at the value's magnitude. ln() terms
  * are micro-quantized to integers BEFORE summation (the q69 idf
  * discipline) so the sum itself is exact.
  */
object CurationQueries {

  /** EWMA weights alpha·(1−alpha)^j, j = 0..k−1, emitted as 17-digit
    * literals embedded in BOTH engines' expressions — the two sides
    * then multiply/add the same constants in the same order, so the
    * smoothed value is identical to the bit (no runtime pow, no
    * cross-libm drift).
    */
  private def ewmaFragments(alpha: Double, k: Int): (String, String) = {
    val w = (0 until k).map(j => f"${alpha * math.pow(1 - alpha, j)}%.17e")
    val num = w.zipWithIndex
      .map { case (wj, j) => s"coalesce(lag_$j, 0.0) * $wj" }
      .mkString(" + ")
    val den = w.zipWithIndex
      .map { case (wj, j) => s"(CASE WHEN lag_$j IS NULL THEN 0.0 ELSE $wj END)" }
      .mkString(" + ")
    (num, den)
  }

  val queries: Seq[GraftQuery] = Seq(

    // q131: Deequ/TFDV-shaped column profile of `orders` — ONE
    // aggregation job (multi-column COUNT DISTINCT lowers to a single
    // Expand: #cols map-side replicas, one exchange, no per-column
    // jobs), unpivoted to long form by a constant-folded stack(). The
    // admission pass a pipeline runs on every new ingest day.
    GraftQuery(
      "q131_data_profile",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Profile.profile(t.orders,
            Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderdate", "o_orderpriority"), avgScale = 2)
          .orderBy(col("col_name"))
      },
      Some {
        def block(c: String, proxy: String) =
          s"""SELECT '$c' AS col_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count($c) AS BIGINT) AS n_nonnull,
                CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                floor(CAST(count($c) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
                  / 1000000.0 AS completeness,
                floor(CAST(count(DISTINCT $c) AS DOUBLE) / count($c)
                  * 1000000.0 + 0.5) / 1000000.0 AS uniqueness,
                min($proxy) AS min_v, max($proxy) AS max_v,
                floor(avg($proxy) * 100.0 + 0.5) / 100.0 AS avg_v
              FROM orders"""
        Seq(
          block("o_orderkey", "CAST(o_orderkey AS DOUBLE)"),
          block("o_custkey", "CAST(o_custkey AS DOUBLE)"),
          block("o_orderstatus", "CAST(length(o_orderstatus) AS DOUBLE)"),
          block("o_totalprice", "CAST(o_totalprice AS DOUBLE)"),
          block("o_orderdate", "CAST(epoch(o_orderdate) AS DOUBLE)"),
          block("o_orderpriority", "CAST(length(o_orderpriority) AS DOUBLE)"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // q132: constraint audit — four row predicates folded into ONE
    // conditional-sum pass, key uniqueness as one hash aggregate, and
    // referential integrity as a LEFT ANTI join (AQE broadcasts the
    // customer dim). Each check reduces to a violation count; `pass` is
    // the admission bit the reference's alert rules would page on.
    GraftQuery(
      "q132_constraint_audit",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Profile.audit(t.orders,
            rowChecks = Seq(
              Profile.RowCheck("nonneg_totalprice", col("o_totalprice") <= 0),
              Profile.RowCheck("valid_status",
                !col("o_orderstatus").isin("O", "F", "P")),
              Profile.RowCheck("orderdate_bounds",
                col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
                col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
              Profile.RowCheck("priority_format",
                !col("o_orderpriority").rlike("^[1-5]-"))),
            uniqueKey = Some(("pk_orderkey_unique", Seq("o_orderkey"))),
            foreignKeys = Seq(("fk_custkey_customer", Seq("o_custkey"),
              t.customer, Seq("c_custkey"))))
          .orderBy(col("check_name"))
      },
      Some("""
        WITH rc AS (
          SELECT
            CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nonneg_totalprice,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
              THEN 1 ELSE 0 END) AS BIGINT) AS valid_status,
            CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
              OR o_orderdate >= TIMESTAMP '2000-01-01'
              THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_bounds,
            CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
              THEN 1 ELSE 0 END) AS BIGINT) AS priority_format
          FROM orders),
        u AS (
          SELECT 'nonneg_totalprice' AS check_name,
                 nonneg_totalprice AS violations FROM rc
          UNION ALL SELECT 'valid_status', valid_status FROM rc
          UNION ALL SELECT 'orderdate_bounds', orderdate_bounds FROM rc
          UNION ALL SELECT 'priority_format', priority_format FROM rc
          UNION ALL SELECT 'pk_orderkey_unique',
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'fk_custkey_customer', CAST(count(*) AS BIGINT)
            FROM orders o
            WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        SELECT check_name, violations, violations = 0 AS pass
        FROM u ORDER BY check_name""")),

    // q133: EWMA smoothing of each user's daily mean event value —
    // trailing-20-observation normalized form, i.e. the bounded-window
    // twin of pandas ewm(adjust=True). The 20 weights are compile-time
    // literals shared verbatim with the oracle (see [[ewmaFragments]]),
    // the 20 lag taps share ONE window pass, and the weighted sum is a
    // statically-unrolled codegen'd expression — the q110 lesson (never
    // an interpreted HOF in a hot loop) applied at design time.
    GraftQuery(
      "q133_ewma_smooth",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val (num, den) = ewmaFragments(alpha = 0.3, k = 20)
        val daily = t.events
          .groupBy(col("user_id"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .agg((floor(avg(col("value")) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("v"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val lagged = (0 until 20).foldLeft(daily) { (df, j) =>
          df.withColumn(s"lag_$j", lag(col("v"), j).over(w))
        }
        lagged.select(col("user_id"), col("day"), col("v"),
            (floor(expr(num) / expr(den) * lit(1e6) + lit(0.5)) / lit(1e6))
              .as("ewma"))
          .orderBy(col("user_id"), col("day"))
      },
      Some {
        val (num, den) = ewmaFragments(alpha = 0.3, k = 20)
        val lags = (0 until 20)
          .map(j => s"lag(v, $j) OVER w AS lag_$j").mkString(", ")
        s"""
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS v
          FROM events GROUP BY user_id, date_trunc('day', ts)),
        l AS (
          SELECT user_id, day, v, $lags
          FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day))
        SELECT user_id, day, v,
               floor(($num) / ($den) * 1000000.0 + 0.5) / 1000000.0 AS ewma
        FROM l ORDER BY user_id, day"""
      }),

    // q134: peak in-flight intervals per month (orders held open 7
    // days) via the two-phase sweep-line ([[graft.ext.SweepLine]]) —
    // the oracle states the same computation as ONE global running sum,
    // pinning that bucket-offset + local-prefix == global prefix.
    GraftQuery(
      "q134_peak_concurrency",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        SweepLine.concurrencyPeaks(t.orders, col("o_orderdate"),
            col("o_orderdate") + expr("INTERVAL 7 DAY"), unit = "month")
          .withColumn("bkt", col("bkt").cast("date"))
          .orderBy(col("bkt"))
      },
      Some("""
        WITH deltas AS (
          SELECT o_orderdate AS t, 1 AS d FROM orders
          UNION ALL
          SELECT o_orderdate + INTERVAL 7 DAY, -1 FROM orders),
        run AS (
          SELECT date_trunc('month', t) AS bkt, d,
                 sum(d) OVER (ORDER BY t, d) AS run
          FROM deltas)
        SELECT bkt, CAST(max(run) AS BIGINT) AS peak,
               CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_starts
        FROM run GROUP BY bkt ORDER BY bkt""")),

    // q135: changelog compaction ([[graft.ext.Cdc.applyLog]]) — events
    // as an op-log keyed by user (errors = deletes, everything else =
    // upserts, (ts, event_id) the total order), reduced to final state.
    // One hash exchange; the oracle is the window formulation.
    GraftQuery(
      "q135_cdc_apply",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val log = t.events.select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", "d").otherwise("u").as("op"),
          col("value"))
        Cdc.applyLog(log, Seq("user_id"), Seq("ts", "event_id"), "op",
            Seq("value"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH log AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
                 value
          FROM events),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn,
                 CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_ops
          FROM log)
        SELECT user_id, ts, event_id, value, n_ops
        FROM r WHERE rn = 1 AND op <> 'd' ORDER BY user_id""")),

    // q136: Pareto frontier of distinct (retail price ↓, size ↑) part
    // points via the two-phase decomposable skyline
    // ([[graft.ext.Frontier]]); the oracle is the quadratic NOT-EXISTS
    // definition, pinning that the sorted-window formulation computes
    // the same set.
    GraftQuery(
      "q136_pareto_frontier",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        Frontier.pareto2d(t.part, col("p_retailprice"),
            col("p_size").cast("long"))
          .orderBy(col("x"), col("y"))
      },
      Some("""
        WITH pts AS (
          SELECT DISTINCT p_retailprice AS x, CAST(p_size AS BIGINT) AS y
          FROM part)
        SELECT x, y FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR q.y > p.y))
        ORDER BY x, y""")),

    // q137: sequence-pattern analytics (MATCH_RECOGNIZE-shaped, regex-
    // powered): each user's event history becomes one ordered character
    // string — collect_list + array_sort on (ts, event_id) makes the
    // order explicit and partitioning-invariant, mirroring the oracle's
    // ORDER BY inside string_agg — then click-run-to-purchase counts,
    // longest click run, double purchases, and a signup-before-first-
    // purchase flag are regex matches over the engine-shared subset
    // (the q57/q125 discipline). Per-user state is one string bounded
    // by that user's activity; group-by shuffle only.
    GraftQuery(
      "q137_event_pattern",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ch = when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "view", "v")
          .when(col("event_type") === "error", "e")
          .when(col("event_type") === "signup", "s")
          .otherwise("x")
        t.events
          .select(col("user_id"), col("ts"), col("event_id"), ch.as("ch"))
          .groupBy(col("user_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("ch")))),
            x => x.getField("ch")), "").as("s"))
          .select(col("user_id"),
            length(col("s")).cast("long").as("seq_len"),
            size(regexp_extract_all(col("s"), lit("c+p"), lit(0)))
              .cast("long").as("n_cp"),
            coalesce(array_max(transform(
              regexp_extract_all(col("s"), lit("c+"), lit(0)),
              x => length(x))), lit(0)).cast("long").as("longest_click_run"),
            size(regexp_extract_all(col("s"), lit("pp"), lit(0)))
              .cast("long").as("n_pp"),
            col("s").rlike("^[^p]*s.*p").as("signup_before_first_purchase"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH m AS (
          SELECT user_id, ts, event_id,
                 CASE event_type WHEN 'click' THEN 'c'
                   WHEN 'purchase' THEN 'p' WHEN 'view' THEN 'v'
                   WHEN 'error' THEN 'e' WHEN 'signup' THEN 's'
                   ELSE 'x' END AS ch
          FROM events),
        s AS (
          SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS s
          FROM m GROUP BY user_id)
        SELECT user_id,
               CAST(length(s) AS BIGINT) AS seq_len,
               CAST(len(regexp_extract_all(s, 'c+p')) AS BIGINT) AS n_cp,
               CAST(coalesce(list_max(list_transform(
                 regexp_extract_all(s, 'c+'), x -> length(x))), 0) AS BIGINT)
                 AS longest_click_run,
               CAST(len(regexp_extract_all(s, 'pp')) AS BIGINT) AS n_pp,
               regexp_matches(s, '^[^p]*s.*p') AS signup_before_first_purchase
        FROM s ORDER BY user_id""")),

    // q138: chi-square independence test of event_type × day-of-week —
    // exact integer contingency cells, margins via cross join (5×7
    // grid), expected counts and the statistic mirrored
    // operation-for-operation; only the 35-term sum folds in
    // engine-specific order, so chi2/Cramér's V are floor-quantized at
    // steps (1e-4 / 1e-6) that dwarf the ~1e-11 fold error. Spark's
    // dayofweek is 1=Sunday; DuckDB's dayofweek is 0=Sunday, hence the
    // +1 on the oracle side.
    GraftQuery(
      "q138_chi_square",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val ev = t.events.select(col("event_type").as("et"),
          dayofweek(col("ts")).as("dw"))
        val cells = ev.groupBy(col("et"), col("dw"))
          .agg(count(lit(1L)).as("o"))
        val rt = cells.groupBy(col("et")).agg(sum(col("o")).as("rt"))
        val ct = cells.groupBy(col("dw")).agg(sum(col("o")).as("ct"))
        val tot = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("et")).as("r"), countDistinct(col("dw")).as("c"))
        val grid = rt.crossJoin(ct)
          .join(cells, Seq("et", "dw"), "left")
          .na.fill(0L, Seq("o"))
          .crossJoin(broadcast(tot))
        val e = col("rt").cast("double") * col("ct") / col("n")
        val chi = grid
          .agg(sum((col("o") - e) * (col("o") - e) / e).as("chi2raw"))
        tot.crossJoin(chi).select(
          col("n"), col("r"), col("c"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          (floor(col("chi2raw") * lit(1e4) + lit(0.5)) / lit(1e4))
            .as("chi2"),
          (floor(sqrt(col("chi2raw") /
              (col("n") * least(col("r") - 1, col("c") - 1)))
            * lit(1e6) + lit(0.5)) / lit(1e6)).as("cramers_v"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type AS et, CAST(dayofweek(ts) AS INT) + 1 AS dw
          FROM events),
        cells AS (
          SELECT et, dw, CAST(count(*) AS BIGINT) AS o
          FROM ev GROUP BY et, dw),
        rt AS (SELECT et, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY et),
        ct AS (SELECT dw, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY dw),
        tot AS (
          SELECT CAST(sum(o) AS BIGINT) AS n,
                 CAST(count(DISTINCT et) AS BIGINT) AS r,
                 CAST(count(DISTINCT dw) AS BIGINT) AS c
          FROM cells),
        grid AS (
          SELECT rt.et, ct.dw, rt.rt, ct.ct, coalesce(cells.o, 0) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN cells ON cells.et = rt.et AND cells.dw = ct.dw),
        chi AS (
          SELECT sum((o - CAST(rt AS DOUBLE) * ct / n)
                   * (o - CAST(rt AS DOUBLE) * ct / n)
                   / (CAST(rt AS DOUBLE) * ct / n)) AS chi2raw
          FROM grid, tot)
        SELECT n, r, c, (r - 1) * (c - 1) AS dof,
               floor(chi2raw * 10000.0 + 0.5) / 10000.0 AS chi2,
               floor(sqrt(chi2raw / (n * least(r - 1, c - 1)))
                 * 1000000.0 + 0.5) / 1000000.0 AS cramers_v
        FROM tot, chi""")),

    // q139: per-source token-distribution entropy and KL divergence
    // against the corpus distribution — the mixture-health metric
    // behind "is src7 just boilerplate". Each −p·ln(p) / p·ln(p/q)
    // term is nano-quantized to an INTEGER before summation (the q69
    // idf discipline), so the per-source sums are exact and
    // partitioning-invariant; only ln() itself crosses libms.
    // Shuffle shape: token-keyed aggregation + one join on token
    // (TF-IDF's shape), source totals broadcast back.
    GraftQuery(
      "q139_source_entropy",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val toks = t.documents.select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        val cnt = toks.groupBy(col("source"), col("tok"))
          .agg(count(lit(1L)).as("tc"))
        val tot = cnt.groupBy(col("source"))
          .agg(sum(col("tc")).as("tot"), count(lit(1L)).as("ndist"))
        val g = cnt.groupBy(col("tok")).agg(sum(col("tc")).as("gc"))
        val gt = g.agg(sum(col("gc")).as("gtot"))
        val p = col("tc").cast("double") / col("tot")
        val q = col("gc").cast("double") / col("gtot")
        cnt.join(broadcast(tot), "source").join(g, "tok")
          .crossJoin(broadcast(gt))
          .groupBy(col("source"))
          .agg(max(col("tot")).as("n_tokens"),
            max(col("ndist")).as("n_distinct_tokens"),
            sum(floor(-(p * log(p) * lit(1e9)) + lit(0.5))).as("ent_nano"),
            sum(floor(p * log(p / q) * lit(1e9) + lit(0.5))).as("kl_nano"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        cnt AS (
          SELECT source, tok, CAST(count(*) AS BIGINT) AS tc
          FROM toks GROUP BY source, tok),
        tot AS (
          SELECT source, CAST(sum(tc) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS ndist
          FROM cnt GROUP BY source),
        g AS (SELECT tok, CAST(sum(tc) AS BIGINT) AS gc FROM cnt GROUP BY tok),
        gt AS (SELECT CAST(sum(gc) AS BIGINT) AS gtot FROM g),
        terms AS (
          SELECT cnt.source, tot.tot, tot.ndist,
                 CAST(floor(-(CAST(tc AS DOUBLE) / tot
                     * ln(CAST(tc AS DOUBLE) / tot) * 1000000000.0) + 0.5)
                   AS BIGINT) AS ent_term,
                 CAST(floor(CAST(tc AS DOUBLE) / tot
                     * ln((CAST(tc AS DOUBLE) / tot)
                       / (CAST(gc AS DOUBLE) / gtot)) * 1000000000.0 + 0.5)
                   AS BIGINT) AS kl_term
          FROM cnt JOIN tot USING (source) JOIN g USING (tok), gt)
        SELECT source, max(tot) AS n_tokens,
               max(ndist) AS n_distinct_tokens,
               CAST(sum(ent_term) AS BIGINT) AS ent_nano,
               CAST(sum(kl_term) AS BIGINT) AS kl_nano
        FROM terms GROUP BY source ORDER BY source""")),

    // q140: symmetric int8 quantization of the embedding column —
    // per-vector scale 127/max|x|, integer codes, saturation count, and
    // a reconstruction-error checksum whose per-element terms are
    // micro-quantized to integers so every output column is exact.
    // Per-row map work over dim-64 arrays: the interpreted-HOF cost the
    // q110 kernel dodges is fine HERE because each lambda runs 64
    // times per row once, not dim×dim — bench guards the difference
    // (swap in a SketchKernels native if this ever trends hot).
    // Float→double promotion is exact and identical in both engines,
    // so scale/codes/err agree to the bit with no rounding at all.
    GraftQuery(
      "q140_int8_quantize",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.embeddings
          .withColumn("maxabs",
            expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE)"))
          .withColumn("scale",
            expr("CASE WHEN maxabs > 0.0 THEN 127.0 / maxabs ELSE 0.0 END"))
          .select(col("vec_id"), col("maxabs"), col("scale"),
            expr("""aggregate(embedding, CAST(0 AS BIGINT),
                    (a, x) -> a + CAST(floor(x * scale + 0.5) AS BIGINT))""")
              .as("checksum"),
            expr("""CAST(size(filter(embedding,
                    x -> abs(CAST(floor(x * scale + 0.5) AS BIGINT)) >= 127))
                    AS BIGINT)""").as("n_sat"),
            expr("""aggregate(embedding, CAST(0 AS BIGINT),
                    (a, x) -> a + CAST(floor(abs(x * scale
                      - floor(x * scale + 0.5)) * 1000000.0 + 0.5)
                      AS BIGINT))""").as("err_micro"))
          .orderBy(col("vec_id"))
      },
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x)))
                   AS DOUBLE) AS maxabs
          FROM embeddings),
        s AS (
          SELECT vec_id, embedding, maxabs,
                 CASE WHEN maxabs > 0.0 THEN 127.0 / maxabs ELSE 0.0 END
                   AS scale
          FROM b)
        SELECT vec_id, maxabs, scale,
               CAST(list_sum(list_transform(embedding,
                 x -> CAST(floor(x * scale + 0.5) AS BIGINT))) AS BIGINT)
                 AS checksum,
               CAST(len(list_filter(embedding,
                 x -> abs(CAST(floor(x * scale + 0.5) AS BIGINT)) >= 127))
                 AS BIGINT) AS n_sat,
               CAST(list_sum(list_transform(embedding,
                 x -> CAST(floor(abs(x * scale - floor(x * scale + 0.5))
                   * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS err_micro
        FROM s ORDER BY vec_id""")),

    // q145: point-in-time (temporal) dimension lookup — each purchase
    // event joined to the SCD2 profile row that was valid at its event
    // day (q108's history consumed the way a warehouse consumes it:
    // "what did we believe about this user WHEN the event happened").
    // Plan shape: equi-join on user_id with the validity range as a
    // residual predicate — per-user histories are span-sized, so the
    // hash join carries no range-join blowup; join method is AQE's
    // call.
    GraftQuery(
      "q145_pit_lookup",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val hist = Scd2.build(Scd2.dailyProfiles(t.events))
        val purchases = t.events
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"))
        purchases.join(hist,
            purchases("user_id") === hist("user_id") &&
              col("day") >= col("valid_from") &&
              (col("valid_to").isNull || col("day") < col("valid_to")))
          .select(col("event_id"), purchases("user_id"), col("day"),
            col("value_micro"), col("is_current"))
          .orderBy(col("event_id"))
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
          FROM seg GROUP BY 1, 2),
        hist AS (
          SELECT user_id, valid_from,
                 lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
                   AS valid_to,
                 value_micro,
                 lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
                   IS NULL AS is_current
          FROM spans)
        SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS day,
               h.value_micro, h.is_current
        FROM events e JOIN hist h
          ON e.user_id = h.user_id
          AND CAST(e.ts AS DATE) >= h.valid_from
          AND (h.valid_to IS NULL OR CAST(e.ts AS DATE) < h.valid_to)
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // q146: per-label embedding centroid similarity matrix — "are
    // sources/classes drifting together". Cosine between centroids is
    // scale-invariant, so the centroids are never divided: per-dim
    // INTEGER sums of the 1e4-quantized embeddings (the q30/q43
    // convention) stand in for the centroids, dot products and norms
    // fold in decimal(38,0) (exact at any corpus size), and the only
    // doubles are IEEE-exact sqrt/division mirrored in both engines.
    // Shuffle shape: posexplode → (label, dim) aggregate (the heavy
    // exchange), then a label×label join over #labels² tiny rows.
    GraftQuery(
      "q146_centroid_cosine",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val dec = "decimal(38,0)"
        val sums = t.embeddings
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .withColumn("q", floor(col("x").cast("double") * 10000 + lit(0.5))
            .cast("long"))
          .groupBy(col("label"), col("pos"))
          .agg(sum(col("q")).as("s"))
        val norms = sums.groupBy(col("label"))
          .agg(sum(col("s").cast(dec) * col("s")).as("nrm"))
        val a = sums.select(col("label").as("la"), col("pos"), col("s").as("sa"))
        val b = sums.select(col("label").as("lb"), col("pos"), col("s").as("sb"))
        a.join(b, Seq("pos")).filter(col("la") < col("lb"))
          .groupBy(col("la"), col("lb"))
          .agg(sum(col("sa").cast(dec) * col("sb")).as("dot"))
          .join(norms.select(col("label").as("la"), col("nrm").as("na")), "la")
          .join(norms.select(col("label").as("lb"), col("nrm").as("nb")), "lb")
          .select(col("la"), col("lb"),
            (col("dot").cast("double") /
              (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
              .as("cos"))
          .orderBy(col("la"), col("lb"))
      },
      Some("""
        WITH q AS (
          SELECT label, g.i AS pos,
                 CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 10000 + 0.5)
                   AS BIGINT) AS qv
          FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
        sums AS (
          SELECT label, pos, CAST(sum(qv) AS BIGINT) AS s
          FROM q GROUP BY label, pos),
        norms AS (
          SELECT label, sum(CAST(s AS DECIMAL(38,0)) * s) AS nrm
          FROM sums GROUP BY label),
        dots AS (
          SELECT a.label AS la, b.label AS lb,
                 sum(CAST(a.s AS DECIMAL(38,0)) * b.s) AS dot
          FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
          GROUP BY a.label, b.label)
        SELECT la, lb,
               CAST(dot AS DOUBLE) /
                 (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
                 AS cos
        FROM dots
        JOIN norms na ON na.label = dots.la
        JOIN norms nb ON nb.label = dots.lb
        ORDER BY la, lb""")),

    // q147: n-gram novelty scoring — per document, the fraction of its
    // distinct word 3-grams never seen in any EARLIER document (doc_id
    // as ingest order): the freshness signal a dedup-aware sampler
    // weighs against quality. Grams travel as xxhash64 LONGS (the
    // q27/q88 census discipline — the oracle groups the gram STRINGS;
    // a 64-bit collision merging two grams is the accepted
    // ~2^-40-per-corpus risk, same as q27). The oracle joins the gram
    // census back to the gram stream; the Spark plan uses the
    // algebraic identity n_seen = n_grams − n_novel instead, where
    // n_novel(d) = #{grams whose min(doc_id) IS d} falls out of the
    // census itself — so NOTHING gram-keyed is ever joined: one
    // map-side-combined census, a SCAN-SIDE per-doc gram count
    // (size() of the same array — the kernel is distinct-by-
    // construction), and a join of two doc-sized tables. Shingling
    // itself rides the CODEGEN'D [[graft.functions.SketchFns
    // .hashed_shingles]] native (the q28/q88 kernel) — the interpreted
    // array-HOF composition it replaces cost ~4 s per evaluation pass
    // at sf0.1 and dominated the original plan (7.5 s → 1.3 s total;
    // at 100 TB the removed gram-keyed join is the difference between
    // shuffling the gram stream three times and once). The final ratio
    // is the same exact-integer IEEE division as the oracle's — no
    // quantization anywhere.
    GraftQuery(
      "q147_ngram_novelty",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val sh = graft.functions.SketchFns.hashed_shingles(col("text"), 3)
        val novel = t.documents
          .select(col("doc_id"), explode(sh).as("gh"))
          .groupBy(col("gh"))
          .agg(min(col("doc_id")).as("first_doc"))
          .groupBy(col("first_doc").as("doc_id"))
          .agg(count(lit(1L)).as("n_novel"))
        t.documents
          // explode(null) on the census side drops NULL-text docs; mirror
          // that here — size(NULL) = -1 would otherwise surface the doc
          // with nonsense counts while the oracle omits it
          .where(col("text").isNotNull)
          .select(col("doc_id"), size(sh).cast("long").as("n_grams"))
          .join(novel, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            (col("n_grams") - coalesce(col("n_novel"), lit(0L))).as("n_seen"))
          .select(col("doc_id"), col("n_grams"), col("n_seen"),
            (lit(1.0) - col("n_seen").cast("double") / col("n_grams"))
              .as("novelty"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        grams AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(words) >= 3
              THEN list_transform(range(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
              ELSE [array_to_string(words, ' ')] END)) AS g
          FROM w),
        fs AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
        SELECT grams.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN fs.first_doc < grams.doc_id
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
               1.0 - CAST(sum(CASE WHEN fs.first_doc < grams.doc_id
                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
        FROM grams JOIN fs ON grams.g = fs.g
        GROUP BY grams.doc_id ORDER BY grams.doc_id"""))
  )
}
