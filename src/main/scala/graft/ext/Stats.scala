package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics over full-corpus value columns —
  * the drift checks a training-data pipeline runs between ingest days
  * ("did today's source distribution move?") and between corpus slices
  * ("do click and purchase values follow the same law?"). The
  * reference's monitoring rules alarm on coarse level thresholds
  * (`k8s/monitoring/alerts.yaml`); these operators quantify the
  * distributional version of the same question.
  *
  * The common primitive is an exact ECDF, which is a prefix sum over
  * the ordered value domain — and a single global ORDER BY window is
  * ONE task, wrong at scale. Prefix sums decompose (the
  * [[SweepLine]] argument): phase 1 computes per-range-bucket local
  * cumulative counts in parallel keyed windows; phase 2 computes each
  * bucket's starting offset as a window over #buckets ROWS (broadcast
  * back). bucket_offset + local_prefix == global_prefix exactly, and
  * the registered oracle (one global window in DuckDB) pins that
  * identity on real data.
  *
  * Exactness discipline: all comparisons happen in integer cross-
  * products (|FA−FB| maximized as |cumA·nB − cumB·nA|, computed in
  * decimal(38,0) so 1e12-row corpora cannot overflow), with ONE double
  * conversion at output. No quantization is needed: the final division
  * is a single IEEE op on integers below 2^53 at any tested scale, and
  * the oracle mirrors the same two casts.
  */
object Stats {

  /** Exact two-sample Kolmogorov–Smirnov statistic between the rows
    * selected by `isA` and by `isB` (rows matching neither are
    * ignored; a row matching both counts in both samples).
    *
    * Output (one row): `n_a`, `n_b`, `d_num` = max|cumA·nB − cumB·nA|
    * (exact, as double — below 2^53 through ~1e8×1e8 corpora), and
    * `d` = d_num / (nA·nB), the KS statistic in [0,1].
    *
    * ECDF convention: F(x) = P(X ≤ x), evaluated after ALL ties at x
    * are counted — values are pre-aggregated per distinct v, so tie
    * groups never straddle an evaluation point.
    *
    * `buckets` controls phase-1 parallelism of the decomposed prefix
    * sum; bucket assignment is a pure per-row function of (v, min,
    * max), so the result is partitioning-invariant by construction.
    */
  def ksTest(df: DataFrame, value: Column, isA: Column, isB: Column,
             buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val pts = df.select(value.as("v"),
        when(isA, 1L).otherwise(0L).as("a"),
        when(isB, 1L).otherwise(0L).as("b"))
      .filter(col("v").isNotNull && (col("a") + col("b")) > 0)
    // one row per distinct value: the ECDF's evaluation grid
    val byV = pts.groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(col("b")).as("cb"))
    val rng = byV.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val bucketed = byV.crossJoin(broadcast(rng))
      .withColumn("bkt",
        when(col("hi") <= col("lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("lo")) / (col("hi") - col("lo"))
              * buckets).cast("int"))))
    val local = Window.partitionBy(col("bkt")).orderBy(col("v"))
    val run = bucketed
      .withColumn("la", sum(col("ca")).over(local))
      .withColumn("lb", sum(col("cb")).over(local))
    val totals = bucketed.groupBy(col("bkt"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val before = graft.functions.BoundedWindow.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // #buckets rows on one task by design — the tiny side of the split.
    // Both running sums in ONE select: chained withColumn would give
    // each its own extracted partition-key attribute and the two Window
    // nodes would no longer collapse into one pass
    val offsets = totals.select(col("bkt"),
      coalesce(sum(col("ta")).over(before), lit(0L)).as("oa"),
      coalesce(sum(col("tb")).over(before), lit(0L)).as("ob"))
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val dec = "decimal(38,0)"
    run.join(broadcast(offsets), "bkt")
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs((col("oa") + col("la")).cast(dec) * col("n_b") -
          (col("ob") + col("lb")).cast(dec) * col("n_a")).as("x"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("x")).cast("double").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        (col("d_num") / (col("n_a").cast("double") * col("n_b")))
          .as("d"))
  }

  /** Per-group Gini coefficient of a non-negative integer measure —
    * concentration of `x` within each `group` (0 = uniform, →1 = one
    * row holds everything). Rank formulation over the ascending sort:
    * G = (2·Σ rᵢxᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ), with ranks assigned by a
    * keyed window (per-group sort only — no global ordering). Ties in
    * `x` may receive ranks in any order without changing G (swapping
    * equal x between adjacent ranks leaves Σ r·x unchanged), so the
    * id-based tie-break exists purely to make the PLAN deterministic.
    * All sums are decimal(38,0)-exact; one double division at output.
    *
    * Output: (group, n, total, gini).
    */
  def gini(df: DataFrame, group: Column, x: Column,
           tieBreak: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(group.as("g"), x.cast("long").as("x"), tieBreak.as("t"))
    val w = Window.partitionBy(col("g")).orderBy(col("x").asc, col("t").asc)
    base.withColumn("r", row_number().over(w))
      .groupBy(col("g"))
      .agg(count(lit(1L)).as("n"),
        sum(col("x")).as("total"),
        sum(col("r").cast(dec) * col("x")).as("srx"),
        sum(col("x").cast(dec)).as("sx"))
      .select(col("g"), col("n"), col("total"),
        ((lit(2).cast(dec) * col("srx") -
            (col("n") + 1).cast(dec) * col("sx")).cast("double") /
          (col("n").cast("double") * col("sx").cast("double")))
          .as("gini"))
  }

  /** Poisson-CDF thresholds for λ=1 in 2^20-ths: `floor(P(N≤k)·2^20)`
    * for k = 0..7. A 20-bit uniform u maps to the replicate count
    * `min{k : u < thr(k)}` (8 if beyond all — P < 1e-5). Shared by the
    * Spark plan and quoted verbatim in the q168 oracle. */
  val poissonThresholds20: Seq[Long] =
    Seq(385749L, 771499L, 964373L, 1028665L, 1044738L, 1047952L,
        1048488L, 1048565L)

  /** Forecast BACKTEST with a skill score — the eval loop behind every
    * "is the pipeline's volume normal today?" monitor: seasonal-naive
    * forecast (`f7` = the value 7 CALENDAR days earlier — a join on
    * `d = d′ + 7`, not a 7-ROW lag, so gap days cannot silently shift
    * the season) scored against the persistence baseline (`f1` =
    * yesterday). Reported per group: MAE of both, sMAPE of the
    * seasonal forecast, and `skill_vs_persistence = 1 − MAE₇/MAE₁`
    * (positive = weekly seasonality is real and worth modeling —
    * the Hyndman forecast-evaluation discipline).
    *
    * Scale shape: one daily aggregation (map-side partials), two
    * self-joins of the SMALL daily series on (group, shifted day),
    * one final per-group aggregation — nothing row-scale crosses a
    * shuffle after the first pass. Exactness: `xCents` must be an
    * integer-quantized measure; errors accumulate as integer cents,
    * per-day sMAPE is integer ppm (`2e6·|x−f| DIV (x+f)`, safe while
    * daily totals stay under ~4.6e12 cents), and each output double is
    * a single integer ratio. Days with `x + f7 = 0` contribute 0 ppm.
    * Output: `(group, n_days, abs_err7_cents, abs_err1_cents,
    * mae7_cents, mae1_cents, smape7_ppm, skill_vs_persistence)`.
    */
  def seasonalBacktest(df: DataFrame, group: Column, day: Column,
                       xCents: Column): DataFrame = {
    val daily = df.groupBy(group.as("g"), day.as("d"))
      .agg(sum(xCents.cast("long")).as("x"))
    val f7 = daily.select(col("g"), date_add(col("d"), 7).as("d"),
      col("x").as("f7"))
    val f1 = daily.select(col("g"), date_add(col("d"), 1).as("d"),
      col("x").as("f1"))
    daily.join(f7, Seq("g", "d")).join(f1, Seq("g", "d"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("x") - col("f7"))).as("abs_err7_cents"),
        sum(abs(col("x") - col("f1"))).as("abs_err1_cents"),
        sum(when(col("x") + col("f7") > 0,
            expr("CAST((2000000 * abs(x - f7)) DIV (x + f7) AS BIGINT)"))
          .otherwise(0L)).as("__smape7_sum"))
      .select(col("g"), col("n_days"), col("abs_err7_cents"),
        col("abs_err1_cents"),
        (col("abs_err7_cents").cast("double") /
          col("n_days").cast("double")).as("mae7_cents"),
        (col("abs_err1_cents").cast("double") /
          col("n_days").cast("double")).as("mae1_cents"),
        (col("__smape7_sum").cast("double") /
          col("n_days").cast("double")).as("smape7_ppm"),
        when(col("abs_err1_cents") > 0,
          lit(1.0) - col("abs_err7_cents").cast("double") /
            col("abs_err1_cents").cast("double"))
          .as("skill_vs_persistence"))
  }

  /** Lehmer/MINSTD multiplier ladder: `48271^b mod (2^31−1)` for
    * b = 0..reps−1, precomputed driver-side (bounded: `reps` longs).
    * Shared by the Spark plan and interpolated verbatim into the q168
    * oracle's VALUES list. */
  def lehmerMultipliers(reps: Int): Seq[Long] =
    Iterator.iterate(1L)(g => g * 48271L % 2147483647L).take(reps).toSeq

  /** Nearest-rank percentile-bootstrap CI for a mean via the POISSON
    * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams", Google 2012): classic resampling draws n indices
    * per replicate — a driver-side impossibility at 1e12 rows — but
    * each row's multiplicity in a replicate is asymptotically
    * Poisson(1), independent across rows. So every row emits its own
    * counts for all `reps` replicates MAP-SIDE and the shuffle carries
    * only `reps` partial sums per task: one pass, no resample
    * materialization, no driver state.
    *
    * Determinism discipline: the "randomness" is content-addressed and
    * integer-only — ONE md5 per row seeds a Lehmer stream
    * (`u_b = seed · 48271^b mod 2^31−1`, multipliers precomputed via
    * [[lehmerMultipliers]]; products < 2^62, so no overflow in either
    * engine), each u reduced to 20 bits and mapped to a Poisson(1)
    * count by the integer threshold ladder [[poissonThresholds20]].
    * One hash per row (not per replicate) keeps the kernel integer
    * math inside whole-stage codegen. Replicate means are exact
    * integer ratios (`valueMicro` must be an integer-quantized
    * measure), so the CI — nearest-rank order statistics over the
    * `reps` means, one bounded `reps`-row window — hash-matches the
    * SQL oracle bit-for-bit. Output row: `n_rows, point_mean_micro,
    * ci_lo_micro, ci_hi_micro, reps`.
    */
  def poissonBootstrapMeanCI(df: DataFrame, id: Column, valueMicro: Column,
                             reps: Int = 96, alphaPct: Int = 5): DataFrame = {
    require(reps > 0, "reps must be positive")
    val m = 2147483647L // 2^31 − 1
    // nearest-rank order statistics: rank = ceil(p·N) with p = α/2 —
    // integer-ceil, NOT floor (floor would widen the labeled interval:
    // reps=96, α=5% → ranks 3/94 = the 2.5%/97.5% statistics, where
    // floor's 2/95 would report a ~97.9% interval as "95%")
    val loRank = math.max(1, (alphaPct * reps + 199) / 200)
    val hiRank = reps + 1 - loRank
    val base = df.select(id.cast("string").as("__id"),
      valueMicro.cast("long").as("__v"))
    val ladder = poissonThresholds20.zipWithIndex.reverse
      .foldLeft(lit(8L)) { case (acc, (thr, k)) =>
        when(col("__u") < thr, k.toLong).otherwise(acc)
      }
    val gs = array(lehmerMultipliers(reps).map(lit): _*)
    val perRep = base
      .withColumn("__seed",
        lit(1L) + conv(substring(md5(concat(lit("boot:"), col("__id"))),
          1, 13), 16, 10).cast("long") % (m - 1))
      .select(col("__v"), col("__seed"), posexplode(gs).as(Seq("__b", "__g")))
      .withColumn("__u", (col("__seed") * col("__g") % m) % 1048576L)
      .withColumn("__c", ladder)
      .groupBy(col("__b"))
      .agg(sum(col("__c") * col("__v")).as("__s"), sum(col("__c")).as("__n"))
      // an all-zero replicate (P ≈ e^−N per replicate — tiny inputs only)
      // would yield a NULL mean, and the engines disagree on NULL sort
      // order (Spark NULLS FIRST, DuckDB's ROW_NUMBER NULLS LAST); pin
      // it to +∞ in BOTH so the 96-row rank order stays bit-identical
      .withColumn("__mean",
        when(col("__n") > 0,
          col("__s").cast("double") / col("__n").cast("double"))
          .otherwise(lit(Double.PositiveInfinity)))
    // `reps` rows only — the single-partition window is bounded by design
    val ranked = perRep.withColumn("__rn",
      row_number().over(graft.functions.BoundedWindow.orderBy(col("__mean").asc, col("__b").asc)))
    val ci = ranked.agg(
      max(when(col("__rn") === loRank, col("__mean"))).as("ci_lo_micro"),
      max(when(col("__rn") === hiRank, col("__mean"))).as("ci_hi_micro"))
    val point = base.agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("__sv"))
      .select(col("n_rows"),
        (col("__sv").cast("double") / col("n_rows").cast("double"))
          .as("point_mean_micro"))
    point.crossJoin(ci).withColumn("reps", lit(reps))
  }

  /** Two-sided CUSUM changepoint detection over a keyed daily series —
    * the sequential mean-shift detector (Page 1954) that catches the
    * slow drifts level-threshold alerting misses; the reference's
    * monitoring rules (`k8s/monitoring/alerts.yaml`) alarm only on
    * instantaneous levels, so this is their drift-sensitive upgrade.
    *
    * Recurrence → closed form: S⁺_t = max(0, S⁺_{t−1} + x_t − μ − s)
    * is NOT a window function, but its solution
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) (P = prefix sum of deviations)
    * is two cumulative windows — the same prefix-sum decomposition
    * argument as [[ksTest]]'s ECDF. The mirrored S⁻ uses the opposite
    * slack sign and running max.
    *
    * Exactness: all in integers with denominators cleared. μ = T/n is
    * never divided: deviations are scaled by 1000·n —
    * D_t = 1000·n·x_t − 1000·T ∓ slackPermille·T — and the alarm
    * threshold h‰ of μ becomes threshPermille·T on the same scale.
    * Prefix sums run in decimal(38,0) (a 1e9-key-day series at 1e12
    * cents/day peaks ~1e27). S⁺/S⁻ are emitted with ONE decimal→double
    * conversion; alarms are booleans decided on the exact decimals.
    *
    * The cumulative windows order by day WITHIN each series key — one
    * task per key, bounded by calendar length (thousands of rows), not
    * by corpus size; the events below each (key, day) cell were already
    * collapsed by the exact aggregation.
    *
    * Output: (key, day, x_cents, s_pos, s_neg, alarm_up, alarm_down),
    * one row per key × day.
    *
    * PRECONDITION: each key's series total must be POSITIVE — slack and
    * threshold are permille fractions of the series' own mean, so a
    * zero/negative-sum series (a signed refund ledger) flips or zeroes
    * both and every row alarms. ENFORCED, not doc-only: keys with
    * t_sum ≤ 0 emit NULL alarm_up/alarm_down (s_pos/s_neg still carry
    * the raw statistic), so a violating series fails loudly downstream
    * instead of alarming on every row. Signed ledgers use
    * [[cusumFixed]], whose slack/threshold are absolute cent values
    * with no data-derived scaling.
    */
  def cusum(df: DataFrame, key: Column, day: Column, valueCents: Column,
            slackPermille: Long, threshPermille: Long): DataFrame = {
    require(slackPermille >= 0 && threshPermille > 0,
      s"bad CUSUM params: slack=$slackPermille thresh=$threshPermille")
    val dec = "decimal(38,0)"
    val series = df.groupBy(key.as("key"), day.as("day"))
      .agg(sum(valueCents.cast("long")).as("x"))
    val tot = series.groupBy(col("key"))
      .agg(sum(col("x")).as("t_sum"), count(lit(1)).as("n_days"))
    val s = series.join(broadcast(tot), "key")
      .withColumn("__base", expr(
        s"cast(1000 as $dec) * n_days * x - cast(1000 as $dec) * t_sum"))
      .withColumn("__dup",
        expr(s"__base - cast($slackPermille as $dec) * t_sum"))
      .withColumn("__ddn",
        expr(s"__base + cast($slackPermille as $dec) * t_sum"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = expr(s"cast($threshPermille as $dec) * t_sum")
    s.withColumn("__pup", sum(col("__dup")).over(w))
      .withColumn("__pdn", sum(col("__ddn")).over(w))
      .withColumn("__spos",
        col("__pup") - least(lit(0).cast(dec), min(col("__pup")).over(w)))
      .withColumn("__sneg",
        greatest(lit(0).cast(dec), max(col("__pdn")).over(w)) - col("__pdn"))
      .select(col("key"), col("day"), col("x").as("x_cents"),
        col("__spos").cast("double").as("s_pos"),
        col("__sneg").cast("double").as("s_neg"),
        when(col("t_sum") > 0, col("__spos") > thr).as("alarm_up"),
        when(col("t_sum") > 0, col("__sneg") > thr).as("alarm_down"))
  }

  /** Cohen's kappa between two labelings of the same rows — the
    * chance-corrected agreement a labeled-data pipeline reports
    * instead of raw accuracy (accuracy flatters any predictor on a
    * skewed class mix; kappa subtracts the agreement the marginals
    * would produce by luck): κ = (n·agree − Σ_k a_k·b_k) /
    * (n² − Σ_k a_k·b_k) over gold marginals a and predicted
    * marginals b.
    *
    * Exactness: the confusion matrix, marginals, and both κ terms are
    * exact integers folded in decimal(38,0) (n² caps Long past ~3e9
    * rows); κ is ONE mirrored double division, NULL when the marginals
    * are degenerate (pe = n² — a single class on both sides). `pe_num`
    * is emitted as the digit string (q170 presentation discipline).
    *
    * Scale shape: one confusion-matrix aggregation (map-side partials,
    * #classes² reduce rows), then arithmetic over class-count-sized
    * frames. The corpus is read once and never re-shuffled.
    *
    * Output: ONE row — (n, n_agree, pe_num, kappa).
    */
  def cohenKappa(df: DataFrame, gold: Column, pred: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cm = df.select(gold.as("g"), pred.as("p"))
      .groupBy(col("g"), col("p")).agg(count(lit(1)).as("c"))
    val tot = cm.agg(sum(col("c")).as("n"),
      sum(when(col("g") === col("p"), col("c")).otherwise(0L))
        .as("n_agree"))
    val ga = cm.groupBy(col("g")).agg(sum(col("c")).as("na"))
    val pb = cm.groupBy(col("p")).agg(sum(col("c")).as("nb"))
    // inner join: a class absent from either side contributes 0 to pe
    val pe = ga.join(pb, ga("g") === pb("p"))
      .agg(coalesce(sum(col("na").cast(dec) * col("nb")),
        lit(0).cast(dec)).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .withColumn("__num",
        expr(s"cast(n as $dec) * n_agree") - col("pe_num"))
      .withColumn("__den", expr(s"cast(n as $dec) * n") - col("pe_num"))
      .select(col("n"), col("n_agree"),
        col("pe_num").cast("string").as("pe_num"),
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") /
            col("__den").cast("double")).as("kappa"))
  }

  /** Spearman rank correlation between two metrics, per group — the
    * monotone-agreement check a pipeline runs between two scoring
    * passes ("does the cheap quality score order documents the way the
    * expensive one does?"): ρ = 1 − 6·Σd²/(n(n²−1)) over the rank
    * differences d. Rank-based, so one metric being heavy-tailed (as
    * every corpus statistic is) cannot dominate the way it would in
    * Pearson.
    *
    * Tie discipline: ranks are ROW_NUMBER with ties broken by `id` —
    * deterministic-tiebreak Spearman, NOT midrank Spearman (midranks
    * are rationals; the tie-broken variant keeps every intermediate an
    * exact integer and is replay-stable — the keep-first/md5-order
    * philosophy applied to ranking). With few or no ties the two
    * coincide to noise; callers comparing against midrank tables
    * should know the difference exists.
    *
    * Exactness: d² is accumulated in decimal(38,0) and n(n²−1) is
    * computed in decimal(38,0), so ρ stays exact-over-exact at ANY
    * group size (a Long denominator would silently wrap past n≈2M
    * under non-ANSI semantics and emit a plausible, possibly
    * sign-flipped ρ); the emitted `d2_sum` BIGINT goes NULL instead of
    * wrapping if a group ever exceeds Long range. ρ is ONE double
    * division of two exact integers. The rank windows partition
    * per group and sort within — at corpus scale swap in the bucketed
    * two-phase prefix decomposition ([[ksTest]]'s ECDF argument) or
    * range-partition the rank.
    *
    * Output: one row per group — (group, n, d2_sum, rho).
    */
  def spearman(df: DataFrame, group: Column, id: Column,
               a: Column, b: Column): DataFrame = {
    val base = df.select(group.as("grp"), id.as("id"),
      a.as("a"), b.as("b"))
    val wa = Window.partitionBy(col("grp")).orderBy(col("a"), col("id"))
    val wb = Window.partitionBy(col("grp")).orderBy(col("b"), col("id"))
    val nDec = col("n").cast("decimal(38,0)")
    base
      .withColumn("ra", row_number().over(wa))
      .withColumn("rb", row_number().over(wb))
      .withColumn("d", (col("ra") - col("rb")).cast("decimal(38,0)"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("__d2"))
      .withColumn("rho",
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise(lit(1.0) - lit(6.0) * col("__d2").cast("double") /
            (nDec * nDec * nDec - nDec).cast("double")))
      // try_cast, not cast: under ANSI mode a plain decimal→long cast
      // past Long range throws CAST_OVERFLOW; try_cast delivers the
      // documented goes-NULL-instead-of-wrapping contract (ADVICE r12)
      .select(col("grp"), col("n"),
        expr("try_cast(__d2 as bigint)").as("d2_sum"), col("rho"))
  }

  /** [[cusum]] with a PINNED reference mean instead of the series' own:
    * deviations are x_t − μ0 ∓ slack in raw integer cents (no
    * denominator clearing — μ0 is a constant, not a full-history
    * ratio), the alarm threshold an absolute cent value, S⁺/S⁻ exact
    * Longs (a 1e14-cent cumulative drift is still two orders under the
    * Long ceiling; past that the series should have alarmed long ago).
    *
    * This is the form an UNBOUNDED stream can maintain — the
    * retrospective [[cusum]] needs the series' own mean, a full-pass
    * aggregate; the pinned form needs only the running statistic —
    * and [[graft.streaming.StreamingCusum]] is its online twin, which
    * must match this output row-for-row on any day-ordered prefix
    * (StreamingCusumSpec pins that parity).
    *
    * Same closed form, same window shape, same output schema as
    * [[cusum]] (`s_pos`/`s_neg` here are exact Longs emitted as
    * doubles for schema parity).
    */
  def cusumFixed(df: DataFrame, key: Column, day: Column,
                 valueCents: Column, mu0Cents: Long, slackCents: Long,
                 threshCents: Long): DataFrame = {
    require(slackCents >= 0 && threshCents > 0,
      s"bad CUSUM params: slack=$slackCents thresh=$threshCents")
    val series = df.groupBy(key.as("key"), day.as("day"))
      .agg(sum(valueCents.cast("long")).as("x"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .withColumn("__pup",
        sum(col("x") - lit(mu0Cents) - lit(slackCents)).over(w))
      .withColumn("__pdn",
        sum(col("x") - lit(mu0Cents) + lit(slackCents)).over(w))
      .withColumn("__spos",
        col("__pup") - least(lit(0L), min(col("__pup")).over(w)))
      .withColumn("__sneg",
        greatest(lit(0L), max(col("__pdn")).over(w)) - col("__pdn"))
      .select(col("key"), col("day"), col("x").as("x_cents"),
        col("__spos").cast("double").as("s_pos"),
        col("__sneg").cast("double").as("s_neg"),
        (col("__spos") > threshCents).as("alarm_up"),
        (col("__sneg") > threshCents).as("alarm_down"))
  }
}
