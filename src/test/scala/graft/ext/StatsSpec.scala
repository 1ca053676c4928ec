package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for [[Stats]]: the KS statistic against hand-checkable
  * distributions, the two-phase ECDF decomposition against the
  * single-bucket (global-window-equivalent) configuration, and Gini
  * boundary/tie behavior.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ksTest: identical samples give D = 0") {
    val df = Seq.tabulate(40)(i => ((i / 2) % 10 * 1.0, if (i % 2 == 0) "a" else "b"))
      .toDF("v", "g")
    val r = Stats.ksTest(df, col("v"), col("g") === "a", col("g") === "b")
      .collect().head
    assert(r.getAs[Long]("n_a") == 20 && r.getAs[Long]("n_b") == 20)
    assert(r.getAs[Double]("d") == 0.0)
  }

  test("ksTest: disjoint supports give D = 1") {
    val df = (Seq.tabulate(5)(i => (i * 1.0, "a")) ++
      Seq.tabulate(7)(i => (100.0 + i, "b"))).toDF("v", "g")
    val row = Stats.ksTest(df, col("v"), col("g") === "a", col("g") === "b")
      .collect().head
    assert(row.getAs[Double]("d") == 1.0)
  }

  test("ksTest: hand-computed D on a small asymmetric case") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 — FA=2/4, FB=0 → D=1/2
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, "a")) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, "b"))).toDF("v", "g")
    val r = Stats.ksTest(df, col("v"), col("g") === "a", col("g") === "b")
      .collect().head
    assert(r.getAs[Double]("d_num") == 8.0) // |2*4 - 0*4|
    assert(r.getAs[Double]("d") == 0.5)
  }

  test("ksTest: bucketed decomposition == single-bucket global prefix") {
    val df = Seq.tabulate(500)(i =>
      (math.sin(i * 0.7) * 50 + (i % 13), if (i % 3 == 0) "a" else "b"))
      .toDF("v", "g")
    val multi = Stats.ksTest(df, col("v"), col("g") === "a", col("g") === "b",
      buckets = 11).collect().head
    val single = Stats.ksTest(df, col("v"), col("g") === "a", col("g") === "b",
      buckets = 1).collect().head
    assert(multi.getAs[Double]("d_num") == single.getAs[Double]("d_num"))
    assert(multi.getAs[Double]("d") == single.getAs[Double]("d"))
  }

  test("ksTest: partitioning-invariant") {
    val base = Seq.tabulate(300)(i => (i % 37 * 1.0, if (i % 4 == 0) "a" else "b"))
    val d1 = Stats.ksTest(base.toDF("v", "g").repartition(1),
      col("v"), col("g") === "a", col("g") === "b").collect().head
    val d2 = Stats.ksTest(base.toDF("v", "g").repartition(17),
      col("v"), col("g") === "a", col("g") === "b").collect().head
    assert(d1.getAs[Double]("d_num") == d2.getAs[Double]("d_num"))
  }

  test("gini: uniform distribution gives 0, total concentration gives (n-1)/n") {
    val uniform = Seq.tabulate(8)(i => ("u", 10L, i.toLong))
      .toDF("src", "x", "id")
    val gu = Stats.gini(uniform, col("src"), col("x"), col("id"))
      .collect().head
    assert(gu.getAs[Double]("gini") == 0.0)
    val conc = (Seq.tabulate(9)(i => ("c", 0L, i.toLong)) :+ ("c", 100L, 9L))
      .toDF("src", "x", "id")
    val gc = Stats.gini(conc, col("src"), col("x"), col("id"))
      .collect().head
    assert(gc.getAs[Double]("gini") == 0.9) // (n-1)/n with n=10
  }

  test("gini: tie order between equal values cannot change the coefficient") {
    // two tied x=5 rows; force opposite tie orders via the tie-break col
    val a = Seq(("s", 5L, 1L), ("s", 5L, 2L), ("s", 10L, 3L))
      .toDF("src", "x", "id")
    val b = Seq(("s", 5L, 2L), ("s", 5L, 1L), ("s", 10L, 3L))
      .toDF("src", "x", "id")
    val ga = Stats.gini(a, col("src"), col("x"), col("id")).collect().head
    val gb = Stats.gini(b, col("src"), col("x"), negate(col("id")))
      .collect().head
    assert(ga.getAs[Double]("gini") == gb.getAs[Double]("gini"))
  }

  test("seasonalBacktest: exact weekly pattern → zero seasonal error, skill 1") {
    val pattern = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L)
    val rows = (0 until 28).map(i => ("a",
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
      pattern(i % 7)))
    val r = Stats.seasonalBacktest(rows.toDF("g", "d", "v"),
      col("g"), col("d"), col("v")).collect().head
    assert(r.getAs[Long]("n_days") == 21)
    assert(r.getAs[Long]("abs_err7_cents") == 0)
    assert(r.getAs[Long]("abs_err1_cents") > 0)
    assert(r.getAs[Double]("smape7_ppm") == 0.0)
    assert(r.getAs[Double]("skill_vs_persistence") == 1.0)
  }

  test("seasonalBacktest: a gap day drops its dependents, never misaligns") {
    val pattern = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L)
    val rows = (0 until 28).filter(_ != 10).map(i => ("a",
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
      pattern(i % 7)))
    val r = Stats.seasonalBacktest(rows.toDF("g", "d", "v"),
      col("g"), col("d"), col("v")).collect().head
    // day 10 absent → 10 unscored, 11 lacks f1, 17 lacks f7; the rest
    // still align on CALENDAR d−7, so the seasonal error stays exactly 0
    // (a row-lag implementation would shift the season and break this)
    assert(r.getAs[Long]("n_days") == 18)
    assert(r.getAs[Long]("abs_err7_cents") == 0)
  }

  test("seasonalBacktest: constant series → both errors 0, skill null") {
    val rows = (0 until 20).map(i => ("a",
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
      500L))
    val r = Stats.seasonalBacktest(rows.toDF("g", "d", "v"),
      col("g"), col("d"), col("v")).collect().head
    assert(r.getAs[Long]("abs_err7_cents") == 0)
    assert(r.getAs[Long]("abs_err1_cents") == 0)
    assert(r.isNullAt(r.fieldIndex("skill_vs_persistence")))
  }

  test("poissonThresholds20 pin the exact λ=1 CDF in 2^20-ths") {
    val cdf = (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).map(_.toDouble).product
    }.tail // scanLeft seed dropped; product of empty range = 1 → k=0 term
    val expect = cdf.map(c => math.floor(c * (1 << 20)).toLong)
    assert(Stats.poissonThresholds20 == expect)
  }

  test("poissonBootstrapMeanCI: sane CI around the mean, exact shape") {
    val df = Seq.tabulate(400)(i => (i.toLong, (i + 1) * 1000L))
      .toDF("id", "v")
    val r = Stats.poissonBootstrapMeanCI(df, col("id"), col("v"), reps = 96)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 400 && r.getAs[Int]("reps") == 96)
    val point = r.getAs[Double]("point_mean_micro")
    assert(point == 400 * 401 / 2 * 1000.0 / 400)
    val (lo, hi) = (r.getAs[Double]("ci_lo_micro"),
      r.getAs[Double]("ci_hi_micro"))
    // mean 200500, sd ≈ 115613 → se ≈ 5780; nearest-rank 95% CI must
    // bracket the mean and stay within a few se of it
    assert(lo < point && point < hi)
    assert(point - lo < 4 * 5800 && hi - point < 4 * 5800)
  }

  test("poissonBootstrapMeanCI: partition- and run-invariant") {
    val base = Seq.tabulate(300)(i => (i.toLong, (i % 37) * 500L))
    val a = Stats.poissonBootstrapMeanCI(base.toDF("id", "v").repartition(1),
      col("id"), col("v")).collect().head
    val b = Stats.poissonBootstrapMeanCI(base.toDF("id", "v").repartition(17),
      col("id"), col("v")).collect().head
    assert(a.toString == b.toString)
  }
}
