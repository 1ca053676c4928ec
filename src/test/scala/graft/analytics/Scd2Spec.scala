package graft.analytics

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the incremental SCD2 merge's contract: applying one day to an
  * existing history reproduces a full rebuild, transition by transition.
  * q126 pins the same property against the DuckDB oracle on the real
  * events table; this spec isolates each merge case on data small
  * enough that a failure names the broken transition.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // (user_id, day, value_micro) daily profiles
  private def daily(rows: (Long, String, Long)*) =
    rows.map { case (u, day, v) => (u, d(day), v) }
      .toDF("user_id", "day", "value_micro")

  private def collectHist(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "valid_from", "valid_to", "value_micro",
        "n_days", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        Option(r.getDate(2)).map(_.toString).orNull, r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("merge covers every transition: absorb, change, new user, absent user") {
    val hist = Scd2.build(daily(
      (1L, "2024-01-01", 10L), (1L, "2024-01-02", 10L), // open run of 10
      (2L, "2024-01-01", 5L), (2L, "2024-01-02", 7L),   // closed 5, open 7
      (3L, "2024-01-02", 3L)))                          // open, absent on day 3
    val snap = daily(
      (1L, "2024-01-03", 10L),  // same value: absorb
      (2L, "2024-01-03", 9L),   // changed: close 7 at day 3, open 9
      (4L, "2024-01-03", 1L))   // brand-new user
    val got = collectHist(Scd2.merge(hist, snap))
    assert(got == Seq(
      (1L, "2024-01-01", null, 10L, 3L, true),
      (2L, "2024-01-01", "2024-01-02", 5L, 1L, false),
      (2L, "2024-01-02", "2024-01-03", 7L, 1L, false),
      (2L, "2024-01-03", null, 9L, 1L, true),
      (3L, "2024-01-02", null, 3L, 1L, true),
      (4L, "2024-01-03", null, 1L, 1L, true)))
  }

  test("merge(build(days < D), day D) == build(days <= D) on generated data") {
    // 40 users x 12 days, values stepping deterministically so runs of
    // equal values, changes, gaps (user skips a day), and a user whose
    // first-ever day is the merge day all occur
    val rows = for {
      u <- 1L to 40L
      day <- 1 to 12
      if (u + day) % 7 != 0          // gaps
      if !(u == 40L && day < 12)     // user 40 first appears on day 12
    } yield (u, f"2024-02-$day%02d", (u * 31 + day.toLong / 3) % 5)
    val all = daily(rows: _*)
    val last = d("2024-02-12")
    val merged = Scd2.merge(
      Scd2.build(all.where($"day" < last)),
      all.where($"day" === last))
    assert(collectHist(merged) == collectHist(Scd2.build(all)))
    assert(collectHist(merged).nonEmpty)
  }

  test("merge is a no-op shape when the snapshot is empty") {
    val hist = Scd2.build(daily((1L, "2024-01-01", 10L), (1L, "2024-01-02", 12L)))
    val got = collectHist(Scd2.merge(hist, daily().limit(0)))
    assert(got == collectHist(hist))
  }
}
