package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for the round-8 admission/curation modules: Profile,
  * Cdc, Frontier, SweepLine. Each test is a tiny hand-checkable case
  * plus (where the operator's scale story depends on it) a
  * partitioning-invariance witness.
  */
class AdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- Profile

  test("profile: counts, completeness, uniqueness, proxies on a known table") {
    val df = Seq(
      (1L, Some("aa"), Some(10.0)),
      (2L, Some("bb"), None),
      (3L, None, Some(30.0)),
      (4L, Some("aa"), Some(20.0))
    ).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v"), avgScale = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 4 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 1.0)
    assert(id.getDouble(6) == 1.0 && id.getDouble(7) == 4.0 &&
      id.getDouble(8) == 2.5)
    val s = p("s")
    assert(s.getLong(2) == 3 && s.getLong(3) == 2)
    assert(s.getDouble(4) == 0.75)
    // uniqueness = 2/3 floor-quantized at 1e6
    assert(s.getDouble(5) == math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6)
    assert(s.getDouble(6) == 2.0 && s.getDouble(7) == 2.0) // length proxy
    val v = p("v")
    assert(v.getLong(2) == 3 && v.getDouble(8) == 20.0)
  }

  test("profile: timestamp columns use the epoch proxy (incl. NTZ loads)") {
    val df = Seq("2020-01-01 00:00:00", "2020-01-03 00:00:00")
      .toDF("raw")
      .select(col("raw").cast("timestamp").as("ts"),
        col("raw").cast("timestamp_ntz").as("tsn"),
        col("raw").cast("date").as("d"))
    val p = Profile.profile(df, Seq("ts", "tsn", "d"), avgScale = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val epoch0 = 1577836800.0 // 2020-01-01 UTC
    for (c <- Seq("ts", "tsn", "d")) {
      assert(p(c).getDouble(6) == epoch0, s"$c min")
      assert(p(c).getDouble(7) == epoch0 + 2 * 86400, s"$c max")
    }
  }

  test("audit: row checks, unique key, FK orphans (null FK is not an orphan)") {
    val fact = Seq(
      (1L, Option(10L), -5.0), // bad amount
      (2L, Option(10L), 1.0),
      (2L, Option(99L), 2.0), // dup key + orphan FK
      (3L, None, 3.0) // null FK: not an orphan
    ).toDF("k", "fk", "amount")
    val dim = Seq(10L, 20L).toDF("pk")
    val out = Profile.audit(fact,
        rowChecks = Seq(Profile.RowCheck("nonneg", col("amount") < 0)),
        uniqueKey = Some(("uniq_k", Seq("k"))),
        foreignKeys = Seq(("fk_dim", Seq("fk"), dim, Seq("pk"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("nonneg") == ((1L, false)))
    assert(out("uniq_k") == ((1L, false)))
    assert(out("fk_dim") == ((1L, false)))
  }

  test("audit: all-green table passes") {
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("k", "fk")
    val dim = Seq(10L, 20L).toDF("pk")
    val out = Profile.audit(fact,
        rowChecks = Seq(Profile.RowCheck("none", lit(false))),
        uniqueKey = Some(("uniq_k", Seq("k"))),
        foreignKeys = Seq(("fk_dim", Seq("fk"), dim, Seq("pk"))))
      .collect()
    assert(out.forall(_.getBoolean(2)), out.mkString(","))
  }

  // -------------------------------------------------------------------- Cdc

  private def opLog = Seq(
    // key 1: insert, update, update — final v=13
    (1L, 1L, "u", 11.0), (1L, 2L, "u", 12.0), (1L, 3L, "u", 13.0),
    // key 2: insert then delete — gone
    (2L, 1L, "u", 21.0), (2L, 2L, "d", 0.0),
    // key 3: delete then re-insert — present, v=32
    (3L, 1L, "u", 31.0), (3L, 2L, "d", 0.0), (3L, 3L, "u", 32.0)
  ).toDF("k", "seq", "op", "v")

  test("cdc applyLog: last op wins, trailing deletes drop the key") {
    val state = Cdc.applyLog(opLog, Seq("k"), Seq("seq"), "op", Seq("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(state.keySet == Set(1L, 3L))
    assert(state(1L) == ((3L, 13.0, 3L)))
    assert(state(3L) == ((3L, 32.0, 3L)))
  }

  test("cdc applyLog: idempotent under reapply and partitioning-invariant") {
    val s1 = Cdc.applyLog(opLog, Seq("k"), Seq("seq"), "op", Seq("v"))
    val s2 = Cdc.reapply(s1, opLog, Seq("k"), Seq("seq"), "op", Seq("v"))
    // state (key/seq/value) is unchanged; n_ops counts one extra fold
    // per key — the injected state row is itself an op
    assert(s2.drop("n_ops").collect().toSet ==
      s1.drop("n_ops").collect().toSet)
    val nOps1 = s1.select("k", "n_ops").as[(Long, Long)].collect().toMap
    val nOps2 = s2.select("k", "n_ops").as[(Long, Long)].collect().toMap
    assert(nOps2 == nOps1.map { case (k, n) => k -> (n + 1) })
    val s3 = Cdc.applyLog(opLog.repartition(7), Seq("k"), Seq("seq"),
      "op", Seq("v"))
    assert(s3.collect().toSet == s1.collect().toSet)
  }

  test("cdc merge: all four paths, clause order, target-side passthrough") {
    val target = Seq((1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L))
      .toDF("k", "name", "bal")
    val source = Seq((1L, 5L, 10L), (3L, 99L, 30L), (9L, 2L, 77L))
      .toDF("k", "n", "delta")
    val out = Cdc.merge(target, source, Seq("k"),
        whenMatched = Seq(
          Cdc.Delete(Some(expr("s.n >= 50"))),
          Cdc.Update(Map("bal" -> expr("t.bal + s.delta")))),
        whenNotMatched = Seq(Cdc.Insert(Map(
          "name" -> concat(lit("new#"), col("k").cast("string")),
          "bal" -> expr("s.delta")))))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ("a", 110L),     // matched -> update (delete shadowed)
      2L -> ("b", 200L),     // unmatched target -> passthrough
      9L -> ("new#9", 77L))) // unmatched source -> insert; 3 deleted
  }

  test("cdc merge: NULL keys never match (ANSI ON-predicate semantics)") {
    val target = Seq((Option(1L), "a", 100L), (None, "nt", 500L))
      .toDF("k", "name", "bal")
    val source = Seq((Option(1L), 10L), (None, 7L), (None, 8L))
      .toDF("k", "delta")
    val out = Cdc.merge(target, source, Seq("k"),
        whenMatched = Seq(Cdc.Update(Map("bal" -> expr("t.bal + s.delta")))),
        whenNotMatched = Seq(Cdc.Insert(Map(
          "name" -> lit("ins"), "bal" -> expr("s.delta")))))
      .collect().map(r => (Option(r.get(0)).map(_.toString),
        r.getString(1), r.getLong(2))).toSeq.sorted
    // null-key target row passes through UNTOUCHED (not "matched" with
    // the null-key source rows); BOTH null-key source rows insert —
    // and must not trip the source-cardinality guard
    assert(out == Seq(
      (None, "ins", 7L), (None, "ins", 8L), (None, "nt", 500L),
      (Some("1"), "a", 110L)).sorted)
  }

  test("cdc merge: idempotent with absolute clauses (re-apply == no-op)") {
    val target = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "bal")
    val source = Seq((1L, 10L), (3L, 999L), (9L, 77L)).toDF("k", "v")
    // absolute SET, delete heavy keys, insert only light ones — the
    // clause shapes under which MERGE is a projection (f(f(x)) = f(x))
    def apply1(t: org.apache.spark.sql.DataFrame) =
      Cdc.merge(t, source, Seq("k"),
        whenMatched = Seq(
          Cdc.Delete(Some(expr("s.v >= 500"))),
          Cdc.Update(Map("bal" -> expr("s.v")))),
        whenNotMatched = Seq(Cdc.Insert(Map("bal" -> expr("s.v")),
          condition = Some(expr("s.v < 500")))))
    val once = apply1(target)
    val twice = apply1(once)
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 200L), (9L, 77L)))
    // and partitioning-invariant, like every operator in this file
    val shuffled = apply1(target.repartition(7))
    assert(shuffled.collect().toSet == once.collect().toSet)
  }

  test("cdc merge: duplicate source keys raise a cardinality error") {
    val target = Seq((1L, 100L)).toDF("k", "bal")
    val dupSource = Seq((1L, 10L), (1L, 20L)).toDF("k", "v")
    val ex = intercept[Exception] {
      Cdc.merge(target, dupSource, Seq("k"),
        whenMatched = Seq(Cdc.Update(Map("bal" -> expr("s.v")))))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("cardinality")),
      s"unexpected error: $ex")
  }

  // --------------------------------------------------------------- Frontier

  test("pareto2d matches the quadratic NOT-EXISTS definition") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(40).toDouble,
      rnd.nextInt(40).toDouble)).toDF("px", "py")
    val got = Frontier.pareto2d(pts, col("px"), col("py"), buckets = 8)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val d = pts.distinct().collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val brute = d.filter { case (x, y) =>
      !d.exists { case (x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.toSet
    assert(got == brute)
  }

  test("pareto2d: buckets=1 equals buckets=32 (decomposability)") {
    val pts = Seq((1.0, 5.0), (2.0, 9.0), (2.0, 9.0), (3.0, 9.0),
      (0.5, 1.0), (4.0, 10.0)).toDF("px", "py")
    def run(b: Int) = Frontier.pareto2d(pts, col("px"), col("py"), b)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(run(1) == run(32))
    assert(run(1) == Set((0.5, 1.0), (1.0, 5.0), (2.0, 9.0), (4.0, 10.0)))
  }

  // -------------------------------------------------------------- SweepLine

  test("concurrencyPeaks: cross-bucket offsets make local prefixes global") {
    // three intervals spanning a month boundary: peak in Feb must count
    // intervals opened in Jan that are still in flight
    val rows = Seq(
      ("2020-01-20 00:00:00", "2020-02-10 00:00:00"),
      ("2020-01-25 00:00:00", "2020-02-05 00:00:00"),
      ("2020-02-01 00:00:00", "2020-02-02 00:00:00"),
      ("2020-03-01 00:00:00", "2020-03-02 00:00:00")
    ).toDF("s", "e").select(col("s").cast("timestamp").as("s"),
      col("e").cast("timestamp").as("e"))
    val out = SweepLine.concurrencyPeaks(rows, col("s"), col("e"), "month")
      .collect()
      .map(r => r.getTimestamp(0).toString.take(7) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("2020-01") == ((2L, 2L)))
    assert(out("2020-02") == ((3L, 1L))) // 2 carried over + 1 new
    assert(out("2020-03") == ((1L, 1L)))
  }

  test("concurrencyPeaks: end-exclusive — back-to-back intervals never overlap") {
    val rows = Seq(
      ("2020-01-01 00:00:00", "2020-01-01 01:00:00"),
      ("2020-01-01 01:00:00", "2020-01-01 02:00:00")
    ).toDF("s", "e").select(col("s").cast("timestamp").as("s"),
      col("e").cast("timestamp").as("e"))
    val out = SweepLine.concurrencyPeaks(rows, col("s"), col("e"), "month")
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
  }
}
