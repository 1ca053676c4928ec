package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantic pins for [[Ivm]]: the delta-join rule's equivalence to full
  * recompute (the q165 oracle proves it on real data; this proves it on
  * a hand-traceable case including the leg cardinalities), leg
  * disjointness, and the load-bearing plan property — the delta legs
  * broadcast the DELTAS, so the stored sides never shuffle.
  */
class IvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frames() = {
    val aOld = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "av")
    val aNew = Seq((2L, "a2n"), (4L, "a4")).toDF("k", "av")
    val bOld = Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("k", "bv")
    val bNew = Seq((1L, 11L), (3L, 30L), (4L, 41L)).toDF("k", "bv")
    (aOld, aNew, bOld, bNew)
  }

  test("maintainJoin equals the full recompute, as a multiset") {
    val (ao, ad, bo, bd) = frames()
    val full = ao.unionByName(ad).join(bo.unionByName(bd), Seq("k"))
    val maint = Ivm.maintainJoin(ao, ad, bo, bd, Seq("k")).drop("leg")
    assert(maint.exceptAll(full).count() == 0)
    assert(full.exceptAll(maint).count() == 0)
  }

  test("delta legs carry exactly the new join rows, tagged correctly") {
    val (ao, ad, bo, bd) = frames()
    val delta = Ivm.deltaJoin(ao, ad, bo, bd, Seq("k"))
    val init = ao.join(bo, Seq("k"))
    assert(delta.drop("leg").intersect(init).count() == 0,
      "a delta leg re-derived a stored-view row")
    val byLeg = delta.groupBy("leg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ΔA keys {2,4} ⋈ B_old keys {1,2,4} → {2,4}; A_old {1,2,3} ⋈ ΔB
    // {1,3,4} → {1,3}; ΔA ⋈ ΔB → {4}
    assert(byLeg == Map("delta_a" -> 2L, "delta_b" -> 2L, "delta_ab" -> 1L))
  }

  test("delta legs broadcast the deltas — no shuffled join in the plan") {
    val (ao, ad, bo, bd) = frames()
    val plan = Ivm.deltaJoin(ao, ad, bo, bd, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"delta leg shuffled a stored side:\n$plan")
  }

  test("idempotent under an empty delta") {
    val (ao, _, bo, _) = frames()
    val empty = ao.limit(0)
    val emptyB = bo.limit(0)
    assert(Ivm.deltaJoin(ao, empty, bo, emptyB, Seq("k")).count() == 0)
  }

  // ------------------------------------------------------- signed deltas

  import org.apache.spark.sql.DataFrame

  private def consolidated(ao: DataFrame, ad: DataFrame,
                           bo: DataFrame, bd: DataFrame) =
    Ivm.consolidate(Ivm.maintainJoinSigned(ao, ad, bo, bd, Seq("k")))

  test("signed: retracting a stored row removes its view rows exactly") {
    val (ao, _, bo, _) = frames()
    // retract (2, a2); key 2 joins bOld's (2, 20)
    val ad = Seq((2L, "a2", -1L)).toDF("k", "av", "mult")
    val bd = bo.limit(0).withColumn("mult", org.apache.spark.sql.functions.lit(1L))
    val got = consolidated(ao, ad, bo, bd)
    val full = ao.exceptAll(Seq((2L, "a2")).toDF("k", "av")).join(bo, Seq("k"))
    assert(got.drop("mult").exceptAll(full).count() == 0)
    assert(full.exceptAll(got.drop("mult")).count() == 0)
    assert(got.select("mult").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L))
  }

  test("signed: delete-then-reinsert in one batch nets to presence") {
    val (ao, _, bo, _) = frames()
    val ad = Seq((2L, "a2", -1L), (2L, "a2", 1L)).toDF("k", "av", "mult")
    val bd = bo.limit(0).withColumn("mult", org.apache.spark.sql.functions.lit(1L))
    val got = consolidated(ao, ad, bo, bd)
    val full = ao.join(bo, Seq("k"))
    assert(got.drop("mult").exceptAll(full).count() == 0)
    assert(full.exceptAll(got.drop("mult")).count() == 0)
  }

  test("signed: update = retract + insert replaces the row's value") {
    val (ao, _, bo, _) = frames()
    val ad = Seq((2L, "a2", -1L), (2L, "a2x", 1L)).toDF("k", "av", "mult")
    val bd = bo.limit(0).withColumn("mult", org.apache.spark.sql.functions.lit(1L))
    val got = consolidated(ao, ad, bo, bd)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows.contains((2L, "a2x", 20L, 1L)))
    assert(!rows.exists(r => r._1 == 2L && r._2 == "a2"))
  }

  test("signed: both-sides retraction nets to exactly zero (the ΔA⋈ΔB " +
       "product leg cancels the two −1 legs)") {
    val (ao, _, bo, _) = frames()
    val ad = Seq((2L, "a2", -1L)).toDF("k", "av", "mult")
    val bd = Seq((2L, 20L, -1L)).toDF("k", "bv", "mult")
    val stream = Ivm.maintainJoinSigned(ao, ad, bo, bd, Seq("k"))
    // unconsolidated: the (2, a2, 20) row appears on all four legs
    val legs = stream.filter($"k" === 2L).select("leg", "mult").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(legs == Map("init" -> 1L, "delta_a" -> -1L,
      "delta_b" -> -1L, "delta_ab" -> 1L))
    val got = consolidated(ao, ad, bo, bd)
    assert(got.filter($"k" === 2L).count() == 0,
      "a row deleted from both inputs must vanish from the view")
    val full = ao.exceptAll(Seq((2L, "a2")).toDF("k", "av"))
      .join(bo.exceptAll(Seq((2L, 20L)).toDF("k", "bv")), Seq("k"))
    assert(got.drop("mult").exceptAll(full).count() == 0)
    assert(full.exceptAll(got.drop("mult")).count() == 0)
  }

  test("signed: retraction whose key matches nothing is a no-op") {
    val (ao, _, bo, _) = frames()
    val ad = Seq((99L, "ghost", -1L)).toDF("k", "av", "mult")
    val bd = bo.limit(0).withColumn("mult", org.apache.spark.sql.functions.lit(1L))
    val got = consolidated(ao, ad, bo, bd)
    val full = ao.join(bo, Seq("k"))
    assert(got.drop("mult").exceptAll(full).count() == 0)
    assert(full.exceptAll(got.drop("mult")).count() == 0)
  }

  test("signed aggregate: retract/update/insert partials fold to the " +
       "full recompute; a fully-retracted group vanishes") {
    import org.apache.spark.sql.functions.{col, lit}
    // stored rows: group g1 has 3 rows, g2 has 1 (to be fully retracted)
    val oldRows = Seq(("g1", "1.50"), ("g1", "2.00"), ("g1", "3.25"),
      ("g2", "9.99")).toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(12,2)").as("x"))
    val stored = Ivm.aggPartial(oldRows, Seq(col("g")), col("x"))
    // delta: retract g2's only row; update one g1 row 2.00 -> 7.00;
    // insert a g3 row
    val delta = Seq(
      ("g2", "9.99", -1L), ("g1", "2.00", -1L), ("g1", "7.00", 1L),
      ("g3", "4.00", 1L)).toDF("g", "v", "mult")
      .select(col("g"), col("v").cast("decimal(12,2)").as("x"), col("mult"))
    val got = Ivm.mergeAggPartials(stored,
      Ivm.signedAggPartial(delta, Seq(col("g")), col("x"), col("mult")),
      Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet
    assert(got == Set(("g1", 3L, "11.75"), ("g3", 1L, "4.00")),
      s"got $got")
    // g2 vanished entirely — net count zero drops the group
  }

  test("signed aggregate: null measures count as rows, never as sum") {
    import org.apache.spark.sql.functions.{col, lit}
    val oldRows = Seq(("g", Some("1.00")), ("g", None))
      .toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(12,2)").as("x"))
    val stored = Ivm.aggPartial(oldRows, Seq(col("g")), col("x"))
    // retract the null-valued row: count drops, sum untouched
    val delta = Seq(("g", None: Option[String], -1L)).toDF("g", "v", "mult")
      .select(col("g"), col("v").cast("decimal(12,2)").as("x"), col("mult"))
    val got = Ivm.mergeAggPartials(stored,
      Ivm.signedAggPartial(delta, Seq(col("g")), col("x"), col("mult")),
      Seq("g")).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 1L)
    assert(got.head.getDecimal(2).toPlainString == "1.00")
  }

  test("signed: insert-only signed deltas reduce to the insert-only rule") {
    val (ao, ad0, bo, bd0) = frames()
    val lit1 = org.apache.spark.sql.functions.lit(1L)
    val signed = Ivm.deltaJoinSigned(ao, ad0.withColumn("mult", lit1),
      bo, bd0.withColumn("mult", lit1), Seq("k"))
    val plain = Ivm.deltaJoin(ao, ad0, bo, bd0, Seq("k"))
    assert(signed.drop("mult").exceptAll(plain).count() == 0)
    assert(plain.exceptAll(signed.drop("mult")).count() == 0)
    assert(signed.filter($"mult" =!= 1L).count() == 0)
  }
}
