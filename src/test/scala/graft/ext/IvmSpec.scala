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
}
