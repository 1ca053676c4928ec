package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{PlanAudit, TestSpark}

/** The plan-shape GATE over the whole registry: re-censuses every
  * registered query's static physical plan (AQE off, sf0.001 — the
  * [[graft.PlanAudit]] protocol) and fails if any query's SHUFFLE count
  * exceeds the committed `plans.json` baseline. PlanShapeSpec pins a
  * handful of load-bearing plans in detail (join-free merge, broadcast
  * fuzzy join); this is the blanket sentinel that catches the quiet
  * regressions those spot pins cannot — a refactor that re-keys an
  * aggregation, a lost broadcast hint, a helper change that splits one
  * exchange into two — on ALL queries at once, the same way
  * InvarianceSpec blankets correctness and ScalingSpec blankets growth.
  *
  * A query BELOW its committed count is reported (not failed) as a
  * prompt to refresh the artifact; a query missing from the baseline
  * fails — new queries must ship with a regenerated `plans.json`
  * (`runMain graft.PlanAudit`), keeping the artifact honest.
  */
class PlanCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def baseline(): Map[String, Int] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("plans.json")), "UTF-8")
    """"(q[0-9a-z_]+)":\{"shuffles":(\d+)""".r
      .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  test("no query's static shuffle count exceeds the committed plans.json") {
    assume(new java.io.File(sf).isDirectory, "testdata not present")
    assume(new java.io.File("plans.json").isFile, "plans.json not present")
    val base = baseline()
    val now = PlanAudit.auditAll(spark, sf)
    val missing = now.collect { case (n, _) if !base.contains(n) => n }
    assert(missing.isEmpty,
      s"queries absent from plans.json (regenerate via `runMain " +
        s"graft.PlanAudit`): ${missing.mkString(", ")}")
    val worse = now.filter { case (n, c) => c.shuffles > base(n) }
    assert(worse.isEmpty,
      "shuffle-count regressions vs plans.json:\n" + worse.map {
        case (n, c) => s"  $n: ${base(n)} -> ${c.shuffles}"
      }.mkString("\n"))
    val better = now.filter { case (n, c) => c.shuffles < base(n) }
    if (better.nonEmpty)
      info("improved vs baseline (refresh plans.json): " +
        better.map { case (n, c) => s"$n ${base(n)}->${c.shuffles}" }
          .mkString(", "))
    // every single-partition window must be a documented
    // [[graft.functions.BoundedWindow]] site (constant-valued,
    // non-foldable key -> non-empty partitionSpec); a truly empty
    // partitionSpec is an accidental whole-corpus single-partition
    // window — the regression the 1,000-warning log noise used to bury
    // (VERDICT r13 item 6), now a structural gate
    val upw = now.filter { case (_, c) => c.unpartitionedWindows > 0 }
    assert(upw.isEmpty,
      "unpartitioned WindowExec (use graft.functions.BoundedWindow for " +
        "structurally bounded frames): " + upw.map {
        case (n, c) => s"$n(${c.unpartitionedWindows})"
      }.mkString(", "))
  }
}
