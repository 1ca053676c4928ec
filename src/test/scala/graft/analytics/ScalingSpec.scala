package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{Scaling, TestSpark}

/** The scale-trend GATE: measures each linear-claimed expensive query at
  * sf0.01 and sf0.1 and fails if its time-vs-rows exponent exceeds
  * [[Scaling.linearExponentCap]] — so an accidental all-pairs join,
  * lost broadcast, or cartesian regression in a plan that claims ~linear
  * scaling fails `sbt test`, not the next bench round. The full recorded
  * trend (3 SFs, min-of-3, per-query table) lives in SCALING.md, produced
  * by the `graft.Scaling` main; this spec is the cheap two-point sentinel
  * of the same measurement.
  *
  * Protocol notes: one untimed warm-up + one timed run per (query, SF)
  * — minutes-cheap, and the cap leaves ~0.7 of exponent headroom over
  * the measured trends (SCALING.md: 0.0–0.72), so single-run noise
  * (±40% worst case ≈ ±0.15 exponent over a 10× row step) cannot
  * false-fail while a quadratic regression (+1.0 exponent) cannot
  * slip through. Super-linear-BY-INTENT queries (q27/q47 exact
  * all-pairs evidence) are excluded and documented in
  * [[Scaling.superLinearByIntent]].
  */
class ScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  test("linear-claimed expensive queries scale ~linearly sf0.01 -> sf0.1") {
    assume(new java.io.File(small).isDirectory &&
      new java.io.File(big).isDirectory, "testdata SFs not present")
    val linear = Scaling.targets.map(_._1)
      .filterNot(Scaling.superLinearByIntent)
    // SPARK_GRAFT_SCALING_DEEP=1 upgrades the sentinel to the full
    // weak-scaling gate: the 8x amplified corpus is built (idempotent)
    // and the exponent is measured on the compute-dominated sf0.1->amp8
    // pair instead of the overhead-biased shipped pair. Off by default —
    // it adds ~10 min of corpus build + measurement to `sbt test`.
    val deep = sys.env.get("SPARK_GRAFT_SCALING_DEEP").contains("1")
    val ampDir =
      if (!deep) None
      else Some {
        val d = s"${sys.props("java.io.tmpdir")}/graft-sf-amp-8"
        Scaling.amplifyCorpus(spark, big, d, 8)
        d
      }
    val trends =
      Scaling.measure(spark, Seq(small, big), runs = 1, linear, ampDir)
    val bad = trends.filter(_.exponent > Scaling.linearExponentCap)
    assert(bad.isEmpty,
      "super-linear growth in linear-claimed queries:\n" + bad.map(tr =>
        f"  ${tr.name}: e=${tr.exponent}%.3f " +
          tr.points.map(p => s"${p.rows} rows -> ${p.seconds}s").mkString(", "))
        .mkString("\n"))
  }
}
