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
    val trends = Scaling.measure(spark, Seq(small, big), runs = 1, linear)
    val bad = trends.filter(_.exponent > Scaling.linearExponentCap)
    assert(bad.isEmpty,
      "super-linear growth in linear-claimed queries:\n" + bad.map(tr =>
        f"  ${tr.name}: e=${tr.exponent}%.3f " +
          tr.points.map(p => s"${p.rows} rows -> ${p.seconds}s").mkString(", "))
        .mkString("\n"))
  }
}
