package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.functions.NfcNormalize]] — the q217 expression. All
  * non-ASCII codepoints written as escapes so the decomposed-vs-
  * composed contrast survives any tool that NFC-normalizes sources.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("composes decomposed sequences, folds singletons, leaves " +
      "normalized text alone (codegen path)") {
    import spark.implicits._
    import NfcNormalize.nfc_normalize
    val rows = Seq(
      "cafe\u0301",   // e + combining acute -> composed e-acute
      "caf\u00e9",    // already composed
      "ohm \u2126",   // OHM SIGN -> GREEK CAPITAL OMEGA (singleton)
      "A\u030a",      // A + combining ring -> ANGSTROM-like A-ring
      "plain ascii",
      "").toDF("s")
    val got = rows.select(nfc_normalize(col("s"))).collect()
      .map(_.getString(0))
    assert(got(0) == "caf\u00e9")
    assert(got(1) == "caf\u00e9")
    assert(got(2) == "ohm \u03a9")
    assert(got(3) == "\u00c5")
    assert(got(4) == "plain ascii")
    assert(got(5) == "")
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(nfc_normalize(col("s"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("idempotent on multi-combining-mark sequences") {
    import spark.implicits._
    import NfcNormalize.nfc_normalize
    val df = Seq("x\u0301\u0308y" * 10).toDF("s")
      .select(nfc_normalize(col("s")).as("a"))
      .select(col("a"), nfc_normalize(col("a")).as("b"))
    val r = df.collect()(0)
    assert(r.getString(0) == r.getString(1))
  }
}
