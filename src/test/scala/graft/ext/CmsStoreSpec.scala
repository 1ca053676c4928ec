package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.ext.CmsStore]] — the q215 sketch. The oracle pins the full
  * integer replay; this spec pins the sketch-theoretic properties on
  * hand data: linearity (merge ≡ direct), the one-sided guarantee,
  * exactness in the collision-free regime, and the token cap.
  */
class CmsStoreSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def docs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("source", "text")
  }

  test("merge of per-shard sketches equals the direct sketch, " +
      "cell for cell") {
    val words = CmsStore.tokens(
      docs(("a", "x y x z"), ("b", "y y w q x")), col("text"))
    val merged = CmsStore.sketchCells(words, col("source"))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
    val direct = CmsStore.sketchCells(words, lit("all"))
      .select(col("row"), col("col"), col("cnt").as("d"))
    val joined = merged.join(direct, Seq("row", "col"), "full_outer")
    assert(joined.filter(!(col("cnt") <=> col("d"))).count() == 0)
    // total mass per row = total token count (CMS row invariant)
    val n = words.count()
    val perRow = direct.groupBy("row").agg(sum("d").as("m")).collect()
    assert(perRow.length == CmsStore.Depth &&
      perRow.forall(_.getLong(1) == n))
  }

  test("estimates are exact in the collision-free regime and never " +
      "under-count") {
    import spark.implicits._
    val words = CmsStore.tokens(
      docs(("a", "cat dog cat bird"), ("a", "cat fish dog")), col("text"))
    val cells = CmsStore.sketchCells(words, lit("all"))
      .select(col("row"), col("col"), col("cnt"))
    val probes = Seq("cat", "dog", "bird", "fish").toDF("word")
    val est = CmsStore.estimate(cells, probes).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("cat" -> 3L, "dog" -> 2L, "bird" -> 1L, "fish" -> 1L)
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w under-counted")
      // 5 distinct words in a 4x1024 sketch: collisions impossible to
      // matter across all 4 rows simultaneously only probabilistically —
      // but with this tiny vocab every row is collision-free in practice
      assert(est(w) == c, s"$w expected exact in collision-free regime")
    }
  }

  test("token cap: 64-byte-plus words are excluded on both paths") {
    val long = "x" * 64
    val words = CmsStore.tokens(docs(("a", s"ok $long also")), col("text"))
    val got = words.select("word").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("also", "ok"))
  }

  test("pow31 constants: Horner fold of poly_hash equals the power sum") {
    val pw = CmsStore.pow31(64)
    def horner(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * 31 + (b & 0xff)) % CmsStore.P)
    def powerSum(s: String): Long = {
      val bs = s.getBytes("UTF-8")
      bs.indices.map(k => (bs(k) & 0xff) * pw(bs.length - 1 - k))
        .sum % CmsStore.P
    }
    Seq("a", "word", "graft-cms", "ü§", "0123456789" * 6).foreach { s =>
      assert(horner(s) == powerSum(s), s)
    }
  }
}
