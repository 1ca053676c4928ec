package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for [[Affinity]]: hand-computed support/confidence/
  * lift, direction asymmetry, the maxBasket Apriori guard, and
  * min-support filtering.
  */
class AffinitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(rows: Seq[(Long, String)], minSupp: Long,
                    maxBasket: Int = 1000) =
    Affinity.associationRules(rows.toDF("b", "i"), col("b"), col("i"),
        minSupp, maxBasket)
      .collect()
      .map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        (r.getAs[Long]("n_both"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift")))
      .toMap

  test("hand-computed rules: counts, confidence, lift, direction") {
    // baskets: 1:{A,B,C}, 2:{A,B}, 3:{A}; duplicates must not count twice
    val rows = Seq(1L -> "A", 1L -> "B", 1L -> "C", 1L -> "A",
      2L -> "A", 2L -> "B", 3L -> "A")
    val r = rules(rows, minSupp = 1)
    assert(r(("A", "B")) == ((2L, 2.0 / 3.0, 1.0)))
    assert(r(("B", "A")) == ((2L, 1.0, 1.0)))
    assert(r(("B", "C")) == ((1L, 0.5, 1.5)))  // lift 1·3/(2·1)
    assert(r(("C", "B")) == ((1L, 1.0, 1.5)))  // same lift, other conf
    assert(r.size == 6)
  }

  test("minSupportCount prunes rare pairs") {
    val rows = Seq(1L -> "A", 1L -> "B", 1L -> "C",
      2L -> "A", 2L -> "B", 3L -> "A")
    val r = rules(rows, minSupp = 2)
    assert(r.keySet == Set(("A", "B"), ("B", "A")))
  }

  test("maxBasket drops oversized baskets whole, including their counts") {
    val big = (1 to 5).map(i => 9L -> s"X$i")
    val rows = Seq(1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B") ++ big
    val df = rules(rows, minSupp = 1, maxBasket = 4)
    // basket 9 gone entirely: no X pairs, and n_baskets excludes it
    assert(df.keys.forall { case (a, c) =>
      !a.startsWith("X") && !c.startsWith("X") })
    val full = Affinity.associationRules(rows.toDF("b", "i"),
      col("b"), col("i"), 1, maxBasket = 4)
    assert(full.select("n_baskets").distinct().collect()
      .head.getLong(0) == 2L)
  }

  test("partition-invariant") {
    val rows = Seq.tabulate(300)(i =>
      ((i % 40).toLong, s"it${i % 7}"))
    val a = Affinity.associationRules(rows.toDF("b", "i").repartition(1),
      col("b"), col("i"), 1).collect().map(_.toString).sorted.toSeq
    val b = Affinity.associationRules(rows.toDF("b", "i").repartition(13),
      col("b"), col("i"), 1).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
