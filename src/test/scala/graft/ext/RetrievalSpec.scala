package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for [[Retrieval]]: RRF scores against hand-computed
  * integer contributions, fused ordering and n_lists accounting,
  * lexical overlap counts on a tiny corpus, and the df-cap scale path.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrfFuse: hand-computed ppb scores and fused order") {
    val l1 = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "cand_id", "rank")
    val l2 = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "cand_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), k = 10)
      .orderBy(col("fused_rank")).collect()
    // 1e9 div 61 = 16393442, 1e9 div 62 = 16129032
    assert(out.map(r => (r.getAs[Long]("cand_id"), r.getAs[Long]("rrf_ppb"),
      r.getAs[Long]("n_lists"))).toSeq == Seq(
      (20L, 16393442L + 16129032L, 2L),
      (10L, 16393442L, 1L),
      (30L, 16129032L, 1L)))
    assert(out.map(_.getAs[Int]("fused_rank")).toSeq == Seq(1, 2, 3))
  }

  test("rrfFuse: ties broken by cand_id, k bounds the output") {
    val l = Seq((1L, 9L, 1), (1L, 3L, 1), (2L, 5L, 1))
      .toDF("query_id", "cand_id", "rank")
    val out = Retrieval.rrfFuse(Seq(l), k = 1)
    val rows = out.orderBy(col("query_id")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("cand_id") == 3L) // tie → lower id wins
    assert(rows(1).getAs[Long]("cand_id") == 5L)
  }

  test("lexicalTopK: distinct-word overlap counts, self excluded") {
    val docs = Seq((1L, "a a b c"), (2L, "a b x"), (3L, "a y z"),
      (4L, "p q r")).toDF("id", "text")
    val out = Retrieval.lexicalTopK(
      docs.filter(col("id") === 1), col("id"), col("text"),
      docs, col("id"), col("text"), k = 5)
      .orderBy(col("rank")).collect()
    // doc2 shares {a,b} (duplicates in "a a" must not double-count),
    // doc3 shares {a}, doc4 shares nothing (absent, not zero)
    assert(out.map(r => (r.getAs[Long]("cand_id"),
      r.getAs[Long]("shared_terms"), r.getAs[Int]("rank"))).toSeq ==
      Seq((2L, 2L, 1), (3L, 1L, 2)))
  }

  test("lexicalTopK: maxDf drops corpus-frequent words from both sides") {
    val docs = Seq((1L, "a b c"), (2L, "a b x"), (3L, "a y z"),
      (4L, "a p q")).toDF("id", "text")
    // df(a) = 4 > cap 2 → 'a' contributes nothing; only b survives
    val out = Retrieval.lexicalTopK(
      docs.filter(col("id") === 1), col("id"), col("text"),
      docs, col("id"), col("text"), k = 5, maxDf = Some(2L))
      .collect()
    assert(out.map(r => (r.getAs[Long]("cand_id"),
      r.getAs[Long]("shared_terms"))).toSeq == Seq((2L, 1L)))
  }

  test("rrfFuse is partition-invariant") {
    val l1 = Seq.tabulate(50)(i => ((i % 5).toLong, (i * 7 % 23).toLong,
      i % 9 + 1)).toDF("query_id", "cand_id", "rank").distinct()
    val a = Retrieval.rrfFuse(Seq(l1.repartition(1)), k = 5).collect()
    val b = Retrieval.rrfFuse(Seq(l1.repartition(13)), k = 5).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }
}
