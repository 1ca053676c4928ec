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

  test("lexicalTopK: dropped_words observation tells capping from exact") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b x"), (3L, "a y z"),
      (4L, "a q r")).toDF("id", "text")
    def metrics(maxDf: Long) = {
      val out = Retrieval.lexicalTopK(
        docs.filter(col("id") === 1), col("id"), col("text"),
        docs, col("id"), col("text"), k = 5, maxDf = Some(maxDf))
      out.collect()
      out.queryExecution.observedMetrics.values
        .find(_.schema.fieldNames.contains("dropped_words")).get
    }
    // cap above every df: guard armed but silent
    val silent = metrics(10L)
    assert(silent.getAs[Long]("dropped_words") == 0L)
    assert(silent.getAs[Long]("max_df") == 4L) // word 'a' is in all docs
    // cap below 'a' (df 4) but not 'b' (df 2): guard actively
    // dropping, and it says so. (cap=1 would empty the join entirely,
    // and AQE's empty-relation propagation then prunes the observed
    // subtree with the rest of the plan - documented on lexicalTopK.)
    val firing = metrics(2L)
    assert(firing.getAs[Long]("dropped_words") == 1L)
  }

  test("lexicalTopK: the capped DEFAULT and the uncapped path agree at " +
       "test scale (no df can reach DefaultMaxDf)") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"w${i % 7} w${i % 11} w${i % 3} shared"))
      .toDF("id", "text")
    val q = docs.filter(col("id") < 5)
    val capped = Retrieval.lexicalTopK(q, col("id"), col("text"),
      docs, col("id"), col("text"), k = 5).collect()
    val uncapped = Retrieval.lexicalTopK(q, col("id"), col("text"),
      docs, col("id"), col("text"), k = 5, maxDf = None).collect()
    assert(capped.map(_.toString).sorted.toSeq ==
      uncapped.map(_.toString).sorted.toSeq)
    assert(capped.nonEmpty)
  }

  test("postingJoinAudit: the guard fires on a stopword corpus — one " +
       "word carries the join mass, and the cap removes exactly it") {
    // every doc contains 'the'; distinctive words are nearly unique
    val docs = Seq.tabulate(60)(i => (i.toLong, s"the only$i rare${i % 30}"))
      .toDF("id", "text")
    val audit = Retrieval.postingJoinAudit(
      docs.filter(col("id") < 10), col("id"), col("text"),
      docs, col("id"), col("text"), topK = 3).collect()
    val top = audit.find(_.getAs[Int]("skew_rank") == 1).get
    assert(top.getAs[String]("key") == "the")
    // 10 query docs × 60 corpus docs = 600 of the ~630 total join rows
    // (contrib is an exact digit string since round 11 — hash-stable
    // cross-engine presentation)
    assert(top.getAs[String]("contrib").toLong == 600L)
    assert(top.getAs[Double]("contrib_share") > 0.9,
      "the stopword must dominate total_output — that IS the guard firing")
    // df-capping below the corpus size removes the stopword postings:
    // overlap through 'the' alone no longer pairs anything
    val capped = Retrieval.lexicalTopK(
      docs.filter(col("id") < 10), col("id"), col("text"),
      docs, col("id"), col("text"), k = 60, maxDf = Some(5L)).collect()
    assert(capped.forall(_.getAs[Long]("shared_terms") <= 1L))
    assert(capped.length < 10 * 59,
      "without the cap every (query, candidate) pair shares 'the'")
  }

  test("rrfFuse is partition-invariant") {
    val l1 = Seq.tabulate(50)(i => ((i % 5).toLong, (i * 7 % 23).toLong,
      i % 9 + 1)).toDF("query_id", "cand_id", "rank").distinct()
    val a = Retrieval.rrfFuse(Seq(l1.repartition(1)), k = 5).collect()
    val b = Retrieval.rrfFuse(Seq(l1.repartition(13)), k = 5).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }
}
