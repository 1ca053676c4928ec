package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewWinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("salted aggregation equals the unsalted aggregate on a skewed key") {
    // 90% of rows share one hot key
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 < 9, "hot").otherwise("cold").as("k"),
              col("id").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, Seq(col("k")), salts = 8)(
        firstPhase = Seq(sum("v").as("total"), count(lit(1)).as("n")),
        secondPhase = Seq(sum("total").as("total"), sum("n").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals the plain join on a skewed key") {
    val left = spark.range(5000)
      .select(when(col("id") % 5 < 4, 1L).otherwise(col("id") % 50).as("k"),
              col("id").as("v"))
    val right = spark.range(50).select(col("id").as("rk"),
      concat(lit("dim"), col("id")).as("name"))
    val plain = left.join(right, col("k") === col("rk"))
      .select("v", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(left, right, col("k"), col("rk"), salts = 8)
      .select("v", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("winnow-fingerprint pairs find the planted near-dup documents") {
    val jacc = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = Dedup.winnowPairs(docs, col("doc_id"), col("text"),
        k = 8, w = 4, minOverlap = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacc.nonEmpty)
    // character-level fingerprints must recover the word-level near-dups
    assert(jacc.subsetOf(win),
      s"missed: ${jacc.diff(win)}; winnow found ${win.size}")
    // and it prunes: far fewer pairs than all-pairs (500 docs -> 124750)
    assert(win.size < 5000, s"winnow candidates not selective: ${win.size}")
  }

  test("joinCardinalityAudit: hand case — exact counts, ranks, shares") {
    import spark.implicits._
    // key 1: 3×2=6, key 2: 1×4=4, key 3 only in a, key 4 only in b
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 1L, 2L, 2L, 2L, 2L, 4L).toDF("k")
    val rows = Skew.joinCardinalityAudit(a, col("k"), b, col("k"), topK = 10)
      .orderBy(col("skew_rank")).collect()
    // contrib/total_output: decimal(38,0) math internally (overflow-proof
    // in the join-explosion regime the audit exists to detect), emitted
    // as exact digit strings since round 11 (hash-stable cross-engine)
    assert(rows.map(r => (r.getAs[Int]("skew_rank"), r.getAs[Long]("key"),
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[String]("contrib").toLong)).toSeq ==
      Seq((1, 1L, 3L, 2L, 6L), (2, 2L, 1L, 4L, 4L)))
    assert(rows.forall(r =>
      r.getAs[String]("total_output").toLong == 10L &&
      r.getAs[Long]("n_join_keys") == 2L))
    assert(rows.head.getAs[Double]("contrib_share") == 0.6)
  }

  test("joinCardinalityAudit: total_output equals the real join size") {
    import spark.implicits._
    val a = Seq.tabulate(500)(i => (i % 37).toLong).toDF("k")
    val b = Seq.tabulate(300)(i => (i % 23).toLong).toDF("k")
    val audited = Skew.joinCardinalityAudit(a, col("k"), b, col("k"), 5)
      .select("total_output").distinct().collect()
      .head.getAs[String](0).toLong
    assert(audited == a.join(b, "k").count())
  }

  test("joinCardinalityAudit: topK bounds output, contrib non-increasing") {
    import spark.implicits._
    val a = Seq.tabulate(200)(i => (i % 19).toLong).toDF("k")
    val b = Seq.tabulate(200)(i => (i % 13).toLong).toDF("k")
    val rows = Skew.joinCardinalityAudit(a, col("k"), b, col("k"), 4)
      .orderBy(col("skew_rank")).collect()
    assert(rows.length == 4)
    val contribs = rows.map(_.getAs[String]("contrib").toLong).toSeq
    assert(contribs == contribs.sorted.reverse)
  }
}
