package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-6 corpus operators: sequence packing, leakage-safe splits, and
  * substring-level duplication spans.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wordRun(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  // ---------------------------------------------------------------- q84

  test("packedSequences: digests are partitioning-invariant, shards cover every doc") {
    val docs = (0L until 40L)
      .map(i => (i, wordRun(s"d$i-", 5 + (i % 7).toInt)))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      TextAnalysis.packedSequences(docs.repartition(parts), col("doc_id"),
          col("text"), budget = 30L, partitions = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val a = run(1)
    val b = run(13)
    // collect_list arrival order must NOT leak into the digest
    assert(a == b)
    assert(a.map(_._2).sum == 40L, "every doc packed exactly once")
    // shards are consecutive from 0
    assert(a.map(_._1).sorted == (0L until a.length.toLong))
  }

  test("packedSequences: digest is md5 of the doc_id-ordered concatenation") {
    val docs = Seq((2L, "bb"), (1L, "aa"), (3L, "cc")).toDF("doc_id", "text")
    // budget large enough for one shard
    val out = TextAnalysis.packedSequences(docs, col("doc_id"), col("text"),
      budget = 100L, partitions = 2).collect()
    assert(out.length == 1)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("aa\nbb\ncc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(3) == expected)
  }

  // ---------------------------------------------------------------- q85

  test("leakageSplit: every cluster member shares one split; singletons covered") {
    // clusters {1,2,3} and {10,11}; 20..24 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 24L))
      .toDF("doc_id")
    val out = Dedup.leakageSplit(docs, col("doc_id"), pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 10, "every doc gets a split row")
    val byCluster = out.groupBy(_._2)
    // one split value per cluster — the leakage guarantee
    assert(byCluster.values.forall(_.map(_._3).distinct.length == 1))
    // clustered docs carry the min-id representative
    assert(out.filter(r => Set(1L, 2L, 3L)(r._1)).forall(_._2 == 1L))
    assert(out.filter(r => Set(10L, 11L)(r._1)).forall(_._2 == 10L))
    // singletons are their own cluster
    assert(out.filter(_._1 >= 20L).forall(r => r._2 == r._1))
  }

  // ---------------------------------------------------------------- q88

  test("dupSpans: run length counts consecutive cross-doc 8-grams only") {
    val shared = wordRun("s", 12) // 12 shared words -> 5 shared 8-grams
    val a = s"$shared ${wordRun("a", 10)}"
    val b = s"${wordRun("b", 10)} $shared"
    val c = wordRun("c", 20) // nothing shared
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: 22 words -> 15 grams; the 5 grams fully inside `shared`
    // (positions 0..4) are duplicated, consecutively
    assert(out(0) == (1L, 15L, 5L, 5L))
    // doc 2: same 5 duplicated grams, at the tail (positions 10..14)
    assert(out(1) == (2L, 15L, 5L, 5L))
    // doc 3: 20 words -> 13 grams, none duplicated
    assert(out(2) == (3L, 13L, 0L, 0L))
  }

  test("dupSpans: within-doc repetition is not duplication; short docs excluded") {
    val rep = wordRun("r", 8)
    val docs = Seq(
      (1L, s"$rep $rep"),   // gram repeats only inside doc 1
      (2L, wordRun("x", 5)) // < 8 words -> no output row
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, col("doc_id"), col("text")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    assert(out(0).getLong(2) == 0L, "within-doc repeats must not count as dup")
  }

  // ---------------------------------------------------------------- q96

  test("TopKByScore: equals the window formulation; plan has no full-group sort") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val src = orders.select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("score"),
        col("o_orderkey"))
      .as[(Long, Long, Long)]
    val agg = new graft.functions.TopKByScore[(Long, Long, Long)](3, _._2, _._3)
    val viaAgg = src.groupByKey(_._1).agg(agg.toColumn.name("top"))
      .toDF("cust", "top")
      .select(col("cust"), posexplode(col("top")))
      .select(col("cust"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("ok"), col("col._1").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("o_custkey").as("cust"), col("rank").cast("long"),
        col("o_orderkey").as("ok"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(rows(viaAgg) == rows(viaWindow))
    // the aggregator plan trims map-side: partial ObjectHashAggregate,
    // and no Window (whose Sort of every group row is what we avoid)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(!plan.contains("Window"), s"window operator leaked into:\n$plan")
  }

  test("TopKByScore: amortized trim never loses a top element (adversarial order)") {
    // feed scores ascending so the best rows arrive LAST, after many trims
    val n = 500
    val src = (0 until n).map(i => (1L, i.toLong, (1000 + i).toLong))
      .toDF("g", "score", "id").as[(Long, Long, Long)]
    val agg = new graft.functions.TopKByScore[(Long, Long, Long)](4, _._2, _._3)
    val top = src.repartition(7).groupByKey(_._1)
      .agg(agg.toColumn.name("top")).collect().head._2
    assert(top.map(_._1) == Seq(499L, 498L, 497L, 496L))
  }

  // ---------------------------------------------------------------- q97

  test("invertedIndex: df exact, postings an id-ascending capped prefix") {
    // "hot" in docs 1..5, "cold" only in doc 3; cap at 3 postings
    val docs = (1L to 5L).map(i =>
      (i, if (i == 3L) "hot cold" else "hot")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs.repartition(4),
        col("doc_id"), col("text"), maxPostings = 3)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getBoolean(3))).toSeq
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 == 5L && hot._3 == "1,2,3" && hot._4,
      s"hot term wrong: $hot")
    val cold = out.find(_._1 == "cold").get
    assert(cold._2 == 1L && cold._3 == "3" && !cold._4)
  }

  test("dupSpans: a gap splits the run (two islands, max is the longer)") {
    // doc 1 shares words 0..9 and 20..31 with doc 2, with a unique middle
    val s1 = wordRun("p", 10) // 3 shared grams
    val s2 = wordRun("q", 12) // 5 shared grams
    val docs = Seq(
      (1L, s"$s1 ${wordRun("u", 10)} $s2"),
      (2L, s"$s1 ${wordRun("v", 10)} $s2")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    // max run is the 5-gram island from s2, not 3+5
    assert(out(0).getLong(3) == 5L)
    assert(out(1).getLong(3) == 5L)
  }

  // --------------------------------------------------------------- q120

  test("hashSplit: deterministic, partitioning-invariant, fractions in expectation") {
    val docs = (0L until 4000L).map(i => (i, s"lang${i % 5}"))
      .toDF("doc_id", "lang")
    def run(parts: Int) = Dedup.hashSplit(docs.repartition(parts),
        col("doc_id"))
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1)
    val b = run(17)
    // assignment is a pure row function: layout cannot change any split
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 4000.0)
    assert(math.abs(frac("train") - 0.8) < 0.03, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.02, s"test ${frac("test")}")
    // a different seed re-deals: the two assignments must disagree on a
    // nontrivial fraction of rows (independence across experiments)
    val c = Dedup.hashSplit(docs, col("doc_id"), seed = "split2")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a.count { case (id, sp) => c(id) != sp }
    assert(moved > 800, s"only $moved rows re-dealt by a new seed")
    // per-stratum independence: every lang keeps ~the global fractions
    val byLang = Dedup.hashSplit(docs, col("doc_id"))
      .groupBy(col("lang"), col("split")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    (0 until 5).foreach { l =>
      val tr = byLang.getOrElse((s"lang$l", "train"), 0L)
      assert(math.abs(tr / 800.0 - 0.8) < 0.05, s"lang$l train $tr/800")
    }
    intercept[IllegalArgumentException] {
      Dedup.hashSplit(docs, col("doc_id"), trainFrac = 0.9, valFrac = 0.2)
    }
  }

  // --------------------------------------------------------------- q163

  test("trainingChunks: exact windows, single short tail, digests pin content") {
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // 100 words, chunk 40 / overlap 10 (stride 30): starts 0, 30, 60 —
    // start 90 is suppressed because the window at 60 already reaches
    // word 100; the doc is still fully covered
    val w = (0 until 100).map(i => s"w$i")
    val docs = Seq((1L, w.mkString(" ")), (2L, "a b c"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.trainingChunks(docs, col("doc_id"), col("text"),
        chunkWords = 40, overlapWords = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4))).toSet
    val expect = Set(
      (1L, 0, 0, 40, md5hex(w.slice(0, 40).mkString(" "))),
      (1L, 1, 30, 40, md5hex(w.slice(30, 70).mkString(" "))),
      (1L, 2, 60, 40, md5hex(w.slice(60, 100).mkString(" "))),
      // short doc: one short chunk; empty/whitespace docs: none
      (2L, 0, 0, 3, md5hex("a b c")))
    assert(got == expect)
    // coverage + overlap properties on the real corpus
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = TextAnalysis.trainingChunks(real, col("doc_id"), col("text"),
        chunkWords = 40, overlapWords = 10)
      .groupBy(col("doc_id"))
      .agg(max(col("start_word") + col("n_words")).as("covered"),
        count(lit(1)).as("n_chunks"))
    val words = real.select(col("doc_id"),
      size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
    val bad = chunks.join(words, "doc_id")
      .where(col("covered") =!= col("n")).count()
    assert(bad == 0, "some document not exactly covered by its chunks")
  }
}
