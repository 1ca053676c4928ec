package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for the round-11 recipe/governance kernels:
  * frequency-capped passage removal (removal-everywhere vs q56's
  * keep-first), temperature mixture accounting identities, outlier
  * audit on a planted far vector, CUSUM on planted level shifts, and
  * k-anonymity class flags.
  */
class RecipeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"

  test("frequencyChunkFilter removes EVERY occurrence above the cap") {
    // boilerplate chunk appears in 3 docs (> maxFreq=2) → cut from all
    // three, including the first; the pair chunk (freq 2) survives
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, s"$boiler v1 v2 v3 v4 v5 v6 v7 v8"),
      (3L, s"$boiler w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "p1 p2 p3 p4 p5 p6 p7 p8"),
      (5L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    val out = Dedup.frequencyChunkFilter(docs, col("doc_id"), col("text"),
      chunkWords = 8, maxFreq = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_removed"),
          r.getAs[String]("retained_md5"))).toMap
    for (d <- Seq(1L, 2L, 3L)) {
      assert(out(d)._1 == 2 && out(d)._2 == 1, s"doc $d")
      assert(out(d)._3 != null)
    }
    // freq-2 docs keep everything
    assert(out(4L) == ((1, 0, out(4L)._3)) && out(4L)._3 != null)
    assert(out(4L)._3 == out(5L)._3)
  }

  test("frequencyChunkFilter: all-template doc gets NULL digest") {
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler)).toDF("doc_id", "text")
    val out = Dedup.frequencyChunkFilter(docs, col("doc_id"), col("text"),
      chunkWords = 8, maxFreq = 2).collect()
    assert(out.forall(_.getAs[String]("retained_md5") == null))
    assert(out.forall(r => r.getAs[Long]("n_removed") == 1))
  }

  test("temperatureMixture: shares sum to ~1e9 and sqrt flattens") {
    // source a: 90000 tokens, source b: 10000 → raw ratio 9:1, but
    // sqrt-temperature ratio 3:1 (τ=0.5 upsamples the small source)
    val docs = (Seq.fill(9)(("a", Seq.fill(10000)("w").mkString(" "))) ++
      Seq(("b", Seq.fill(10000)("w").mkString(" "))))
      .toDF("source", "text")
    // 50k-token budget over a 100k-token corpus: the sqrt weights give
    // a 37.5k (0.42 epochs) and b 12.5k (1.25 epochs — upsampled)
    val rows = TextAnalysis.temperatureMixture(docs, col("source"),
      col("text"), targetTokens = 50000L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val sa = rows("a").getAs[Long]("share_ppb")
    val sb = rows("b").getAs[Long]("share_ppb")
    assert(math.abs(sa + sb - 1000000000L) <= 2) // div truncation only
    assert(math.abs(sa - 3L * sb) <= 5,
      s"sqrt temperature should give 3:1, got $sa : $sb")
    assert(rows("b").getAs[Long]("epochs_micro") > 1000000L)
    assert(rows("a").getAs[Long]("epochs_micro") < 1000000L)
  }

  test("outlierAudit ranks a planted far vector first") {
    val dim = 8
    val base = Seq.tabulate(20)(i =>
      (i.toLong, Array.fill(dim)(0.1f + (i % 3) * 0.01f), 1))
    val far = (99L, Array.fill(dim)(-0.9f), 1)
    val df = (base :+ far).toDF("vec_id", "embedding", "label")
    val out = Similarity.outlierAudit(df, k = 3).collect()
    assert(out.length == 3)
    val top = out.find(_.getAs[Int]("out_rank") == 1).get
    assert(top.getAs[Long]("vec_id") == 99L)
    assert(top.getAs[Long]("n_label") == 21L)
    assert(top.getAs[Double]("dist2_scaled") >
      out.find(_.getAs[Int]("out_rank") == 2).get
        .getAs[Double]("dist2_scaled"))
  }

  test("cusum: constant series stays at zero; step shift alarms up") {
    val flat = Seq.tabulate(30)(i => ("k", i, 100L))
      .toDF("g", "d", "cents")
    val f = Stats.cusum(flat, col("g"), col("d"), col("cents"),
      slackPermille = 100, threshPermille = 1000).collect()
    assert(f.forall(r => r.getAs[Double]("s_pos") == 0.0 &&
      r.getAs[Double]("s_neg") == 0.0))
    assert(f.forall(r => !r.getAs[Boolean]("alarm_up") &&
      !r.getAs[Boolean]("alarm_down")))

    // 20 days at 100, then 10 days at 400: mean 200 — the late regime
    // sits 2× above mean and must trip the up-side alarm, never the
    // down-side at the end
    val step = Seq.tabulate(30)(i => ("k", i, if (i < 20) 100L else 400L))
      .toDF("g", "d", "cents")
    val s = Stats.cusum(step, col("g"), col("d"), col("cents"),
      slackPermille = 100, threshPermille = 1000)
      .orderBy(col("day")).collect()
    assert(s.last.getAs[Boolean]("alarm_up"))
    assert(!s.last.getAs[Boolean]("alarm_down"))
    // alarms are monotone within the post-shift run-up
    val firstAlarm = s.indexWhere(_.getAs[Boolean]("alarm_up"))
    assert(firstAlarm >= 20, "alarm must not fire before the shift")
  }

  test("cusum: a zero/negative-sum series nulls the alarms, not garbage") {
    // signed refund ledger summing to 0 — permille-of-mean slack and
    // threshold are undefined; pre-fix every positive-drift row alarmed
    val signed = Seq(("r", 0, 500L), ("r", 1, -500L), ("r", 2, 300L),
      ("r", 3, -300L)).toDF("g", "d", "cents")
    val out = Stats.cusum(signed, col("g"), col("d"), col("cents"),
      slackPermille = 100, threshPermille = 1000).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("alarm_up")) &&
      r.isNullAt(r.fieldIndex("alarm_down"))),
      "t_sum <= 0 must yield NULL verdicts")
    // a healthy positive series is untouched by the guard
    val ok = Stats.cusum(Seq(("k", 0, 10L), ("k", 1, 10L))
        .toDF("g", "d", "cents"),
      col("g"), col("d"), col("cents"), 100, 1000).collect()
    assert(ok.forall(r => !r.isNullAt(r.fieldIndex("alarm_up"))))
  }

  test("cusum matches the max(0, prev + dev) recurrence exactly") {
    val vals = Seq(5L, 9L, 2L, 14L, 3L, 8L, 1L, 12L, 7L, 6L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("g", "d", "cents")
    val out = Stats.cusum(df, col("g"), col("d"), col("cents"),
      slackPermille = 250, threshPermille = 1500)
      .orderBy(col("day")).collect()
    val n = vals.size.toLong
    val t = vals.sum
    // reference recurrence on the same cleared-denominator scale
    var sp = BigInt(0); var sn = BigInt(0)
    vals.zipWithIndex.foreach { case (x, i) =>
      val up = BigInt(1000) * n * x - BigInt(1000) * t - BigInt(250) * t
      val dn = BigInt(1000) * n * x - BigInt(1000) * t + BigInt(250) * t
      sp = (sp + up).max(BigInt(0))
      sn = (sn - dn).max(BigInt(0))
      assert(out(i).getAs[Double]("s_pos") == sp.toDouble, s"s_pos @$i")
      assert(out(i).getAs[Double]("s_neg") == sn.toDouble, s"s_neg @$i")
    }
  }

  test("spearman: perfect agreement 1, perfect reversal -1") {
    val agree = Seq.tabulate(10)(i => ("g", i.toLong, i * 2.0, i * 100L))
      .toDF("grp", "id", "a", "b")
    val r1 = Stats.spearman(agree, col("grp"), col("id"), col("a"),
      col("b")).collect().head
    assert(r1.getAs[Long]("d2_sum") == 0L &&
      r1.getAs[Double]("rho") == 1.0)

    val reverse = Seq.tabulate(10)(i => ("g", i.toLong, i * 2.0,
      (100 - i).toLong)).toDF("grp", "id", "a", "b")
    val r2 = Stats.spearman(reverse, col("grp"), col("id"), col("a"),
      col("b")).collect().head
    assert(r2.getAs[Double]("rho") == -1.0)
  }

  test("spearman: ties break by id deterministically") {
    // all a-values equal: ra follows id order; b also ordered by id →
    // ranks coincide, rho = 1 under the tie-broken discipline
    val tied = Seq.tabulate(8)(i => ("g", i.toLong, 5.0, i.toLong))
      .toDF("grp", "id", "a", "b")
    val r = Stats.spearman(tied, col("grp"), col("id"), col("a"), col("b"))
      .collect().head
    assert(r.getAs[Double]("rho") == 1.0)
  }

  test("erasureAudit counts residuals per table and certifies clean") {
    val del = Seq(7L, 9L).toDF("uid")
    val t1 = Seq(1L, 7L, 7L, 3L).toDF("user_id") // 2 residual rows
    val t2 = Seq(1L, 2L, 3L).toDF("owner")       // clean
    val out = Profile.erasureAudit(del, col("uid"), Seq(
        ("t1", t1, col("user_id")), ("t2", t2, col("owner"))))
      .collect().map(r => r.getAs[String]("table_name") -> r).toMap
    assert(out("t1").getAs[Long]("n_refs") == 2)
    assert(out("t1").getAs[Long]("n_subjects_referenced") == 1)
    assert(!out("t1").getAs[Boolean]("clean"))
    assert(out("t2").getAs[Long]("n_refs") == 0)
    assert(out("t2").getAs[Boolean]("clean"))
  }

  test("sortedNeighborPairs: exactly w successors per record, ranked globally") {
    val names = Seq((1L, "alpha"), (2L, "alpine"), (3L, "beta"),
      (4L, "betta"), (5L, "gamma")).toDF("id", "name")
    val out = Dedup.sortedNeighborPairs(names, col("id"), col("name"), w = 2)
      .collect()
    // n=5, w=2 → (n-1) + (n-2) = 7 pairs
    assert(out.length == 7)
    val byA = out.groupBy(_.getAs[Long]("id_a"))
      .view.mapValues(_.length).toMap
    // ranks 1..3 have two successors, rank 4 one, the last none
    assert(byA(1L) == 2 && byA(2L) == 2 && byA(3L) == 2 && byA(4L) == 1)
    assert(!byA.contains(5L))
    // adjacent cross-bucket pair exists (alpine → beta spans 'a'/'b')
    assert(out.exists(r => r.getAs[String]("key_a") == "alpine" &&
      r.getAs[String]("key_b") == "beta" &&
      r.getAs[Int]("rank_dist") == 1))
    // levenshtein verified: beta/betta distance 1
    assert(out.exists(r => r.getAs[String]("key_a") == "beta" &&
      r.getAs[String]("key_b") == "betta" && r.getAs[Int]("dist") == 1))
  }

  test("modularity: two triangles + bridge gives the textbook Q") {
    // A = {1,2,3}, B = {4,5,6}, bridge 3-4: m=7, e_A=e_B=3, d_A=d_B=7
    // → Q_c·4m² = 4·7·3 − 49 = 35 each; Q = 2·35/196 = 5/14
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("node", "community")
    val out = Graph.modularity(edges, comm).collect()
      .map(r => r.getAs[String]("community") -> r).toMap
    for (c <- Seq("A", "B")) {
      assert(out(c).getAs[Long]("n_nodes") == 3)
      assert(out(c).getAs[Long]("degree_sum") == 7)
      assert(out(c).getAs[Long]("intra_edges") == 3)
      assert(out(c).getAs[String]("q_contrib_scaled") == "35")
      assert(out(c).getAs[Double]("q_contrib") == 35.0 / 196.0)
    }
  }

  test("modularity: whole graph in one community scores near the maximum split penalty") {
    // single community: e_c = m, d_c = 2m → Q = 1 − 1 = 0 exactly
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val comm = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("node", "community")
    val r = Graph.modularity(edges, comm).collect().head
    assert(r.getAs[String]("q_contrib_scaled") ==
      (4L * 3 * 3 - 36L).toString)
    assert(r.getAs[Double]("q_contrib") == 0.0)
  }

  test("cohenKappa: perfect agreement 1, independent marginals ~0, degenerate NULL") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("g", "p")
    val k1 = Stats.cohenKappa(perfect, col("g"), col("p")).collect().head
    assert(k1.getAs[Double]("kappa") == 1.0 && k1.getAs[Long]("n_agree") == 4)

    // hand case: n=4, agree=2, gold marginals a:(2,2), pred b:(2,2),
    // pe = 2·2 + 2·2 = 8 → κ = (8−8)/(16−8) = 0
    val indep = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("g", "p")
    val k2 = Stats.cohenKappa(indep, col("g"), col("p")).collect().head
    assert(k2.getAs[String]("pe_num") == "8")
    assert(k2.getAs[Double]("kappa") == 0.0)

    // single class both sides: pe = n² → undefined, NULL not 1
    val degen = Seq(("z", "z"), ("z", "z")).toDF("g", "p")
    val k3 = Stats.cohenKappa(degen, col("g"), col("p")).collect().head
    assert(k3.isNullAt(k3.fieldIndex("kappa")))
  }

  test("disparityAudit: keep rates, exact ppm ratio, four-fifths verdict") {
    // model keeps docs with >= 3 words: weights 1e6 per word, bias -2.5e6
    val m = QualityFilter.LinearModel(0L, 1000000L, 0L, 0L, 0L, -2500000L)
    // group A: 4 docs, 3 kept; group B: 4 docs, 1 kept
    val docs = Seq(
      ("A", "w w w"), ("A", "w w w w"), ("A", "w w w"), ("A", "w"),
      ("B", "w w w"), ("B", "w"), ("B", "w w"), ("B", "w"))
      .toDF("g", "text")
    val out = QualityFilter.disparityAudit(docs, col("g"), col("text"), m)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("A").getAs[Long]("n_keep") == 3)
    assert(out("B").getAs[Long]("n_keep") == 1)
    // corpus rate 4/8; A ratio = (3/4)/(4/8) = 1.5; B = (1/4)/(1/2) = 0.5
    assert(out("A").getAs[Long]("ratio_ppm") == 1500000L)
    assert(out("B").getAs[Long]("ratio_ppm") == 500000L)
    assert(out("A").getAs[Boolean]("four_fifths_ok"))
    assert(!out("B").getAs[Boolean]("four_fifths_ok"))
  }

  test("disparityAudit: zero corpus-wide keeps fails closed, not NULL") {
    // model keeps nothing: ratio is 0/0 (NULL), but the release-gate
    // verdict must be an explicit FALSE so filters do not skip the group
    val m = QualityFilter.LinearModel(0L, 0L, 0L, 0L, 0L, -1L)
    val docs = Seq(("A", "w w"), ("B", "w")).toDF("g", "text")
    val out = QualityFilter.disparityAudit(docs, col("g"), col("text"), m)
      .collect()
    assert(out.forall(r => r.getAs[Long]("n_keep") == 0L))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("ratio_ppm"))))
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("four_fifths_ok")) &&
      !r.getAs[Boolean]("four_fifths_ok")))
  }

  test("kAnonymityAudit flags small and uniform classes") {
    val rows = Seq(
      // class (1,"A"): 3 rows, 2 distinct sensitive → both pass
      (1, "A", 10L), (1, "A", 10L), (1, "A", 20L),
      // class (2,"B"): 2 rows → k fails; 2 distinct → l passes
      (2, "B", 1L), (2, "B", 2L),
      // class (3,"C"): 4 rows, all same sensitive → k passes, l fails
      (3, "C", 7L), (3, "C", 7L), (3, "C", 7L), (3, "C", 7L))
      .toDF("nat", "seg", "bal")
    val out = Profile.kAnonymityAudit(rows.toDF(),
      Seq("nat" -> col("nat"), "seg" -> col("seg")), col("bal"),
      kMin = 3, lMin = 2).collect()
      .map(r => (r.getAs[Int]("nat"),
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_distinct"),
          r.getAs[Boolean]("k_ok"), r.getAs[Boolean]("l_ok")))).toMap
    assert(out(1) == ((3, 2, true, true)))
    assert(out(2) == ((2, 2, false, true)))
    assert(out(3) == ((4, 1, true, false)))
  }
}
