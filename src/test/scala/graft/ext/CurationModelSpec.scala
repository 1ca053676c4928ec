package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins for the round-11 curation-model operators: the frozen linear
  * quality filter (q180), cluster-balanced diversity sampling (q181),
  * and the frozen-vocab OOV audit (q182).
  */
class CurationModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fitPerceptron separates linearly separable data and is deterministic") {
    // label = (f_distinct > 5): integer-separable with margin
    val samples = (0 until 40).map { i =>
      val d = (i % 11).toLong
      (Array[Long](2 * d, d, d, 3 * d, i % 3), d > 5L)
    }
    val m = QualityFilter.fitPerceptron(samples, epochs = 1000)
    val errs = samples.count { case (x, y) =>
      val logit = m.biasMicro + m.wChars * x(0) + m.wWords * x(1) +
        m.wDistinct * x(2) + m.wWordChars * x(3) + m.wStop * x(4)
      (logit >= 0) != y
    }
    assert(errs == 0, s"perceptron failed to separate: $errs errors, $m")
    // pure function of the sample: same input, same model
    assert(QualityFilter.fitPerceptron(samples, epochs = 1000) == m)
  }

  test("withQualityLogit: hand-computed features and logit") {
    val df = Seq((1L, "the cat cat sat"), (2L, ""), (3L, null: String))
      .toDF("id", "text")
    val m = QualityFilter.LinearModel(wChars = 1L, wWords = 10L,
      wDistinct = 100L, wWordChars = 1000L, wStop = 10000L,
      biasMicro = 7L)
    val rows = QualityFilter.withQualityLogit(df, col("text"), m)
      .orderBy("id").collect()
    // "the cat cat sat": 15 chars, 4 words, 3 distinct, 12 word chars,
    // 1 'the' -> 7 + 15 + 40 + 300 + 12000 + 10000 = 22362
    assert(rows(0).getAs[Long]("f_chars") == 15L)
    assert(rows(0).getAs[Long]("f_words") == 4L)
    assert(rows(0).getAs[Long]("f_distinct") == 3L)
    assert(rows(0).getAs[Long]("f_word_chars") == 12L)
    assert(rows(0).getAs[Long]("f_stop") == 1L)
    assert(rows(0).getAs[Long]("logit_micro") == 22362L)
    assert(rows(0).getAs[Boolean]("keep"))
    // empty and null text: all-zero features, bias decides
    for (r <- Seq(rows(1), rows(2))) {
      assert(r.getAs[Long]("f_words") == 0L)
      assert(r.getAs[Long]("logit_micro") == 7L)
      assert(r.getAs[Boolean]("keep"))
    }
  }

  test("diversitySample: per-cell bound, rank order, partition invariance") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.diversitySample(embs, FrozenModels.ivfCentroids,
      perCell = 3).collect()
    val byCell = out.groupBy(_.getAs[Int]("cell"))
    assert(byCell.nonEmpty)
    byCell.foreach { case (cell, rows) =>
      val size = rows.head.getAs[Long]("cell_size")
      assert(rows.length == math.min(3L, size),
        s"cell $cell kept ${rows.length} of $size")
      assert(rows.map(_.getAs[Int]("cell_rank")).sorted.toSeq ==
        (1 to rows.length))
    }
    // the sample is content-addressed: any input partitioning, same rows
    val again = Similarity.diversitySample(embs.repartition(7),
      FrozenModels.ivfCentroids, perCell = 3).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("vocabCoverage: hand-computed OOV accounting") {
    val docs = Seq(
      ("a", "the cat the dog"), // 4 words, oov: cat dog (2 occ, 2 distinct)
      ("a", "the cat"),         // 2 words, oov: cat
      ("b", "zebra zebra")      // 2 words, all oov, 1 distinct
    ).toDF("source", "text")
    val rows = TextAnalysis.vocabCoverage(docs, col("source"), col("text"),
      Seq("the")).orderBy("grp").collect()
    assert(rows.map(r => (r.getAs[String]("grp"),
      r.getAs[Long]("total_words"), r.getAs[Long]("oov_words"),
      r.getAs[Long]("distinct_oov"), r.getAs[Long]("oov_ppm"))).toSeq ==
      Seq(("a", 6L, 3L, 2L, 500000L), ("b", 2L, 2L, 1L, 1000000L)))
  }
}
