package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality-filter apply — the CCNet/fastText-shaped "model-based
  * quality classifier" stage of a pre-training data pipeline (cf. the
  * reference pipelines in Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", 2020), expressed
  * the way this repo ships every learned artifact: training is
  * iterative and happens OFFLINE/bounded (the q48-codebook / q176-BPE
  * discipline), the apply half is a pure map-side function of the
  * FROZEN weights and is oracle-gated bit-for-bit.
  *
  * Integer discipline end-to-end: features are exact counts from the
  * text, weights are pinned integer micro-units, the logit is one
  * BIGINT dot product — so score and keep-decision are identical in
  * any engine, and at 100 TB the stage is a pure scan-side projection
  * (zero shuffles, codegen'd — the same shape as q57's redaction).
  *
  * [[fitPerceptron]] is the matching deterministic trainer: an integer
  * averaged-free perceptron over a caller-bounded labeled sample (the
  * md5-sample pattern bounds the sample; one driver pass per epoch).
  * QualityFilterSpec pins convergence on separable data. Production
  * weights (q180) are a pinned artifact of exactly this shape.
  */
object QualityFilter {

  /** Frozen model: integer micro-unit weights over the five features
    * of [[withQualityLogit]], in order (chars, words, distinctWords,
    * wordChars, stopHits). Bias last.
    */
  final case class LinearModel(wChars: Long, wWords: Long,
                               wDistinct: Long, wWordChars: Long,
                               wStop: Long, biasMicro: Long)

  /** Feature extraction + frozen-model scoring: appends the five exact
    * integer features, `logit_micro` (BIGINT), and `keep`
    * (logit ≥ 0). Null text scores as all-zero features (bias decides).
    */
  def withQualityLogit(df: DataFrame, text: Column,
                       m: LinearModel): DataFrame = {
    val words = filter(split(coalesce(text, lit("")), " "),
      w => length(w) > 0)
    val scored = df
      .withColumn("f_chars", length(coalesce(text, lit(""))).cast("long"))
      .withColumn("f_words", size(words).cast("long"))
      .withColumn("f_distinct", size(array_distinct(words)).cast("long"))
      .withColumn("f_word_chars",
        aggregate(words, lit(0L), (a, w) => a + length(w).cast("long")))
      .withColumn("f_stop",
        size(filter(words, w => w === "the")).cast("long"))
    scored.withColumn("logit_micro",
        lit(m.biasMicro)
          + lit(m.wChars) * col("f_chars")
          + lit(m.wWords) * col("f_words")
          + lit(m.wDistinct) * col("f_distinct")
          + lit(m.wWordChars) * col("f_word_chars")
          + lit(m.wStop) * col("f_stop"))
      .withColumn("keep", col("logit_micro") >= 0L)
  }

  /** Deterministic integer perceptron: `w += y·x` on every
    * misclassified sample, fixed sample order, fixed epochs — the
    * whole fit is integer arithmetic, so the trained model is a pure
    * function of the (bounded) labeled sample. Features as in
    * [[withQualityLogit]] order; y ∈ {false, true} ↦ {−1, +1}.
    */
  def fitPerceptron(samples: Seq[(Array[Long], Boolean)],
                    epochs: Int = 10): LinearModel = {
    require(samples.nonEmpty && samples.forall(_._1.length == 5))
    val w = new Array[Long](6) // 5 weights + bias
    var e = 0
    while (e < epochs) {
      samples.foreach { case (x, label) =>
        var logit = w(5)
        var i = 0
        while (i < 5) { logit += w(i) * x(i); i += 1 }
        val y = if (label) 1L else -1L
        if (y * logit <= 0L) {
          i = 0
          while (i < 5) { w(i) += y * x(i); i += 1 }
          w(5) += y
        }
      }
      e += 1
    }
    LinearModel(w(0), w(1), w(2), w(3), w(4), w(5))
  }

  /** Filter disparity audit — does the frozen quality model drop one
    * group (language, source, dialect) disproportionately? Heuristic
    * corpus filters are DOCUMENTED to disfavor low-resource languages
    * and non-standard dialects; this is the audit a curation pipeline
    * runs before shipping a filtered corpus. Per group: exact
    * keep/drop counts, keep rate, and the disparate-impact ratio
    * against the corpus-wide keep rate in exact ppm —
    * `ratio_ppm = 10⁶ · (n_keep·N) div (n_docs·K)` (N, K = corpus
    * totals, computed in decimal(38,0) so 1e12-doc corpora cannot
    * wrap) — with the four-fifths verdict (`ratio_ppm ≥ 800000`, the
    * adverse-impact rule of thumb applied to data curation). Degenerate
    * corpus (zero keeps anywhere): `ratio_ppm` is NULL (undefined — a
    * 0/0 ratio) but `four_fifths_ok` is pinned FALSE, so a release gate
    * filtering on the verdict fails closed instead of treating the
    * group as neither pass nor fail.
    *
    * Scale shape: one scan scoring map-side (the q180 apply), one
    * grouped aggregation, totals broadcast back. Nothing else moves.
    */
  def disparityAudit(df: DataFrame, group: Column, text: Column,
                     m: LinearModel): DataFrame = {
    val dec = "decimal(38,0)"
    val per = withQualityLogit(df, text, m)
      .groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val tot = per.agg(sum(col("n_docs")).as("__n_total"),
      sum(col("n_keep")).as("__k_total"))
    per.crossJoin(broadcast(tot))
      .withColumn("keep_rate",
        col("n_keep").cast("double") / col("n_docs").cast("double"))
      // zero keeps corpus-wide: the div would raise DIVIDE_BY_ZERO under
      // ANSI — gate it so the degenerate corpus reports instead of crashing
      .withColumn("ratio_ppm",
        when(col("__k_total") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            s"(cast(n_keep as $dec) * __n_total * 1000000)" +
              s" div (cast(n_docs as $dec) * __k_total)")))
      .withColumn("four_fifths_ok",
        when(col("__k_total") === 0L, lit(false))
          .otherwise(col("ratio_ppm") >= 800000L))
      .select(col("grp"), col("n_docs"), col("n_keep"), col("keep_rate"),
        col("ratio_ppm"), col("four_fifths_ok"))
  }
}
