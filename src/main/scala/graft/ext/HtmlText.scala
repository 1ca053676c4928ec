package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-text extraction with block-level boilerplate removal —
  * the step that runs BEFORE every text operator in a web-crawl
  * pipeline (the jusText/trafilatura idea, reduced to its load-bearing
  * core): segment the markup into block-level fragments, score each
  * block by length and LINK DENSITY, keep the long low-link blocks
  * (article prose), drop the short link-heavy ones (nav bars, ad
  * units, footers). [[UrlOps]] curates by URL, [[TextAnalysis]] scores
  * the extracted text; this is the missing middle.
  *
  * Everything is a per-row chain of built-in string/array/lambda
  * functions (codegen'd, zero shuffles, map-side at any scale), and
  * every step has an exact DuckDB mirror (split ↔ string_split_regex,
  * filter/transform/aggregate ↔ list_filter/list_transform/
  * list_reduce) so the whole extraction is oracle-gated. The keep rule
  * is integer-exact: words ≥ minWords AND links·10 ≤ words (link
  * density ≤ 0.1 without a float division).
  *
  * Deliberate non-goals (each would be a further map-side step): no
  * entity decoding (&amp; passes through), no script/style CONTENT
  * suppression beyond their tags, no DOM nesting (block tags are
  * treated as flat boundaries — exactly what the segmentation-based
  * extractors do).
  */
object HtmlText {

  /** Block-level boundary tags: splitting on any of these (open or
    * close, any attributes) yields the flat fragment stream. Inline
    * tags (`<a>`, `<b>`, `<span>`) stay INSIDE fragments so link
    * density can be measured before they are stripped.
    */
  val BlockTagPattern: String =
    "(?i)</?(?:html|head|body|title|p|div|nav|footer|header|section|" +
      "article|aside|ul|ol|li|h[1-6]|table|tr|td|br)[^>]*>"

  /** Per-document extraction: one row per input row with
    * block/keep/word counts, the keep fraction, and the md5 of the
    * space-normalized extracted text (NULL when nothing survives —
    * the q183 convention for an empty retained set).
    */
  def htmlExtract(df: DataFrame, id: Column, html: Column,
                  minWords: Int = 5): DataFrame = {
    // Evaluation-count discipline: the scored-fragments array is bound
    // to a COLUMN (project boundary) before fan-out — five output
    // columns reference it, and without the boundary each one would
    // re-run the whole segment+strip+score regex chain (measured ~3×
    // on the q209 corpus). Same for the two-step lambda below: `words`
    // reads the ALREADY-STRIPPED text field of the previous
    // transform's result instead of re-deriving it per use.
    val frags = filter(
      transform(split(html, BlockTagPattern), f => trim(f)),
      f => f =!= "")
    // per-fragment: link count BEFORE stripping, tag-stripped
    // space-normalized text; then word counts over the BOUND text
    val base = transform(frags, f => struct(
      (size(split(f, "<a ", -1)) - 1).as("links"),
      trim(regexp_replace(regexp_replace(f, "<[^>]*>", " "),
        "\\s+", " ")).as("text")))
    val scored = transform(base, s => struct(
      s.getField("links").as("links"),
      s.getField("text").as("text"),
      when(s.getField("text") === "", 0)
        .otherwise(size(split(s.getField("text"), " ", -1)))
        .as("words")))
    df.select(id.as("doc_id"), scored.as("__sc"))
      .withColumn("__kept", filter(col("__sc"), s =>
        s.getField("words") >= minWords &&
          s.getField("links") * 10 <= s.getField("words")))
      .select(
        col("doc_id"),
        size(col("__sc")).as("n_blocks"),
        size(col("__kept")).as("n_kept"),
        aggregate(col("__sc"), lit(0L),
          (a, s) => a + s.getField("words")).as("total_words"),
        aggregate(col("__kept"), lit(0L),
          (a, s) => a + s.getField("words")).as("kept_words"),
        array_join(transform(col("__kept"), s => s.getField("text")), " ")
          .as("__extracted"),
        size(col("__kept")).as("__nk"))
      .withColumn("kept_frac",
        when(col("total_words") > 0,
          col("kept_words").cast("double") / col("total_words")))
      .withColumn("extracted_md5",
        when(col("__nk") > 0, md5(col("__extracted"))))
      .drop("__extracted", "__nk")
  }

  /** [[htmlExtract]] variant that RETURNS the extracted main text —
    * the composite-pipeline entry point (q224): downstream stages
    * (normalization, quality scoring, near-dup) consume the text
    * itself, not its digest. Same segmentation chain, same integer
    * keep rule, same expression-binding discipline; `extracted` is
    * NULL when nothing survives.
    */
  def htmlExtractText(df: DataFrame, id: Column, html: Column,
                      minWords: Int = 5): DataFrame = {
    val frags = filter(
      transform(split(html, BlockTagPattern), f => trim(f)),
      f => f =!= "")
    val base = transform(frags, f => struct(
      (size(split(f, "<a ", -1)) - 1).as("links"),
      trim(regexp_replace(regexp_replace(f, "<[^>]*>", " "),
        "\\s+", " ")).as("text")))
    val scored = transform(base, s => struct(
      s.getField("links").as("links"),
      s.getField("text").as("text"),
      when(s.getField("text") === "", 0)
        .otherwise(size(split(s.getField("text"), " ", -1)))
        .as("words")))
    df.select(id.as("doc_id"), scored.as("__sc"))
      .withColumn("__kept", filter(col("__sc"), s =>
        s.getField("words") >= minWords &&
          s.getField("links") * 10 <= s.getField("words")))
      .select(
        col("doc_id"),
        size(col("__sc")).as("n_blocks"),
        size(col("__kept")).as("n_kept"),
        aggregate(col("__kept"), lit(0L),
          (a, s) => a + s.getField("words")).as("kept_words"),
        when(size(col("__kept")) > 0,
          array_join(transform(col("__kept"), s => s.getField("text")),
            " ")).as("extracted"))
  }
}
