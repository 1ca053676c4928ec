package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns

/** Text-analysis operators for corpus curation: language identification
  * (marker-n-gram heuristic), quality scoring, token counting, and
  * document fingerprinting. Everything is built-in expressions or our
  * codegen'd natives (PolyHash/Winnow) — per-document work, no shuffles.
  */
object TextAnalysis {

  /** Marker word lists per language for the heuristic language ID.
    * Deliberately tiny — this is the classic stopword-profile n-gram
    * heuristic, not a model; markers are keyed to the corpus vocabulary.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "fast", "slow"),
    "de" -> Seq("data", "batch", "hash"),
    "es" -> Seq("table", "row", "line"),
    "fr" -> Seq("merge", "sort", "filter"),
    "zh" -> Seq("spark", "query", "scan"))

  private def countOccurrences(words: Column, marker: String): Column =
    size(filter(words, w => w === marker))

  /** Language-ID: score each language by marker-word hits over the
    * whitespace tokens; predict the argmax (ties broken by declaration
    * order). Returns (scores array, predicted code).
    */
  def withLangId(df: DataFrame, text: Column): DataFrame = {
    val words = split(text, " ")
    val scored = langMarkers.foldLeft(df.withColumn("__words", words)) {
      case (acc, (lang, markers)) =>
        acc.withColumn(s"score_$lang",
          markers.map(m => countOccurrences(col("__words"), m))
            .reduce(_ + _))
    }
    val best = langMarkers.map { case (lang, _) => (lang, col(s"score_$lang")) }
      .foldLeft((lit(""), lit(-1))) { case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
      }
    scored.withColumn("predicted_lang", best._1).drop("__words")
  }

  /** Quality signals: length, token count, mean word length, stopword
    * ratio, punctuation ratio, uppercase ratio — combined into a [0,1]
    * score with fixed weights. All ratios are deterministic doubles
    * (single divisions of exact integers).
    */
  def qualityScore(text: Column): Column =
    // one codegen'd byte-scan kernel; the signal definitions, the
    // floor(x*1e4+0.5) grid quantization (half-up vs half-even tie
    // handling differs across engines at representable midpoints —
    // floor doesn't), and the empty-text-scores-0 rule (its ratios
    // would otherwise be 0/0 = NaN, silently falling out of every
    // downstream threshold filter) all live in
    // [[graft.functions.SketchKernels.qualityScore]]. Replaced the
    // equivalent Column formula (3 regex passes + a higher-order
    // stopword filter per row), bit-exact by construction.
    graft.functions.SketchFns.quality_score(text)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish subword count: alnum runs are split into ≤4-char chunks,
    * punctuation is one token each — a cheap deterministic proxy for a
    * real tokenizer's token count (the usual pretraining budget metric).
    */
  def tokenCountBpe(text: Column): Column =
    aggregate(
      regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)),
      lit(0L),
      (acc, t) => acc + when(t.rlike("^[A-Za-z0-9]+$"),
        ceil(length(t) / 4.0).cast("long")).otherwise(lit(1L)))

  /** Vocabulary-coverage / OOV audit under a FROZEN tokenizer
    * vocabulary — the pre-flight a training run does before committing
    * a tokenizer to a corpus (high OOV ⇒ wasted <unk> mass): per
    * `group`, exact total words, out-of-vocabulary word occurrences,
    * distinct OOV words, and integer `oov_ppm`.
    *
    * Scale shape: one explode to `(group, word)` postings (the q58 /
    * posting-join discipline — map-side, columnar), one hash
    * aggregation keyed by the group with partial combine; the
    * distinct-OOV count hashes (group, word) pairs whose cardinality
    * is bounded by the corpus vocabulary, not the corpus. The frozen
    * vocab broadcasts as a literal in-list (production: a broadcast
    * join against the vocab table — same plan shape at 250k entries).
    */
  def vocabCoverage(docs: DataFrame, group: Column, text: Column,
                    vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty)
    val words = docs.select(group.as("grp"),
      explode(filter(split(text, " "), w => length(w) > 0)).as("word"))
    words
      .withColumn("oov", !col("word").isInCollection(vocab))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("total_words"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("oov_words"),
        count_distinct(when(col("oov"), col("word"))).as("distinct_oov"))
      .withColumn("oov_ppm",
        // ×1e6 in decimal(38,0): a >9.2e12-occurrence OOV census (the
        // 100 TB pre-flight this exists for) would wrap Long
        expr("CAST(cast(oov_words as decimal(38,0)) * 1000000" +
          " div total_words AS BIGINT)"))
  }

  /** PII redaction patterns: (name, regex, replacement). The regexes are
    * deliberately written in the RE2-compatible subset (no backrefs, no
    * lookaround) so the exact same pattern text runs under Java regex
    * (Spark) and RE2 (DuckDB oracle / most scrubbing services) with
    * identical match sets. Order matters: emails are scrubbed before the
    * bare-number patterns so an address never leaks its digits to a
    * later, looser pattern.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9][0-9-]{6,}[0-9]", "<PHONE>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** Scrub PII from a text column: applies [[piiPatterns]] sequentially
    * (each pattern replaces ALL its matches) and reports a per-pattern
    * match count taken on the ORIGINAL text. Pure per-row expressions —
    * no shuffle, no UDF; at corpus scale this runs inside the scan
    * projection.
    */
  def withRedaction(df: DataFrame, text: Column): DataFrame = {
    val redacted = piiPatterns.foldLeft(text) {
      case (acc, (_, pat, repl)) => regexp_replace(acc, pat, repl)
    }
    piiPatterns.foldLeft(df.withColumn("redacted", redacted)) {
      case (acc, (name, pat, _)) =>
        acc.withColumn(s"n_$name",
          size(regexp_extract_all(text, lit(pat), lit(0))))
    }
  }

  /** Corpus-trained unigram LM scoring — the CCNet-style perplexity
    * quality signal with a unigram model standing in for KenLM (the
    * sandbox has no LM artifacts; the Spark shape — train pass, broadcast
    * model, score pass — is identical for any n-gram order).
    *
    * Scoring is `log_ppl` = mean negative natural log-probability of the
    * document's tokens under the corpus unigram distribution (this IS
    * ln(perplexity); exp() is deliberately not applied — see below).
    * Lower = more typical of the corpus; curation filters drop both
    * tails.
    *
    * Determinism discipline: per-token log-probabilities are quantized
    * to integer MICRO-nats once, in the (tiny) model table, and each
    * document sums INTEGERS — so the per-doc reduction is exact and
    * order-free regardless of partitioning, and the final score is a
    * fixed sequence of two IEEE divisions. Summing raw double logs
    * would make the result depend on fold order; applying exp() at the
    * end would reintroduce a libm whose last-ulp rounding differs
    * across engines.
    *
    * Scale shape: pass 1 trains the model (one shuffle on token,
    * partial-agg absorbs Zipf skew); pass 2 joins it back token-keyed.
    * That join is deliberately UNHINTED: a vocabulary grows with the
    * corpus (Heaps' law — an open-vocabulary 100 TB crawl has billions
    * of types), so AQE broadcasts the model while it is small and
    * degrades to a shuffled equi-join past broadcast range instead of
    * OOMing the driver (the q218 lesson).
    */
  def unigramLogPpl(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(split(text, " ")).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    val model = counts.crossJoin(broadcast(total))
      .withColumn("lp_micro",
        floor(log(col("c").cast("double") / col("total")) * -1000000d + 0.5d)
          .cast("long"))
      .select(col("token"), col("lp_micro"))
    toks.join(model, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("__s"))
      .withColumn("log_ppl",
        col("__s").cast("double") / 1000000.0 / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("log_ppl"))
  }

  /** Bigram-LM log-perplexity with add-½ smoothing — the next step up
    * from [[unigramLogPpl]] in LM-based quality scoring: fluent text has
    * predictable word-to-word transitions, so a high bigram perplexity
    * flags shuffled/garbled documents a unigram model scores as normal.
    * Same micro-nat discipline (the one ln per model row is quantized to
    * integer micro-nats; per-document sums are exact integer folds).
    *
    * Scale shape vs the unigram twin: a bigram model is O(vocab²) rows
    * in the worst case and does NOT broadcast — the scoring join is a
    * deliberate shuffle join on the bigram key (both sides hash-
    * partition; Spark picks broadcast anyway when the model is small
    * enough). Only the unigram context counts and the vocabulary size —
    * vocab-bounded — broadcast into the model build.
    */
  def bigramLogPpl(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val wArr = split(text, " ")
    val pairArr = zip_with(
      slice(wArr, lit(1), size(wArr) - 1),
      slice(wArr, lit(2), size(wArr) - 1),
      (x, y) => struct(x.as("w1"), concat(x, lit(" "), y).as("bigram")))
    val bi = docs.select(id.as("doc_id"),
        explode(when(size(wArr) >= 2, pairArr)
          .otherwise(array().cast("array<struct<w1:string,bigram:string>>")))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"),
              col("bg.bigram").as("bigram"))
    val uni = docs.select(explode(split(text, " ")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val model = bi.groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("c12"))
      // token-keyed both sides, unhinted: unigram vocab grows with
      // the corpus (see unigramLogPpl's scale note)
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_micro",
        floor(-log((col("c12") + lit(0.5)) /
                   (col("c1") + lit(0.5) * col("v"))) * 1000000d + 0.5d)
          .cast("long"))
      .select(col("bigram"), col("lp_micro"))
    bi.join(model, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("__s"))
      .withColumn("log_ppl",
        col("__s").cast("double") / 1000000.0 / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("log_ppl"))
  }

  /** Top-`k` TF-IDF terms per document — the classic keyword/salience
    * extraction, computed ENTIRELY in integers so it is exact and
    * order-free: score = tf × floor(ln(N/df)·1e6 + 0.5). The idf factor
    * is quantized once per vocabulary term (micro-nats, same discipline
    * as [[unigramLogPpl]]); the per-row multiply is exact long
    * arithmetic, so no floating-point fold order anywhere.
    *
    * Scale shape: tf is one shuffle on (doc, term) with map-side
    * combine; df aggregates the (already distinct) tf pairs per term
    * into a vocab-sized table that BROADCASTS back; top-k per doc is a
    * bounded window over ≤ |doc vocab| rows per partition key. The
    * corpus crosses the wire once, as (doc_id, term, tf) triples.
    */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column,
                    k: Int = 3): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(split(text, " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.select(id).agg(count(lit(1)).as("n_docs"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_micro",
        floor(log(col("n_docs").cast("double") / col("df")) * 1000000d + 0.5d)
          .cast("long"))
      .select(col("term"), col("idf_micro"))
    // term-keyed both sides, unhinted: the term vocabulary grows with
    // the corpus (see unigramLogPpl's scale note)
    val scored = tf.join(df_, "term")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
              col("score_micro"))
  }

  /** BM25 retrieval: top-k documents per query, Okapi BM25 with the
    * standard k1/b defaults. Built for the "find training docs relevant
    * to an eval prompt" curation loop — the query side is tiny and
    * BROADCAST twice (term filter, then query→term map); the 100 TB
    * corpus is scanned once for tokens (doc length computed map-side on
    * the same pass, before the term filter drops non-query tokens) and
    * once for corpus-level length stats — both scans prune to the text
    * column, and nothing doc-sized ever shuffles: the only corpus-keyed
    * exchange carries (doc_id, dl, term, tf) for query terms only.
    *
    * Scoring is oracle-exact by the micro-nat discipline (see q65): the
    * only transcendental (idf's ln) is quantized to integer micro-nats;
    * the tf-saturation factor is IEEE arithmetic over identical inputs
    * written in identical operation order on both engines; each
    * (doc, term) score is floored to an integer BEFORE the per-document
    * sum, so the aggregate is fold-order-free.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queries: Seq[(String, Seq[String])], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val toks = docs.select(id.as("doc_id"),
        size(split(text, " ")).as("dl"),
        explode(split(text, " ")).as("term"))
      .filter(col("term").isin(allTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(text, " ")).cast("long")).as("total_tokens"))
    val dfTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        floor(log((col("n_docs") - col("df") + lit(0.5)) /
                  (col("df") + lit(0.5)) + lit(1.0)) * 1000000d + 0.5d)
          .cast("long"))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs"))
      .select(col("term"), col("idf_micro"), col("avgdl"))
    val scored = tf.join(broadcast(dfTerm), "term")
      .withColumn("score_micro",
        floor(col("idf_micro") *
          (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
          + lit(0.5)).cast("long"))
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val perDoc = scored.join(broadcast(qt), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score_micro")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_micro"))
  }

  /** Deterministic weighted sample (Efraimidis–Spirakis A-ES): each row
    * draws priority −ln(u)/w and the k smallest win — inclusion
    * probability proportional to weight, so quality-weighted corpus
    * sampling upweights good documents without excluding any. The
    * "randomness" u is content-addressed (md5 of the text, first 52
    * bits), making the sample replay-stable, partitioning-independent,
    * and oracle-checkable: u = (v+1)/2^52 is an exact double (52-bit
    * mantissa, power-of-two divisor), the one transcendental is
    * quantized to integer micro-units, ties break on id.
    *
    * Scale shape: priorities compute map-side per row; selection is
    * orderBy+limit, which plans as TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver, never a global sort.
    */
  def weightedSample(docs: DataFrame, id: Column, text: Column,
                     weight: Column, k: Int): DataFrame = {
    val v = conv(substring(md5(encode(text, "UTF-8")), 1, 13), 16, 10)
      .cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val w = greatest(weight, lit(0.0001))
    docs.select(id.as("doc_id"), weight.as("quality"),
        floor((-log(u) / w) * 1000000d + 0.5d).cast("long")
          .as("priority_micro"))
      .orderBy(col("priority_micro"), col("doc_id"))
      .limit(k)
  }

  /** Token-budget shard packing: assign documents (in id order) to
    * consecutive training shards of ~`budget` tokens each — shard =
    * (tokens before this doc) div budget. The interesting part at 100 TB
    * is the global prefix sum: a naive `SUM OVER (ORDER BY id)` is a
    * SINGLE-partition window (the whole corpus through one task). This
    * runs the classic two-phase distributed cumsum instead: range-
    * partition by id, within-partition running sums, then per-partition
    * totals (a `numPartitions`-row frame) prefix-summed on one tiny task
    * and broadcast back as offsets. The result is independent of the
    * (sample-derived) range boundaries — prefix sums compose — so the
    * output stays deterministic and oracle-exact.
    */
  def tokenPacking(docs: DataFrame, id: Column, text: Column,
                   budget: Long, partitions: Int = 64): DataFrame = {
    require(budget > 0 && partitions > 0)
    val toks = docs.select(id.as("doc_id"),
      size(split(text, " ")).cast("long").as("n_tokens"))
    val ranged = toks.repartitionByRange(partitions, col("doc_id"))
      .withColumn("__b", spark_partition_id())
    // explicit ROWS frame: the default RANGE frame includes order-by
    // peers, so duplicate doc_id values would diverge from the oracle's
    // ROWS UNBOUNDED PRECEDING cumulative sum
    val w = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner = ranged.withColumn("__cum_in", sum(col("n_tokens")).over(w))
    // per-partition totals: numPartitions rows — the single-partition
    // window below is over THIS bounded frame, never the corpus
    val offsets = inner.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"), min(col("doc_id")).as("__mn"))
      .withColumn("__offset",
        coalesce(sum(col("__bt")).over(
          graft.functions.BoundedWindow.orderBy(col("__mn"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__offset"))
    inner.join(broadcast(offsets), "__b")
      .withColumn("cum_tokens", col("__offset") + col("__cum_in"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div ${budget}L").as("shard"))
      .orderBy(col("doc_id"))
  }

  /** Context-window sequence packing: the step after [[tokenPacking]] in
    * a training-data pipeline — concatenate each shard's documents (in
    * doc_id order, '\n'-separated) into one training sequence and emit
    * the shard manifest (doc count, token total, content digest).
    *
    * Scale shape: the per-shard state is bounded BY CONSTRUCTION — a
    * shard holds ~`budget` tokens of text, so the `collect_list` below
    * buffers one context window (kilobytes), never an unbounded group.
    * Ordering inside the group is made deterministic with `array_sort`
    * over (doc_id, text) structs (struct ordering is field-order
    * lexicographic, so doc_id decides), NOT by trusting collect_list's
    * arrival order, which is partitioning-dependent.
    */
  def packedSequences(docs: DataFrame, id: Column, text: Column,
                      budget: Long, partitions: Int = 64): DataFrame = {
    val shards = tokenPacking(docs, id, text, budget, partitions)
    val withText = shards.join(
      docs.select(id.as("doc_id"), text.as("__text")), "doc_id")
    withText.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        md5(encode(array_join(expr(
            "transform(array_sort(collect_list(struct(doc_id, __text))), x -> x.__text)"),
          "\n"), "UTF-8")).as("digest"))
      .orderBy(col("shard"))
  }

  /** Bounded inverted-index build: term → document frequency + the
    * first `maxPostings` doc_ids (ascending) + a truncation flag — the
    * text twin of the ANN serving layout ([[AnnIndex]]).
    *
    * The posting list is the classic unbounded-group hazard: a stopword
    * appears in every document, so `collect_list` per term would buffer
    * an entire corpus' ids in one task. The cap here is structural, not
    * a post-hoc slice: postings accumulate through the bounded
    * [[graft.functions.TopKByScore]] aggregator (score = −doc_id keeps
    * the SMALLEST k ids), so every partial buffer holds ≤ maxPostings
    * entries no matter how hot the term — while `df` counts the true
    * total in the same pass and `truncated` records that the list is a
    * prefix. Postings are emitted as a comma-joined string (scalar,
    * hash-comparable across engines).
    */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
                    maxPostings: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs
      .select(id.as("doc_id"),
        explode(array_distinct(split(text, " "))).as("term"))
      .filter(length(col("term")) > 0)
      .as[(Long, String)]
    val bottomK = new graft.functions.TopKByScore[(Long, String)](
      maxPostings, r => -r._1, r => r._1)
    terms.groupByKey(_._2)
      .agg(bottomK.toColumn.name("top"), count(lit(1)).as[Long].name("df"))
      .toDF("term", "top", "df")
      .select(col("term"), col("df"),
        array_join(expr("transform(top, x -> x._2)"), ",").as("postings"),
        (col("df") > maxPostings).as("truncated"))
  }

  /** Document fingerprints: md5 (exact), poly_hash (codegen'd rolling
    * hash), winnow (MOSS-style k-gram/window minima).
    */
  def withFingerprints(df: DataFrame, text: Column): DataFrame =
    df.withColumn("md5_hex", md5(encode(text, "UTF-8")))
      .withColumn("poly_hash", ColumnFns.poly_hash(text))
      .withColumn("winnow_fp", ColumnFns.winnow(text, 8, 4))

  /** Gopher-style within-document repetition signals: distinct-word
    * ratio, top-2-gram fraction, duplicated-3-gram fraction, and the
    * threshold verdict a curation filter would act on. One native kernel
    * pass per document ([[graft.functions.RepetitionStats]]), no shuffle.
    * (The kernel array is projected twice, so CollapseProject runs it
    * twice per row — a few µs on a kernel this size, cheaper than
    * persisting a corpus-wide intermediate to avoid it.)
    */
  def withRepetitionStats(df: DataFrame, text: Column,
                          maxTop2: Double = 0.18,
                          maxDup3: Double = 0.30): DataFrame = {
    val words = split(text, " ")
    val stats = graft.functions.SketchFns.repetition_stats(text)
    df.withColumn("n_words", size(words))
      .withColumn("distinct_word_ratio",
        size(array_distinct(words)).cast("double") / size(words))
      .withColumn("top_2gram_frac", element_at(stats, 1))
      .withColumn("dup_3gram_frac", element_at(stats, 2))
      .withColumn("is_repetitive",
        col("top_2gram_frac") > maxTop2 || col("dup_3gram_frac") > maxDup3)
  }

  /** Training-mixture resampling: take the LARGEST corpus that matches a
    * target source mixture exactly, integer-exact and deterministic.
    * Given per-source weights w_s (unnormalized), the feasible total is
    * T = min_s floor(count_s * W / w_s) (W = sum of weights) — the size
    * at which the scarcest source is exhausted — and each source
    * contributes its needed_s = floor(w_s * T / W) lowest-(md5, id)
    * documents. All arithmetic is integer (no normalized fractions, no
    * float thresholds), so the selection is bit-stable across engines
    * and partitionings; the md5 ranking makes it layout-independent and
    * re-dealable (salt the id upstream for a different draw).
    *
    * Scale shape: one tiny per-source aggregate (broadcast back), one
    * per-source ranking window. Sources are mixture dimensions —
    * dozens, not millions — but each source's rows DO sort on one task
    * here; at corpus scales where a single source outgrows a task, take
    * the rate-based [[graft.ext.Dedup.hashSplit]]-style threshold
    * instead (fractions in expectation) or range-partition the rank.
    *
    * Output: (doc_id, source, rk, needed) for the selected rows only —
    * the id/source columns as named here, not the full input row; join
    * back on doc_id to recover other columns.
    */
  def mixtureTake(docs: DataFrame, id: Column, source: Column,
                  weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(id.as("doc_id"), source.as("source"),
      weight.cast("long").as("w"))
    val per = base.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"), first(col("w")).as("w"))
    val w0 = per.agg(sum(col("w")).as("bigw"))
    val t0 = per.crossJoin(broadcast(w0))
      .agg(min(expr("(cnt * bigw) div w")).as("t"))
    val needs = per.crossJoin(broadcast(w0)).crossJoin(broadcast(t0))
      .select(col("source"), expr("(w * t) div bigw").as("needed"))
    val rk = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    base.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(rk))
      .join(broadcast(needs), "source")
      .where(col("rk") <= col("needed"))
  }

  /** Overlapping training/RAG chunks: split each document into
    * word-windows of `chunkWords` with `overlapWords` of context carried
    * between consecutive chunks (stride = chunk − overlap). Start
    * offsets are 0, stride, 2·stride, …, and generation stops at the
    * first start whose window already reaches the end of the document —
    * so the final (possibly short) chunk is emitted exactly once and no
    * fully-contained tail duplicates are produced. Entirely map-side:
    * split → generated start sequence → per-start array slice, one
    * output row per chunk, no shuffle anywhere (the chunk stream
    * inherits the scan's partitioning — the right shape for a 100 TB
    * corpus feeding a tokenizer).
    *
    * Output: (doc_id, chunk_id, start_word, n_words, chunk_digest) —
    * the digest (md5 of the space-joined window) stands in for the
    * chunk text so downstream exactness is checkable without shipping
    * bodies; a caller wanting the text swaps the digest column for the
    * joined slice itself.
    */
  def trainingChunks(docs: DataFrame, id: Column, text: Column,
                     chunkWords: Int, overlapWords: Int): DataFrame = {
    require(chunkWords > 0 && overlapWords >= 0 && overlapWords < chunkWords,
      s"need 0 <= overlap < chunk, got chunk=$chunkWords overlap=$overlapWords")
    val stride = chunkWords - overlapWords
    val words = filter(split(text, " "), w => w =!= "")
    docs.select(id.as("doc_id"), words.as("ws"))
      .withColumn("n", size(col("ws")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"), col("n"),
        explode(filter(sequence(lit(0), col("n") - 1, lit(stride)),
          s => s === 0 || s - stride + chunkWords < col("n"))).as("st"))
      .select(col("doc_id"),
        (col("st") / stride).cast("int").as("chunk_id"),
        col("st").as("start_word"),
        least(lit(chunkWords), col("n") - col("st")).as("n_words"),
        md5(concat_ws(" ",
          slice(col("ws"), col("st") + 1, lit(chunkWords)))).as("chunk_digest"))
  }

  /** Temperature-scaled source mixture plan — the data-recipe step that
    * decides how much of each source a training run reads (the
    * multilingual/multi-source sampling rule p_s ∝ n_s^τ used since
    * mBERT/XLM-R; τ < 1 upsamples small sources). [[mixtureTake]]
    * MATERIALIZES a corpus for given weights; this operator COMPUTES
    * the weights from the corpus itself and prices the plan (per-source
    * token budget and epoch count) without touching document bodies
    * beyond one token-count scan.
    *
    * τ is restricted to 2^-halfSqrts (0.5, 0.25, …): n^τ is then a
    * chain of IEEE sqrt ops — correctly rounded and engine-identical —
    * where a libm pow() is not. General τ in production arrives as a
    * pinned per-source weight table and skips the derivation entirely.
    *
    * Exactness: token counts are exact BIGINTs; the weight is
    * floor(sqrt^k(n_tokens)·1e6) (one float multiply + floor on a
    * correctly-rounded sqrt chain); shares/budgets/epochs are integral
    * `div` products computed in decimal(38,0) so a 1e13-token source
    * times 1e9 ppb cannot wrap. One aggregation over the corpus, then
    * arithmetic over #sources rows — nothing else shuffles.
    *
    * Output: one row per source — `n_docs`, `n_tokens`, `weight_micro`,
    * `share_ppb` (this source's sampling probability in parts-per-
    * billion), `planned_tokens` (its slice of `targetTokens`), and
    * `epochs_micro` (planned/actual tokens ×1e6 — values over 1e6 mean
    * the source is upsampled / read more than once).
    */
  def temperatureMixture(docs: DataFrame, source: Column, text: Column,
                         targetTokens: Long, halfSqrts: Int = 1)
      : DataFrame = {
    require(halfSqrts >= 1 && halfSqrts <= 4,
      s"halfSqrts must be in [1,4], got $halfSqrts")
    val per = docs.select(source.as("source"),
        tokenCountWs(text).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    val root = (1 to halfSqrts).foldLeft(col("n_tokens").cast("double")) {
      (c, _) => sqrt(c)
    }
    val weighted = per.withColumn("weight_micro",
      floor(root * 1e6d).cast("long"))
    val tot = weighted.agg(sum(col("weight_micro")).as("__w_total"))
    weighted.crossJoin(broadcast(tot))
      .withColumn("share_ppb", expr(
        "(cast(weight_micro as decimal(38,0)) * 1000000000) div __w_total"))
      .withColumn("planned_tokens", expr(
        s"(cast(weight_micro as decimal(38,0)) * $targetTokens) div __w_total"))
      .withColumn("epochs_micro", expr(
        "(cast(planned_tokens as decimal(38,0)) * 1000000) div n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight_micro"), col("share_ppb"), col("planned_tokens"),
        col("epochs_micro"))
  }
}
