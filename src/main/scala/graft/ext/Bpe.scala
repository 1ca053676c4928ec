package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BpeFns

/** Byte-pair-encoding tokenizer training + corpus-wide apply — the
  * canonical learned tokenizer of an LLM data pipeline (Sennrich,
  * Haddow & Birch, ACL'16), next to the fixed tokenizations in
  * [[TextAnalysis]] (whitespace, regex).
  *
  * Scale split, deliberately asymmetric:
  *
  *  - TRAINING is a bounded-vocabulary problem. The pair census runs
  *    over the distinct-word frequency table, not the corpus — and a
  *    capped vocabulary (the `min_frequency` / top-K cut every
  *    production BPE trainer applies) makes that table kilobytes. So
  *    the ONE corpus-scale pass is the word-frequency aggregation
  *    (map-side partial agg + TakeOrdered top-K: deterministic by
  *    (freq DESC, word ASC)); the merge loop then runs driver-side on
  *    ≤ topK rows, exact and replay-stable — the same bounded-driver
  *    pattern as [[Similarity]]'s 2048-row codebook training, for the
  *    same reason: iterating Spark jobs over a KB-sized table buys
  *    nothing but scheduler overhead.
  *  - APPLY is the corpus-scale work and is purely MAP-SIDE: the merge
  *    table ships once per executor inside the codegen'd
  *    [[graft.functions.BpeTokens]] expression; no shuffle, no UDF,
  *    no per-row table lookup setup.
  *
  * Determinism: merge choice is (pair count DESC, pair ASC); word-freq
  * top-K is (freq DESC, word ASC); both total orders, so the trained
  * table — and therefore every token — is a pure function of the
  * corpus, independent of partitioning and replay.
  */
object Bpe {

  /** Top-K distinct-word frequency table of a text column (single-space
    * word discipline, empty words dropped) — one map-side-combined
    * aggregation + bounded TakeOrdered; K rows to the driver.
    */
  def wordFrequencies(docs: DataFrame, text: Column,
                      topK: Int): Array[(String, Long)] = {
    docs.select(explode(split(text, " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Exact BPE merge training over a word-frequency table: each step
    * merges the adjacent symbol pair with the highest total frequency
    * (ties: lexicographically smallest pair), until `numMerges` merges
    * or no pair repeats. Pure function — no RNG, no fold-order floats.
    */
  def trainMerges(wordFreqs: Seq[(String, Long)],
                  numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] = wordFreqs.map { case (w, f) =>
      val cps = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        cps += w.substring(i, i + n)
        i += n
      }
      (cps.toArray, f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val census = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1)
        census((syms(j), syms(j + 1))) =
          census.getOrElse((syms(j), syms(j + 1)), 0L) + f
      if (census.isEmpty) exhausted = true
      else {
        val best = census.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var k = 0
          while (k < syms.length) {
            if (k < syms.length - 1 &&
                syms(k) == best._1 && syms(k + 1) == best._2) {
              out += syms(k) + syms(k + 1)
              k += 2
            } else {
              out += syms(k)
              k += 1
            }
          }
          (out.toArray, f)
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Train on the corpus (top-`vocabCap` words, `numMerges` merges) and
    * tokenize every document map-side. Output: (id, n_chars, n_tokens,
    * n_distinct_tokens) — the compression/diversity profile per doc.
    */
  def tokenStats(docs: DataFrame, id: Column, text: Column,
                 numMerges: Int, vocabCap: Int = 2048): DataFrame = {
    val merges = trainMerges(
      wordFrequencies(docs, text, vocabCap).toIndexedSeq, numMerges)
    docs.select(id.as("id"), text.as("text"))
      .where(col("text").isNotNull)
      .select(col("id"),
        length(col("text")).as("n_chars"),
        BpeFns.bpe_tokens(col("text"), merges).as("toks"))
      .select(col("id"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"))
  }
}
