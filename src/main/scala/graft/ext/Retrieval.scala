package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independent per-query rankings (lexical,
  * vector, …) with Reciprocal Rank Fusion (Cormack/Clarke/Büttcher,
  * SIGIR 2009): `score(d) = Σ_lists 1/(k + rank_list(d))`. RRF is the
  * standard first fusion a RAG / training-data retrieval stack runs —
  * rank-only, so the lists' incomparable raw scores (BM25 vs cosine)
  * never need calibration.
  *
  * Scale shape: fusion is one hash aggregation on (query, candidate)
  * over the concatenated lists (each already ≤ k rows per query — the
  * upstream rankers bound the input), then a per-query window for the
  * fused top-k. No corpus-wide state, no global sort. Scores are summed
  * in integer parts-per-billion (`1e9 DIV (k + rank)`) so the fused
  * order — and the hash gate — is fold-order-independent.
  */
object Retrieval {

  /** Observation names must be unique per query plan (a hybrid pipeline
    * composes several lexicalTopK frames into one execution). */
  private val obsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fuse rankings, each a DataFrame with columns `(query_id, cand_id,
    * rank)` (rank 1-based within query). Returns the fused per-query
    * top-`k`: `query_id, fused_rank, cand_id, rrf_ppb, n_lists` with
    * `rrf_ppb = Σ floor(1e9 / (kRrf + rank))` (integer — exact, the
    * fusion constant kRrf = 60 per the RRF paper), `n_lists` = how many
    * input lists contained the pair. Ties broken by `cand_id`.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val cols = Seq("query_id", "cand_id", "rank")
    val all = rankings.map(_.select(cols.map(col): _*))
      .reduce(_ unionByName _)
    val scored = all
      .withColumn("contrib",
        expr(s"CAST(1000000000 DIV ($kRrf + rank) AS BIGINT)"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("contrib")).as("rrf_ppb"),
           count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppb").desc, col("cand_id"))
    scored.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank").cast("int").as("fused_rank"),
              col("cand_id"), col("rrf_ppb"), col("n_lists"))
  }

  private def postings(df: DataFrame, id: Column, text: Column,
                       out: String): DataFrame =
    df.select(id.as(out),
        explode(array_distinct(filter(split(text, " "),
          w => length(w) > 0))).as("word"))

  /** Production default for [[lexicalTopK]]'s df-cap: a word present in
    * more than 100k corpus documents is a stopword for ranking purposes
    * — its postings dominate Σ df_q·df_c while contributing a term
    * every candidate shares (near-zero ranking signal; dropping
    * stopwords is what every lexical engine's stopword list does). At
    * test scale (corpus ≤ thousands of docs) no df can reach the cap,
    * so the capped and uncapped paths agree exactly — pinned in
    * RetrievalSpec and by the q166/q169 oracles running against the
    * capped default.
    */
  val DefaultMaxDf = 100000L

  /** Pre-flight cost audit for the posting join — q170's
    * [[Skew.joinCardinalityAudit]] wired to the retrieval operator:
    * exact posting-join output cardinality (`total_output` = Σ_w
    * df_q(w)·df_c(w)) and the top contributing words, from two
    * word-histogram aggregations, WITHOUT running the join. Run this
    * before passing `maxDf = None` at scale: a stopword-dominated
    * corpus shows a few words carrying almost all of `total_output`
    * (`contrib_share` near 1), which is exactly the mass the df-cap
    * removes.
    */
  def postingJoinAudit(queries: DataFrame, qId: Column, qText: Column,
                       corpus: DataFrame, cId: Column, cText: Column,
                       topK: Int = 20): DataFrame =
    Skew.joinCardinalityAudit(
      postings(queries, qId, qText, "query_id"), col("word"),
      postings(corpus, cId, cText, "cand_id"), col("word"), topK)

  /** Lexical per-query top-`k` by distinct-word overlap, computed as an
    * inverted-index (posting-list) join — the corpus is exploded to
    * `(word, doc)` postings once and joined word-wise against the query
    * postings, so cost is Σ_w df_q(w)·df_c(w), never |Q|·|C| all-pairs.
    * At 100 TB the stopword mass dominates that sum; `maxDf` drops
    * corpus-frequent words from BOTH sides (the q27 df-cap discipline)
    * and DEFAULTS ON at [[DefaultMaxDf]] — exact at test scale, a
    * stopword guard at corpus scale. Pass `None` only after
    * [[postingJoinAudit]] says the join cannot explode.
    * Output: `query_id, cand_id, rank, shared_terms` (rank 1-based by
    * shared_terms desc, cand_id asc; self-pairs excluded).
    */
  def lexicalTopK(queries: DataFrame, qId: Column, qText: Column,
                  corpus: DataFrame, cId: Column, cText: Column,
                  k: Int,
                  maxDf: Option[Long] = Some(DefaultMaxDf)): DataFrame = {
    val cPost = postings(corpus, cId, cText, "cand_id")
    val cKept = maxDf match {
      case Some(cap) =>
        // Surface when the guard actually fires: `dropped_words`/`max_df`
        // ride the df aggregation as a CollectMetrics observation (zero
        // extra jobs) — readable synchronously from
        // `queryExecution.observedMetrics` after any action and shipped
        // to QueryExecutionListener telemetry, so a large-corpus caller
        // can tell silently-exact from actively-capping (RetrievalSpec
        // pins both readings).
        val dfAll = cPost.groupBy("word").agg(count(lit(1)).as("df"))
          .observe(s"lexical_df_cap_${Retrieval.obsId.incrementAndGet()}",
            sum(when(col("df") > cap, 1L).otherwise(0L)).as("dropped_words"),
            max(col("df")).as("max_df"))
        // (caveat: if the join result is EMPTY, AQE empty-relation
        // propagation prunes the observed subtree and no metric surfaces
        // — an empty result already tells the caller everything matched
        // nothing)
        // word-keyed both sides, unhinted: the kept vocabulary (rare
        // words survive the cap) grows with the corpus — AQE
        // broadcasts while small, shuffles past broadcast range
        cPost.join(dfAll.filter(col("df") <= cap).select("word"),
          "word")
      case None => cPost
    }
    // query words outside the kept-vocabulary simply match nothing in
    // the join below — no separate query-side filter needed
    val qPost = postings(queries, qId, qText, "query_id")
    val shared = qPost.join(cKept, "word")
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(count(lit(1)).as("shared_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("shared_terms").desc, col("cand_id"))
    shared.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
              col("rank").cast("int").as("rank"), col("shared_terms"))
  }
}
