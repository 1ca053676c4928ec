package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket affinity: pairwise association rules with
  * support / confidence / lift (Agrawal-Srikant Apriori, restricted to
  * the 2-itemset level that co-purchase analytics actually consume —
  * [[Graph]] builds co-occurrence EDGES for traversal; this scores the
  * directed RULES a merchandiser or recommender reads).
  *
  * Scale shape: baskets are reduced to distinct (basket, item) pairs
  * first (one hash aggregation), candidate pairs come from a basket-
  * keyed self-join whose fan-out is Σ|basket|² — bounded by
  * `maxBasket` (oversized baskets are dropped whole, the standard
  * Apriori guard: a single degenerate 1e5-item basket would otherwise
  * contribute 1e10 pairs), then everything is counting. No item-pair
  * matrix is ever materialized beyond pairs that actually co-occur.
  *
  * Exactness: support/confidence/lift are single divisions of exact
  * long counts (`lift = n_both·N / (n_ant·n_cons)` with the integer
  * products taken first — safe while n·N < 2^63), so the doubles
  * hash-match an independent engine bit-for-bit.
  */
object Affinity {

  /** Directed pairwise rules from `df`'s (basketCol, itemCol) rows.
    * Output: `antecedent, consequent, n_both, n_ant, n_cons, n_baskets,
    * support, confidence, lift` for pairs co-occurring in at least
    * `minSupportCount` baskets (both directions are emitted — the rule
    * X→Y and Y→X differ in confidence). Ties and ordering are left to
    * the caller.
    *
    * One shuffle keys everything: baskets collapse to `(b, items[])`
    * via collect_set (dedup inside the agg buffer), the size guard
    * filters arrays, and candidate pairs come from a double explode of
    * the array — generated MAP-SIDE, so the only further exchanges are
    * the pair-count and item-count aggregations. The basket exchange
    * is shared by all three consumers (ReusedExchange in the plan).
    * Set order from collect_set is nondeterministic, but every
    * downstream consumer only counts — order never matters.
    */
  def associationRules(df: DataFrame, basketCol: Column, itemCol: Column,
                       minSupportCount: Long,
                       maxBasket: Int = 1000): DataFrame = {
    // null contract, made explicit at the plan edge: null items and null
    // basket ids are DROPPED (collect_set would silently skip null items
    // anyway — while a SQL twin's DISTINCT would count them toward the
    // basket-size guard, flipping whole-basket keep/drop at the cap)
    val baskets = df.select(basketCol.as("b"), itemCol.as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .groupBy(col("b")).agg(collect_set(col("i")).as("items"))
      .filter(size(col("items")) <= maxBasket)
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val itemCounts = baskets
      .select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("c"))
      .filter(col("a") =!= col("c"))
      .groupBy(col("a").as("antecedent"), col("c").as("consequent"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupportCount)
    pairs
      .join(itemCounts.select(col("i").as("antecedent"),
        col("n_item").as("n_ant")), "antecedent")
      .join(itemCounts.select(col("i").as("consequent"),
        col("n_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ant"), col("n_cons"), col("n_baskets"),
        (col("n_both").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_both").cast("double") / col("n_ant").cast("double"))
          .as("confidence"),
        ((col("n_both") * col("n_baskets")).cast("double") /
          (col("n_ant") * col("n_cons")).cast("double")).as("lift"))
  }
}
