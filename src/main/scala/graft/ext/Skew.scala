package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md / north star: "salting for skew,
  * AQE for runtime re-plan"). AQE's skew-join split handles sort-merge
  * join skew automatically; these cover the two cases it doesn't:
  * single-hot-key aggregations and broadcast-side replication joins.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt) first — spreading
    * a hot key over `salts` reducers — then re-aggregate by key. The agg
    * list must be re-aggregatable (sum/count/min/max: pass the same
    * expression twice; avg: decompose into sum+count upstream).
    *
    * Partial (map-side) aggregation already handles *moderate* skew; the
    * salt matters when a single key's post-combine partials still
    * overwhelm one reducer — billions of rows of one key at 100 TB.
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int)(
      firstPhase: Seq[Column], secondPhase: Seq[Column]): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(firstPhase.head, firstPhase.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(secondPhase.head, secondPhase.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small right side: the
    * left gets a random salt in [0, salts); the right is replicated once
    * per salt value; the join key becomes (key, salt), so one hot key
    * spreads over `salts` tasks. Right-side blowup = |right| × salts —
    * use only when the right side is broadcast-small.
    */
  def saltedJoin(leftSkewed: DataFrame, rightSmall: DataFrame,
                 leftKey: Column, rightKey: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = leftSkewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedRight = rightSmall.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(replicatedRight,
        leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }

  /** Pre-flight join cardinality & skew audit — answer "will this join
    * explode, and on which keys?" BEFORE running it at 100 TB. Exact,
    * not a sketch: |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k), so two per-key
    * histograms (map-side partial aggregation — only one row per
    * distinct key crosses each shuffle) joined on the key give the
    * exact output cardinality, and the top-`topK` contributions are
    * the salting/AQE-skew candidates. Cost is two aggregations of the
    * inputs' KEY COLUMNS only — orders of magnitude under running the
    * join when values are wide or fan-out is high.
    *
    * Output: one row per top-`topK` key — `skew_rank, key, n_a, n_b,
    * contrib` (= n_a·n_b) — each carrying the global `total_output`,
    * `n_join_keys`, and `contrib_share` (this key's fraction of the
    * join output; near 1.0 = one hot key dominates → salt it). The
    * top-k is TakeOrderedAndProject (bounded partials through the
    * shuffle), the rank window runs over `topK` rows only.
    */
  def joinCardinalityAudit(a: DataFrame, aKey: Column,
                           b: DataFrame, bKey: Column,
                           topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ha = a.groupBy(aKey.as("key")).agg(count(lit(1)).as("n_a"))
    val hb = b.groupBy(bKey.as("key")).agg(count(lit(1)).as("n_b"))
    // contrib/total in decimal(38,0): the audit exists to detect join
    // explosion, and that is exactly the regime where Long n_a·n_b
    // silently wraps (two ~3e9-count sides already exceed 2^63) —
    // decimal keeps the census exact to 10^38 output rows
    val contrib = ha.join(hb, "key")
      .withColumn("contrib",
        col("n_a").cast("decimal(38,0)") * col("n_b").cast("decimal(38,0)"))
    val totals = contrib.agg(sum(col("contrib")).as("total_output"),
      count(lit(1)).as("n_join_keys"))
    contrib.orderBy(col("contrib").desc, col("key")).limit(topK)
      .withColumn("skew_rank", row_number()
        .over(graft.functions.BoundedWindow.orderBy(col("contrib").desc, col("key"))))
      .crossJoin(broadcast(totals))
      .withColumn("contrib_share",
        col("contrib").cast("double") / col("total_output").cast("double"))
      // decimal(38,0) stays internal; the OUTPUT carries the exact values
      // as strings — a decimal(38,0) column is representation-unstable
      // across engines (DuckDB fetches wide decimals as float64), while
      // the digit string is exact to 10^38 and canonical everywhere
      .select(col("skew_rank").cast("int").as("skew_rank"), col("key"),
        col("n_a"), col("n_b"), col("contrib").cast("string").as("contrib"),
        col("total_output").cast("string").as("total_output"),
        col("n_join_keys"), col("contrib_share"))
  }
}
