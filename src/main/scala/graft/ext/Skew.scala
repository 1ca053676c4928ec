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
}
