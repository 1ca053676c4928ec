package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §7: "bucketing
  * for co-located joins"). Writing both sides of a recurring join
  * bucketed (and sorted) by the join key lets Spark plan the join with
  * ZERO exchanges — each bucket pair joins locally. At 100 TB this is the
  * difference between re-shuffling 100 TB per join and none: fact tables
  * are written bucketed once at ingest, and every downstream
  * orderkey-join (q02-style plans) skips its largest exchange.
  *
  * Bucket counts must match (or divide) across join sides; pick a count
  * sized so bucket × row-group fits executor memory at target scale.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the physical plan contains no shuffle exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
