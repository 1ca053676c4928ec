package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-generated parquet testdata (see TESTDATA.md).
  *
  * Every table is a plain parquet directory-or-file under `dir`; reads go
  * through `spark.read.parquet` so Catalyst gets pushdown + pruning on the
  * scan. At cluster scale these would be catalog tables; the `dir`
  * indirection keeps the query functions location-agnostic.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Partition-invariance test hook (InvarianceSpec): when set, re-split
    // every scan round-robin so map-side fold order and partial-aggregate
    // grouping differ from the file-split default. Unset in production —
    // the extra exchange would be pure cost.
    spark.conf.getOption("graft.test.inputPartitions") match {
      case Some(n) => df.repartition(n.toInt)
      case None    => df
    }
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as long, integer-divide to micros;
    * a double division would lose precision, 2024 epoch-nanos exceed 2^53)
    * and plain TIMESTAMP(MICROS) across testdata generations. Branch on
    * the read schema so both load, normalized to session-tz TIMESTAMP
    * (the session is pinned UTC, so the cast is value-preserving).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** One engine query: a Spark DataFrame program plus (when expressible) the
  * equivalent ANSI SQL for the DuckDB oracle. Column names and row order
  * must match between the two — the driver sorts columns by name and
  * hash-compares values.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
