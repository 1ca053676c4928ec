package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in module registries ([[graft.analytics.Relational]],
  * etc.); this object just flattens them into the driver's shape.
  */
object SparkEntry {

  /** Every registered query, in registration order. */
  def all: Seq[GraftQuery] =
    analytics.Relational.queries ++
    analytics.TimeSeries.queries ++
    analytics.PipelineQueries.queries ++
    analytics.ExtQueries.queries ++
    analytics.SketchQueries.queries ++
    analytics.RangeJoin.queries ++
    analytics.SqlSurface.queries ++
    analytics.SurfaceQueries.queries ++
    analytics.Scd2.queries ++
    analytics.CurationQueries.queries ++
    analytics.StatQueries.queries ++
    analytics.BehaviorQueries.queries ++
    analytics.RecipeQueries.queries ++
    analytics.WebCurationQueries.queries ++
    analytics.DocTextQueries.queries ++
    analytics.ImageQueries.queries ++
    analytics.AudioQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Relational.queries
      .find(_.name == "q02_region_revenue").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
