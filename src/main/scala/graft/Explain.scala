package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of one or more
  * registered queries without executing them (`runMain graft.Explain
  * <sfDir> <query>[,<query>...]`). The per-operator review loop —
  * "explain, then iterate until it's the plan you'd want" — needs this
  * to be one command, not an interactive session.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query>[,<query>...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(1).split(",").foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
