package graft.streaming

import org.apache.spark.sql.SparkSession

/** transformWithState is RocksDB-only; scope the provider to the query
  * under test and restore the default so the suites written against the
  * HDFS-backed provider keep running on it.
  */
object RocksDbTestSupport {
  def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
