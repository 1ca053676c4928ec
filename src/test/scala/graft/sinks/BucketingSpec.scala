package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet"), "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "o_b", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // sanity: it is a real join with real rows
      assert(joined.count() ==
        spark.read.parquet(s"$sf/lineitem.parquet")
          .join(spark.read.parquet(s"$sf/orders.parquet"),
            org.apache.spark.sql.functions.col("l_orderkey")
              === org.apache.spark.sql.functions.col("o_orderkey"))
          .count())

      // the non-bucketed twin DOES shuffle — the comparison that shows
      // what bucketing removed
      val unbucketed = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          org.apache.spark.sql.functions.col("l_orderkey")
            === org.apache.spark.sql.functions.col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
