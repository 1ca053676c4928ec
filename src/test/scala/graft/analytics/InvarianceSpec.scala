package graft.analytics

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Registry-wide partition-invariance sweep: every ORACLE-GATED query
  * (an `oracleSql` entry — the set the driver hash-compares against
  * DuckDB) is executed under two deliberately different partitioning
  * regimes and must produce bit-identical result multisets:
  *
  *   A) shuffle.partitions = 3  + every input scan re-split round-robin
  *      into 7 partitions (the [[graft.Tables]] `graft.test
  *      .inputPartitions` hook) — different map-side fold order AND
  *      different partial-aggregate grouping;
  *   B) shuffle.partitions = 32, natural file splits — the production
  *      shape.
  *
  * This is the central proof of the repo's integer-exactness discipline
  * (micro-nat/cents/decimal(38,0) accumulators, one terminal double
  * division): any query whose result depends on float fold order or
  * per-partition tie-breaks fails HERE, at registration time, rather
  * than flaking at the oracle gate on a re-partitioned corpus. Doubles
  * are compared by RAW BITS (the driver's hash gate is exact too);
  * rows and columns are canonically sorted first, so `ORDER BY` ties
  * reordering between regimes — which the driver also sorts away —
  * don't count as differences.
  *
  * The rows-only queries (no oracle — q48/q94/q162, all three
  * iterative-training outputs) are exactly the excluded set; their
  * stability properties are pinned by their own golden/property specs
  * instead.
  */
class InvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def canon(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double => "d" + java.lang.Double.doubleToRawLongBits(d)
    case f: java.lang.Float => "f" + java.lang.Float.floatToRawIntBits(f)
    case b: Array[Byte] => b.map("%02x".format(_)).mkString("x", "", "")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + "->" + canon(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case x => x.toString
  }

  /** Collect under a given regime as a canonically sorted row-string list. */
  private def resultUnder(name: String, shuffle: Int,
                          inputParts: Option[Int]): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
    inputParts match {
      case Some(n) => spark.conf.set("graft.test.inputPartitions", n.toString)
      case None    => spark.conf.unset("graft.test.inputPartitions")
    }
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(canon).sorted.toSeq
    } finally {
      spark.conf.unset("graft.test.inputPartitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("all oracle-gated queries are partition-invariant (bit-exact)") {
    assume(new java.io.File(sf).isDirectory, "testdata not present")
    val gated = SparkEntry.queries.keys.toSeq.sorted
      .filter(SparkEntry.oracleSql.contains)
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (name <- gated) {
      val a = resultUnder(name, shuffle = 3, inputParts = Some(7))
      val b = resultUnder(name, shuffle = 32, inputParts = None)
      if (a != b) {
        val diff = a.zipAll(b, "<missing>", "<missing>")
          .filter { case (x, y) => x != y }.take(3)
        failures += s"$name: ${a.size} vs ${b.size} rows; first diffs: " +
          diff.map { case (x, y) => s"\n  A=$x\n  B=$y" }.mkString
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} partition-sensitive queries:\n" +
        failures.mkString("\n"))
  }
}
