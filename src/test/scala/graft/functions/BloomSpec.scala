package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ext.Dedup

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted hash reports might-contain (property)") {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      hashes <- Gen.nonEmptyListOf(Gen.long)
      k <- Gen.chooseNum(1, 12)
    } yield (hashes, k)
    for (seed <- 1L to 200L) {
      val (hashes, k) = gen(Gen.Parameters.default, rng.Seed(seed)).get
      val words = new Array[Long](1024 / 64)
      hashes.foreach(h => BloomKernels.set(words, h, k))
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
      assert(hashes.forall(h => BloomKernels.mightContain(arr, h, k)),
        s"false negative at seed=$seed k=$k")
    }
  }

  test("false-positive rate near the configured budget, never silently high") {
    val n = 5000
    val numBits = BloomKernels.optimalBits(n, 0.02)
    val k = BloomKernels.optimalHashes(numBits, n)
    val words = new Array[Long](numBits / 64)
    (0 until n).foreach(i => BloomKernels.set(words, SketchKernels.splitmix64(i.toLong), k))
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
    val probes = 20000
    val fps = (n until n + probes)
      .count(i => BloomKernels.mightContain(arr, SketchKernels.splitmix64(i.toLong), k))
    val rate = fps.toDouble / probes
    assert(rate < 0.06, s"false-positive rate $rate far above the 2% design point")
  }

  test("incrementalNew == plain left-anti join (the Bloom changes cost, not answers)") {
    val hist = (0L until 400L).map(i => (i, s"key-${i % 97}")).toDF("id", "key")
    val inc = (1000L until 1400L).map(i => (i, s"key-${i % 211}")).toDF("id", "key")
    val viaBloom = Dedup.incrementalNew(inc, hist, col("key"),
        numBits = 1 << 12, numHashes = 6)
      .select("id", "key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = inc.join(hist.select(col("key")).distinct(), Seq("key"), "left_anti")
      .select("id", "key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaBloom == plain)
    // the split is non-trivial: some incoming keys are duplicates, some new
    assert(plain.nonEmpty && plain.size < 400)
  }

  test("null fingerprints follow the anti-join contract: kept, not silently dropped") {
    val hist = Seq((1L, "a"), (2L, "b")).toDF("id", "key")
    val inc = Seq((10L, "a"), (11L, null), (12L, "c")).toDF("id", "key")
    val viaBloom = Dedup.incrementalNew(inc, hist, col("key"),
        numBits = 1 << 10, numHashes = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    val plain = inc.join(hist.select(col("key")).distinct(), Seq("key"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plain == Set(11L, 12L), "sanity: anti join keeps null-keyed rows")
    assert(viaBloom == plain)
  }

  test("empty historical side: everything is new, no NPE from a null filter row") {
    val hist = Seq.empty[(Long, String)].toDF("id", "key")
    val inc = Seq((1L, "a"), (2L, "b")).toDF("id", "key")
    val out = Dedup.incrementalNew(inc, hist, col("key"),
      numBits = 1 << 10, numHashes = 4)
    assert(out.count() == 2)
  }

  test("bloom_might_contain is SQL-registered and codegen'd") {
    graft.GraftFunctions.registerAll(spark)
    val words = new Array[Long](16)
    BloomKernels.set(words, 42L, 4)
    val df = Seq((words, 42L), (words, 43L)).toDF("bits", "h")
      .selectExpr("bloom_might_contain(bits, h, 4) AS m")
    val got = df.collect().map(_.getBoolean(0))
    assert(got(0)) // inserted -> must be might-contain
  }
}
