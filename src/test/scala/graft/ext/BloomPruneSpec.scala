package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.ext.BloomPrune]] — the q211 runtime-filter operator. The
  * load-bearing property is the build/probe HASH AGREEMENT: the build
  * aggregator hashes on the JVM (XxHash64Function chain) while the
  * probe hashes in SQL (`xxhash64(key, i)`); if the two ever diverge
  * (a Spark upgrade changing the seed/chain, a type mismatch in the
  * cast discipline) the filter silently grows false negatives — so
  * the agreement is pinned directly, the no-false-negative property
  * is pinned over a generated key set, and the false-positive rate
  * is measured against the sizing note's claim.
  */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("SQL xxhash64(key, i) and the JVM-side hash chain agree " +
      "bit-for-bit") {
    import spark.implicits._
    val keys = (0 until 200).map(i => i * 2654435761L % 100003 - 50000)
    val sql = keys.toDF("k")
      .select(col("k"),
        xxhash64(col("k").cast("long"), lit(0)).as("h0"),
        xxhash64(col("k").cast("long"), lit(1)).as("h1"),
        xxhash64(col("k").cast("long"), lit(2)).as("h2"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    keys.foreach { k =>
      val (h0, h1, h2) = sql(k)
      assert(BloomPrune.hashChain(k, 0) == h0, s"k=$k i=0")
      assert(BloomPrune.hashChain(k, 1) == h1, s"k=$k i=1")
      assert(BloomPrune.hashChain(k, 2) == h2, s"k=$k i=2")
    }
  }

  test("no false negatives: every built key passes mightContain; " +
      "false positives stay under the sizing claim") {
    import spark.implicits._
    val members = (0 until 1000).map(i => (i * 48271L) % 2147483647L)
    val bits = BloomPrune.buildBits(members.toDF("k"), col("k"),
      mBits = 16384) // ~16 bits/key
    val memberSet = members.toSet
    val probes = (0 until 20000).map(i => 3000000000L + i * 7919L)
      .filterNot(memberSet.contains)
    val results = members.map(k => (k, true)).toDF("k", "is_member")
      .union(probes.map(k => (k, false)).toDF("k", "is_member"))
      .select(col("is_member"),
        BloomPrune.mightContain(bits, col("k")).as("admitted"))
      .collect()
    val falseNeg = results.count(r => r.getBoolean(0) && !r.getBoolean(1))
    assert(falseNeg == 0, s"$falseNeg members rejected by the filter")
    val nonMembers = results.filterNot(_.getBoolean(0))
    val fpRate = nonMembers.count(_.getBoolean(1)).toDouble / nonMembers.length
    assert(fpRate < 0.03, f"false-positive rate $fpRate%.4f ≥ 3%%")
    info(f"false-positive rate at 16 bits/key: $fpRate%.4f")
  }

  test("probe is a plan reference, not a literal: large filters keep " +
      "the plan small and the expression codegen'd") {
    import spark.implicits._
    // 2^22 bits = 64K words — as a typedlit this was a 64K-element
    // array literal in every probe conjunct; as a reference object the
    // plan stays O(1) regardless of filter size
    val bits = BloomPrune.buildBits(
      Seq(1L, 2L, 3L).toDF("k"), col("k"), mBits = 1 << 22)
    assert(bits.length == (1 << 22) / 64)
    val df = spark.range(50).toDF("k")
      .filter(BloomPrune.mightContain(bits, col("k")))
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("bloom_prune_probe"),
      s"native probe expression expected in plan:\n$planStr")
    assert(planStr.length < 20000,
      s"plan unexpectedly large (${planStr.length} chars) — literal leak?")
    val got = df.collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L).subsetOf(got), "members must pass")
    assert(got.size <= 6, s"FP explosion at 2^22 bits over 3 keys: $got")
  }

  test("bloomSemiJoin equals the exact semi-join (null keys and " +
      "duplicate dim keys included)") {
    import spark.implicits._
    val fact = (0 until 5000).map(i =>
        (if (i % 97 == 0) None else Some((i * 31L) % 500), s"row$i"))
      .toDF("fk", "payload")
    val dim = ((0 until 120).map(i => (i * 7L) % 500) ++
        Seq(3L, 3L, 10L)).toDF("dk") // duplicates must not duplicate fact rows
    val got = BloomPrune.bloomSemiJoin(fact, col("fk"), dim, col("dk"),
        mBits = 4096)
      .select(col("fk"), col("payload"))
      .collect().map(r => (r.get(0), r.getString(1))).toSet
    val want = fact.join(dim.distinct(), col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.get(0), r.getString(1))).toSet
    assert(got == want)
    assert(want.nonEmpty && !got.exists(_._1 == null),
      "null fact keys must never survive the semi-join")
  }
}
