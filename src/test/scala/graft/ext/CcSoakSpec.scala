package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Adversarial soak for the two connected-components formulations on the
  * graph shape that separates them: a single path of 1e5 nodes (diameter
  * 1e5 — the worst case for min-label propagation, which moves labels
  * one hop per round, and a non-event for the large-star/small-star
  * rewrite, whose round count depends only on ~log² of component size).
  * Node ids are a shuffled permutation so neither formulation can
  * shortcut via id-ordered adjacency.
  *
  * This pins the documented crossover (Dedup.clusters scaladoc: "deep
  * chains should use clustersBigStar") as executable fact rather than
  * claim: the propagation guard must fail LOUDLY — a silent partial
  * labeling would emit split components with several is_canonical rows
  * per true cluster, corrupting downstream dedup.
  */
class CcSoakSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val n = 100000
  // shuffled path: perm(0)–perm(1)–…–perm(n); one component, diameter n
  private def pathEdges = {
    val perm = new scala.util.Random(7).shuffle((0L to n.toLong).toVector)
    perm.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("id_a", "id_b")
      // materialize as a real distributed frame (32 partitions), not a
      // single-partition local relation — the soak should exercise the
      // shuffle machinery the operator uses at scale
      .repartition(32)
  }

  test("clustersBigStar converges on a 1e5-node path within the default round budget") {
    val out = Dedup.clustersBigStar(pathEdges)
    val agg = out.agg(
      count(lit(1)),
      countDistinct(col("cluster_id")),
      min(col("cluster_id")),
      sum(when(col("is_canonical"), 1).otherwise(0)),
      min(col("cluster_size")),
      max(col("cluster_size"))).head()
    assert(agg.getLong(0) == n + 1L, "every node labeled exactly once")
    assert(agg.getLong(1) == 1L, "single component")
    assert(agg.getLong(2) == 0L, "canonical representative is the min id")
    assert(agg.getLong(3) == 1L, "exactly one is_canonical row")
    assert(agg.getLong(4) == n + 1L && agg.getLong(5) == n + 1L,
      "cluster_size is the full component everywhere")
  }

  test("label propagation trips its loud-failure guard on the same deep path") {
    // a round budget far above what near-dup graphs need, far below the
    // path's diameter: must throw, never return a partial labeling
    val ex = intercept[IllegalStateException] {
      Dedup.clusters(pathEdges, maxIterations = 6).count()
    }
    assert(ex.getMessage.contains("clustersBigStar"),
      "failure message should point at the deep-graph formulation")
  }
}
