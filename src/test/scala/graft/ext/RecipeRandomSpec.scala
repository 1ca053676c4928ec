package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Reference-implementation cross-checks for the round-11 kernels on
  * deterministic pseudo-random instances (the GraphRandomSpec
  * discipline): an in-memory modularity sum, a naive O(n²)
  * sorted-neighborhood pairing, a scalar CUSUM recurrence, and a
  * counted-by-hand kappa are all trivially auditable, so agreement on
  * few-thousand-row instances pins the distributed formulations
  * (two-phase rank decomposition, cleared-denominator windows,
  * confusion-matrix algebra) far beyond RecipeSpec's hand fixtures.
  * All draws are a fixed LCG — identical across runs and partitions.
  */
class RecipeRandomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var seed = 987654321L
  private def next(): Long = {
    seed = seed * 6364136223846793005L + 1442695040888963407L; seed
  }
  private def draw(bound: Int): Int = Math.floorMod(next(), bound).toInt

  test("modularity agrees with the in-memory Newman sum on a random graph") {
    val n = 120
    val und = (1 to 900).map(_ => (draw(n).toLong, draw(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val commOf: Long => String = v => s"c${v % 7}"
    val edges = und.toSeq.toDF("src", "dst")
    val comm = (0L until n).map(v => (v, commOf(v))).toDF("node", "community")

    val m = und.size.toLong
    val deg = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    und.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    val dC = deg.groupBy { case (v, _) => commOf(v) }
      .view.mapValues(_.values.sum).toMap
    val eC = und.toSeq.groupBy { case (a, b) =>
      if (commOf(a) == commOf(b)) commOf(a) else "__cross"
    }.view.mapValues(_.size.toLong).toMap

    val got = Graph.modularity(edges, comm).collect()
      .map(r => r.getAs[String]("community") -> r).toMap
    dC.foreach { case (c, d) =>
      val e = eC.getOrElse(c, 0L)
      val expect = BigInt(4) * m * e - BigInt(d) * d
      assert(got(c).getAs[String]("q_contrib_scaled") == expect.toString,
        s"community $c")
      assert(got(c).getAs[Long]("degree_sum") == d)
    }
    // total Q from the scaled contributions must telescope to
    // Σe_intra/m − Σ(d_c/2m)² computed directly
    val qScaled = dC.map { case (c, d) =>
      BigInt(4) * BigInt(m) * BigInt(eC.getOrElse(c, 0L)) -
        BigInt(d) * BigInt(d)
    }.sum
    val direct = dC.map { case (c, d) =>
      eC.getOrElse(c, 0L).toDouble / m - math.pow(d.toDouble / (2 * m), 2)
    }.sum
    assert(math.abs(qScaled.toDouble / (4.0 * m * m) - direct) < 1e-12)
  }

  test("sortedNeighborPairs equals the naive global-sort pairing") {
    val rows = (0 until 500).map { i =>
      (i.toLong, s"${('a' + draw(26)).toChar}${draw(1000)}")
    }
    val w = 4
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    val expect = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + w, sorted.size - 1)
    } yield (sorted(i)._1, sorted(j)._1, j - i)).toSet

    val got = Dedup.sortedNeighborPairs(rows.toDF("id", "name"),
        col("id"), col("name"), w).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("rank_dist"))).toSet
    assert(got == expect)
  }

  test("cusumFixed matches the scalar recurrence on a random series") {
    val vals = (0 until 200).map(_ => 150L + draw(120))
    val mu = 200L; val slack = 15L; val thresh = 900L
    val df = vals.zipWithIndex.map { case (v, d) => ("s", d, v) }
      .toDF("g", "d", "c")
    val out = Stats.cusumFixed(df, col("g"), col("d"), col("c"),
      mu, slack, thresh).orderBy(col("day")).collect()
    var sp = 0L; var sn = 0L
    vals.zipWithIndex.foreach { case (x, i) =>
      sp = math.max(0L, sp + x - mu - slack)
      sn = math.max(0L, sn - (x - mu + slack))
      assert(out(i).getAs[Double]("s_pos") == sp.toDouble, s"s_pos @$i")
      assert(out(i).getAs[Double]("s_neg") == sn.toDouble, s"s_neg @$i")
      assert(out(i).getAs[Boolean]("alarm_up") == (sp > thresh))
      assert(out(i).getAs[Boolean]("alarm_down") == (sn > thresh))
    }
  }

  test("cohenKappa matches the counted confusion-matrix formula") {
    val labels = Vector("a", "b", "c", "d")
    val rows = (0 until 1000).map { _ =>
      val g = labels(draw(4))
      val p = if (draw(10) < 6) g else labels(draw(4))
      (g, p)
    }
    val n = rows.size.toLong
    val agree = rows.count { case (g, p) => g == p }.toLong
    val ga = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val pb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pe = labels.map(l =>
      BigInt(ga.getOrElse(l, 0L)) * BigInt(pb.getOrElse(l, 0L))).sum
    val expect = (BigInt(n) * agree - pe).toDouble /
      (BigInt(n) * n - pe).toDouble

    val r = Stats.cohenKappa(rows.toDF("g", "p"), col("g"), col("p"))
      .collect().head
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("n_agree") == agree)
    assert(r.getAs[String]("pe_num") == pe.toString)
    assert(math.abs(r.getAs[Double]("kappa") - expect) < 1e-12)
  }

  test("spearman matches the in-memory rank formula with tie-break by id") {
    val rows = (0 until 300).map(i =>
      ("g", i.toLong, draw(40).toDouble, draw(40).toLong))
    val ra = rows.sortBy { case (_, id, a, _) => (a, id) }
      .zipWithIndex.map { case ((_, id, _, _), r) => id -> (r + 1L) }.toMap
    val rb = rows.sortBy { case (_, id, _, b) => (b, id) }
      .zipWithIndex.map { case ((_, id, _, _), r) => id -> (r + 1L) }.toMap
    val d2 = rows.map { case (_, id, _, _) =>
      val d = ra(id) - rb(id); d * d
    }.sum
    val nL = rows.size.toLong
    val expect = 1.0 - 6.0 * d2.toDouble / (nL * (nL * nL - 1)).toDouble

    val r = Stats.spearman(rows.toDF("grp", "id", "a", "b"),
      col("grp"), col("id"), col("a"), col("b")).collect().head
    assert(r.getAs[Long]("d2_sum") == d2)
    assert(r.getAs[Double]("rho") == expect)
  }
}
