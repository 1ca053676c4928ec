package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns

/** Mergeable count-min sketch store — the frequency member of the
  * sketch-store family next to q63's HLL (distinct counts) and q198's
  * log-linear histogram (quantiles): per-shard depth×width count
  * matrices whose merge is CELL-WISE ADDITION, so a store of per-shard
  * (or per-day) sketches answers any shard union exactly as if the
  * union had been sketched directly — CMS is linear in its input, and
  * the q215 gate pins that identity cell-by-cell rather than assuming
  * it. Point estimates are `min` over the depth rows; the one-sided
  * guarantee (estimate ≥ true count, always) is structural and
  * TRUE-pinned; the overshoot is bounded by εN with ε = e/width in
  * expectation per row.
  *
  * Hashing is the house [[graft.functions.ColumnFns.poly_hash]]
  * (h·31+byte mod 1e9+7 — a native codegen'd expression) composed with
  * depth-many affine maps (h·aᵢ+bᵢ mod p mod width); every step stays
  * far below Long overflow (h < 2³⁰, aᵢ < 2¹⁰), which matters twice:
  * ANSI mode would fail a wrapping multiply, and the DuckDB oracle
  * replays the identical integer arithmetic (the polynomial as a
  * Σ byteₖ·31^(L−1−k) power sum with interpolated 31^j mod p
  * constants).
  *
  * Scale shape: one explode(depth) over the token stream, one hash
  * aggregation keyed (shard, row, col) — cardinality ≤ shards·d·w
  * regardless of corpus size — and the store table IS the sketch
  * (sparse cells; absent = 0). No driver-side state, no collect.
  */
object CmsStore {

  val P = 1000000007L
  val Depth = 4
  val Width = 1024

  /** Affine row-hash constants (odd, < 2¹⁰ — see overflow note). */
  val A = Array(31L, 271L, 631L, 877L)
  val B = Array(17L, 193L, 409L, 751L)

  /** 31^j mod p for the oracle's power-sum replay of poly_hash. */
  def pow31(maxLen: Int): Array[Long] = {
    val out = new Array[Long](maxLen)
    out(0) = 1L
    var j = 1
    while (j < maxLen) { out(j) = out(j - 1) * 31 % P; j += 1 }
    out
  }

  /** Whitespace tokens under the house convention (single-space
    * corpus), capped at 63 UTF-8 bytes so the oracle's unrolled
    * power sum stays bounded.
    */
  def tokens(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("source"), explode(split(text, " ")).as("word"))
      .filter(length(col("word")) > 0 && octet_length(col("word")) < 64)

  /** (shard, row, col) → cnt sparse cell table over `words(shard,
    * word)` — one sketch per shard; merge = GROUP BY (row, col) SUM.
    */
  def sketchCells(words: DataFrame, shard: Column): DataFrame = {
    val h = ColumnFns.poly_hash(col("word"))
    words
      .select(shard.as("shard"),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row"),
            ((h * A(i) + B(i)) % P % Width).cast("int").as("col"))): _*))
          .as("rc"))
      .select(col("shard"), col("rc.row").as("row"), col("rc.col").as("col"))
      .groupBy(col("shard"), col("row"), col("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes(word)` against a (possibly merged)
    * cell table: min over rows of the addressed cells. Absent cells
    * would mean count 0 — a probe that was sketched always finds its
    * d cells, so the inner join is exact for sketched keys.
    */
  def estimate(cells: DataFrame, probes: DataFrame): DataFrame = {
    val h = ColumnFns.poly_hash(col("word"))
    val addressed = probes
      .select(col("word"),
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("row"),
            ((h * A(i) + B(i)) % P % Width).cast("int").as("col"))): _*))
          .as("rc"))
      .select(col("word"), col("rc.row").as("row"), col("rc.col").as("col"))
    addressed.join(cells, Seq("row", "col"))
      .groupBy(col("word"))
      .agg(min(col("cnt")).as("est_cnt"))
  }
}
