package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering — the
  * storage-side lever for 100 TB scans that [[graft.sinks.Bucketing]]'s
  * hash buckets can't provide. Hash bucketing co-locates equal keys for
  * JOINS; Z-ordering co-locates NEARBY (a, b) pairs in one dimension so
  * a range/point predicate on EITHER column touches few files: sorting
  * by the interleaved bits makes every contiguous file span cover a
  * small aligned rectangle of the (a, b) grid, so parquet min/max
  * footer stats prune on both columns at once. (Same idea Delta/Iceberg
  * expose as OPTIMIZE ZORDER BY; here it is one expression + one
  * repartitionByRange, nothing engine-specific.)
  */
object Layout {

  /** Morton (bit-interleaved) code of two non-negative ints using the
    * low `bits` bits of each: bit i of `a` lands at z-bit 2i, bit i of
    * `b` at 2i+1. Pure integer bit math — deterministic in any engine;
    * the DuckDB twin is
    * `list_sum(list_transform(range(0, bits), i ->
    *    (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1))))`.
    * Inputs must fit in `bits` bits (callers mod/scale first) — values
    * beyond that would alias onto the same code silently, so the
    * expression floors at the contract instead: pass reduced values.
    */
  def morton(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    // statically unrolled (bits is a plan-time constant): 2·bits codegen'd
    // shift-mask-shift terms, no higher-order lambda interpretation
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i) +
      shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order-cluster `df` on `(a, b)`: range-partition by the Morton
    * code into `partitions` spans, sort within each. Written as-is,
    * every output file covers one contiguous z-range ≈ one small
    * rectangle of the key grid — the property the LayoutSpec measures
    * (per-partition bounding boxes ≪ the global extent). The Morton
    * column rides along as `zcol` for inspection/stats; drop it at the
    * write edge.
    *
    * Scale shape: one range exchange (sampled bounds, same cost class
    * as any global sort) — no driver-side data, no skew sensitivity
    * beyond range partitioning's own sampling.
    */
  def zorder(df: DataFrame, a: Column, b: Column, bits: Int,
             partitions: Int, zcol: String = "__z"): DataFrame =
    df.withColumn(zcol, morton(a, b, bits))
      .repartitionByRange(partitions, col(zcol))
      .sortWithinPartitions(col(zcol))

  /** Per-file min/max footer stats a layout WOULD produce: rows sorted
    * by `(sortKey, tieBreak…)`, cut into files of `fileRows`, each file
    * reporting min/max of every `stats` column — the exact inputs
    * parquet row-group pruning works from, so layouts can be compared
    * analytically ([[probeHitStats]]) before rewriting a single byte.
    *
    * The global rank that cuts files is computed WITHOUT a global
    * window (which would collapse to one partition at 100 TB): the
    * house decomposed-prefix-sum pattern — per-`bucket` counts rolled
    * into bucket offsets (one tiny window over #buckets rows), plus a
    * bucket-partitioned local row_number. Exactness contract: `bucket`
    * must be a monotone coarsening of `sortKey` (e.g. `sortKey` itself,
    * or `z >> 8`), so bucket order refines to the global order.
    * In a real write path the files come from
    * `repartitionByRange.sortWithinPartitions` and the stats from
    * footers; this analytic mirrors that cut deterministically.
    */
  def fileMinMax(df: DataFrame, sortKey: Column, tieBreak: Seq[Column],
                 bucket: Column, fileRows: Long,
                 stats: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      (sortKey.as("__sk") +: bucket.as("__bk") +:
        tieBreak.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }) ++
        stats.map { case (n, c) => c.as(n) }: _*)
    val offsets = base.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(graft.functions.BoundedWindow.orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bk"), col("__off"))
    val local = Window.partitionBy(col("__bk"))
      .orderBy(col("__sk").asc +: tieBreak.indices.map(i => col(s"__t$i").asc): _*)
    val ranked = base.join(broadcast(offsets), "__bk")
      .withColumn("__rank", col("__off") + row_number().over(local))
      // integral DIV, not IEEE '/': keeps the cut integer-exact at any
      // row count (the oracle's `//`), per the house discipline
      .withColumn("file_id", expr(s"(__rank - 1) DIV $fileRows"))
    ranked.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        stats.flatMap { case (n, _) =>
          Seq(min(col(n)).as(s"min_$n"), max(col(n)).as(s"max_$n"))
        }: _*)
  }

  /** Expected scan cost of a point-predicate workload against a file
    * layout: for each probe value, a file must be read iff
    * `min ≤ v ≤ max` (parquet footer pruning semantics). One broadcast
    * cross of the (tiny) file-stats frame with the (tiny) probe spine,
    * aggregated to a single row: `n_files, n_probes, files_hit,
    * scan_fraction` (= files_hit / (n_files·n_probes), the average
    * fraction of the table a point query reads under this layout).
    */
  def probeHitStats(files: DataFrame, probes: DataFrame,
                    minCol: String, maxCol: String,
                    probeCol: String): DataFrame =
    files.crossJoin(broadcast(probes))
      .agg(
        countDistinct(col("file_id")).as("n_files"),
        countDistinct(col(probeCol)).as("n_probes"),
        sum(when(col(probeCol).between(col(minCol), col(maxCol)), 1L)
          .otherwise(0L)).as("files_hit"))
      .withColumn("scan_fraction",
        col("files_hit").cast("double") /
          (col("n_files") * col("n_probes")).cast("double"))

  /** [[probeHitStats]] for SEVERAL probe keys in one pass — one row per
    * key, from a single cross + aggregation over the file-stats frame,
    * so an N-key workload audit charges each layout's [[fileMinMax]]
    * subtree once instead of N times (Catalyst does not CSE sibling
    * union branches in the static plan). Each key `k` reads its bounds
    * from `min_k`/`max_k` — the [[fileMinMax]] naming contract.
    */
  def probeHitStatsMulti(files: DataFrame, probes: DataFrame,
                         keys: Seq[String], probeCol: String): DataFrame = {
    require(keys.nonEmpty, "need at least one probe key")
    // keys are interpolated into a stack() SQL string below — restrict to
    // plain identifiers so a quote/metacharacter can neither break the
    // parse nor inject (the Column-based APIs elsewhere need no such rule)
    keys.foreach(k => require(k.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"probe key must be a plain identifier: '$k'"))
    val hits = keys.map(k =>
      sum(when(col(probeCol).between(col(s"min_$k"), col(s"max_$k")), 1L)
        .otherwise(0L)).as(s"hit_$k"))
    val stackExpr = "stack(" + keys.size + ", " +
      keys.map(k => s"'$k', hit_$k").mkString(", ") + ") AS (probe_key, files_hit)"
    files.crossJoin(broadcast(probes))
      .agg(countDistinct(col("file_id")).as("n_files"),
           countDistinct(col(probeCol)).as("n_probes") +: hits: _*)
      .select(col("n_files"), col("n_probes"), expr(stackExpr))
      .withColumn("scan_fraction",
        col("files_hit").cast("double") /
          (col("n_files") * col("n_probes")).cast("double"))
      .select(col("probe_key"), col("n_files"), col("n_probes"),
              col("files_hit"), col("scan_fraction"))
  }
}
