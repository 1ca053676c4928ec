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
}
