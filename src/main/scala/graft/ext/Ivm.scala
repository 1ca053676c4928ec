package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN views — the delta-join rule
  * (Blakeley et al., "Efficiently Updating Materialized Views", SIGMOD
  * 1986; the same algebra DBSP/Materialize incrementalize):
  *
  * {{{ (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB }}}
  *
  * so a materialized `A⋈B` is maintained under insert-only deltas by
  * computing only the three delta legs and appending ([[deltaJoin]]),
  * and under general deletes/updates by the signed-multiplicity form
  * ([[deltaJoinSigned]]). [[Cdc]] covers the
  * upsert/delete log side; this covers the 100 TB ETL contract for
  * joins: the stored view and the BIG stored sides are never re-joined
  * against each other — each leg joins a (small) delta against one side.
  *
  * Scale shape: both big-side legs put the DELTA on the build side with
  * an explicit `broadcast()` hint, so `A` and `B` (the 100 TB
  * operands) are scanned once each and never shuffled; `ΔA⋈ΔB` is a
  * broadcast join of two deltas. When a delta outgrows broadcast the
  * hint degrades to one shuffled join whose probe side is still a
  * single scan — remove the hint rather than pre-shuffling history.
  * No leg double-counts: the legs are pairwise disjoint because the
  * old/delta split of each input is disjoint.
  */
object Ivm {

  /** The three delta legs of the join-view maintenance rule, tagged by
    * provenance in a `leg` column (`delta_a` / `delta_b` / `delta_ab`).
    * Appending these to the stored `aOld ⋈ bOld` view yields exactly
    * `(aOld ∪ aDelta) ⋈ (bOld ∪ bDelta)` — proven against the
    * full-recompute oracle in q165 and IvmSpec.
    *
    * `keys` are equi-join USING columns (deduplicated in the output,
    * ANSI USING semantics). Inputs must share a schema side-wise;
    * column sets of A and B must be disjoint apart from `keys`.
    */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame = {
    val legA  = broadcast(aDelta).join(bOld, keys)
      .withColumn("leg", lit("delta_a"))
    val legB  = aOld.join(broadcast(bDelta), keys)
      .withColumn("leg", lit("delta_b"))
    val legAB = aDelta.join(broadcast(bDelta), keys)
      .withColumn("leg", lit("delta_ab"))
    legA.unionByName(legB).unionByName(legAB)
  }

  /** Full maintained view: the stored `init` (yesterday's materialized
    * `aOld ⋈ bOld`, here recomputed only because the demo has no
    * storage layer — a production run reads it back) plus the delta
    * legs. `init` rows are tagged `leg = "init"`.
    */
  def maintainJoin(aOld: DataFrame, aDelta: DataFrame,
                   bOld: DataFrame, bDelta: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val init = aOld.join(bOld, keys).withColumn("leg", lit("init"))
    init.unionByName(deltaJoin(aOld, aDelta, bOld, bDelta, keys))
  }

  /** The GENERAL Blakeley rule — deltas carry a signed multiplicity
    * column `mult` (+1 insert, −1 retract), so updates and deletes
    * maintain the view too, not just appends. Join is bilinear over
    * multiset sum, so the three legs are the insert-only ones with
    * multiplicities carried through (and MULTIPLIED on the ΔA⋈ΔB leg:
    * retract×retract = +1, which is exactly what cancels the two −1
    * single-side legs when a row disappears from BOTH inputs — the
    * net for such a view row is 1−1−1+1 = 0). Same scale shape as
    * [[deltaJoin]]: deltas broadcast, stored sides scanned once.
    *
    * Caller contract: a retraction must match a stored row exactly
    * (column-for-column) — retracting a never-stored row leaves net
    * −1 debris in the unconsolidated stream. Retractions of rows
    * whose key matches nothing on the other side are harmless no-ops
    * (the join emits nothing), exactly like their inserts would be.
    */
  def deltaJoinSigned(aOld: DataFrame, aDelta: DataFrame,
                      bOld: DataFrame, bDelta: DataFrame,
                      keys: Seq[String], mult: String = "mult"): DataFrame = {
    val legA = broadcast(aDelta).join(bOld, keys)
      .withColumn("leg", lit("delta_a"))
    val legB = aOld.join(broadcast(bDelta), keys)
      .withColumn("leg", lit("delta_b"))
    val legAB = aDelta.withColumnRenamed(mult, "__ma")
      .join(broadcast(bDelta.withColumnRenamed(mult, "__mb")), keys)
      .withColumn(mult, col("__ma") * col("__mb"))
      .drop("__ma", "__mb")
      .withColumn("leg", lit("delta_ab"))
    legA.unionByName(legB, allowMissingColumns = false)
      .unionByName(legAB)
  }

  /** Signed maintained view: stored `init` at multiplicity +1 plus the
    * signed delta legs — an APPEND-ONLY stream (the 100 TB write path:
    * retractions land as rows, nothing is updated in place). Feed it
    * to [[consolidate]] at read/compaction time.
    */
  def maintainJoinSigned(aOld: DataFrame, aDelta: DataFrame,
                         bOld: DataFrame, bDelta: DataFrame,
                         keys: Seq[String], mult: String = "mult")
      : DataFrame = {
    val init = aOld.join(bOld, keys)
      .withColumn(mult, lit(1L)).withColumn("leg", lit("init"))
    init.unionByName(
      deltaJoinSigned(aOld, aDelta, bOld, bDelta, keys, mult))
  }

  /** Compaction of a signed view stream: net multiplicity per distinct
    * row (provenance `leg` does not survive netting), zero-net rows
    * dropped. One hash aggregation over the view columns — run at
    * compaction cadence, not per delta batch (the q135 applyLog
    * discipline applied to join views).
    */
  def consolidate(view: DataFrame, mult: String = "mult"): DataFrame = {
    val rowCols = view.columns.filter(c => c != mult && c != "leg")
    view.groupBy(rowCols.map(col): _*)
      .agg(sum(col(mult)).as(mult))
      .where(col(mult) =!= 0)
  }

  // ------------------------------------------------- aggregate views

  /** Stored-state shape for an incrementally-maintained SUM/COUNT
    * rollup: per-key `(pn, ps)` partials over an exact-typed measure
    * (decimal/long — the q81 re-aggregatability contract; float sums
    * are not exactly mergeable). `pn` counts ROWS (null measures
    * count, as COUNT(*) does), `ps` ignores nulls, as SUM does.
    */
  def aggPartial(rows: DataFrame, keys: Seq[Column], x: Column): DataFrame =
    rows.groupBy(keys: _*)
      .agg(count(lit(1)).as("pn"),
           sum(x.cast("decimal(24,2)")).cast("decimal(24,2)").as("ps"))

  /** The delta batch's SIGNED partial: each delta row carries ±1
    * `mult`, so count becomes Σ mult and sum becomes Σ x·mult — a
    * retraction subtracts exactly what its insert added. The aggregate
    * companion of [[deltaJoinSigned]] (q81 is the insert-only form).
    */
  def signedAggPartial(delta: DataFrame, keys: Seq[Column], x: Column,
                       mult: Column): DataFrame =
    delta.groupBy(keys: _*)
      .agg(sum(mult).cast("long").as("pn"),
           sum(x.cast("decimal(24,2)") * mult).cast("decimal(24,2)")
             .as("ps"))

  /** Fold a delta partial into yesterday's stored partials: one
    * aggregation over `stored ∪ deltaPartial` — the stored state is
    * scanned once and NEVER joined against the delta (group keys that
    * the delta does not touch stream straight through the merge).
    * Groups whose net count reaches zero vanish from the view; under
    * the caller contract (retract only stored rows) a negative net is
    * impossible and a zero net implies a zero net sum.
    */
  def mergeAggPartials(stored: DataFrame, deltaPartial: DataFrame,
                       keys: Seq[String]): DataFrame =
    stored.unionByName(deltaPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("pn")).cast("long").as("pn"),
           sum(col("ps")).cast("decimal(24,2)").as("ps"))
      .where(col("pn") > 0)
}
