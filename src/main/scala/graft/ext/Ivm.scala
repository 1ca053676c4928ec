package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN views — the delta-join rule
  * (Blakeley et al., "Efficiently Updating Materialized Views", SIGMOD
  * 1986; the same algebra DBSP/Materialize incrementalize):
  *
  * {{{ (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB }}}
  *
  * so a materialized `A⋈B` is maintained under insert-only deltas by
  * computing only the three delta legs and appending. [[Cdc]] covers the
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
}
