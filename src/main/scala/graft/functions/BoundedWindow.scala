package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{coalesce, hash, lit, pmod}

/** Single-partition window over a STRUCTURALLY BOUNDED frame — the
  * documented alternative to a bare `Window.orderBy(...)`.
  *
  * Several operators run a global running-sum/rank over a frame whose
  * row count is bounded by construction (a #buckets offset table, a
  * #reps bootstrap summary, a #days calendar spine) — never the
  * corpus. Semantically that IS a single-partition window, but a bare
  * unpartitioned spec makes `WindowExec` log "No Partition Defined for
  * Window operation" on every execution: ~1,000 warnings per test run
  * (VERDICT r13 item 6), burying any ACCIDENTAL unpartitioned window —
  * the real regression the warning exists to flag — in noise from
  * sites that are safe by design.
  *
  * This spec partitions by a key that is constant in VALUE (so results
  * are bit-identical to the unpartitioned spec — all rows share one
  * partition) but NOT foldable (so Catalyst's
  * `EliminateWindowPartitions` cannot strip it back to an empty
  * partitionSpec): `pmod(hash(firstOrderingCol), 1)`. The hash is
  * deterministic and never null, and pmod-by-one pins the value at 0.
  * `hash(c) * 0` does NOT survive — once CollapseProject inlines the
  * projected key into the Window node, the optimizer simplifies the
  * zero-multiply and the spec is empty again (verified on 4.1.2);
  * no rule touches `pmod(x, 1)`. Execution cost is one codegen'd
  * hash+pmod per row over an already-bounded frame.
  *
  * Call-site rule: put every window column sharing one bounded spec in
  * a SINGLE select — each `.over(...)` in a separate `withColumn`
  * extracts its own `_w0` partition-key attribute, and Window nodes
  * keyed on different attributes no longer collapse into one pass.
  *
  * Two guards keep this honest:
  *   - every call site's scaladoc states its row bound (the call is an
  *     assertion of boundedness, not a silencer);
  *   - [[graft.PlanAudit]] censuses truly-unpartitioned WindowExec
  *     nodes per query and PlanCensusSpec gates the registry at ZERO —
  *     a future Spark that folds the key (or a new bare
  *     `Window.orderBy`) fails `sbt test` structurally, which a log
  *     line never could.
  */
object BoundedWindow {

  /** The constant-valued, non-foldable partition key. `anchor` may
    * carry a SortOrder wrapper (.asc / .desc); hash() needs the bare
    * value node underneath — unwrapped at the ColumnNode level via the
    * bridge shim (the catalyst view of a Column is a lazy
    * ColumnNodeExpression, so a catalyst-SortOrder match would never
    * fire).
    */
  private def constKey(anchor: Column): Column =
    coalesce(pmod(hash(org.apache.spark.sql.graft.bridge.unsort(anchor)),
      lit(1)), lit(0))

  /** Ordered single-partition spec for a bounded frame; `cols` must be
    * non-empty.
    */
  def orderBy(cols: Column*): WindowSpec = {
    require(cols.nonEmpty, "boundedWindow needs at least one ordering column")
    Window.partitionBy(constKey(cols.head)).orderBy(cols: _*)
  }

  /** Unordered whole-frame spec for a bounded frame — the
    * share-of-total shape (`sum(x).over(all frame)`); `anchor` is any
    * input column, used only to form the constant key.
    */
  def all(anchor: Column): WindowSpec =
    Window.partitionBy(constKey(anchor))
}
