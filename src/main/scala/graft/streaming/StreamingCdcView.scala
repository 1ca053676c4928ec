package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, ValueState}

/** Streaming changelog materialization — the online twin of
  * [[graft.ext.Cdc.applyLog]] (q135): an op-log of upserts and deletes
  * keyed by entity, folded continuously into a latest-state view. This
  * is the operator that keeps a serving table current while the batch
  * form rebuilds it from scratch — the same split as q64's ANN build
  * vs q127's incremental maintenance, applied to CDC. The reference's
  * DLQ reprocess leg replays logged messages in arrival order
  * (`camel/dlq-handler.yaml:16-33`); this view is what such a replay
  * converges onto, and the seq discipline below is why replaying is
  * idempotent.
  *
  * Semantics (matching the batch operator exactly):
  *  - An op's position in the log is its (seqTs, seqId) pair — a TOTAL
  *    order within a key (a real CDC feed's (commit_ts, lsn)). The view
  *    holds the highest-seq op seen so far; an arriving op with
  *    seq ≤ current is STALE and folds into nothing but the op count —
  *    out-of-order delivery and replays cannot regress state.
  *  - op "d" is a delete: the key's view row becomes a tombstone
  *    (live = false) but retains its seq, so a stale upsert arriving
  *    after the delete cannot resurrect the row. Any other op is an
  *    upsert carrying the new value.
  *  - `nOps` counts every op ever folded for the key (stale included),
  *    mirroring q135's n_ops = all log entries — so after the same log,
  *    batch and stream agree on every column.
  *
  * Emission: ONE ViewChange row per key per micro-batch that touched
  * it — the final state after the batch's ops, Append mode (a
  * downstream `foreachBatch` upserting into a serving store applies
  * rows keyed by `key`, last-emission-wins; max-by (ts, opId) of the
  * emitted stream IS the view). Per-key state is one fixed-size record
  * in a ValueState — entity count × ~40 bytes, RocksDB-backed; one
  * shuffle on key.
  */
object StreamingCdcView {

  /** One changelog entry. `op` = "d" deletes; anything else upserts. */
  final case class CdcOp(key: Long, seqTs: Timestamp, seqId: Long,
                         op: String, value: Double)

  /** Post-batch view state of one key. `live` = false is a tombstone
    * (key currently deleted); `ts`/`opId` are the seq of the op that
    * produced this state; `nOps` counts all ops folded so far.
    */
  final case class ViewChange(key: Long, ts: Timestamp, opId: Long,
                              value: Double, live: Boolean, nOps: Long)

  private[streaming] final case class ViewState(tsMs: Long, opId: Long, value: Double,
                                     live: Boolean, nOps: Long)

  private final class CdcProcessor
      extends StatefulProcessor[Long, CdcOp, ViewChange] {

    @transient private var cur: ValueState[ViewState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[ViewState]("view",
        Encoders.product[ViewState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcOp],
                                 timers: TimerValues): Iterator[ViewChange] = {
      var st =
        if (cur.exists()) cur.get()
        else ViewState(Long.MinValue, Long.MinValue, 0.0, live = false, 0L)
      // batch ops in seq order: the fold is then order-insensitive to
      // shuffle arrival, and replaying the same batch from a checkpoint
      // reaches the identical state (exactly-once recovery contract)
      rows.toSeq.sortBy(o => (o.seqTs.getTime, o.seqId)).foreach { o =>
        val newer = o.seqTs.getTime > st.tsMs ||
          (o.seqTs.getTime == st.tsMs && o.seqId > st.opId)
        st =
          if (!newer) st.copy(nOps = st.nOps + 1) // stale: count only
          else if (o.op == "d")
            ViewState(o.seqTs.getTime, o.seqId, 0.0, live = false,
              st.nOps + 1)
          else ViewState(o.seqTs.getTime, o.seqId, o.value, live = true,
            st.nOps + 1)
      }
      cur.update(st)
      Iterator.single(ViewChange(key, new Timestamp(st.tsMs), st.opId,
        st.value, st.live, st.nOps))
    }
  }

  /** Materialize `log` into a change stream of per-key view states.
    * Requires the RocksDB state store provider (transformWithState's
    * only backend).
    */
  def materialize(log: Dataset[CdcOp]): Dataset[ViewChange] = {
    val spark = log.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[ViewChange] = Encoders.product[ViewChange]
    log.filter(col("seqTs").isNotNull)
      .groupByKey(_.key)
      .transformWithState(new CdcProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
