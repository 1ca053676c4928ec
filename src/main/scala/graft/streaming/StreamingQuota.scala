package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, MapState}

/** Streaming per-source daily byte-quota admission — the online
  * enforcement twin of the reference's broker-side size limits
  * (`maxSizeBytes` per address, `k8s/amq-broker.yaml:81`; bucket-quota
  * alerting, `k8s/monitoring/alerts.yaml:141-151`). Where the reference
  * pages or alerts AFTER a queue/bucket fills, this decides per file,
  * online, whether the transfer fits its source system's daily budget —
  * the gate a 100 TB/day ingest runs ahead of the expensive
  * enrichment/storage stages rather than behind them.
  *
  * Built on `transformWithState` (the Spark 4 arbitrary-state API,
  * RocksDB-backed) rather than `flatMapGroupsWithState`: the per-key
  * ledger is a composite — one `MapState[day → bytes admitted]` — and
  * MapState reads/writes touch ONLY the day being updated, not a
  * serialized whole-ledger blob per event, which is the point of the
  * newer API at scale (per-field state access + native TTL support).
  *
  * Semantics:
  *  - Budget is per (sourceSystem, UTC event-time day): event time, not
  *    arrival time, decides which day a file is charged to.
  *  - Within a micro-batch, rows are charged in (eventTime, fileName)
  *    order — a total order, so admission does not depend on shuffle
  *    arrival order, and replaying the SAME batches (Spark's
  *    exactly-once recovery contract) reaches identical decisions.
  *    Determinism is per-batch, not global: cross-batch arrival order
  *    is an input to the decision — an early-eventTime file that only
  *    ARRIVES after a later batch spent the day's budget is denied,
  *    where a replay that batches it earlier would admit it.
  *  - A file is admitted iff its whole size fits the remaining budget
  *    (no partial admission); denied files consume NO budget, so one
  *    oversized file cannot starve later small ones.
  *  - State bound is structural: each key retains at most `retainDays`
  *    day entries (oldest ISO days evicted after each batch — ISO-8601
  *    sorts chronologically). An event older than every retained day
  *    re-opens a day only if a slot frees up — the trade documented for
  *    replays deeper than the retention horizon.
  *
  * Scale shape: one shuffle on sourceSystem (the natural partitioning —
  * quota is a per-key invariant, so the ledger for a key lives on
  * exactly one task), state per key is ≤ retainDays (day, long) entries
  * in RocksDB — thousands of source systems cost megabytes. Emission is
  * one decision row per input row (Append mode, no retraction).
  */
object StreamingQuota {

  final case class FileEvent(sourceSystem: String, fileName: String,
                             sizeBytes: Long, eventTime: Timestamp)

  /** One admission decision per input file. `usedBytes` is the day's
    * admitted total AFTER this decision — monotonic per (key, day), so
    * the current ledger view is max-by-usedBytes.
    */
  final case class Admission(sourceSystem: String, day: String,
                             fileName: String, sizeBytes: Long,
                             admitted: Boolean, usedBytes: Long)

  private[streaming] def utcDay(ts: Timestamp): String =
    Instant.ofEpochMilli(ts.getTime).atZone(ZoneOffset.UTC)
      .toLocalDate.toString

  /** The per-key processor: MapState ledger day → admitted bytes. */
  private final class QuotaProcessor(quotaBytes: Long, retainDays: Int)
      extends StatefulProcessor[String, FileEvent, Admission] {

    @transient private var used: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getMapState[String, Long](
        "used", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[FileEvent],
                                 timers: TimerValues): Iterator[Admission] = {
      val out = Seq.newBuilder[Admission]
      rows.toSeq.sortBy(e => (e.eventTime.getTime, e.fileName)).foreach { e =>
        val day = utcDay(e.eventTime)
        val before =
          if (used.containsKey(day)) used.getValue(day) else 0L
        // overflow-safe: both operands of the subtraction are in
        // [0, quotaBytes], so `quotaBytes - before` cannot wrap — the
        // additive form (before + sizeBytes <= quota) would admit an
        // adversarially huge sizeBytes via Long overflow
        val fits = e.sizeBytes >= 0 && e.sizeBytes <= quotaBytes - before
        if (fits) used.updateValue(day, before + e.sizeBytes)
        out += Admission(key, day, e.fileName, e.sizeBytes, fits,
          if (fits) before + e.sizeBytes else before)
      }
      // structural state bound: keep only the newest retainDays days
      val days = used.keys().toSeq.sorted
      if (days.length > retainDays)
        days.dropRight(retainDays).foreach(used.removeKey)
      out.result().iterator
    }
  }

  /** Admission decisions for `events` under a per-(sourceSystem, UTC
    * day) budget of `quotaBytes`. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the only provider backing
    * transformWithState.
    */
  def enforce(events: Dataset[FileEvent], quotaBytes: Long,
              retainDays: Int = 7): Dataset[Admission] = {
    require(quotaBytes > 0, "quotaBytes must be > 0")
    require(retainDays >= 1, "retainDays must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[Admission] = Encoders.product[Admission]
    events
      .filter(col("sourceSystem").isNotNull && col("eventTime").isNotNull)
      .groupByKey(_.sourceSystem)
      .transformWithState(new QuotaProcessor(quotaBytes, retainDays),
        TimeMode.None(), OutputMode.Append())
  }
}
