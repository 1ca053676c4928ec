package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig, TimerValues, MapState}

import graft.ext.DocText

/** Streaming extraction-coverage census — q243's online twin: the
  * per-format ok-rate and failure-REASON histogram a 100 TB ingest
  * reads first, maintained continuously over the arriving corpus
  * instead of recomputed per audit run. Every record probes through
  * [[graft.ext.DocText.probeOne]] — the SAME dispatch copy the batch
  * census uses, so the two censuses cannot drift — then reason counts
  * accumulate in keyed state and each touched format re-emits its
  * full histogram per micro-batch (Append; latest emission is the
  * current census).
  *
  * State bound (structural, stream-length independent): one MapState
  * entry per (format, reason) SEEN — the reason vocabulary is fixed
  * and documented (q243's ~22 codes + ok), so state never exceeds
  * formats × vocabulary regardless of how many documents pass.
  *
  * Scale shape: probe is map-side (the expensive part — full parser
  * dispatch per record); ONE shuffle on the format key (#keys =
  * #formats, single digits); O(vocabulary) state and emission work
  * per key per batch.
  */
object StreamingExtractCensus {

  /** One arriving document: id + raw bytes. */
  final case class DocBytes(media_id: Long, media: Array[Byte])

  /** One format's reason row after a batch: count of this reason and
    * the format's running totals (ok + all).
    */
  final case class CensusRow(format: String, reason: String, n: Long,
                             format_ok: Long, format_total: Long)

  private final class CensusProcessor
      extends StatefulProcessor[String, DocText.ExtractProbe, CensusRow] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
                                 rows: Iterator[DocText.ExtractProbe],
                                 timers: TimerValues)
        : Iterator[CensusRow] = {
      rows.foreach { r =>
        val cur =
          if (counts.containsKey(r.reason)) counts.getValue(r.reason)
          else 0L
        counts.updateValue(r.reason, cur + 1)
      }
      val all = counts.iterator().toMap
      val total = all.valuesIterator.sum
      val okN = all.getOrElse("ok", 0L)
      all.iterator.map { case (reason, n) =>
        CensusRow(key, reason, n, okN, total)
      }
    }
  }

  /** Census over an arriving document stream; per touched format per
    * micro-batch, one row per reason seen so far. Requires the
    * RocksDB state store provider.
    */
  def census(docs: Dataset[DocBytes]): Dataset[CensusRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[CensusRow] = Encoders.product[CensusRow]
    docs.map(d => DocText.probeOne(d.media_id, d.media))
      .groupByKey(_.format)
      .transformWithState(new CensusProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
