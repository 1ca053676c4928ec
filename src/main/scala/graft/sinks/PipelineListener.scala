package graft.sinks

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** K5/K6 + the §2C telemetry surface: a StreamingQueryListener that turns
  * per-micro-batch progress into the counters/gauges the reference's
  * Prometheus alerts consume (throughput, batch duration for the p95 SLO,
  * input backlog standing in for queue depth). Snapshots are kept
  * in-memory for tests/inspection and logged; a production deployment
  * would forward them to its metrics sink from the same hook.
  */
final class PipelineListener(maxSnapshots: Int = 10000)
    extends StreamingQueryListener {

  final case class BatchSnapshot(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      batchDurationMs: Long,
      observed: Map[String, Map[String, Double]] = Map.empty)

  private val snaps =
    new java.util.concurrent.ConcurrentLinkedQueue[BatchSnapshot]

  def snapshots: Seq[BatchSnapshot] = {
    val it = snaps.iterator()
    val b = Seq.newBuilder[BatchSnapshot]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Rolling p95 of batch durations — the route-processing-time SLO
    * (alerts.yaml:51-60) computed driver-side over listener snapshots.
    */
  def p95BatchDurationMs: Option[Long] = {
    val ds = snapshots.map(_.batchDurationMs).sorted
    if (ds.isEmpty) None
    else Some(ds(math.min(ds.length - 1, (0.95 * (ds.length - 1)).round.toInt)))
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    // numeric observed metrics only, widened to double (a long-only view
    // would silently truncate fractional metrics); non-numeric metrics
    // are skipped, not coerced to a fake zero
    val observed = {
      val it = p.observedMetrics.entrySet().iterator()
      val b = Map.newBuilder[String, Map[String, Double]]
      while (it.hasNext) {
        val e = it.next()
        val row = e.getValue
        b += e.getKey -> row.schema.fieldNames.zipWithIndex.flatMap {
          case (f, i) => row.get(i) match {
            case n: Number => Some(f -> n.doubleValue)
            case _ => None
          }
        }.toMap
      }
      b.result()
    }
    val snap = BatchSnapshot(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.inputRowsPerSecond match { case d if d.isNaN => 0d; case d => d },
      p.batchDuration,
      observed)
    snaps.add(snap)
    // bounded history: a continuous query would otherwise grow the
    // snapshot queue without limit (and the p95 sort with it)
    while (snaps.size > maxSnapshots) snaps.poll()
    org.apache.logging.log4j.LogManager.getLogger(getClass)
      .info(s"pipeline batch: $snap")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
