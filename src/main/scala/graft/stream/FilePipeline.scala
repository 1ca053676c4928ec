package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.enrich.{BreakerConfig, BreakerRegistry, DoclingClient, RetryPolicy}
import graft.ops.Envelope

/** Typed record flowing through the enrichment stage. The binary body is
  * deliberately ABSENT: it is persisted to `incoming/` before enrichment
  * and the converter fetches it from the object store by key — the same
  * pointer-passing the reference uses (Docling reads from S3,
  * file-pipeline.yaml:129), and the only sane choice at 100 TB (never
  * shuffle 100 MB rows; SURVEY.md §7.4.4).
  */
final case class PipelineRecord(
    fileName: String,
    contentType: String,
    fileSize: Long,
    transferId: String,
    checksum: String,
    correlationId: String,
    eventTime: Timestamp,
    deliveryCount: Int,
    processingDate: String,
    s3IncomingKey: String,
    s3ProcessedKey: String,
    s3FailedKey: String,
    doclingRequest: String)

final case class EnrichedRecord(
    fileName: String,
    contentType: String,
    fileSize: Long,
    transferId: String,
    checksum: String,
    correlationId: String,
    eventTime: Timestamp,
    deliveryCount: Int,
    processingDate: String,
    s3IncomingKey: String,
    s3ProcessedKey: String,
    s3FailedKey: String,
    attempts: Int,
    doclingResult: Option[String],
    error: Option[String])

final case class PipelineConfig(
    retry: RetryPolicy = RetryPolicy(),
    breaker: BreakerConfig = BreakerConfig(),
    breakerName: String = "docling",
    processingTimeMode: Boolean = false,
    /** E4: messages older than this (vs. watermark/max event time) are
      * routed to the expiry branch, mirroring broker message expiry
      * (k8s/amq-broker.yaml:78).
      */
    expiry: Option[String] = None,
    /** Success-path notifications mirror (the reference's declared-but-
      * dead `file-transfer-notifications` address): when true, each
      * processed record also emits a notification object.
      */
    notifications: Boolean = false)

/** The main dataflow (SURVEY.md §3.1), batch-first: every stage is a pure
  * DataFrame/Dataset function; [[runStream]] applies the identical
  * transform per micro-batch via foreachBatch. Checkpoint + deterministic
  * object keys give effective exactly-once — the same idempotence argument
  * the reference relies on (§3.1 step 9).
  */
object FilePipeline {

  /** Envelope-shaped input → validated, keyed, request-carrying records
    * plus the invalid branch. Returns (valid, invalid).
    */
  def prepare(envelope: DataFrame, cfg: PipelineConfig = PipelineConfig())
      : (DataFrame, DataFrame) = {
    val validated = Envelope.withValidation(envelope,
      requireEventTime = !cfg.processingTimeMode)
    val invalid = validated.filter(col("invalidReason").isNotNull)
    val valid = Envelope.withDoclingRequest(
      Envelope.withObjectKeys(
        Envelope.withProcessingDate(
          validated.filter(col("invalidReason").isNull),
          cfg.processingTimeMode)))
    (valid, invalid)
  }

  /** X1+X2+E3: per-partition enrichment with pooled client, executor-local
    * circuit breaker and bounded in-batch retry. Runs on the body-free
    * projection — the only non-codegen stage in the pipeline, kept
    * deliberately narrow (13 small columns).
    */
  def enrich(prepared: DataFrame, client: DoclingClient,
             cfg: PipelineConfig = PipelineConfig()): Dataset[EnrichedRecord] = {
    val spark = prepared.sparkSession
    import spark.implicits._
    val retry = cfg.retry
    val breakerCfg = cfg.breaker
    val breakerName = cfg.breakerName
    prepared.select(
        col("fileName"), col("contentType"), col("fileSize"),
        col("transferId"), col("checksum"), col("correlationId"),
        col("eventTime"), col("deliveryCount"), col("processingDate"),
        col("s3IncomingKey"), col("s3ProcessedKey"), col("s3FailedKey"),
        col("doclingRequest"))
      .as[PipelineRecord]
      .mapPartitions { it =>
        val breaker = BreakerRegistry.get(breakerName, breakerCfg)
        it.map { r =>
          val outcome = retry.run(() => breaker.call(() => client.convert(r.doclingRequest)))
          val (attempts, result, error) = outcome match {
            case Right((json, n)) => (n, Some(json), None)
            case Left((err, n)) => (n, None, Some(err))
          }
          EnrichedRecord(
            r.fileName, r.contentType, r.fileSize, r.transferId,
            r.checksum, r.correlationId, r.eventTime, r.deliveryCount,
            r.processingDate, r.s3IncomingKey, r.s3ProcessedKey,
            r.s3FailedKey, attempts, result, error)
        }
      }
  }

  /** Splits enriched output into (succeeded, failed) — the error channel
    * is a column, so this is two cheap filters over one computed Dataset,
    * not a re-execution (callers should cache/persist per micro-batch).
    */
  def route(enriched: Dataset[EnrichedRecord])
      : (Dataset[EnrichedRecord], Dataset[EnrichedRecord]) =
    (enriched.filter(_.error.isEmpty), enriched.filter(_.error.nonEmpty))

  /** E4: expiry branch — rows whose event time lags the batch's max by
    * more than `expiry` go to the expired side: (live, expired). The max
    * is a broadcast single-row aggregate, not a driver collect; in the
    * streaming path the watermark plays the role of the max.
    */
  def splitExpired(envelope: DataFrame, expiry: String): (DataFrame, DataFrame) = {
    val maxTs = envelope.select(max(col("eventTime")).as("__maxTs"))
    // null-safe equality: a null eventTime makes the age predicate null,
    // which plain filter/!filter would drop from BOTH branches — silent
    // loss. Such rows stay on the live side; downstream, event-time-mode
    // validation routes them to the DLQ ("missing eventTime"), while
    // processing-time mode accepts them (keyed by current_timestamp —
    // they simply never expire).
    val tagged = envelope.crossJoin(broadcast(maxTs))
      .withColumn("__expired",
        (col("eventTime") < col("__maxTs") - expr(s"INTERVAL $expiry"))
          <=> lit(true))
    (tagged.filter(!col("__expired")).drop("__expired", "__maxTs"),
     tagged.filter(col("__expired")).drop("__expired", "__maxTs"))
  }

  /** One micro-batch (or one batch job): persist incoming, enrich, write
    * processed + failure reports, return the failed set for the DLQ topic.
    * `outDir` stands in for the S3 bucket (s3a:// in production).
    *
    * Metrics ride the existing write actions via `observe()`
    * (CollectMetrics nodes): a batch costs exactly its writes — no
    * standalone count() jobs. The same observations surface in streaming
    * progress events for [[graft.sinks.PipelineListener]].
    */
  def runBatch(envelope: DataFrame, outDir: String, client: DoclingClient,
               cfg: PipelineConfig = PipelineConfig()): BatchMetrics = {
    import org.apache.spark.sql.Observation
    val spark = envelope.sparkSession
    // Enrichment (external calls) and object puts are latency-bound: their
    // parallelism is the partition count. Kafka micro-batches arrive
    // pre-partitioned; a single-file batch input arrives as one partition
    // and would serialize the whole pipeline — spread it once, up front
    // (the only point where bodies may cross an exchange).
    // queryExecution.toRdd: partition count without stacking the row-
    // deserializer lineage `.rdd` would add.
    val target = spark.sparkContext.defaultParallelism
    val spreadEnv =
      if (envelope.isStreaming
          || envelope.queryExecution.toRdd.getNumPartitions >= target)
        envelope
      else envelope.repartition(target)
    // E4: configured expiry routes stale rows to the DLQ branch before
    // any processing (the broker-expiry analog); they become failure
    // reports with an "expired" exception.
    val (liveEnv, expiredEnv) = cfg.expiry match {
      case Some(age) => splitExpired(spreadEnv, age)
      case None => (spreadEnv, null)
    }
    val (valid, invalid) = prepare(liveEnv, cfg)
    val obsIn = Observation(); val obsOk = Observation()
    val obsFailed = Observation(); val obsInvalid = Observation()
    val obsExpired = Observation()
    val nAgg = count(lit(1)).as("n")
    // blocks until the write action carrying the observed node finishes —
    // all gets below run after their actions, so this never waits
    def counted(obs: Observation): Long = obs.get("n").asInstanceOf[Long]
    val validP = valid.persist()
    try {
      // K1: raw payloads to incoming/ (exact deterministic keys). The
      // observation on top of the cached frame rides this first action.
      graft.sinks.ObjectStore.writeIncoming(validP.observe(obsIn, nAgg), outDir)
      val enriched = enrich(validP, client, cfg).persist()
      try {
        val (ok, failed) = route(enriched)
        // K2: structured JSON to processed/.
        val okDf = ok.toDF().observe(obsOk, nAgg)
        graft.sinks.ObjectStore.writeProcessed(okDf, outDir)
        // Success-path notifications mirror (reference's declared-but-
        // dead notifications address), keyed like the processed objects.
        if (cfg.notifications)
          graft.sinks.ObjectStore.writeNotifications(ok.toDF(), outDir)
        // DLQ route (3.2): failure reports to failed/, swallow-on-error.
        val failedDf = failed.toDF().observe(obsFailed, nAgg)
        val invalidO = invalid.observe(obsInvalid, nAgg)
        val expired = Option(expiredEnv)
        val reports = expired match {
          case Some(e) =>
            val expiredReports =
              Envelope.withObjectKeys(Envelope.withProcessingDate(
                  e.observe(obsExpired, nAgg)))
                .select(col("s3FailedKey").as("key"),
                  Envelope.failureReportJson(
                    lit(s"expired: exceeded ${cfg.expiry.get}"),
                    current_timestamp()).as("report"))
            dlqReports(failedDf, invalidO).unionByName(expiredReports)
          case None => dlqReports(failedDf, invalidO)
        }
        // one action covers the failed/invalid/expired observations: all
        // three branches flow into this single write
        graft.sinks.ObjectStore.writeFailed(reports, outDir)
        BatchMetrics(
          counted(obsIn), counted(obsOk), counted(obsFailed),
          counted(obsInvalid)
            + expired.map(_ => counted(obsExpired)).getOrElse(0L))
      } finally enriched.unpersist()
    } finally validP.unpersist()
  }

  /** DLQ-handler projection (P2+P5, dlq-handler.yaml:26-98): failure
    * reports for enrichment failures and contract-invalid rows.
    */
  def dlqReports(failed: DataFrame, invalid: DataFrame): DataFrame = {
    val fromEnrich = failed.select(
      col("s3FailedKey").as("key"),
      Envelope.failureReportJson(col("error"), current_timestamp())
        .as("report"))
    val fromInvalid =
      Envelope.withObjectKeys(Envelope.withProcessingDate(invalid))
        .select(
          col("s3FailedKey").as("key"),
          Envelope.failureReportJson(col("invalidReason"),
            current_timestamp()).as("report"))
    fromEnrich.unionByName(fromInvalid)
  }

  /** Structured Streaming driver: same batch core per micro-batch.
    * With a Kafka cluster the source is
    * `spark.readStream.format("kafka").option("subscribe", topic)` →
    * [[Envelope.fromKafka]]; tests drive this with MemoryStream instead
    * (no broker in this environment).
    */
  def runStream(envelopeStream: DataFrame, outDir: String,
                checkpointDir: String, client: DoclingClient,
                cfg: PipelineConfig = PipelineConfig()): StreamingQuery =
    envelopeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        runBatch(batch, outDir, client, cfg): Unit
      }
      .start()

  /** E5 implemented (the reference leaves reprocessing a TODO,
    * dlq-handler.yaml:184-188): read failure reports, resolve the original
    * payload from incoming/, re-emit envelope rows ready for resubmission.
    */
  def reprocess(spark: SparkSession, outDir: String,
                correlationId: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reports = graft.sinks.ObjectStore.readFailedReports(spark, outDir)
    val filtered = correlationId match {
      case Some(id) => reports.filter(col("correlationId") === id)
      case None => reports
    }
    // join on the full (correlationId, fileName) identity — a correlation
    // id is NOT unique per file (it comes from JMSCorrelationID or the
    // Kafka key, and several files can share it), and processing-time-mode
    // redeliveries store the same file under several dates: keep only the
    // latest incoming copy per identity so a report re-emits exactly one
    // body, the newest
    val latest = Window
      .partitionBy(col("correlationId"), col("fileName"))
      .orderBy(col("incomingDate").desc)
    val incoming = graft.sinks.ObjectStore.readIncoming(spark, outDir)
      .withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1)
      .drop("__rn", "incomingDate")
    filtered.join(incoming, Seq("correlationId", "fileName"), "inner")
      .select(col("fileName"), col("contentType"), col("fileSize"),
              col("checksum"), col("transferId"), col("correlationId"),
              col("body"), current_timestamp().as("eventTime"),
              (col("redeliveryCount") + 1).as("deliveryCount"))
  }
}

final case class BatchMetrics(
    input: Long, processed: Long, failed: Long, invalid: Long)
