package graft.model

import java.sql.Timestamp

/** Typed data model for the file-transfer dataflow (SURVEY.md §1).
  *
  * The envelope mirrors the reference's producer contract — five required
  * application headers plus correlation id and the binary body
  * (reference: README.md:45-52, docs/goanywhere-config.md:353-363) — with
  * two deliberate upgrades over the reference: the schema is *declared and
  * validated* at ingest (the reference enforces nothing and nulls leak into
  * S3 keys), and event time is a typed timestamp rather than a formatted
  * string (reference stamps processing-time strings in-flight,
  * camel/file-pipeline.yaml:62-66).
  */
final case class FileTransferEvent(
    fileName: String,
    contentType: String,
    fileSize: Long,
    transferId: String,
    checksum: String,
    correlationId: String,
    body: Array[Byte],
    eventTime: Timestamp,
    deliveryCount: Int)

/** Result of the enrichment stage: exactly one of `result` / `error` is
  * set. Carried as columns (not exceptions) so failure routing is a plain
  * filter — the Spark-native form of the reference's doTry/doCatch +
  * throwException chain (camel/file-pipeline.yaml:109-202).
  */
final case class EnrichedEvent(
    fileName: String,
    contentType: String,
    fileSize: Long,
    transferId: String,
    checksum: String,
    correlationId: String,
    eventTime: Timestamp,
    deliveryCount: Int,
    attempts: Int,
    doclingResult: Option[String],
    error: Option[String])

/** The DLQ failure report (reference: camel/dlq-handler.yaml:69-86) — one
  * nested struct, serialized to JSON at the `failed/` sink.
  */
final case class FailureReport(
    status: String,
    fileName: String,
    correlationId: String,
    transferId: String,
    failureTimestamp: String,
    redeliveryCount: Int,
    exception: String,
    headers: FailureHeaders)

final case class FailureHeaders(
    contentType: String,
    fileSize: Long,
    checksum: String)
