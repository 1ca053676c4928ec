package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

class EnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def kafkaRow(
      headers: Seq[(String, String)],
      key: String = "corr-1",
      value: Array[Byte] = "payload".getBytes,
      ts: String = "2024-03-05 07:08:09"): org.apache.spark.sql.DataFrame = {
    val rows = java.util.List.of(
      Row(key.getBytes, value, "file-transfer-queue", 0, 0L,
          Timestamp.valueOf(ts),
          headers.map { case (k, v) => Row(k, v.getBytes) }))
    spark.createDataFrame(rows, Envelope.kafkaSchema)
  }

  private val fullHeaders = Seq(
    "fileName" -> "report.pdf",
    "contentType" -> "application/pdf",
    "fileSize" -> "12345",
    "transferId" -> "GOANYWHERE-1709622489",
    "checksum" -> "ab" * 32,
    "JMSCorrelationID" -> "corr-42",
    "JMSXDeliveryCount" -> "2")

  test("fromKafka projects all five contract headers plus system fields") {
    val env = Envelope.fromKafka(kafkaRow(fullHeaders)).collect().head
    assert(env.getAs[String]("fileName") == "report.pdf")
    assert(env.getAs[String]("contentType") == "application/pdf")
    assert(env.getAs[Long]("fileSize") == 12345L)
    assert(env.getAs[String]("transferId") == "GOANYWHERE-1709622489")
    assert(env.getAs[String]("correlationId") == "corr-42")
    assert(env.getAs[Int]("deliveryCount") == 2)
    assert(new String(env.getAs[Array[Byte]]("body")) == "payload")
  }

  test("fromKafka falls back to the Kafka key when JMSCorrelationID is absent") {
    val noCorr = fullHeaders.filterNot(_._1 == "JMSCorrelationID")
    val env = Envelope.fromKafka(kafkaRow(noCorr, key = "key-7")).collect().head
    assert(env.getAs[String]("correlationId") == "key-7")
    assert(env.getAs[Int]("deliveryCount") == 2)
  }

  test("repeated Kafka headers take the last occurrence instead of crashing") {
    val dup = fullHeaders :+ ("fileName" -> "override.pdf")
    val env = Envelope.fromKafka(kafkaRow(dup)).collect().head
    assert(env.getAs[String]("fileName") == "override.pdf")
  }

  test("malformed numeric headers become nulls routed to validation, not ANSI cast crashes") {
    val bad = fullHeaders.map {
      case ("fileSize", _) => ("fileSize", "12MB")
      case kv => kv
    }
    val env = Envelope.fromKafka(kafkaRow(bad))
    val row = Envelope.withValidation(env).collect().head
    assert(row.get(row.fieldIndex("fileSize")) == null)
    assert(row.getAs[String]("invalidReason") == "bad fileSize")
    // malformed deliveryCount falls back to 1
    val badDc = fullHeaders.map {
      case ("JMSXDeliveryCount", _) => ("JMSXDeliveryCount", "many")
      case kv => kv
    }
    assert(Envelope.fromKafka(kafkaRow(badDc)).collect().head
      .getAs[Int]("deliveryCount") == 1)
  }

  test("validation flags contract violations; clean rows pass") {
    val env = Envelope.fromKafka(kafkaRow(fullHeaders))
    assert(Envelope.withValidation(env)
      .filter(col("invalidReason").isNotNull).count() == 0)
    val bad = Envelope.fromKafka(
      kafkaRow(fullHeaders.filterNot(_._1 == "fileName")))
    val reason = Envelope.withValidation(bad).collect().head
      .getAs[String]("invalidReason")
    assert(reason == "missing fileName")
    val big = Envelope.fromKafka(kafkaRow(
      fullHeaders.map { case ("fileSize", _) => ("fileSize", "999999999") case kv => kv }))
    assert(Envelope.withValidation(big).collect().head
      .getAs[String]("invalidReason") == "file exceeds 100MB limit")
  }

  test("object keys follow the reference layout, derived from event time") {
    val keyed = Envelope.withObjectKeys(Envelope.withProcessingDate(
      Envelope.fromKafka(kafkaRow(fullHeaders)))).collect().head
    assert(keyed.getAs[String]("s3IncomingKey") ==
      "incoming/2024/03/05/corr-42/report.pdf")
    assert(keyed.getAs[String]("s3ProcessedKey") ==
      "processed/2024/03/05/corr-42/report.pdf.json")
    assert(keyed.getAs[String]("s3FailedKey") ==
      "failed/2024/03/05/corr-42/report.pdf.failure.json")
  }

  test("object keys are deterministic and injective per (date, corr, file)") {
    val gen = for {
      corr <- Gen.identifier.suchThat(_.nonEmpty)
      file <- Gen.identifier.suchThat(_.nonEmpty)
    } yield (corr, file)
    def key(corr: String, file: String) = s"incoming/2024/03/05/$corr/$file"
    val samples = Iterator.from(0)
      .map(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .collect { case Some(v) => v }.take(200).toVector
    for (a <- samples.take(40); b <- samples.take(40) if a != b)
      // '/'-free segments make the key injective.
      assert(key(a._1, a._2) != key(b._1, b._2))
    for (a <- samples) assert(key(a._1, a._2) == key(a._1, a._2))
  }

  test("docling request carries source key and conversion options") {
    val req = Envelope.withDoclingRequest(Envelope.withObjectKeys(
      Envelope.withProcessingDate(Envelope.fromKafka(kafkaRow(fullHeaders)))))
      .collect().head.getAs[String]("doclingRequest")
    assert(req.contains(""""source":"incoming/2024/03/05/corr-42/report.pdf""""))
    assert(req.contains(""""from_format":"pdf""""))
    assert(req.contains(""""ocr":true"""))
    assert(req.contains(""""table_structure":true"""))
  }

  test("failure report JSON has the reference's shape incl. nested headers") {
    val df = Envelope.withObjectKeys(Envelope.withProcessingDate(
      Envelope.fromKafka(kafkaRow(fullHeaders))))
      .withColumn("error", lit("docling: boom"))
    val json = df.select(Envelope.failureReportJson(col("error"),
      to_timestamp(lit("2024-03-05 08:00:00"))).as("r"))
      .collect().head.getAs[String]("r")
    assert(json.contains(""""status":"FAILED""""))
    assert(json.contains(""""redeliveryCount":2"""))
    assert(json.contains(""""exception":"docling: boom""""))
    assert(json.contains(""""headers":{"contentType":"application/pdf","fileSize":12345,"checksum":"""))
    assert(json.contains(""""failureTimestamp":"2024-03-05T08:00:00.000Z""""))
  }

  test("file-type filter accepts pdf/docx only (case-insensitive)") {
    import spark.implicits._
    val names = Seq("a.pdf", "b.DOCX", "c.txt", "d.pdf.exe").toDF("fileName")
    val kept = Envelope.acceptedFileTypes(names)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("a.pdf", "b.DOCX"))
  }

  test("checksum verification matches sha2(body)") {
    import spark.implicits._
    val body = "payload".getBytes
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map("%02x".format(_)).mkString
    val good = Seq((body, sha)).toDF("body", "checksum")
    assert(Envelope.withChecksumOk(good).collect().head.getAs[Boolean]("checksumOk"))
    val bad = Seq((body, "00" * 32)).toDF("body", "checksum")
    assert(!Envelope.withChecksumOk(bad).collect().head.getAs[Boolean]("checksumOk"))
  }
}
