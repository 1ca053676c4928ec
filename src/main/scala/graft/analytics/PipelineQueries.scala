package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}
import graft.ops.Envelope

/** The reference-parity pipeline projections (SURVEY.md §2A: P1–P8, F2/F3,
  * key templating, request/report JSON) expressed as oracle-checked
  * queries. The `events` table stands in for the message stream: each event
  * is deterministically mapped to a file-transfer envelope, then the real
  * `graft.ops.Envelope` transforms run over it — so the exact production
  * code paths (not test doubles) are what the DuckDB oracle checks.
  */
object PipelineQueries {

  /** Deterministic events→envelope mapping (shared by several queries;
    * mirrored 1:1 in each oracle's WITH clause).
    */
  private def eventsAsEnvelope(t: Tables): DataFrame =
    t.events.select(
      concat(lit("doc_"), col("event_id"), lit(".pdf")).as("fileName"),
      lit("application/pdf").as("contentType"),
      (col("event_id") % 90000000L + 1024L).as("fileSize"),
      concat(lit("GOANYWHERE-"), col("event_id")).as("transferId"),
      sha2(encode(col("props"), "UTF-8"), 256).as("checksum"),
      concat(lit("corr-"), col("user_id"), lit("-"), col("event_id"))
        .as("correlationId"),
      encode(col("props"), "UTF-8").as("body"),
      col("ts").as("eventTime"),
      (col("event_id") % 3 + 1).cast("int").as("deliveryCount"))

  private val envelopeSql = """
          SELECT CONCAT('doc_', event_id, '.pdf') AS fileName,
                 'application/pdf' AS contentType,
                 event_id % 90000000 + 1024 AS fileSize,
                 CONCAT('GOANYWHERE-', event_id) AS transferId,
                 sha256(props) AS checksum,
                 CONCAT('corr-', user_id, '-', event_id) AS correlationId,
                 ts AS eventTime,
                 CAST(event_id % 3 + 1 AS INT) AS deliveryCount
          FROM events"""

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q21: P1/P3/P7 — processing-date derivation and the three
    // deterministic object keys (idempotence depends on these being pure
    // functions of the envelope; file-pipeline.yaml:76-85,211-218).
    GraftQuery(
      "q21_object_keys",
      (spark, dir) => {
        val env = eventsAsEnvelope(new Tables(spark, dir))
        Envelope.withObjectKeys(Envelope.withProcessingDate(env))
          .select(col("correlationId"), col("processingDate"),
                  col("s3IncomingKey"), col("s3ProcessedKey"),
                  col("s3FailedKey"))
          .orderBy(col("correlationId"))
      },
      Some(s"""
        WITH env AS ($envelopeSql)
        SELECT correlationId,
               STRFTIME(eventTime, '%Y/%m/%d') AS processingDate,
               CONCAT('incoming/', STRFTIME(eventTime, '%Y/%m/%d'), '/', correlationId, '/', fileName) AS s3IncomingKey,
               CONCAT('processed/', STRFTIME(eventTime, '%Y/%m/%d'), '/', correlationId, '/', fileName, '.json') AS s3ProcessedKey,
               CONCAT('failed/', STRFTIME(eventTime, '%Y/%m/%d'), '/', correlationId, '/', fileName, '.failure.json') AS s3FailedKey
        FROM env
        ORDER BY correlationId""")),

    // ------------------------------------------------------------------
    // q22: P4 — the Docling request JSON (file-pipeline.yaml:124-136),
    // built with to_json(struct(...)): both engines emit identical compact
    // JSON with declaration-ordered keys.
    GraftQuery(
      "q22_docling_requests",
      (spark, dir) => {
        val env = eventsAsEnvelope(new Tables(spark, dir))
        Envelope.withDoclingRequest(
            Envelope.withObjectKeys(Envelope.withProcessingDate(env)))
          .select(col("correlationId"), col("doclingRequest"))
          .orderBy(col("correlationId"))
      },
      Some(s"""
        WITH env AS ($envelopeSql)
        SELECT correlationId,
               CAST(to_json(struct_pack(
                 source := CONCAT('incoming/', STRFTIME(eventTime, '%Y/%m/%d'), '/', correlationId, '/', fileName),
                 options := struct_pack(
                   from_format := 'pdf',
                   to_format := 'json',
                   ocr := true,
                   table_structure := true))) AS VARCHAR) AS doclingRequest
        FROM env
        ORDER BY correlationId""")),

    // ------------------------------------------------------------------
    // q23: P2/P5 — the DLQ failure report (dlq-handler.yaml:69-86) for
    // the error-type events, with F2's breaker-vs-other routing flag.
    // Failure time is the event time here so the output is deterministic.
    GraftQuery(
      "q23_failure_reports",
      (spark, dir) => {
        val env = eventsAsEnvelope(new Tables(spark, dir))
          .filter(col("fileSize") % 7 === 0)
          .withColumn("error",
            when(col("fileSize") % 14 === 0,
                 lit("circuit breaker open: failing fast"))
              .otherwise(lit("docling: conversion failed")))
        env.select(
            col("correlationId"),
            Envelope.failureReportJson(col("error"), col("eventTime"))
              .as("report"),
            Envelope.isBreakerError(col("error")).as("isBreakerFailure"))
          .orderBy(col("correlationId"))
      },
      Some(s"""
        WITH env AS ($envelopeSql),
        failing AS (
          SELECT *, CASE WHEN fileSize % 14 = 0
                         THEN 'circuit breaker open: failing fast'
                         ELSE 'docling: conversion failed' END AS error
          FROM env WHERE fileSize % 7 = 0)
        SELECT correlationId,
               CAST(to_json(struct_pack(
                 status := 'FAILED',
                 fileName := fileName,
                 correlationId := correlationId,
                 transferId := transferId,
                 failureTimestamp := STRFTIME(eventTime, '%Y-%m-%dT%H:%M:%S.%g') || 'Z',
                 redeliveryCount := deliveryCount,
                 exception := error,
                 headers := struct_pack(
                   contentType := contentType,
                   fileSize := fileSize,
                   checksum := checksum))) AS VARCHAR) AS report,
               contains(error, 'circuit breaker') AS isBreakerFailure
        FROM failing
        ORDER BY correlationId""")),

    // ------------------------------------------------------------------
    // q23b/q41: the FULL enrichment path under the oracle — the real
    // FilePipeline.prepare + FilePipeline.enrich (mapPartitions stage,
    // retry + circuit breaker) with the deterministic LocalDocling stub,
    // then from_json over the conversion result (the schema-on-read
    // surface for the Docling JSON, SURVEY.md §1.2). The oracle recomputes
    // the stub's pages/tables from sha256(request) with a hex fold —
    // so a drift anywhere in the prepare→request→enrich→parse chain
    // hash-mismatches.
    GraftQuery(
      "q41_docling_enrich_stats",
      (spark, dir) => {
        val env = eventsAsEnvelope(new Tables(spark, dir))
        val (valid, _) = graft.stream.FilePipeline.prepare(env)
        val enriched = graft.stream.FilePipeline.enrich(
          valid, new graft.enrich.LocalDocling(),
          graft.stream.PipelineConfig(
            retry = graft.enrich.RetryPolicy(sleeper = _ => ())))
        val resultSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("digest",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pages",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("tables",
            org.apache.spark.sql.types.LongType)))
        enriched.toDF()
          .withColumn("r", from_json(col("doclingResult"), resultSchema))
          .groupBy(col("r.tables").as("n_tables"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("r.pages")).as("sum_pages"),
               min(col("r.digest")).as("min_digest"))
          .orderBy(col("n_tables"))
      },
      Some(s"""
        WITH env AS ($envelopeSql),
        req AS (
          SELECT correlationId,
                 to_json(struct_pack(
                   source := CONCAT('incoming/', STRFTIME(eventTime, '%Y/%m/%d'), '/', correlationId, '/', fileName),
                   options := struct_pack(
                     from_format := 'pdf', to_format := 'json',
                     ocr := true, table_structure := true))) AS request
          FROM env),
        dig AS (SELECT correlationId, sha256(request) AS digest FROM req),
        parsed AS (
          SELECT digest,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 7),
                i -> CAST(strpos('0123456789abcdef', substr(digest, CAST(i AS INT), 1)) - 1 AS BIGINT))),
              (a, b) -> a * 16 + b) % 40 + 1 AS pages,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(7, 13),
                i -> CAST(strpos('0123456789abcdef', substr(digest, CAST(i AS INT), 1)) - 1 AS BIGINT))),
              (a, b) -> a * 16 + b) % 5 AS tables
          FROM dig)
        SELECT tables AS n_tables, COUNT(*) AS n_docs,
               CAST(SUM(pages) AS BIGINT) AS sum_pages,
               MIN(digest) AS min_digest
        FROM parsed
        GROUP BY tables
        ORDER BY n_tables""")),

    // ------------------------------------------------------------------
    // q24: keep-first dedup — the deterministic batch analog of the
    // streaming dropDuplicates-with-watermark (north-star dedup op).
    // row_number instead of dropDuplicates because dropDuplicates keeps
    // an arbitrary row (partition-order-dependent) — unacceptable for a
    // replayable pipeline.
    GraftQuery(
      "q24_dedup_keep_first",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        t.events
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
                  date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""
        SELECT user_id, event_type, event_id,
               STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type""")),

    // ------------------------------------------------------------------
    // q25: checksum functions — sha2-256 (the producer contract's
    // checksum, goanywhere-config.md:158-165) + md5 fingerprint over the
    // payload bytes.
    GraftQuery(
      "q25_payload_checksums",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.events
          .filter(col("event_id") % 97 === 0)
          .select(col("event_id"),
                  sha2(encode(col("props"), "UTF-8"), 256).as("sha256_hex"),
                  md5(encode(col("props"), "UTF-8")).as("md5_hex"),
                  length(encode(col("props"), "UTF-8")).as("payload_len"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, sha256(props) AS sha256_hex, md5(props) AS md5_hex,
               CAST(LENGTH(props) AS INT) AS payload_len
        FROM events
        WHERE event_id % 97 = 0
        ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // q51: nested-JSON analytics over Docling-style result documents
    // (SURVEY.md §1.2: the reference stores the converter's JSON verbatim,
    // camel/file-pipeline.yaml:169-173 — a user analyzing processed docs
    // parses it back with an explicit schema and explodes the extracted
    // tables). The result JSON is synthesized deterministically per event
    // (nested array of table structs, null when no tables), then parsed
    // with from_json(StructType) + explode — the full nested-parse path,
    // checked against DuckDB's json_extract on the identically-built JSON.
    GraftQuery(
      "q51_nested_json_tables",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val pages = (col("event_id") % 7 + 1).cast("int")
        val nTab = col("event_id") % 4
        val stored = t.events.select(col("event_id"), col("ts"),
          to_json(struct(
            lit("docling/v1").as("schema"),
            pages.as("pages"),
            when(nTab > 0, transform(sequence(lit(1L), nTab),
              i => struct(
                ((col("event_id") + i) % (col("event_id") % 7 + 1) + 1)
                  .cast("int").as("page"),
                ((col("event_id") * i) % 20 + 1).cast("int").as("nrows"),
                (i % 6 + 1).cast("int").as("ncols")))).as("tables")))
            .as("doclingResult"))
        val resultSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "`schema` STRING, pages INT, " +
          "tables ARRAY<STRUCT<page: INT, nrows: INT, ncols: INT>>")
        val parsed = stored.select(col("ts"),
          from_json(col("doclingResult"), resultSchema).as("doc"))
        val day = date_format(col("ts"), "yyyy-MM-dd").as("day")
        // single pass over the (expensive) synthesize→parse chain:
        // posexplode_outer keeps table-less docs as one (pos=null) row,
        // so doc and table counts come out of ONE aggregation — the
        // doc is counted where pos is null-or-0 (exactly once per doc,
        // no count-distinct Expand), tables where tbl is non-null. The
        // former docs⋈tabs two-branch form executed the parse twice.
        val exploded = parsed.select(col("ts"),
          posexplode_outer(col("doc.tables")).as(Seq("pos", "tbl")))
        exploded.groupBy(day)
          .agg(count(when(col("pos").isNull || col("pos") === 0, lit(1)))
                 .as("n_docs"),
               count(col("tbl")).as("n_tables"),
               sum(col("tbl.nrows")).cast("long").as("sum_rows"),
               max(col("tbl.ncols")).as("max_cols"))
          .withColumn("avg_rows_per_table",
            col("sum_rows").cast("double") / col("n_tables"))
          .select(col("day"), col("n_docs"), col("n_tables"),
                  col("sum_rows"), col("max_cols"), col("avg_rows_per_table"))
          .orderBy(col("day"))
      },
      Some("""
        WITH built AS (
          SELECT event_id, ts,
            to_json(struct_pack(
              "schema" := 'docling/v1',
              pages := CAST(event_id % 7 + 1 AS INT),
              tables := CASE WHEN event_id % 4 > 0 THEN
                list_transform(generate_series(1, event_id % 4),
                  i -> struct_pack(
                    page := CAST((event_id + i) % (event_id % 7 + 1) + 1 AS INT),
                    nrows := CAST((event_id * i) % 20 + 1 AS INT),
                    ncols := CAST(i % 6 + 1 AS INT)))
                ELSE NULL END)) AS j
          FROM events),
        exploded AS (
          SELECT event_id, ts,
            CAST(json_extract(j, '$.pages') AS INT) AS pages,
            unnest(CAST(json_extract(j, '$.tables')
              AS STRUCT(page INT, nrows INT, ncols INT)[])) AS tbl
          FROM built),
        docs AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_docs
          FROM built GROUP BY 1),
        tabs AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day,
                 COUNT(*) AS n_tables,
                 CAST(SUM(tbl.nrows) AS BIGINT) AS sum_rows,
                 CAST(MAX(tbl.ncols) AS INT) AS max_cols
          FROM exploded GROUP BY 1)
        SELECT d.day AS day, CAST(d.n_docs AS BIGINT) AS n_docs,
               CAST(t.n_tables AS BIGINT) AS n_tables, t.sum_rows AS sum_rows,
               t.max_cols AS max_cols,
               CAST(t.sum_rows AS DOUBLE) / t.n_tables AS avg_rows_per_table
        FROM docs d JOIN tabs t ON d.day = t.day
        ORDER BY day""")),

    // ------------------------------------------------------------------
    // q159: per-document TABLE-CELL reconstruction — the Docling result
    // JSON's deepest data product (k8s/configmaps.yaml:20-26: the
    // converter emits table STRUCTURE, tables → rows → cells), which
    // q51 only counts at the table level. The cell matrix is
    // synthesized deterministically per document (numeric cells where
    // (doc_id + r + c) % 3 = 0, word cells elsewhere), stored as the
    // JSON a pipeline would persist, then parsed back with a
    // triple-nested schema and EXPLODED TO PER-CELL ROWS (posexplode ×3:
    // table index, row index, column index — the distributed cell
    // stream a 100 TB corpus would feed into typed table extraction),
    // and re-aggregated to per-doc stats: table/cell counts, numeric
    // cell census with an exact integer sum, and the widest row. The
    // oracle walks the same JSON with DuckDB list ops instead of
    // explodes — a hash match pins that the two nestings agree cell by
    // cell. Tables are counted at their (ri=0, ci=0) anchor cell, so
    // ONE aggregation serves all five stats — no count-distinct Expand.
    GraftQuery(
      "q159_docling_table_cells",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val nTab = col("doc_id") % 3
        val stored = t.documents.select(col("doc_id"),
          to_json(struct(
            lit("docling/v1").as("schema"),
            when(nTab > 0, transform(sequence(lit(1L), nTab), tt =>
              struct(transform(
                sequence(lit(1L), (col("doc_id") + tt) % 4 + 1), r =>
                transform(sequence(lit(1L), tt % 3 + 1), c =>
                  when((col("doc_id") + r + c) % 3 === 0,
                    ((col("doc_id") * r + c * 7) % 100).cast("string"))
                  .otherwise(concat(lit("w"),
                    ((r * 10 + c) % 30).cast("string")))))
                .as("rows")))).as("tables"))).as("doclingResult"))
        val resultSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "`schema` STRING, " +
          "tables ARRAY<STRUCT<`rows`: ARRAY<ARRAY<STRING>>>>")
        val isNum = col("cell").rlike("^[0-9]+$")
        stored
          .select(col("doc_id"),
            from_json(col("doclingResult"), resultSchema).as("doc"))
          .select(col("doc_id"),
            posexplode(col("doc.tables")).as(Seq("ti", "tbl")))
          .select(col("doc_id"), col("ti"),
            posexplode(col("tbl.rows")).as(Seq("ri", "row")))
          .select(col("doc_id"), col("ti"), col("ri"),
            posexplode(col("row")).as(Seq("ci", "cell")))
          .groupBy(col("doc_id"))
          .agg(
            count(when(col("ri") === 0 && col("ci") === 0, lit(1)))
              .as("n_tables"),
            count(lit(1)).as("n_cells"),
            count(when(isNum, lit(1))).as("n_numeric"),
            coalesce(sum(when(isNum, col("cell").cast("long"))), lit(0L))
              .as("numeric_sum"),
            (max(col("ci")) + 1).as("max_width"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH built AS (
          SELECT doc_id,
            to_json(struct_pack(
              "schema" := 'docling/v1',
              tables := CASE WHEN doc_id % 3 > 0 THEN
                list_transform(generate_series(1, doc_id % 3), t ->
                  struct_pack("rows" := list_transform(
                    generate_series(1, (doc_id + t) % 4 + 1), r ->
                    list_transform(generate_series(1, t % 3 + 1), c ->
                      CASE WHEN (doc_id + r + c) % 3 = 0
                           THEN CAST((doc_id * r + c * 7) % 100 AS VARCHAR)
                           ELSE 'w' || CAST((r * 10 + c) % 30 AS VARCHAR)
                      END))))
                ELSE NULL END)) AS j
          FROM documents),
        parsed AS (
          SELECT doc_id,
                 CAST(json_extract(j, '$.tables')
                      AS STRUCT("rows" VARCHAR[][])[]) AS tabs
          FROM built WHERE doc_id % 3 > 0),
        percell AS (
          SELECT doc_id,
                 flatten(list_transform(tabs, t -> flatten(t."rows")))
                   AS cells,
                 flatten(list_transform(tabs, t ->
                   list_transform(t."rows", r -> len(r)))) AS widths,
                 len(tabs) AS n_tables
          FROM parsed)
        SELECT doc_id,
               CAST(n_tables AS BIGINT) AS n_tables,
               CAST(len(cells) AS BIGINT) AS n_cells,
               CAST(len(list_filter(cells,
                 x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_numeric,
               CAST(coalesce(list_sum(list_transform(
                 list_filter(cells, x -> regexp_matches(x, '^[0-9]+$')),
                 x -> CAST(x AS BIGINT))), 0) AS BIGINT) AS numeric_sum,
               CAST(list_max(widths) AS INT) AS max_width
        FROM percell ORDER BY doc_id"""))
  )
}
