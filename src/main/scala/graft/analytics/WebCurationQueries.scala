package graft.analytics

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ext.{Dedup, TextAnalysis, UrlOps}

/** Round-13 widening: URL/domain web-crawl curation (VERDICT r12 item
  * 1) — the C4/RefinedWeb recipe steps that precede text cleaning:
  * canonicalize URLs, dedup on the canonical form, census per
  * registered domain, drop blocklisted domains.
  *
  * documents carries no url column (TESTDATA.md), so the fixture IS
  * part of each query: [[graft.ext.UrlOps.synthesizeUrl]] derives a
  * deterministic URL from doc_id, mirrored expression-for-expression
  * in the oracle SQL (the q199 fixture discipline — both engines
  * build identical inputs, so the gate prices the kernels, not a file
  * side-channel). Canonical content derives from doc_id % 37, the
  * removable variants (case, userinfo, default port, tracking params,
  * fragment) from doc_id directly, so canonical collapse is real at
  * every SF and exactly checkable.
  *
  * Oracle mirror table (each Spark step ↔ DuckDB step):
  * substring_index(u,sep,1) ↔ split_part(u,sep,1);
  * substring_index(u,sep,-1) ↔ split_part(u,sep,-1) (or ,2) — guarded
  * by an explicit CASE wherever the engines' absent-separator
  * behavior differs; Column.substr ↔ substr; filter/array_join ↔
  * list_filter/array_to_string (COALESCE'd: DuckDB yields NULL for
  * the empty list where Spark's array_join yields '');
  * slice(l,-2,2) ↔ l[-2:].
  */
object WebCurationQueries {

  /** Domains excluded by the census anti-join: both are reachable in
    * the synthesized corpus (site0.com at k ≡ 0 mod 15, site2.co.uk at
    * k ≡ 11 mod 15), so the anti-join provably removes rows.
    */
  val Blocklist: Seq[String] = Seq("site0.com", "site2.co.uk")

  /** DuckDB CTE chain shared by both oracles: synthesize the raw URL
    * from doc_id, then canonicalize it step-for-step like
    * [[graft.ext.UrlOps.canonicalizeUrl]].
    */
  private val synthesisAndCanonSql = """
    WITH parts AS (
      SELECT doc_id, n_chars, doc_id % 37 AS k,
             CASE WHEN (doc_id % 37) % 2 = 0 THEN 'http' ELSE 'https' END
               AS scheme_l,
             CASE WHEN (doc_id % 37) % 5 = 0 THEN '.com'
                  WHEN (doc_id % 37) % 5 = 1 THEN '.co.uk'
                  WHEN (doc_id % 37) % 5 = 2 THEN '.org'
                  WHEN (doc_id % 37) % 5 = 3 THEN '.com.au'
                  ELSE '.net' END AS suffix,
             CASE WHEN (doc_id % 37) % 3 > 0
                  THEN 'id=' || CAST((doc_id % 37) % 8 AS VARCHAR)
                  ELSE '' END AS idq
      FROM documents),
    raw AS (
      SELECT doc_id, n_chars,
             (CASE WHEN doc_id % 4 = 0 THEN upper(scheme_l) ELSE scheme_l END)
             || '://'
             || (CASE WHEN doc_id % 9 = 0 THEN 'u:p@' ELSE '' END)
             || (CASE WHEN doc_id % 8 = 0
                 THEN upper('www' || CAST(k % 4 AS VARCHAR) || '.site'
                            || CAST(k % 3 AS VARCHAR) || suffix)
                 ELSE 'www' || CAST(k % 4 AS VARCHAR) || '.site'
                      || CAST(k % 3 AS VARCHAR) || suffix END)
             || (CASE WHEN k % 7 = 1 THEN ':8080'
                      WHEN doc_id % 6 = 0 THEN
                        (CASE WHEN scheme_l = 'http' THEN ':80'
                              ELSE ':443' END)
                      ELSE '' END)
             || '/p/' || CAST(k % 7 AS VARCHAR) || '/x'
             || (CASE WHEN doc_id % 3 = 0 THEN
                        '?utm_source=feed&utm_campaign=c'
                        || CAST(doc_id % 4 AS VARCHAR)
                        || (CASE WHEN idq = '' THEN ''
                                 ELSE '&' || idq END)
                      WHEN doc_id % 3 = 1 THEN
                        (CASE WHEN idq = '' THEN '?ref=tw'
                              ELSE '?' || idq || '&ref=tw' END)
                      ELSE (CASE WHEN idq = '' THEN ''
                                 ELSE '?' || idq END) END)
             || (CASE WHEN doc_id % 4 = 2 THEN '#sec1' ELSE '' END) AS url
      FROM parts),
    c1 AS (SELECT doc_id, n_chars, url, split_part(url, '#', 1) AS nf
           FROM raw),
    c2 AS (SELECT *, lower(split_part(nf, '://', 1)) AS scheme,
                  split_part(nf, '://', 2) AS rest FROM c1),
    c3 AS (SELECT *, split_part(split_part(rest, '/', 1), '?', 1)
                    AS authority,
                  substr(rest,
                    len(split_part(split_part(rest, '/', 1), '?', 1)) + 1)
                    AS pathq
           FROM c2),
    c4 AS (SELECT *, split_part(authority, '@', -1) AS hostport FROM c3),
    c5 AS (SELECT *, lower(split_part(hostport, ':', 1)) AS host,
                  CASE WHEN contains(hostport, ':')
                       THEN split_part(hostport, ':', 2)
                       ELSE '' END AS port FROM c4),
    c6 AS (SELECT *, split_part(pathq, '?', 1) AS path,
                  CASE WHEN port = ''
                         OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                       THEN '' ELSE ':' || port END AS port_out FROM c5),
    c7 AS (SELECT *, CASE WHEN contains(pathq, '?')
                          THEN substr(pathq, len(path) + 2)
                          ELSE '' END AS qs FROM c6),
    c8 AS (SELECT *, COALESCE(array_to_string(
                    list_filter(string_split(qs, '&'),
                    p -> NOT (starts_with(p, 'utm_')
                              OR starts_with(p, 'gclid=')
                              OR starts_with(p, 'fbclid=')
                              OR starts_with(p, 'msclkid=')
                              OR starts_with(p, 'ref='))), '&'), '') AS kept
           FROM c7),
    canon AS (
      SELECT doc_id, n_chars, url, host,
             scheme || '://' || host || port_out
               || (CASE WHEN path = '' THEN '/' ELSE path END)
               || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END)
               AS canonical_url
      FROM c8)"""

  private val suffixListSql =
    UrlOps.TwoLevelSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")

  val queries: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q200: exact canonical-URL dedup ([[graft.ext.UrlOps]]) — one row
    // per canonical URL with document count, distinct raw-spelling
    // count, and the keep-min-doc_id winner. The canonicalization is
    // pure map-side expression work; the census is one hash
    // aggregation keyed on the canonical string (map-side partials do
    // the collapsing, so at 100 TB the shuffle carries one row per
    // distinct URL, not per document).
    GraftQuery(
      "q200_url_canonical_dedup",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        UrlOps.canonicalDedup(t.documents, col("doc_id"),
            UrlOps.synthesizeUrl(col("doc_id")))
          .orderBy(col("canonical_url"))
      },
      Some(synthesisAndCanonSql + """
        SELECT canonical_url,
               count(*) AS n_docs,
               count(DISTINCT url) AS n_raw,
               min(doc_id) AS keeper_doc_id
        FROM canon GROUP BY 1""")),

    // ------------------------------------------------------------------
    // q201: per-registered-domain census behind a broadcast blocklist
    // anti-join ([[graft.ext.UrlOps.domainCensus]]) — docs, distinct
    // canonical URLs, distinct hosts, total chars, and the canonical
    // dup rate per eTLD+1, with blocklisted domains removed before
    // aggregation (the C4/RefinedWeb denylist step). The blocklist is
    // always the broadcast side; dup_rate is a single division of
    // exact integers (bit-identical across engines).
    GraftQuery(
      "q201_domain_census_blocklist",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        UrlOps.domainCensus(t.documents, col("doc_id"),
            UrlOps.synthesizeUrl(col("doc_id")), col("n_chars"), Blocklist)
          .orderBy(col("registered_domain"))
      },
      Some(synthesisAndCanonSql + s""",
        dom AS (
          SELECT doc_id, n_chars, canonical_url, host,
                 CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                      WHEN array_to_string((string_split(host, '.'))[-2:],
                             '.') IN $suffixListSql
                      THEN array_to_string((string_split(host, '.'))[-3:],
                             '.')
                      ELSE array_to_string((string_split(host, '.'))[-2:],
                             '.') END AS registered_domain
          FROM canon)
        SELECT registered_domain,
               count(*) AS n_docs,
               count(DISTINCT canonical_url) AS n_canonical,
               count(DISTINCT host) AS n_hosts,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(count(*) - count(DISTINCT canonical_url) AS DOUBLE)
                 / count(*) AS dup_rate
        FROM dom
        WHERE registered_domain NOT IN
          (${Blocklist.map(s => s"'$s'").mkString(", ")})
        GROUP BY 1""")),

    // ------------------------------------------------------------------
    // q206: full domain-reputation census
    // ([[graft.ext.UrlOps.domainReputation]]) — q201's census joined
    // with the two signals the r12 brief specified and q201 shipped
    // without: MEAN QUALITY per registered domain (the q33 score,
    // 10⁻⁴-quantized so the mean is one double division of exact
    // integers) and NEAR-DUP PARTICIPATION (docs in ≥ 1 q28
    // MinHash-LSH pair; the oracle replays the exact-Jaccard
    // equivalent, the q28 equivalence). Aggregate-then-join
    // throughout: the near-dup doc set derives its domain MAP-SIDE
    // from doc_id (no corpus join), both join sides are domain-sized,
    // the corpus is scanned once for the census+quality aggregation
    // and once for the pair machinery.
    GraftQuery(
      "q206_domain_reputation",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val pairs = Dedup.minhashPairs(t.documents, col("doc_id"),
            col("text"), n = 3, threshold = 0.8)
        // domain derived map-side from doc_id — in STEPWISE withColumns:
        // nesting the four kernels directly would textually expand the
        // synthesis expression ~200× (each kernel references its input
        // many times), blowing up codegen; the project boundaries keep
        // each step's tree referencing the previous COLUMN
        val ndDomains = pairs
          .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
          .withColumn("__url", UrlOps.synthesizeUrl(col("doc_id")))
          .withColumn("__canonical", UrlOps.canonicalizeUrl(col("__url")))
          .withColumn("__host", UrlOps.hostOf(col("__canonical")))
          .withColumn("registered_domain",
            UrlOps.registeredDomain(col("__host")))
          .groupBy(col("registered_domain"))
          .agg(count(lit(1)).as("n_near_dup"))
          // domain-sized (~#domains rows): materialize BEFORE the
          // broadcast so the pair-set machinery runs once at full
          // parallelism, not inside the broadcast-build thread
          // (measured ~2× on the whole query)
          .localCheckpoint(true)
        UrlOps.domainReputation(t.documents, col("doc_id"),
            UrlOps.synthesizeUrl(col("doc_id")), col("n_chars"),
            round(TextAnalysis.qualityScore(col("text")) * 10000)
              .cast("long"),
            ndDomains, Blocklist)
          .orderBy(col("registered_domain"))
      },
      Some(synthesisAndCanonSql + s""",
        dom AS (
          SELECT doc_id, n_chars, canonical_url, host,
                 CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                      WHEN array_to_string((string_split(host, '.'))[-2:],
                             '.') IN $suffixListSql
                      THEN array_to_string((string_split(host, '.'))[-3:],
                             '.')
                      ELSE array_to_string((string_split(host, '.'))[-2:],
                             '.') END AS registered_domain
          FROM canon),
        sig AS (
          SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS nc,
            CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
            CAST(len(list_filter(string_split(text,' '),
              x -> x IN ('the','a','of','and','to'))) AS DOUBLE) AS nstop,
            CAST(length(text) - length(regexp_replace(text, '[.,;:!?]',
              '', 'g')) AS DOUBLE) AS npunct,
            CAST(length(text) - length(regexp_replace(text, '[A-Z]',
              '', 'g')) AS DOUBLE) AS nupper
          FROM documents),
        qual AS (
          SELECT doc_id, CAST(round(
            (CASE WHEN nc = 0 THEN 0.0 ELSE
             floor((0.35 * (CASE WHEN nc BETWEEN 100 AND 10000
                            THEN 1.0 ELSE 0.3 END)
                 + 0.25 * (CASE WHEN (nc - (nw - 1)) / nw BETWEEN 3 AND 10
                           THEN 1.0 ELSE 0.4 END)
                 + 0.2 * least((nstop / nw) * 5, 1.0)
                 + 0.1 * (1.0 - npunct / nc)
                 + 0.1 * (1.0 - nupper / nc)) * 10000 + 0.5) / 10000 END)
            * 10000) AS BIGINT) AS qmicro
          FROM sig),
        words AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
        shingles AS (SELECT doc_id, CASE WHEN len(w) >= 3
               THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
               ELSE [array_to_string(w, ' ')] END AS sh FROM words),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shingles),
        sizes AS (SELECT doc_id, len(sh) AS n FROM shingles),
        ndcand AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS inter
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        ndpairs AS (
          SELECT ia, ib
          FROM ndcand JOIN sizes sa ON ia = sa.doc_id
                      JOIN sizes sb ON ib = sb.doc_id
          WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.8),
        ndids AS (SELECT DISTINCT doc_id FROM (
          SELECT ia AS doc_id FROM ndpairs
          UNION ALL SELECT ib FROM ndpairs)),
        nddom AS (
          SELECT d.registered_domain,
                 CAST(count(*) AS BIGINT) AS n_near_dup
          FROM ndids JOIN dom d USING (doc_id) GROUP BY 1),
        cen AS (
          SELECT d.registered_domain,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 count(DISTINCT d.canonical_url) AS n_canonical,
                 count(DISTINCT d.host) AS n_hosts,
                 CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
                 SUM(q.qmicro) AS qsum
          FROM dom d JOIN qual q USING (doc_id)
          WHERE d.registered_domain NOT IN
            (${Blocklist.map(s => s"'$s'").mkString(", ")})
          GROUP BY 1)
        SELECT c.registered_domain, n_docs, n_canonical, n_hosts,
               total_chars,
               CAST(n_docs - n_canonical AS DOUBLE) / n_docs AS dup_rate,
               CAST(qsum AS DOUBLE) / CAST(n_docs * 10000 AS DOUBLE)
                 AS mean_quality,
               CAST(coalesce(nd.n_near_dup, 0) AS BIGINT) AS n_near_dup,
               CAST(coalesce(nd.n_near_dup, 0) AS DOUBLE) / n_docs
                 AS near_dup_rate
        FROM cen c LEFT JOIN nddom nd USING (registered_domain)
        ORDER BY registered_domain""")),

    // ------------------------------------------------------------------
    // q209: HTML → main-text extraction with block-level boilerplate
    // removal ([[graft.ext.HtmlText.htmlExtract]]) — the step BEFORE
    // every text operator in a web pipeline: segment markup into block
    // fragments, keep the long low-link-density blocks (article
    // prose), drop nav/ad/footer units. The fixture wraps each
    // document's text in a deterministic page skeleton (title, 3-link
    // nav, optional 2-link ad div on doc_id % 3, 2-link footer) —
    // mirrored expression-for-expression in the oracle (the q200
    // synthesis discipline), which then replays segmentation, link
    // counting, tag stripping, the integer keep rule, and the md5 of
    // the extracted text. Pure map-side expression work at any scale.
    GraftQuery(
      "q209_html_extract",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val half = (length(col("text")) / lit(2)).cast("int")
        val c1 = col("text").substr(lit(1), half)
        val c2 = col("text").substr(half + lit(1),
          length(col("text")))
        val html = concat(
          lit("<html><head><title>doc "), col("doc_id").cast("string"),
          lit("</title></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></nav>"),
          lit("<p>"), c1, lit("</p>"),
          when(col("doc_id") % 3 === 0,
            lit("<div><a href=\"/buy\">Buy</a> <a href=\"/now\">now</a> " +
              "great deals</div>")).otherwise(lit("")),
          lit("<p>"), c2, lit("</p>"),
          lit("<footer><a href=\"/tos\">Terms</a> " +
            "<a href=\"/priv\">Privacy</a> (c) site"),
          (col("doc_id") % 5).cast("string"),
          lit("</footer></body></html>"))
        graft.ext.HtmlText.htmlExtract(
            t.documents.where(col("text").isNotNull), col("doc_id"), html)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH src AS (SELECT doc_id, text FROM documents
                     WHERE text IS NOT NULL),
        h AS (
          SELECT doc_id,
            '<html><head><title>doc ' || doc_id
            || '</title></head><body>'
            || '<nav><a href="/">Home</a> <a href="/a">About</a> '
            || '<a href="/c">Contact</a></nav>'
            || '<p>' || substr(text, 1, length(text) // 2) || '</p>'
            || CASE WHEN doc_id % 3 = 0
                    THEN '<div><a href="/buy">Buy</a> '
                         || '<a href="/now">now</a> great deals</div>'
                    ELSE '' END
            || '<p>' || substr(text, length(text) // 2 + 1) || '</p>'
            || '<footer><a href="/tos">Terms</a> '
            || '<a href="/priv">Privacy</a> (c) site' || (doc_id % 5)
            || '</footer></body></html>' AS html
          FROM src),
        frags AS (
          SELECT doc_id, list_filter(list_transform(
                   string_split_regex(html,
                     '(?i)</?(?:html|head|body|title|p|div|nav|footer|header|section|article|aside|ul|ol|li|h[1-6]|table|tr|td|br)[^>]*>'),
                   f -> trim(f)), f -> f <> '') AS fr
          FROM h),
        scored AS (
          SELECT doc_id, list_transform(fr, f -> struct_pack(
                   links := len(string_split(f, '<a ')) - 1,
                   txt := trim(regexp_replace(regexp_replace(f,
                     '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')))) AS sc0
          FROM frags),
        sc2 AS (
          SELECT doc_id, list_transform(sc0, s -> struct_pack(
                   links := struct_extract(s, 'links'),
                   txt := struct_extract(s, 'txt'),
                   words := CASE WHEN struct_extract(s, 'txt') = '' THEN 0
                                 ELSE len(string_split(
                                   struct_extract(s, 'txt'), ' ')) END))
                 AS sc
          FROM scored),
        k AS (
          SELECT doc_id, sc,
                 list_filter(sc, s -> struct_extract(s, 'words') >= 5
                   AND struct_extract(s, 'links') * 10
                       <= struct_extract(s, 'words')) AS kept
          FROM sc2)
        SELECT doc_id,
               CAST(len(sc) AS INT) AS n_blocks,
               CAST(len(kept) AS INT) AS n_kept,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(sc, s -> CAST(struct_extract(s, 'words')
                   AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS total_words,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(kept, s -> CAST(struct_extract(s, 'words')
                   AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS kept_words,
               CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(sc, s -> CAST(struct_extract(s,
                        'words') AS BIGINT))), (a, b) -> a + b) > 0
                    THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(kept, s -> CAST(struct_extract(s,
                        'words') AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
                      / list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(sc, s -> CAST(struct_extract(s,
                          'words') AS BIGINT))), (a, b) -> a + b)
               END AS kept_frac,
               CASE WHEN len(kept) > 0
                    THEN md5(array_to_string(list_transform(kept,
                      s -> struct_extract(s, 'txt')), ' '))
               END AS extracted_md5
        FROM k ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q216: WARC crawl-archive ingestion ([[graft.ext.Warc]]) — the
    // container web corpora actually arrive in (Common Crawl): per-file
    // record walk (version line, named headers, exact Content-Length
    // payload, CRLF CRLF terminator), HTTP response split (status
    // line, headers, body), first-response URI/date/status/
    // content-type/body surfaced — the ingest step that feeds the q200
    // URL pipeline and the q209 extractor. The oracle replays every
    // field from the synthesis formulas INCLUDING the body md5, so one
    // mis-sliced Content-Length anywhere desynchronizes the walk and
    // flips ok=false red. Even ids carry a 4th (metadata) record the
    // walker must count; doc_id % 17 ids answer 404; doc_id % 41 rows
    // carry raw text (fail-closed arm). Map-side only: archive bytes
    // never cross a shuffle; at 100 TB the parallelism unit is the
    // ~1 GB WARC file, one task each (the q212 gzip shape).
    GraftQuery(
      "q216_warc_ingest",
      (spark, dir) => {
        graft.ext.Warc.extractWarc(warcFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_records"),
            col("target_uri"), col("warc_date"), col("http_status"),
            col("content_type"), col("body_len"), col("body_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, doc_id % 41 = 0 AS bad,
                 CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
                   AS scheme,
                 'entry-' || CAST(doc_id AS VARCHAR) || '-'
                   || repeat('ab ', CAST(1 + doc_id % 7 AS INT)) AS body
          FROM documents)
        SELECT doc_id AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/warc' END AS mime,
               CAST(CASE WHEN bad THEN 0
                         WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS INT)
                 AS n_records,
               CASE WHEN bad THEN ''
                    ELSE scheme || '://site' || CAST(doc_id % 5 AS VARCHAR)
                         || '.test/doc/' || CAST(doc_id AS VARCHAR) END
                 AS target_uri,
               CASE WHEN bad THEN ''
                    ELSE '2026-08-' || CAST(10 + doc_id % 19 AS VARCHAR)
                         || 'T00:00:00Z' END AS warc_date,
               CAST(CASE WHEN bad THEN 0
                         WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS INT)
                 AS http_status,
               CASE WHEN bad THEN '' ELSE 'text/html' END AS content_type,
               CAST(CASE WHEN bad THEN 0 ELSE length(body) END AS BIGINT)
                 AS body_len,
               CASE WHEN bad THEN '' ELSE md5(body) END AS body_md5,
               NOT bad AS ok
        FROM p
        ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q218: robots.txt crawl-policy audit ([[graft.ext.Robots]]) — the
    // RFC 9309 compliance step between q216's ingest and the corpus: a
    // per-domain policy table parsed from REAL robots.txt text
    // (groups, comments, mixed case, multi-agent groups, unknown
    // directives) and evaluated per URL with the standard decision
    // rules — most-specific agent group (exact token beats *), longest
    // matching rule path, Allow winning length ties, empty Disallow as
    // allow-all, no-match/no-robots defaulting to allow. The five
    // domain policies are chosen so every rule fires somewhere in the
    // corpus; the oracle re-derives each decision independently from
    // the URL formulas (never parsing text), so the gate pins
    // parse → scope → longest-match end-to-end. Scale shape: rules
    // equi-join the corpus on domain (unhinted — AQE broadcasts a
    // small table, a domain-scale one shuffles instead of OOMing the
    // driver); one shuffle on the URL for the per-URL argmax.
    GraftQuery(
      "q218_robots_policy",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        import spark.implicits._
        val bodies = Seq(
          "site0.test" -> ("# corpus policy\nUser-agent: *\n" +
            "Disallow: /doc/1\nCrawl-delay: 2\n"),
          "site1.test" -> ("User-agent: *\nDisallow: /doc/\n\n" +
            "User-agent: GraftBot\nAllow: /doc/2\nDISALLOW: /doc/\n"),
          "site2.test" -> ("User-agent: *\nDisallow: /doc/3\n" +
            "Allow: /doc/3\nDisallow: /doc/4\n"),
          "site3.test" -> ("User-agent: *\nDisallow: /\n\n" +
            "User-Agent: graftbot\nDisallow:\n"),
          "site4.test" -> "") // no policy at all
        val rules = bodies
          .flatMap { case (dom, b) => graft.ext.Robots.parse(dom, b) }
          .toDF()
        val d5 = (col("doc_id") % 5).cast("string")
        val urls = t.documents.select(
          concat(when(col("doc_id") % 2 === 0, "http").otherwise("https"),
            lit("://site"), d5, lit(".test/doc/"),
            col("doc_id").cast("string")).as("url"),
          concat(lit("site"), d5, lit(".test")).as("domain"),
          concat(lit("/doc/"), col("doc_id").cast("string")).as("path"))
        graft.ext.Robots.evaluate(urls, rules, "GraftBot")
          .orderBy(col("url"))
      },
      Some("""
        WITH u AS (
          SELECT (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                   || '://site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
                 'site' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS domain,
                 '/doc/' || CAST(doc_id AS VARCHAR) AS path,
                 CAST(doc_id % 5 AS INT) AS d,
                 CAST(doc_id AS VARCHAR) AS s
          FROM documents)
        SELECT url, domain, path,
               CASE d WHEN 0 THEN NOT starts_with(s, '1')
                      WHEN 1 THEN starts_with(s, '2')
                      WHEN 2 THEN NOT starts_with(s, '4')
                      ELSE TRUE END AS allowed,
               CASE WHEN d = 0 AND starts_with(s, '1') THEN '/doc/1'
                    WHEN d = 1 AND starts_with(s, '2') THEN '/doc/2'
                    WHEN d = 1 THEN '/doc/'
                    WHEN d = 2 AND starts_with(s, '3') THEN '/doc/3'
                    WHEN d = 2 AND starts_with(s, '4') THEN '/doc/4'
                    WHEN d = 3 THEN ''
                    ELSE NULL END AS matched_path,
               CAST(CASE WHEN d = 0 AND starts_with(s, '1') THEN 6
                         WHEN d = 1 AND starts_with(s, '2') THEN 6
                         WHEN d = 1 THEN 5
                         WHEN d = 2 AND (starts_with(s, '3')
                                         OR starts_with(s, '4')) THEN 6
                         WHEN d = 3 THEN 0
                         ELSE NULL END AS INT) AS matched_len
        FROM u
        ORDER BY url""")),

    // ------------------------------------------------------------------
    // q220: end-to-end web-curation composite — the REAL operators
    // chained the way a production crawl-refinement run chains them:
    // [[graft.ext.Warc.extractWarc]] (archive → responses) → status
    // filter → [[graft.ext.UrlOps.canonicalizeUrl]]/[[graft.ext.UrlOps.hostOf]]
    // (URI normalization) → [[graft.ext.Robots.evaluate]] (RFC 9309
    // compliance, per-response verdicts carried through the policy
    // aggregation — no corpus-sized re-join) → canonical-URL dedup →
    // per-domain
    // rollup (responses, allowed, unique pages, allowed bytes). Each
    // stage is individually oracle-gated elsewhere (q216/q200/q218);
    // this gate pins their COMPOSITION: the oracle recomputes the
    // domain rollup from the synthesis formulas alone, so a fetch
    // leaking through the status filter, a policy mis-scope, a
    // canonicalization drift, or a dedup miscount anywhere in the
    // chain flips the hash. The fixture's paths collide by design
    // (doc_id % 89) so the dedup stage genuinely merges. Scale shape:
    // archives map-side, policy rules equi-joined on domain (AQE
    // broadcasts when small, shuffles when domain-scale), ONE
    // distinct over (domain-bounded) urls, one domain rollup.
    GraftQuery(
      "q220_web_pipeline",
      (spark, dir) => {
        import graft.ext.{Robots, UrlOps, Warc}
        val parsed = Warc.extractWarc(warc220Fixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("media_id"),
            UrlOps.canonicalizeUrl(col("target_uri")).as("url"),
            col("body_len"))
        val rest = substring_index(col("url"), "://", -1)
        val authority = substring_index(rest, "/", 1)
        val docs = parsed
          .withColumn("domain", UrlOps.hostOf(col("url")))
          .withColumn("path",
            col("url").substr(
              length(substring_index(col("url"), "://", 1)) + lit(3) +
                length(authority) + lit(1),
              length(col("url"))))
        val bodies = Seq(
          "site0.test" -> "User-agent: *\nDisallow: /p/1\n",
          "site1.test" -> ("User-agent: *\nDisallow: /p/\n\n" +
            "User-agent: GraftBot\nAllow: /p/2\nDisallow: /p/\n"),
          "site2.test" -> ("User-agent: *\nDisallow: /p/3\n" +
            "Allow: /p/3\nDisallow: /p/4\n"),
          "site3.test" -> ("User-agent: *\nDisallow: /\n\n" +
            "User-agent: graftbot\nDisallow:\n"),
          "site4.test" -> "")
        import spark.implicits._
        val rules = bodies
          .flatMap { case (dom, b) => Robots.parse(dom, b) }.toDF()
        val verdicts = Robots.evaluate(
          docs.select(col("url"), col("domain"), col("path"),
            col("media_id"), col("body_len")), rules,
          "GraftBot", carry = Seq("media_id", "body_len"))
        verdicts
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_responses"),
            sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
            countDistinct(when(col("allowed"), col("url")))
              .as("n_unique_pages"),
            sum(when(col("allowed"), col("body_len")).otherwise(0L))
              .as("bytes_allowed"))
          .orderBy(col("domain"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id AS m, CAST(doc_id % 5 AS INT) AS dom,
                 CAST(doc_id % 89 AS VARCHAR) AS ps,
                 length(CAST(doc_id AS VARCHAR)) AS L
          FROM documents
          WHERE doc_id % 43 <> 0 AND doc_id % 17 <> 0),
        a AS (
          SELECT *,
            CASE dom WHEN 0 THEN NOT starts_with(ps, '1')
                     WHEN 1 THEN starts_with(ps, '2')
                     WHEN 2 THEN NOT starts_with(ps, '4')
                     ELSE TRUE END AS allowed,
            7 + L + 3 * (1 + CAST(m % 7 AS INT)) AS blen
          FROM d)
        SELECT 'site' || CAST(dom AS VARCHAR) || '.test' AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_responses,
               CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_allowed,
               CAST(COUNT(DISTINCT CASE WHEN allowed
                     THEN CAST(m % 2 AS VARCHAR) || ':' || ps END)
                 AS BIGINT) AS n_unique_pages,
               CAST(SUM(CASE WHEN allowed THEN blen ELSE 0 END) AS BIGINT)
                 AS bytes_allowed
        FROM a
        GROUP BY 1
        ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q221: .warc.gz ingestion ([[graft.ext.Warc.extractWarcGz]]) —
    // the layout crawl corpora actually SHIP in: each record gzipped
    // as its own member, members concatenated (random access by
    // member offset for index readers; one sequential inflate for
    // scan readers — the JDK's concatenated-member support, with a
    // bounded-output cap against decompression bombs). Same synthesis
    // and oracle as q216 modulo the compression, so the gate prices
    // the multi-member gunzip path end-to-end against the identical
    // formulas. Fail-closed arm at doc_id % 41 (raw text — not gzip,
    // rejected by magic); at 100 TB the parallelism unit stays the
    // shard file (the q212 note).
    GraftQuery(
      "q221_warcgz_ingest",
      (spark, dir) => {
        graft.ext.Warc.extractWarcGz(warcGzFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_records"),
            col("target_uri"), col("warc_date"), col("http_status"),
            col("content_type"), col("body_len"), col("body_md5"),
            col("ok"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, doc_id % 41 = 0 AS bad,
                 CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
                   AS scheme,
                 'entry-' || CAST(doc_id AS VARCHAR) || '-'
                   || repeat('ab ', CAST(1 + doc_id % 7 AS INT)) AS body
          FROM documents)
        SELECT doc_id AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/warc+gzip' END AS mime,
               CAST(CASE WHEN bad THEN 0
                         WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS INT)
                 AS n_records,
               CASE WHEN bad THEN ''
                    ELSE scheme || '://site' || CAST(doc_id % 5 AS VARCHAR)
                         || '.test/doc/' || CAST(doc_id AS VARCHAR) END
                 AS target_uri,
               CASE WHEN bad THEN ''
                    ELSE '2026-08-' || CAST(10 + doc_id % 19 AS VARCHAR)
                         || 'T00:00:00Z' END AS warc_date,
               CAST(CASE WHEN bad THEN 0
                         WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS INT)
                 AS http_status,
               CASE WHEN bad THEN '' ELSE 'text/html' END AS content_type,
               CAST(CASE WHEN bad THEN 0 ELSE length(body) END AS BIGINT)
                 AS body_len,
               CASE WHEN bad THEN '' ELSE md5(body) END AS body_md5,
               NOT bad AS ok
        FROM p
        ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q224: extract-and-curate composite v2 — the TEXT-side sibling of
    // q220's URL-side pipeline, chaining the four curation kernels the
    // way a crawl-refinement run chains them:
    // [[graft.ext.HtmlText.htmlExtractText]] (boilerplate removal,
    // text RETAINED) → [[graft.functions.NfcNormalize]] (the fixture
    // plants a DECOMPOSED e+U+0301 inside a kept paragraph; the
    // oracle writes the COMPOSED form, so the md5 only matches if
    // normalization really ran) → [[graft.ext.TextAnalysis.qualityScore]]
    // (10⁻⁴-quantized) → [[graft.ext.Dedup.minhashPairs]] near-dup
    // over the NORMALIZED EXTRACTED text (doc_id % 53 docs share a
    // template body, so the dedup stage genuinely fires) → per-doc
    // verdict (quality ≥ 0.7 AND not a near-dup loser). Each stage is
    // oracle-gated alone (q209/q217/q33/q28); this pins the
    // COMPOSITION. Scale shape: extraction/normalization/quality are
    // map-side expression work; the pair stage is the q28 banded LSH
    // (8-byte keys only); the loser join is doc-keyed and unhinted.
    GraftQuery(
      "q224_extract_curate_pipeline",
      (spark, dir) => {
        import graft.ext.{Dedup, HtmlText, TextAnalysis}
        val t = new Tables(spark, dir)
        val body = when(col("doc_id") % 53 === 0,
          concat(lit("dup template "), (col("doc_id") % 3).cast("string"),
            lit(" shared body text repeated for near duplicate " +
              "detection across documents")))
          .otherwise(col("text"))
        val src = t.documents.where(col("text").isNotNull)
          .select(col("doc_id"), body.as("__body"))
        val half = (length(col("__body")) / lit(2)).cast("int")
        val html = concat(
          lit("<html><head><title>doc "), col("doc_id").cast("string"),
          lit("</title></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></nav>"),
          lit("<p>"), col("__body").substr(lit(1), half), lit("</p>"),
          when(col("doc_id") % 3 === 0,
            lit("<div><a href=\"/buy\">Buy</a> <a href=\"/now\">now</a> " +
              "great deals</div>")).otherwise(lit("")),
          lit("<p>"),
          col("__body").substr(half + lit(1), length(col("__body"))),
          lit(" Caf"), lit("é"), lit(" fin.</p>"),
          lit("<footer><a href=\"/tos\">Terms</a> " +
            "<a href=\"/priv\">Privacy</a> (c) site"),
          (col("doc_id") % 5).cast("string"),
          lit("</footer></body></html>"))
        val extracted = HtmlText.htmlExtractText(src, col("doc_id"), html)
        // `norm` feeds BOTH the LSH loser pass and the final verdict
        // join — one materialization instead of running the html
        // synthesis + extraction + NFC + quality kernels twice
        // (round-17 optimization: 2.23 → 1.53 s at sf0.1; the same
        // derive-once discipline as ndDomains in q206)
        val norm = extracted
          .withColumn("norm",
            graft.functions.NfcNormalize.nfc_normalize(col("extracted")))
          .withColumn("q_micro",
            round(TextAnalysis.qualityScore(col("norm")) * 10000)
              .cast("long"))
          .localCheckpoint(true)
        val losers = Dedup.minhashPairs(
            norm.where(col("norm").isNotNull), col("doc_id"), col("norm"),
            n = 3, threshold = 0.8)
          .select(col("id_b").as("doc_id")).distinct()
          .withColumn("__loser", lit(true))
        norm.join(losers, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_blocks"), col("kept_words"),
            length(col("norm")).as("text_len"),
            md5(col("norm")).as("text_md5"),
            col("q_micro"),
            coalesce(col("__loser"), lit(false)).as("near_dup_loser"),
            (coalesce(col("q_micro") >= 7000, lit(false)) &&
              !coalesce(col("__loser"), lit(false))).as("retained"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 53 = 0
                      THEN 'dup template ' || (doc_id % 3)
                        || ' shared body text repeated for near'
                        || ' duplicate detection across documents'
                      ELSE text END AS body
          FROM documents WHERE text IS NOT NULL),
        h AS (
          SELECT doc_id,
            '<html><head><title>doc ' || doc_id
            || '</title></head><body>'
            || '<nav><a href="/">Home</a> <a href="/a">About</a> '
            || '<a href="/c">Contact</a></nav>'
            || '<p>' || substr(body, 1, length(body) // 2) || '</p>'
            || CASE WHEN doc_id % 3 = 0
                    THEN '<div><a href="/buy">Buy</a> '
                         || '<a href="/now">now</a> great deals</div>'
                    ELSE '' END
            || '<p>' || substr(body, length(body) // 2 + 1)
            || ' Caf' || chr(233) || ' fin.</p>'
            || '<footer><a href="/tos">Terms</a> '
            || '<a href="/priv">Privacy</a> (c) site' || (doc_id % 5)
            || '</footer></body></html>' AS html
          FROM src),
        frags AS (
          SELECT doc_id, list_filter(list_transform(
                   string_split_regex(html,
                     '(?i)</?(?:html|head|body|title|p|div|nav|footer|header|section|article|aside|ul|ol|li|h[1-6]|table|tr|td|br)[^>]*>'),
                   f -> trim(f)), f -> f <> '') AS fr
          FROM h),
        sc2 AS (
          SELECT doc_id, list_transform(list_transform(fr,
                   f -> struct_pack(
                     links := len(string_split(f, '<a ')) - 1,
                     txt := trim(regexp_replace(regexp_replace(f,
                       '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')))),
                 s -> struct_pack(
                   links := struct_extract(s, 'links'),
                   txt := struct_extract(s, 'txt'),
                   words := CASE WHEN struct_extract(s, 'txt') = '' THEN 0
                                 ELSE len(string_split(
                                   struct_extract(s, 'txt'), ' ')) END))
                 AS sc
          FROM frags),
        k AS (
          SELECT doc_id, sc,
                 list_filter(sc, s -> struct_extract(s, 'words') >= 5
                   AND struct_extract(s, 'links') * 10
                       <= struct_extract(s, 'words')) AS kept
          FROM sc2),
        ex AS (
          SELECT doc_id,
                 CAST(len(sc) AS INT) AS n_blocks,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(kept, s -> CAST(struct_extract(s,
                     'words') AS BIGINT))), (a, b) -> a + b) AS BIGINT)
                   AS kept_words,
                 CASE WHEN len(kept) > 0
                      THEN nfc_normalize(array_to_string(
                        list_transform(kept, s -> struct_extract(s,
                          'txt')), ' '))
                 END AS norm
          FROM k),
        sig AS (
          SELECT doc_id, n_blocks, kept_words, norm,
            CAST(length(norm) AS DOUBLE) AS nc,
            CAST(len(string_split(norm, ' ')) AS DOUBLE) AS nw,
            CAST(len(list_filter(string_split(norm, ' '),
              x -> x IN ('the','a','of','and','to'))) AS DOUBLE) AS nstop,
            CAST(length(norm) - length(regexp_replace(norm, '[.,;:!?]',
              '', 'g')) AS DOUBLE) AS npunct,
            CAST(length(norm) - length(regexp_replace(norm, '[A-Z]',
              '', 'g')) AS DOUBLE) AS nupper
          FROM ex),
        qual AS (
          SELECT doc_id, n_blocks, kept_words, norm,
            CAST(round(
              (CASE WHEN nc = 0 THEN 0.0 ELSE
               floor((0.35 * (CASE WHEN nc BETWEEN 100 AND 10000
                              THEN 1.0 ELSE 0.3 END)
                   + 0.25 * (CASE WHEN (nc - (nw - 1)) / nw
                             BETWEEN 3 AND 10 THEN 1.0 ELSE 0.4 END)
                   + 0.2 * least((nstop / nw) * 5, 1.0)
                   + 0.1 * (1.0 - npunct / nc)
                   + 0.1 * (1.0 - nupper / nc)) * 10000 + 0.5) / 10000
               END) * 10000) AS BIGINT) AS q_micro
          FROM sig),
        words AS (SELECT doc_id, string_split(norm, ' ') AS w
                  FROM qual WHERE norm IS NOT NULL),
        shingles AS (SELECT doc_id, CASE WHEN len(w) >= 3
               THEN list_distinct(list_transform(
                 generate_series(1, len(w) - 2),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
               ELSE [array_to_string(w, ' ')] END AS sh FROM words),
        exsh AS (SELECT doc_id, unnest(sh) AS s FROM shingles),
        sizes AS (SELECT doc_id, len(sh) AS n FROM shingles),
        ndcand AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS inter
          FROM exsh a JOIN exsh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        losers AS (SELECT DISTINCT ib AS doc_id
          FROM ndcand JOIN sizes sa ON ia = sa.doc_id
                      JOIN sizes sb ON ib = sb.doc_id
          WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.8)
        SELECT q.doc_id, n_blocks, kept_words,
               CAST(length(norm) AS INT) AS text_len,
               md5(norm) AS text_md5,
               q_micro,
               l.doc_id IS NOT NULL AS near_dup_loser,
               COALESCE(q_micro >= 7000, FALSE)
                 AND l.doc_id IS NULL AS retained
        FROM qual q LEFT JOIN losers l ON q.doc_id = l.doc_id
        ORDER BY q.doc_id""")),

    // ------------------------------------------------------------------
    // q225: CDX member index over .warc.gz ([[graft.ext.Warc.cdxIndex]])
    // — the random-access side table crawl infrastructure publishes
    // next to each archive: one row per gzip MEMBER with the contained
    // record's type, target URI, and payload length (the byte
    // offset/length handles are verified structurally by the walk's
    // all-bytes-accounted contract and pinned by WarcSpec's
    // slice-and-reparse test; they are deflate-size-dependent, so the
    // formula oracle gates the structural columns). Same corpus as
    // q221 (fixture shared), so the gate also pins the one-record-per-
    // member profile: a multi-record member or raw-text arm (%41)
    // fails closed to a single ok=false row. Scale shape: map-side
    // member walk per archive file; the index rows are the ONLY thing
    // that leaves the scan.
    GraftQuery(
      "q225_warcgz_cdx_index",
      (spark, dir) => {
        graft.ext.Warc.extractCdx(warcGzFixture(spark, dir))
          .toDF()
          .select(col("media_id"), col("mime"), col("member_idx"),
            col("record_type"), col("target_uri"), col("payload_len"),
            col("ok"))
          .orderBy(col("media_id"), col("member_idx"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 41 = 0 AS bad,
                 CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
                   AS scheme,
                 CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS status,
                 CASE WHEN doc_id % 17 = 0 THEN 'Not Found' ELSE 'OK' END
                   AS reason,
                 'entry-' || CAST(doc_id AS VARCHAR) || '-'
                   || repeat('ab ', CAST(1 + doc_id % 7 AS INT)) AS body
          FROM documents),
        f AS (
          SELECT m, bad,
                 scheme || '://site' || CAST(m % 5 AS VARCHAR)
                   || '.test/doc/' || CAST(m AS VARCHAR) AS uri,
                 'GET /doc/' || CAST(m AS VARCHAR) || ' HTTP/1.1'
                   || chr(13) || chr(10) || 'Host: site'
                   || CAST(m % 5 AS VARCHAR) || '.test'
                   || chr(13) || chr(10) || chr(13) || chr(10) AS req,
                 'HTTP/1.1 ' || status || ' ' || reason
                   || chr(13) || chr(10) || 'Content-Type: text/html'
                   || chr(13) || chr(10) || 'Content-Length: '
                   || length(body) || chr(13) || chr(10)
                   || chr(13) || chr(10) || body AS resp
          FROM p),
        mem AS (
          SELECT m, bad,
            CASE WHEN bad THEN
              [struct_pack(idx := 0, typ := '', uri2 := '',
                 plen := CAST(0 AS BIGINT))]
            ELSE list_concat(
              [struct_pack(idx := 0, typ := 'warcinfo', uri2 := '',
                 plen := CAST(17 AS BIGINT)),
               struct_pack(idx := 1, typ := 'request', uri2 := uri,
                 plen := CAST(length(req) AS BIGINT)),
               struct_pack(idx := 2, typ := 'response', uri2 := uri,
                 plen := CAST(length(resp) AS BIGINT))],
              CASE WHEN m % 2 = 0 THEN
                [struct_pack(idx := 3, typ := 'metadata', uri2 := '',
                   plen := CAST(length('fetch: ' || CAST(m AS VARCHAR))
                     + 2 AS BIGINT))]
              ELSE [] END)
            END AS ms
          FROM f),
        u AS (SELECT m, bad, unnest(ms) AS r FROM mem)
        SELECT m AS media_id,
               CASE WHEN bad THEN 'application/octet-stream'
                    ELSE 'application/warc+gzip' END AS mime,
               CAST(struct_extract(r, 'idx') AS INT) AS member_idx,
               struct_extract(r, 'typ') AS record_type,
               struct_extract(r, 'uri2') AS target_uri,
               struct_extract(r, 'plen') AS payload_len,
               NOT bad AS ok
        FROM u
        ORDER BY media_id, member_idx""")),

    // ------------------------------------------------------------------
    // q227: crawl-refresh diff — the INCREMENTAL-ingest census a
    // periodically re-crawled corpus needs: snapshot A (the q216
    // corpus, fixture shared) vs snapshot B (same synthesis, a
    // different fail arm and a content drift at doc_id % 7), compared
    // by (url, body digest) after each side's archive walk + status
    // filter: per domain, how many pages are unchanged / changed /
    // added (B only) / removed (A only). The arms make every status
    // reachable: A's bad arm (%41) becomes ADDED in B (B parses
    // there), B's bad arm (%43) becomes REMOVED, %7 bodies get a
    // "-v2" suffix (CHANGED), 404s (%17) are excluded from both.
    // Scale shape: both walks map-side; ONE url-keyed full-outer join
    // (both sides co-keyed on url — no broadcast, no skew), then a
    // domain-sized rollup.
    GraftQuery(
      "q227_crawl_refresh_diff",
      (spark, dir) => {
        import graft.ext.Warc
        val a = Warc.extractWarc(warcFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"),
            col("body_md5").as("md5_a"))
        val b = Warc.extractWarc(warcRefreshFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"),
            col("body_md5").as("md5_b"))
        val domain = substring_index(
          substring_index(col("url"), "://", -1), "/", 1)
        a.join(b, Seq("url"), "full_outer")
          .select(domain.as("domain"),
            when(col("md5_a").isNotNull && col("md5_b").isNotNull &&
              col("md5_a") === col("md5_b"), "unchanged")
              .when(col("md5_a").isNotNull && col("md5_b").isNotNull,
                "changed")
              .when(col("md5_b").isNotNull, "added")
              .otherwise("removed").as("status"))
          .groupBy(col("domain"))
          .agg(
            sum(when(col("status") === "unchanged", 1L).otherwise(0L))
              .as("n_unchanged"),
            sum(when(col("status") === "changed", 1L).otherwise(0L))
              .as("n_changed"),
            sum(when(col("status") === "added", 1L).otherwise(0L))
              .as("n_added"),
            sum(when(col("status") === "removed", 1L).otherwise(0L))
              .as("n_removed"))
          .orderBy(col("domain"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m,
                 doc_id % 41 = 0 AS bad_a,
                 doc_id % 43 = 0 AS bad_b,
                 doc_id % 17 = 0 AS p404,
                 doc_id % 7 = 0 AS drift
          FROM documents),
        s AS (
          SELECT 'site' || CAST(m % 5 AS VARCHAR) || '.test' AS domain,
                 NOT bad_a AND NOT p404 AS in_a,
                 NOT bad_b AND NOT p404 AS in_b,
                 drift
          FROM p
          WHERE (NOT bad_a OR NOT bad_b) AND NOT p404)
        SELECT domain,
               CAST(SUM(CASE WHEN in_a AND in_b AND NOT drift
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
               CAST(SUM(CASE WHEN in_a AND in_b AND drift
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN NOT in_a AND in_b
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN in_a AND NOT in_b
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        FROM s
        GROUP BY domain
        ORDER BY domain""")),

    // ------------------------------------------------------------------
    // q229: sitemap coverage audit ([[graft.ext.Sitemap]]) — the
    // scheduling complement to q218's robots compliance: parse each
    // domain's sitemap.xml (urlset groups, required <loc>, optional
    // <lastmod>, skipped extensions, entity decode — the &amp; in the
    // per-domain extra URL only counts as a query URL if decoding
    // really ran) and join it against the q216 crawl snapshot
    // (fixture shared) per URL: listed+crawled, listed-but-uncrawled
    // (the refresh backlog), crawled-but-unlisted (discovery side),
    // and the freshest lastmod. Scale shape: sitemap parse map-side;
    // ONE url-keyed full-outer join (co-keyed, unhinted); domain
    // rollup.
    GraftQuery(
      "q229_sitemap_coverage",
      (spark, dir) => {
        import graft.ext.{Sitemap, Warc}
        val listed = Sitemap.extractSitemap(sitemapFixture(spark, dir))
          .toDF()
          .filter(col("ok"))
          .select(col("loc").as("url"), col("lastmod"))
          .withColumn("l", lit(true))
        val crawled = Warc.extractWarc(warcFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"))
          .withColumn("c", lit(true))
        val domain = substring_index(
          substring_index(col("url"), "://", -1), "/", 1)
        listed.join(crawled, Seq("url"), "full_outer")
          .select(domain.as("domain"), col("l"), col("c"),
            col("lastmod"), col("url"))
          .groupBy(col("domain"))
          .agg(
            sum(when(col("l"), 1L).otherwise(0L)).as("n_listed"),
            sum(when(col("l") && col("c"), 1L).otherwise(0L))
              .as("n_crawled_listed"),
            sum(when(col("l") && col("c").isNull, 1L).otherwise(0L))
              .as("n_listed_uncrawled"),
            sum(when(col("l").isNull && col("c"), 1L).otherwise(0L))
              .as("n_crawled_unlisted"),
            sum(when(col("url").contains("&b="), 1L).otherwise(0L))
              .as("n_query_urls"),
            max(when(col("l"), col("lastmod"))).as("max_lastmod"))
          .orderBy(col("domain"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, CAST(doc_id % 5 AS INT) AS d,
                 doc_id % 3 <> 0 AS listed,
                 doc_id % 41 <> 0 AND doc_id % 17 <> 0 AS crawled,
                 '2026-08-' || CAST(10 + doc_id % 19 AS VARCHAR) AS lm
          FROM documents),
        base AS (SELECT * FROM p WHERE listed OR crawled),
        agg AS (
          SELECT 'site' || CAST(d AS VARCHAR) || '.test' AS domain,
            SUM(CASE WHEN listed THEN 1 ELSE 0 END) AS nl,
            SUM(CASE WHEN listed AND crawled THEN 1 ELSE 0 END) AS ncl,
            SUM(CASE WHEN listed AND NOT crawled THEN 1 ELSE 0 END)
              AS nlu,
            SUM(CASE WHEN crawled AND NOT listed THEN 1 ELSE 0 END)
              AS ncu,
            max(CASE WHEN listed THEN lm END) AS max_lm
          FROM base GROUP BY 1)
        SELECT domain,
               CAST(nl + 1 AS BIGINT) AS n_listed,
               CAST(ncl AS BIGINT) AS n_crawled_listed,
               CAST(nlu + 1 AS BIGINT) AS n_listed_uncrawled,
               CAST(ncu AS BIGINT) AS n_crawled_unlisted,
               CAST(1 AS BIGINT) AS n_query_urls,
               max_lm AS max_lastmod
        FROM agg
        ORDER BY domain""")),

    // ------------------------------------------------------------------
    // q230: fetch-frontier scheduling — the capstone of the crawl arc
    // (q216 ingest → q218 compliance → q229 coverage → q227 refresh):
    // build the NEXT fetch list. Candidates: sitemap-listed pages the
    // last crawl missed (priority 1, 'discover' — q229's backlog,
    // derived by an anti-join against the snapshot) ∪ pages whose
    // content drifted between snapshots (priority 2, 'recrawl' —
    // q227's changed set). Every candidate then passes
    // [[graft.ext.Robots.evaluate]] (verdict carried through the
    // aggregation, the q220 shape); disallowed candidates are counted,
    // never fetched. Output per domain: candidate counts by class,
    // blocked count, and the top-3 fetch order (priority, then URL).
    // Scale shape: all joins URL- or domain-keyed and unhinted; the
    // per-domain top-3 is a bounded sort_array over an
    // already-aggregated list.
    GraftQuery(
      "q230_fetch_frontier",
      (spark, dir) => {
        import graft.ext.{Robots, Warc}
        import spark.implicits._
        val a = Warc.extractWarc(warcFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"), col("body_md5").as("m_a"))
        val b = Warc.extractWarc(warcRefreshFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"), col("body_md5").as("m_b"))
        val recrawl = a.join(b, Seq("url"))
          .filter(col("m_a") =!= col("m_b"))
          .select(col("url"), lit(2).as("priority"))
        val discover = graft.ext.Sitemap
          .extractSitemap(sitemapFixture(spark, dir)).toDF()
          .filter(col("ok"))
          .select(col("loc").as("url"))
          .join(a.select(col("url")), Seq("url"), "left_anti")
          .select(col("url"), lit(1).as("priority"))
        val cand = discover.unionByName(recrawl)
        val rest = substring_index(col("url"), "://", -1)
        val withDom = cand
          .withColumn("domain", substring_index(rest, "/", 1))
          .withColumn("path",
            col("url").substr(
              length(substring_index(col("url"), "://", 1)) + lit(3) +
                length(substring_index(rest, "/", 1)) + lit(1),
              length(col("url"))))
        val bodies = Seq(
          "site0.test" -> ("# corpus policy\nUser-agent: *\n" +
            "Disallow: /doc/1\nCrawl-delay: 2\n"),
          "site1.test" -> ("User-agent: *\nDisallow: /doc/\n\n" +
            "User-agent: GraftBot\nAllow: /doc/2\nDISALLOW: /doc/\n"),
          "site2.test" -> ("User-agent: *\nDisallow: /doc/3\n" +
            "Allow: /doc/3\nDisallow: /doc/4\n"),
          "site3.test" -> ("User-agent: *\nDisallow: /\n\n" +
            "User-Agent: graftbot\nDisallow:\n"),
          "site4.test" -> "")
        val rules = bodies
          .flatMap { case (dom, t) => Robots.parse(dom, t) }.toDF()
        val verdicts = Robots.evaluate(
          withDom.select(col("url"), col("domain"), col("path"),
            col("priority")),
          rules, "GraftBot", carry = Seq("priority"))
        verdicts
          .withColumn("__k",
            when(col("allowed"),
              concat(col("priority").cast("string"), lit("|"),
                col("url"))))
          .groupBy(col("domain"))
          .agg(
            sum(when(col("allowed") && col("priority") === 1, 1L)
              .otherwise(0L)).as("n_discover"),
            sum(when(col("allowed") && col("priority") === 2, 1L)
              .otherwise(0L)).as("n_recrawl"),
            sum(when(!col("allowed"), 1L).otherwise(0L)).as("n_blocked"),
            // Serialized with array_join (the SurfaceQueries.scala
            // convention): the oracle harness hashes cell values and
            // cannot hash raw arrays — r15's q230 red row.
            array_join(
              transform(
                slice(sort_array(collect_list(col("__k"))), 1, 3),
                k => k.substr(lit(3), length(k))),
              "|").as("top_urls"))
          .orderBy(col("domain"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, CAST(doc_id % 5 AS INT) AS d,
                 CAST(doc_id AS VARCHAR) AS s,
                 doc_id % 41 = 0 AS bad_a, doc_id % 43 = 0 AS bad_b,
                 doc_id % 17 = 0 AS p404,
                 doc_id % 3 <> 0 AS listed, doc_id % 7 = 0 AS drift,
                 (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                   || '://site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        c AS (
          SELECT d, url, 1 AS pri, s, FALSE AS extra FROM p
          WHERE listed AND (bad_a OR p404)
          UNION ALL
          SELECT d, url, 2, s, FALSE FROM p
          WHERE NOT bad_a AND NOT bad_b AND NOT p404 AND drift
          UNION ALL
          SELECT d, 'https://site' || CAST(d AS VARCHAR)
                   || '.test/extra?a=1&b=2', 1, '', TRUE
          FROM (SELECT DISTINCT CAST(doc_id % 5 AS INT) AS d
                FROM documents)),
        v AS (
          SELECT *, CASE WHEN extra THEN TRUE
                 WHEN d = 0 THEN NOT starts_with(s, '1')
                 WHEN d = 1 THEN starts_with(s, '2')
                 WHEN d = 2 THEN NOT starts_with(s, '4')
                 ELSE TRUE END AS allowed,
               CAST(pri AS VARCHAR) || '|' || url AS k
          FROM c)
        SELECT 'site' || CAST(d AS VARCHAR) || '.test' AS domain,
               CAST(SUM(CASE WHEN allowed AND pri = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_discover,
               CAST(SUM(CASE WHEN allowed AND pri = 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_recrawl,
               CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_blocked,
               array_to_string(
                 list_transform(
                   list_slice(list_sort(list(k) FILTER (WHERE allowed)),
                     1, 3),
                   x -> x[3:]), '|') AS top_urls
        FROM v GROUP BY d ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q244: POLITE fetch frontier (VERDICT r16 item 5) — q230 ordered
    // the fetches but nothing rate-limited them; a real scheduler
    // needs max-fetches-per-domain-per-window. Same candidate build
    // and robots verdicts as q230, plus [[graft.ext.Robots
    // .crawlDelayFor]] (group-scoped Crawl-delay: exact-agent group
    // decides ALONE even when it declares no delay — site3 pins that
    // against a 7 s decoy in its `*` group — case-insensitive at
    // site2, exact-group value at site1, default for the silent
    // site4) and [[graft.ext.Frontier.politeSchedule]]: fetch k of a
    // domain runs at (k-1)×delay, and `in_window` prices the 6 s
    // budget. A wrong group scope, a missed delay, or a rank slip
    // all flip a count, an eta, or the schedule serialization.
    GraftQuery(
      "q244_polite_frontier",
      (spark, dir) => {
        import graft.ext.{Frontier, Robots, Warc}
        import spark.implicits._
        val a = Warc.extractWarc(warcFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"), col("body_md5").as("m_a"))
        val b = Warc.extractWarc(warcRefreshFixture(spark, dir)).toDF()
          .filter(col("ok") && col("http_status") === 200)
          .select(col("target_uri").as("url"), col("body_md5").as("m_b"))
        val recrawl = a.join(b, Seq("url"))
          .filter(col("m_a") =!= col("m_b"))
          .select(col("url"), lit(2).as("priority"))
        val discover = graft.ext.Sitemap
          .extractSitemap(sitemapFixture(spark, dir)).toDF()
          .filter(col("ok"))
          .select(col("loc").as("url"))
          .join(a.select(col("url")), Seq("url"), "left_anti")
          .select(col("url"), lit(1).as("priority"))
        val cand = discover.unionByName(recrawl)
        val rest = substring_index(col("url"), "://", -1)
        val withDom = cand
          .withColumn("domain", substring_index(rest, "/", 1))
          .withColumn("path",
            col("url").substr(
              length(substring_index(col("url"), "://", 1)) + lit(3) +
                length(substring_index(rest, "/", 1)) + lit(1),
              length(col("url"))))
        val bodies = Seq(
          "site0.test" -> ("# corpus policy\nUser-agent: *\n" +
            "Disallow: /doc/1\nCrawl-delay: 2\n"),
          "site1.test" -> ("User-agent: *\nDisallow: /doc/\n\n" +
            "User-agent: GraftBot\nAllow: /doc/2\nDISALLOW: /doc/\n" +
            "Crawl-delay: 5\n"),
          "site2.test" -> ("User-agent: *\nDisallow: /doc/3\n" +
            "Allow: /doc/3\nDisallow: /doc/4\nCRAWL-DELAY: 3\n"),
          "site3.test" -> ("User-agent: *\nDisallow: /\n" +
            "Crawl-delay: 7\n\nUser-Agent: graftbot\nDisallow:\n"),
          "site4.test" -> "")
        val rules = bodies
          .flatMap { case (dom, t) => Robots.parse(dom, t) }.toDF()
        val verdicts = Robots.evaluate(
          withDom.select(col("url"), col("domain"), col("path"),
            col("priority")),
          rules, "GraftBot", carry = Seq("priority"))
        val delays = bodies
          .flatMap { case (dom, t) =>
            Robots.crawlDelayFor(dom, t, "GraftBot").map(d => (dom, d))
          }.toDF("domain", "delay_s")
        val sched = Frontier.politeSchedule(
          verdicts.filter(col("allowed"))
            .select(col("url"), col("domain"), col("priority")),
          delays, horizonSec = 6, defaultDelay = 1)
        sched.withColumn("__k",
            concat(lpad(col("fetch_rank").cast("string"), 6, "0"),
              lit("|"), col("url"), lit("@"),
              col("fetch_at").cast("string")))
          .groupBy(col("domain"))
          .agg(
            max(col("delay_s")).as("delay_s"),
            count(lit(1)).as("n_allowed"),
            sum(when(col("in_window"), 1L).otherwise(0L))
              .as("n_in_window"),
            max(col("fetch_at")).as("last_eta"),
            array_join(
              transform(
                slice(sort_array(collect_list(col("__k"))), 1, 3),
                k => k.substr(lit(8), length(k))),
              "|").as("top3"))
          .orderBy(col("domain"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, CAST(doc_id % 5 AS INT) AS d,
                 CAST(doc_id AS VARCHAR) AS s,
                 doc_id % 41 = 0 AS bad_a, doc_id % 43 = 0 AS bad_b,
                 doc_id % 17 = 0 AS p404,
                 doc_id % 3 <> 0 AS listed, doc_id % 7 = 0 AS drift,
                 (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                   || '://site' || CAST(doc_id % 5 AS VARCHAR)
                   || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        c AS (
          SELECT d, url, 1 AS pri, s, FALSE AS extra FROM p
          WHERE listed AND (bad_a OR p404)
          UNION ALL
          SELECT d, url, 2, s, FALSE FROM p
          WHERE NOT bad_a AND NOT bad_b AND NOT p404 AND drift
          UNION ALL
          SELECT d, 'https://site' || CAST(d AS VARCHAR)
                   || '.test/extra?a=1&b=2', 1, '', TRUE
          FROM (SELECT DISTINCT CAST(doc_id % 5 AS INT) AS d
                FROM documents)),
        v AS (
          SELECT *, CASE WHEN extra THEN TRUE
                 WHEN d = 0 THEN NOT starts_with(s, '1')
                 WHEN d = 1 THEN starts_with(s, '2')
                 WHEN d = 2 THEN NOT starts_with(s, '4')
                 ELSE TRUE END AS allowed
          FROM c),
        r AS (
          SELECT d, url, pri,
                 ROW_NUMBER() OVER (PARTITION BY d ORDER BY pri, url)
                   AS rk,
                 CASE d WHEN 0 THEN 2 WHEN 1 THEN 5 WHEN 2 THEN 3
                   ELSE 1 END AS delay
          FROM v WHERE allowed),
        sch AS (
          SELECT *, CAST((rk - 1) * delay AS BIGINT) AS fetch_at FROM r)
        SELECT 'site' || CAST(d AS VARCHAR) || '.test' AS domain,
               CAST(MAX(delay) AS INT) AS delay_s,
               CAST(COUNT(*) AS BIGINT) AS n_allowed,
               CAST(SUM(CASE WHEN fetch_at < 6 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_in_window,
               CAST(MAX(fetch_at) AS BIGINT) AS last_eta,
               array_to_string(list_transform(
                 list_slice(list_sort(list(
                   lpad(CAST(rk AS VARCHAR), 6, '0') || '|' || url
                     || '@' || CAST(fetch_at AS VARCHAR))), 1, 3),
                 x -> x[8:]), '|') AS top3
        FROM sch GROUP BY d ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q235: two-level sitemap TREE resolution ([[graft.ext.Sitemap
    // .resolveTree]]) — the shape real sites publish (the 50k-URL
    // cap forces a <sitemapindex> over child sitemaps; q229 covered
    // one flat urlset per domain). Each site's index lists 1+m%3
    // children; a child is MISSING from the fetch at (m+k)%7 (the
    // scheduler's backlog), fetched-but-unparseable at %41 (surfaces
    // as BOTH unparsed and missing — refetch either way), and an
    // UN-INDEXED orphan sitemap exists at %11 (pages with null
    // index_url). The rollup pins attribution (indexed vs orphan
    // pages), both gap classes, and an md5 over the sorted page set —
    // a wrong join key, a dropped entity decode, or a page attributed
    // to the wrong parent all flip a column. Scale shape: map-side
    // XML walks + two site-local url-keyed equi-joins, unhinted.
    GraftQuery(
      "q235_sitemap_tree",
      (spark, dir) => {
        val flat = graft.ext.Sitemap.resolveTree(
          sitemapTreeFixture(spark, dir))
        flat
          .groupBy(col("site_id"))
          .agg(
            sum(when(col("role") === "page", 1L).otherwise(0L))
              .as("n_pages"),
            sum(when(col("role") === "page" &&
              col("index_url").isNotNull, 1L).otherwise(0L))
              .as("n_indexed_pages"),
            sum(when(col("role") === "page" && col("index_url").isNull,
              1L).otherwise(0L)).as("n_orphan_pages"),
            sum(when(col("role") === "missing_child", 1L).otherwise(0L))
              .as("n_missing_children"),
            sum(when(col("role") === "unparsed", 1L).otherwise(0L))
              .as("n_unparsed"),
            max(when(col("role") === "page", col("lastmod")))
              .as("max_lastmod"),
            md5(array_join(sort_array(collect_list(
              when(col("role") === "page", col("page_url")))), "|"))
              .as("pages_md5"))
          .orderBy(col("site_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, CAST(1 + doc_id % 3 AS INT) AS nc
          FROM documents),
        t AS (
          SELECT *,
            flatten(list_transform(range(0, nc), k ->
              CASE WHEN (m + k) % 7 = 0 OR (m % 41 = 0 AND k = 0)
                THEN []
                ELSE list_transform(range(0, 2 + (m + k) % 3), j ->
                  struct_pack(
                    u := 'https://s' || m || '.test/p' || k || '_' || j
                      || CASE WHEN j = 0 AND m % 5 = 0
                         THEN '?a=1&b=2' ELSE '' END,
                    lm := CASE WHEN j % 2 = 0
                      THEN '2024-03-0' || (1 + (m + j) % 7) ELSE '' END,
                    idx := TRUE))
              END))
            || CASE WHEN m % 11 = 0 THEN
                 [struct_pack(u := 'https://s' || m || '.test/px_0',
                    lm := '', idx := FALSE)]
               ELSE [] END AS pages,
            len(list_filter(range(0, nc), k -> (m + k) % 7 = 0))
              + CASE WHEN m % 41 = 0 AND m % 7 <> 0 THEN 1 ELSE 0 END
              AS n_missing,
            CASE WHEN m % 41 = 0 AND m % 7 <> 0 THEN 1 ELSE 0 END
              AS n_unparsed
          FROM p)
        SELECT m AS site_id,
               CAST(len(pages) AS BIGINT) AS n_pages,
               CAST(len(list_filter(pages, x -> x.idx)) AS BIGINT)
                 AS n_indexed_pages,
               CAST(len(list_filter(pages, x -> NOT x.idx)) AS BIGINT)
                 AS n_orphan_pages,
               CAST(n_missing AS BIGINT) AS n_missing_children,
               CAST(n_unparsed AS BIGINT) AS n_unparsed,
               CASE WHEN len(pages) = 0 THEN NULL
                    ELSE list_max(list_transform(pages, x -> x.lm)) END
                 AS max_lastmod,
               md5(coalesce(array_to_string(
                 list_sort(list_transform(pages, x -> x.u)), '|'), ''))
                 AS pages_md5
        FROM t ORDER BY site_id""")),

    // ------------------------------------------------------------------
    // q237: robots.txt sitemap DISCOVERY ([[graft.ext.Robots
    // .sitemapDirectives]]) — the channel that tells a crawler the
    // sitemap roots exist at all (RFC 9309 §2.3: group-independent
    // `Sitemap:` lines). Each site's robots declares its index
    // (duplicated line — dedup pinned), the orphan sitemap on the %22
    // arm, and a GHOST sitemap (declared, never fetched) at %13 with
    // an upper-case `SITEMAP:` key (case-insensitivity pinned);
    // declarations join the q235 fetched corpus to split
    // declared+fetched from the ghost backlog. Completes the arc:
    // DISCOVER (here) → resolve (q235) → comply (q218) → cover
    // (q229) → refresh (q227) → schedule (q230).
    GraftQuery(
      "q237_sitemap_discovery",
      (spark, dir) => {
        import spark.implicits._
        val t = new Tables(spark, dir)
        val declared = t.documents.select(col("doc_id")).as[Long]
          .flatMap { m =>
            val host = s"https://s$m.test"
            val body = "User-agent: *\nDisallow: /private\n\n" +
              s"Sitemap: $host/sitemap_index.xml\n" +
              s"Sitemap: $host/sitemap_index.xml # dup, dropped\n" +
              (if (m % 22 == 0) s"Sitemap: $host/sm_x.xml\n" else "") +
              (if (m % 13 == 0) s"SITEMAP: $host/sm_ghost.xml\n" else "")
            graft.ext.Robots.sitemapDirectives(s"s$m.test", body)
              .map { case (_, u) => (m, u) }
          }.toDF("site_id", "url")
        val fetched = sitemapTreeFixture(spark, dir)
          .select(col("site_id"), col("url")).distinct()
          .withColumn("f", lit(true))
        declared.join(fetched, Seq("site_id", "url"), "left")
          .groupBy(col("site_id"))
          .agg(
            count(lit(1)).as("n_declared"),
            sum(when(col("f"), 1L).otherwise(0L)).as("n_declared_fetched"),
            sum(when(col("f").isNull, 1L).otherwise(0L))
              .as("n_ghost"),
            md5(array_join(sort_array(collect_list(col("url"))), "|"))
              .as("declared_md5"))
          .orderBy(col("site_id"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id AS m, doc_id % 22 = 0 AS orph,
                 doc_id % 13 = 0 AS ghost
          FROM documents),
        t AS (
          SELECT *,
            ['https://s' || m || '.test/sitemap_index.xml']
            || CASE WHEN orph
               THEN ['https://s' || m || '.test/sm_x.xml'] ELSE [] END
            || CASE WHEN ghost
               THEN ['https://s' || m || '.test/sm_ghost.xml'] ELSE [] END
              AS declared
          FROM p)
        SELECT m AS site_id,
               CAST(len(declared) AS BIGINT) AS n_declared,
               CAST(1 + CASE WHEN orph THEN 1 ELSE 0 END AS BIGINT)
                 AS n_declared_fetched,
               CAST(CASE WHEN ghost THEN 1 ELSE 0 END AS BIGINT)
                 AS n_ghost,
               md5(array_to_string(list_sort(declared), '|'))
                 AS declared_md5
        FROM t ORDER BY site_id""")))

  /** Synthesized WARC corpus for q216: one archive per document —
    * warcinfo + request + response (+ metadata on even ids), every
    * field a formula of doc_id the oracle replays. Fail-closed arm at
    * doc_id % 41.
    */
  private def warcFixture(spark: org.apache.spark.sql.SparkSession,
                          dir: String)
      : org.apache.spark.sql.Dataset[graft.ext.Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q216_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              graft.ext.Multimodal.MediaRecord(m,
                "application/octet-stream", text.getBytes("UTF-8"))
            else {
              val scheme = if (m % 2 == 0) "http" else "https"
              val uri = scheme + "://site" + (m % 5) + ".test/doc/" + m
              val date = "2026-08-" + (10 + m % 19) + "T00:00:00Z"
              val status = if (m % 17 == 0) 404 else 200
              val reason = if (status == 200) "OK" else "Not Found"
              val body = s"entry-$m-" + "ab " * (1 + (m % 7)).toInt
              val httpResp =
                s"HTTP/1.1 $status $reason\r\nContent-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n$body"
              val req = s"GET /doc/$m HTTP/1.1\r\nHost: site${m % 5}" +
                ".test\r\n\r\n"
              val recs = Seq(
                ("warcinfo",
                  Seq("WARC-Date" -> date,
                    "WARC-Record-ID" -> s"<urn:graft:$m:info>"),
                  "software: graft\r\n".getBytes("UTF-8")),
                ("request",
                  Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date),
                  req.getBytes("UTF-8")),
                ("response",
                  Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date,
                    "WARC-Record-ID" -> s"<urn:graft:$m:resp>"),
                  httpResp.getBytes("UTF-8"))) ++
                (if (m % 2 == 0)
                  Seq(("metadata", Seq("WARC-Date" -> date),
                    s"fetch: $m\r\n".getBytes("UTF-8")))
                else Nil)
              graft.ext.Multimodal.MediaRecord(m, "application/warc",
                graft.ext.Warc.encode(recs))
            }
          }
        }.toDF()
    }.as[graft.ext.Multimodal.MediaRecord]
  }

  /** The q221 corpus: the q216 records, each gzipped as its own
    * member ([[graft.ext.Warc.encodeGz]]).
    */
  private def warcGzFixture(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[graft.ext.Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q221_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 41 == 0)
              graft.ext.Multimodal.MediaRecord(m,
                "application/octet-stream", text.getBytes("UTF-8"))
            else {
              val scheme = if (m % 2 == 0) "http" else "https"
              val uri = scheme + "://site" + (m % 5) + ".test/doc/" + m
              val date = "2026-08-" + (10 + m % 19) + "T00:00:00Z"
              val status = if (m % 17 == 0) 404 else 200
              val reason = if (status == 200) "OK" else "Not Found"
              val body = s"entry-$m-" + "ab " * (1 + (m % 7)).toInt
              val httpResp =
                s"HTTP/1.1 $status $reason\r\nContent-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n$body"
              val req = s"GET /doc/$m HTTP/1.1\r\nHost: site${m % 5}" +
                ".test\r\n\r\n"
              val recs = Seq(
                ("warcinfo",
                  Seq("WARC-Date" -> date,
                    "WARC-Record-ID" -> s"<urn:graft:$m:info>"),
                  "software: graft\r\n".getBytes("UTF-8")),
                ("request",
                  Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date),
                  req.getBytes("UTF-8")),
                ("response",
                  Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date,
                    "WARC-Record-ID" -> s"<urn:graft:$m:resp>"),
                  httpResp.getBytes("UTF-8"))) ++
                (if (m % 2 == 0)
                  Seq(("metadata", Seq("WARC-Date" -> date),
                    s"fetch: $m\r\n".getBytes("UTF-8")))
                else Nil)
              graft.ext.Multimodal.MediaRecord(m, "application/warc+gzip",
                graft.ext.Warc.encodeGz(recs))
            }
          }
        }.toDF()
    }.as[graft.ext.Multimodal.MediaRecord]
  }

  /** The q227 refresh snapshot: the q216 synthesis with the fail arm
    * moved to doc_id % 43 (so A's bad rows become ADDED and B's become
    * REMOVED) and a "-v2" body drift at doc_id % 7 (CHANGED).
    */
  private def warcRefreshFixture(spark: org.apache.spark.sql.SparkSession,
                                 dir: String)
      : org.apache.spark.sql.Dataset[graft.ext.Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q227_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 43 == 0)
              graft.ext.Multimodal.MediaRecord(m,
                "application/octet-stream", text.getBytes("UTF-8"))
            else {
              val scheme = if (m % 2 == 0) "http" else "https"
              val uri = scheme + "://site" + (m % 5) + ".test/doc/" + m
              val date = "2026-08-" + (10 + m % 19) + "T00:00:00Z"
              val status = if (m % 17 == 0) 404 else 200
              val reason = if (status == 200) "OK" else "Not Found"
              val body = s"entry-$m-" + "ab " * (1 + (m % 7)).toInt +
                (if (m % 7 == 0) "-v2" else "")
              val httpResp =
                s"HTTP/1.1 $status $reason\r\nContent-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n$body"
              graft.ext.Multimodal.MediaRecord(m, "application/warc",
                graft.ext.Warc.encode(Seq(
                  ("warcinfo", Seq("WARC-Date" -> date),
                    "software: graft\r\n".getBytes("UTF-8")),
                  ("response",
                    Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date),
                    httpResp.getBytes("UTF-8")))))
            }
          }
        }.toDF()
    }.as[graft.ext.Multimodal.MediaRecord]
  }

  /** The q229 sitemaps: one urlset per domain listing the doc_id % 3
    * ≠ 0 URLs of that domain (same URL formulas as q216, so the
    * coverage join is real) plus one never-crawled extra URL whose
    * query string is entity-encoded (decode trap). Deterministic:
    * entries sorted by doc_id. The xmlns value is the sitemaps.org
    * protocol's namespace IDENTIFIER (a format constant; nothing
    * dereferences it).
    */
  private def sitemapFixture(spark: org.apache.spark.sql.SparkSession,
                             dir: String)
      : org.apache.spark.sql.Dataset[graft.ext.Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q229_fixture", dir) {
      t.documents
        .filter(col("doc_id") % 3 =!= 0)
        .select((col("doc_id") % 5).as("d"), col("doc_id"))
        .groupBy(col("d"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .as[(Long, Seq[Long])]
        .map { case (d, ids) =>
          val sb = new StringBuilder
          sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
          sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/" +
            "sitemap/0.9\">")
          ids.foreach { m =>
            val scheme = if (m % 2 == 0) "http" else "https"
            sb.append("<url><loc>").append(scheme).append("://site")
              .append(d).append(".test/doc/").append(m)
              .append("</loc><lastmod>2026-08-").append(10 + m % 19)
              .append("</lastmod><priority>0.5</priority></url>")
          }
          sb.append("<url><loc>https://site").append(d)
            .append(".test/extra?a=1&amp;b=2</loc>")
            .append("<lastmod>2026-08-01</lastmod></url>")
          sb.append("</urlset>")
          graft.ext.Multimodal.MediaRecord(d, "application/xml",
            sb.toString.getBytes("UTF-8"))
        }.toDF()
    }.as[graft.ext.Multimodal.MediaRecord]
  }

  /** The q235 fetched-sitemap corpus: per site m, a sitemapindex at
    * /sitemap_index.xml listing 1+m%3 children; child k's urlset is
    * MISSING from the fetch at (m+k)%7, garbage bytes (fetched but
    * unparseable) at m%41 for k=0, else 2+(m+k)%3 pages (lastmod on
    * even j, an &amp;-escaped query URL at j=0 when m%5==0); an
    * un-indexed orphan sitemap at m%11. Every formula replayed by the
    * oracle.
    */
  private def sitemapTreeFixture(spark: org.apache.spark.sql.SparkSession,
                                 dir: String)
      : org.apache.spark.sql.DataFrame = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q235_fixture", dir) {
      t.documents.select(col("doc_id")).as[Long]
        .flatMap { m =>
          val host = s"https://s$m.test"
          val nc = (1 + m % 3).toInt
          def urlset(pages: Seq[(String, String)]): Array[Byte] = {
            val sb = new StringBuilder
            sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
            sb.append("<urlset xmlns=\"http://www.sitemaps.org/" +
              "schemas/sitemap/0.9\">")
            pages.foreach { case (u, lm) =>
              sb.append("<url><loc>")
                .append(u.replace("&", "&amp;")).append("</loc>")
              if (lm.nonEmpty)
                sb.append("<lastmod>").append(lm).append("</lastmod>")
              sb.append("</url>")
            }
            sb.append("</urlset>")
            sb.toString.getBytes("UTF-8")
          }
          val idx = {
            val sb = new StringBuilder
            sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
            sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/" +
              "schemas/sitemap/0.9\">")
            (0 until nc).foreach { k =>
              sb.append("<sitemap><loc>").append(host).append("/sm_")
                .append(k).append(".xml</loc></sitemap>")
            }
            sb.append("</sitemapindex>")
            (m, s"$host/sitemap_index.xml",
              sb.toString.getBytes("UTF-8"))
          }
          val children = (0 until nc).flatMap { k =>
            if ((m + k) % 7 == 0) None // fetch gap: the backlog arm
            else if (m % 41 == 0 && k == 0)
              Some((m, s"$host/sm_$k.xml",
                s"fetched garbage $m".getBytes("UTF-8")))
            else {
              val np = (2 + (m + k) % 3).toInt
              val pages = (0 until np).map { j =>
                val u = s"$host/p${k}_$j" +
                  (if (j == 0 && m % 5 == 0) "?a=1&b=2" else "")
                val lm =
                  if (j % 2 == 0) "2024-03-0" + (1 + (m + j) % 7) else ""
                (u, lm)
              }
              Some((m, s"$host/sm_$k.xml", urlset(pages)))
            }
          }
          val orphan =
            if (m % 11 == 0)
              Seq((m, s"$host/sm_x.xml",
                urlset(Seq((s"$host/px_0", "")))))
            else Nil
          Seq(idx) ++ children ++ orphan
        }
        .toDF("site_id", "url", "media")
    }
  }

  /** The q220 crawl corpus: the q216 synthesis with COLLIDING paths
    * (doc_id % 89) so the downstream dedup stage genuinely merges,
    * and the same status/fail arms (404 at % 17, raw text at % 43).
    */
  private def warc220Fixture(spark: org.apache.spark.sql.SparkSession,
                             dir: String)
      : org.apache.spark.sql.Dataset[graft.ext.Multimodal.MediaRecord] = {
    val t = new Tables(spark, dir)
    import spark.implicits._
    FixtureCache.materialized(spark, "q220_fixture", dir) {
      t.documents.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (m, text) =>
            if (m % 43 == 0)
              graft.ext.Multimodal.MediaRecord(m,
                "application/octet-stream", text.getBytes("UTF-8"))
            else {
              val scheme = if (m % 2 == 0) "http" else "https"
              val uri = scheme + "://site" + (m % 5) + ".test/p/" + (m % 89)
              val date = "2026-08-" + (10 + m % 19) + "T00:00:00Z"
              val status = if (m % 17 == 0) 404 else 200
              val reason = if (status == 200) "OK" else "Not Found"
              val body = s"entry-$m-" + "ab " * (1 + (m % 7)).toInt
              val httpResp =
                s"HTTP/1.1 $status $reason\r\nContent-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n$body"
              graft.ext.Multimodal.MediaRecord(m, "application/warc",
                graft.ext.Warc.encode(Seq(
                  ("warcinfo", Seq("WARC-Date" -> date),
                    "software: graft\r\n".getBytes("UTF-8")),
                  ("response",
                    Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date),
                    httpResp.getBytes("UTF-8")))))
            }
          }
        }.toDF()
    }.as[graft.ext.Multimodal.MediaRecord]
  }
}
