package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation kernels — the C4/RefinedWeb web-crawl recipe
  * steps that run BEFORE text cleaning: canonicalize every URL, dedup
  * on the canonical form, aggregate per registered domain, and drop
  * blocklisted domains.
  *
  * Everything here is a pure per-row expression chain over built-in
  * string/array functions (codegen'd, zero shuffles); the dedup and
  * census groupings are single hash aggregations on low-cardinality
  * keys. At 100 TB the canonicalization is map-side cost only, the
  * canonical-URL dedup shuffles one (url, count) pair per distinct
  * URL, and the per-domain census shuffles one row per registered
  * domain — the blocklist side is always broadcast.
  *
  * Every kernel step is chosen to have an exact DuckDB string-SQL
  * mirror (substring_index ↔ split_part, slice ↔ list slicing,
  * filter ↔ list_filter) so the whole family is oracle-gated; the
  * deliberate non-goals are documented per function (no IDN punycode
  * decoding, no %-escape normalization, no full public-suffix list).
  */
object UrlOps {

  /** Two-level public suffixes recognized by [[registeredDomain]].
    * Deliberately a short built-in list (the common ccTLD second-level
    * registries), NOT the full Mozilla public-suffix list — at
    * production scale that list would ship as a broadcast lookup the
    * same way; the kernel's shape (match on the last two labels, take
    * three) is what matters here.
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "co.nz", "co.in", "co.za", "com.br", "com.mx")

  /** Tracking-parameter predicates stripped by [[canonicalizeUrl]]:
    * the ubiquitous analytics/click identifiers whose presence forks
    * otherwise-identical URLs (the #1 cause of crawl URL blowup).
    */
  private def isTrackingParam(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("gclid=") ||
      p.startsWith("fbclid=") || p.startsWith("msclkid=") ||
      p.startsWith("ref=")

  /** Canonicalize an absolute http(s) URL:
    *
    *   - strip the fragment (`#…`)
    *   - lowercase the scheme and host (path/query case is preserved —
    *     paths are case-sensitive on most origins)
    *   - strip userinfo (`user:pw@`)
    *   - strip the scheme's default port (`:80` http, `:443` https);
    *     non-default ports are kept
    *   - drop tracking query parameters ([[isTrackingParam]]),
    *     preserving the relative order of the survivors, and drop the
    *     `?` entirely when nothing survives — including a query that
    *     directly follows the authority with no path (`http://e.com?x`)
    *   - normalize an empty path to `/` (RFC 3986 §6.2.3), so
    *     `http://e.com?x` collapses with `http://e.com/?x`
    *
    * Precondition: the input contains `://` exactly once (an absolute
    * URL). Inputs without a scheme pass through the same string ops
    * deterministically (the whole input is treated as
    * scheme-and-authority); UrlOpsSpec pins that behavior. Deliberate
    * non-goals, each documented because a full crawler would add them
    * as further map-side steps: no IDN punycode decoding (xn-- hosts
    * pass through unchanged), no %-escape or dot-segment
    * normalization, no query-parameter re-sorting (order is a content
    * signal some origins depend on).
    *
    * Every step is a built-in expression with an exact DuckDB mirror —
    * see the q200/q201 oracle SQL in
    * [[graft.analytics.WebCurationQueries]].
    */
  def canonicalizeUrl(u: Column): Column = {
    val nf = substring_index(u, "#", 1)
    val scheme = lower(substring_index(nf, "://", 1))
    val rest = substring_index(nf, "://", -1)
    // a query can directly follow the authority with no path
    // (http://e.com?x) — split it off BEFORE host/port extraction so
    // it routes through the same query-filtering path (ADVICE r13)
    val authority = substring_index(substring_index(rest, "/", 1), "?", 1)
    // substr is 1-based; everything past the authority (starts with
    // '/' or '?' when present, empty otherwise)
    val pathq = rest.substr(length(authority) + lit(1), length(rest))
    val hostport = substring_index(authority, "@", -1)
    val host = lower(substring_index(hostport, ":", 1))
    // explicit CASE on both engines: Spark's substring_index(x,':',-1)
    // returns the whole string when ':' is absent, DuckDB's
    // split_part(x,':',2) returns '' — the guard makes them agree
    val port = when(hostport.contains(":"),
      substring_index(hostport, ":", -1)).otherwise(lit(""))
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portOut = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val path = substring_index(pathq, "?", 1)
    // position-based (not last-'?'-based) so both engines agree on
    // pathological multi-'?' inputs
    val qs = when(pathq.contains("?"),
      pathq.substr(length(path) + lit(2), length(pathq))).otherwise(lit(""))
    val kept = array_join(
      filter(split(qs, "&"), p => !isTrackingParam(p)), "&")
    // RFC 3986 §6.2.3: an empty path with an authority normalizes to
    // "/" — so http://e.com?x and http://e.com/?x collapse
    val pathOut = when(path === "", lit("/")).otherwise(path)
    concat(scheme, lit("://"), host, portOut, pathOut,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Host of an already-canonicalized URL (lowercase, no userinfo):
    * the authority minus any port.
    */
  def hostOf(canonical: Column): Column = {
    val rest = substring_index(canonical, "://", -1)
    val authority = substring_index(rest, "/", 1)
    substring_index(substring_index(authority, "?", 1), ":", 1)
  }

  /** Registered domain (aka eTLD+1) of a lowercase host: the last two
    * labels, or the last three when the last two form a known
    * two-level public suffix ([[TwoLevelSuffixes]]). Hosts with fewer
    * than two labels (localhost, IPs are out of scope) pass through.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(n <= 2, host)
      .when(last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Deterministic URL synthesis for the testdata corpus (documents
    * has no url column — TESTDATA.md). Same discipline as the q199
    * text fixtures: the fixture IS part of the query and is mirrored
    * expression-for-expression in the DuckDB oracle, so both engines
    * derive identical inputs from doc_id alone.
    *
    * Structure: the CANONICAL content (scheme, host, non-default port,
    * path, real query param) derives from `k = doc_id % 37`, while the
    * canonicalization-removable VARIANTS (scheme/host case, userinfo,
    * default port, tracking params, fragment) derive from doc_id
    * directly. 37 is coprime to every variant modulus, so documents
    * with equal k carry the same canonical URL under different raw
    * spellings — the canonical-URL dedup has real work to do at every
    * SF (500-doc sf0.001 already holds ~13 collapsed groups), and the
    * collapse count is exactly derivable by the oracle.
    */
  def synthesizeUrl(docId: Column): Column = {
    val d = docId
    val k = d % 37
    val schemeL = when(k % 2 === 0, lit("http")).otherwise(lit("https"))
    val scheme = when(d % 4 === 0, upper(schemeL)).otherwise(schemeL)
    val suffix = when(k % 5 === 0, lit(".com"))
      .when(k % 5 === 1, lit(".co.uk"))
      .when(k % 5 === 2, lit(".org"))
      .when(k % 5 === 3, lit(".com.au"))
      .otherwise(lit(".net"))
    val hostL = concat(lit("www"), (k % 4).cast("string"),
      lit(".site"), (k % 3).cast("string"), suffix)
    val host = when(d % 8 === 0, upper(hostL)).otherwise(hostL)
    val userinfo = when(d % 9 === 0, lit("u:p@")).otherwise(lit(""))
    val port = when(k % 7 === 1, lit(":8080"))
      .when(d % 6 === 0,
        when(schemeL === "http", lit(":80")).otherwise(lit(":443")))
      .otherwise(lit(""))
    val path = concat(lit("/p/"), (k % 7).cast("string"), lit("/x"))
    val idq = when(k % 3 > 0,
      concat(lit("id="), (k % 8).cast("string"))).otherwise(lit(""))
    val qs = when(d % 3 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"), (d % 4).cast("string"),
          when(idq === "", lit("")).otherwise(concat(lit("&"), idq))))
      .when(d % 3 === 1,
        when(idq === "", lit("?ref=tw"))
          .otherwise(concat(lit("?"), idq, lit("&ref=tw"))))
      .otherwise(when(idq === "", lit("")).otherwise(concat(lit("?"), idq)))
    val frag = when(d % 4 === 2, lit("#sec1")).otherwise(lit(""))
    concat(scheme, lit("://"), userinfo, host, port, path, qs, frag)
  }

  /** Exact canonical-URL dedup census: one row per canonical URL with
    * the document count, the distinct raw-spelling count, and the
    * keep-min-doc_id winner. One hash aggregation keyed on the
    * canonical string; at 100 TB this is the standard map-side
    * partial-agg shape (the per-URL group is tiny — raw spellings of
    * one page).
    */
  def canonicalDedup(docs: DataFrame, docId: Column, url: Column)
      : DataFrame =
    docs
      .withColumn("__url", url)
      .withColumn("canonical_url", canonicalizeUrl(col("__url")))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__url")).as("n_raw"),
        min(docId).as("keeper_doc_id"))

  /** Per-registered-domain census with a broadcast blocklist
    * anti-join: docs, distinct canonical URLs, distinct hosts, total
    * chars, and the duplicate rate (docs that would be removed by
    * canonical-URL dedup, as a single exact-integer division). The
    * blocklist is the C4/RefinedWeb domain-denylist step — always the
    * small side, so always broadcast; the corpus never reshuffles for
    * it.
    */
  /** Full domain-reputation census (the RefinedWeb table a crawl
    * curator actually consults before admitting a domain): q201's
    * census columns PLUS mean document quality and near-dup
    * participation per registered domain — VERDICT r13 item 4, the
    * half of the r12 brief q201 shipped without.
    *
    * `qualityMicro` is the per-document quality scaled to an exact
    * integer (quality·10⁴ — [[TextAnalysis.qualityScore]] is already
    * 10⁻⁴-quantized, so the long cast is lossless); the mean is then
    * ONE double division of exact integers (Σq_micro / (n·10⁴)) —
    * fold-order-free and engine-identical, the q201 dup_rate
    * discipline. `nearDupDomains` is a PRE-AGGREGATED domain-keyed
    * frame (registered_domain, n_near_dup) — docs of the domain that
    * participate in ≥ 1 near-dup pair; the caller derives it from its
    * pair set (q28's MinHash+LSH output) so this join is
    * aggregate-then-join: both sides domain-sized, the corpus never
    * reshuffles for it. At 100 TB: one corpus-scan aggregation keyed
    * on registered_domain (map-side partials collapse per-domain),
    * one broadcast anti-join for the blocklist, one domain-keyed left
    * join for the near-dup census.
    */
  def domainReputation(docs: DataFrame, docId: Column, url: Column,
                       nChars: Column, qualityMicro: Column,
                       nearDupDomains: DataFrame,
                       blocklist: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = broadcast(blocklist.toDF("registered_domain"))
    docs
      .withColumn("__url", url)
      .withColumn("__canonical", canonicalizeUrl(col("__url")))
      .withColumn("__host", hostOf(col("__canonical")))
      .withColumn("registered_domain", registeredDomain(col("__host")))
      .withColumn("__chars", nChars)
      .withColumn("__q", qualityMicro)
      .join(blocked, Seq("registered_domain"), "left_anti")
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__canonical")).as("n_canonical"),
        countDistinct(col("__host")).as("n_hosts"),
        sum(col("__chars")).cast("long").as("total_chars"),
        sum(col("__q")).as("__qsum"))
      // deliberately UNHINTED (the q218 lesson): both sides are
      // domain-keyed aggregates — AQE broadcasts while they are small
      // and degrades to a shuffled equi-join at web-crawl domain
      // counts instead of OOMing the driver
      .join(nearDupDomains.select(col("registered_domain"),
        col("n_near_dup")), Seq("registered_domain"), "left")
      .select(col("registered_domain"), col("n_docs"), col("n_canonical"),
        col("n_hosts"), col("total_chars"),
        ((col("n_docs") - col("n_canonical")).cast("double") / col("n_docs"))
          .as("dup_rate"),
        (col("__qsum").cast("double") /
          (col("n_docs") * lit(10000L)).cast("double")).as("mean_quality"),
        coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"),
        (coalesce(col("n_near_dup"), lit(0L)).cast("double") /
          col("n_docs")).as("near_dup_rate"))
  }

  def domainCensus(docs: DataFrame, docId: Column, url: Column,
                   nChars: Column, blocklist: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val blocked = broadcast(blocklist.toDF("registered_domain"))
    docs
      .withColumn("__url", url)
      .withColumn("__canonical", canonicalizeUrl(col("__url")))
      .withColumn("__host", hostOf(col("__canonical")))
      .withColumn("registered_domain", registeredDomain(col("__host")))
      .withColumn("__chars", nChars)
      .join(blocked, Seq("registered_domain"), "left_anti")
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__canonical")).as("n_canonical"),
        countDistinct(col("__host")).as("n_hosts"),
        sum(col("__chars")).cast("long").as("total_chars"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_canonical")).cast("double") / col("n_docs"))
  }
}
