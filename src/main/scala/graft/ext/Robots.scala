package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy evaluation (RFC 9309) — the compliance
  * step between q216's archive ingest and everything downstream: a
  * responsible corpus pipeline drops documents whose URL the site's
  * robots policy disallows for its crawler. Parsing follows the RFC's
  * group model: consecutive `User-agent:` lines open a group, the
  * group's `Allow:`/`Disallow:` rules apply to every agent it names,
  * the most specific agent match wins (exact product token beats
  * `*`), and per-URL the LONGEST matching rule path wins with Allow
  * breaking length ties (the rule Google documents and RFC 9309
  * standardizes). Empty `Disallow:` means allow-all. Restricted
  * profile: literal path prefixes only (no `*`/`$` wildcards) — the
  * overwhelming majority of real rules, and what keeps the decision
  * exactly replayable in the oracle's SQL.
  *
  * Scale shape: policies are per-DOMAIN (thousands of rows where the
  * corpus has billions), parsed once into a rule table and BROADCAST;
  * the per-URL decision is one broadcast join + one aggregation over
  * the matched rules — the corpus never reshuffles for compliance.
  */
object Robots {

  final case class Rule(domain: String, agent: String, allow: Boolean,
                        path: String)

  /** Parse one robots.txt body into rules. Tolerant of comments,
    * blank lines, mixed case, and unknown directives (skipped);
    * malformed lines (no colon) are skipped — robots.txt consumers
    * are lenient by long convention (fail-open per line, with the
    * overall default being ALLOW, so a mangled file never blocks a
    * crawl it should permit — the RFC's stance).
    */
  def parse(domain: String, body: String): Seq[Rule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var agents = List.empty[String]
    var inRules = false
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val k = line.substring(0, colon).trim.toLowerCase
          val v = line.substring(colon + 1).trim
          k match {
            case "user-agent" =>
              if (inRules) { agents = Nil; inRules = false }
              agents = v.toLowerCase :: agents
            case "allow" | "disallow" if agents.nonEmpty =>
              inRules = true
              if (v.nonEmpty || k == "disallow")
                // empty Disallow = allow-all marker; keep as an Allow
                // of "" so the group is recorded but never blocks
                agents.foreach { a =>
                  out += Rule(domain, a,
                    allow = k == "allow" || v.isEmpty,
                    path = v)
                }
            case _ => // crawl-delay, sitemap, unknown: skipped
          }
        }
      }
    }
    out.toSeq
  }

  /** Evaluate URLs against a rule table for `agent`: per URL, pick the
    * applicable agent group (exact token if the domain has one, else
    * `*`), then the longest matching rule path, Allow winning length
    * ties; no matching rule (or no robots at all) = allowed. Pure
    * relational: `rules` is domain-sized and broadcast; `urls` never
    * reshuffles.
    *
    * Expects `urls(url, domain, path)`; returns url, domain, allowed,
    * matched rule path + type (null when no rule matched).
    */
  def evaluate(urls: DataFrame, rules: DataFrame, agent: String)
      : DataFrame = {
    val a = lower(lit(agent))
    // does the domain define a group for this agent?
    val hasExact = rules.filter(lower(col("agent")) === a)
      .select(col("domain").as("he_domain")).distinct()
    val scoped = rules.join(broadcast(hasExact),
        col("domain") === col("he_domain"), "left")
      .filter(
        when(col("he_domain").isNotNull, lower(col("agent")) === a)
          .otherwise(col("agent") === "*"))
      .select(col("domain").as("r_domain"), col("allow"),
        col("path").as("r_path"))
    urls.join(broadcast(scoped), col("domain") === col("r_domain") &&
        (col("r_path") === "" ||
          col("path").startsWith(col("r_path"))), "left")
      .groupBy(col("url"), col("domain"), col("path"))
      .agg(max(when(col("r_path").isNotNull,
        struct(length(col("r_path")).as("l"),
          col("allow").cast("int").as("a"),
          col("r_path").as("p")))).as("best"))
      .select(col("url"), col("domain"), col("path"),
        coalesce(col("best.a") === 1, lit(true)).as("allowed"),
        col("best.p").as("matched_path"),
        col("best.l").as("matched_len"))
  }
}
