package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-13 URL/domain curation kernels ([[graft.ext.UrlOps]]):
  * canonicalization over hand-built hostile URLs, registered-domain
  * extraction, the synthesized-corpus collapse invariants, and
  * canonicalization idempotence over the full synthesized corpus.
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  private def regdom(hosts: String*): Seq[String] =
    hosts.toDF("h").select(UrlOps.registeredDomain(col("h")).as("r"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: hostile hand-built URLs") {
    val cases = Seq(
      // case-folding scheme+host, userinfo strip, default-port strip,
      // tracking-param strip (order of survivors preserved), fragment
      "HTTP://User:Pw@WWW.Example.COM:80/A/b?utm_source=x&id=3&ref=y#frag"
        -> "http://www.example.com/A/b?id=3",
      // https default port, root path survives
      "https://example.co.uk:443/" -> "https://example.co.uk/",
      // non-default port is kept
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      // all params stripped -> '?' dropped entirely
      "http://example.com/p?utm_a=1&utm_b=2" -> "http://example.com/p",
      // trailing bare '?' dropped
      "http://e.com/p?" -> "http://e.com/p",
      // no path at all: empty path normalizes to '/' (RFC 3986 §6.2.3)
      "HTTPS://E.COM" -> "https://e.com/",
      // query directly after the authority, no path (ADVICE r13):
      // tracking params ARE stripped, and the path-less spelling
      // collapses with its '/?' sibling
      "http://e.com?utm_a=1" -> "http://e.com/",
      "http://e.com?x=1" -> "http://e.com/?x=1",
      "http://e.com/?x=1" -> "http://e.com/?x=1",
      "HTTP://u:p@E.com:80?utm_a=1&id=2" -> "http://e.com/?id=2",
      // IDN punycode passes through undecoded (documented non-goal)
      "http://xn--bcher-kva.example/x" -> "http://xn--bcher-kva.example/x",
      // %-escapes and param order preserved (documented non-goals)
      "http://e.com/a%2Fb?b=2&a=1" -> "http://e.com/a%2Fb?b=2&a=1",
      // userinfo without port, multiple tracking families
      "http://u@e.com/p?gclid=g&fbclid=f&msclkid=m&keep=1"
        -> "http://e.com/p?keep=1",
      // port on http that is https' default is NOT stripped
      "http://e.com:443/x" -> "http://e.com:443/x")
    val got = canon(cases.map(_._1): _*)
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"in=$in")
    }
  }

  test("canonicalizeUrl: no-scheme inputs pass through the same ops " +
       "deterministically (pinned, documented precondition)") {
    // substring_index with no '://' returns the whole string for both
    // parts, so the input is treated as scheme-and-authority; the pin
    // documents (not endorses) the out-of-contract behavior.
    assert(canon("not-a-url") == Seq("not-a-url://not-a-url/"))
  }

  test("registeredDomain: two-level suffixes, plain TLDs, short hosts") {
    assert(regdom(
      "www.example.co.uk", "a.b.example.com", "example.com",
      "deep.sub.tree.com.au", "localhost", "co.uk", "site1.org") ==
      Seq("example.co.uk", "example.com", "example.com",
        "tree.com.au", "localhost", "co.uk", "site1.org"))
  }

  test("synthesized corpus: canonical content is a pure function of " +
       "doc_id % 37, variants genuinely collapse, idempotence holds") {
    val docs = (0L until 500L).toDF("doc_id")
      .withColumn("url", UrlOps.synthesizeUrl(col("doc_id")))
      .withColumn("canonical", UrlOps.canonicalizeUrl(col("url")))
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // canonical = f(doc_id % 37) exactly
    val byK = rows.groupBy(_._1 % 37)
    assert(byK.size == 37)
    byK.foreach { case (k, g) =>
      assert(g.map(_._3).distinct.size == 1, s"k=$k canonical not pure")
    }
    // the variants are real: every k-group carries >1 raw spelling
    byK.foreach { case (k, g) =>
      assert(g.map(_._2).distinct.size > 1, s"k=$k no raw variety")
    }
    // canonicalization is idempotent on its own output
    val twice = docs
      .withColumn("again", UrlOps.canonicalizeUrl(col("canonical")))
      .filter(col("again") =!= col("canonical")).count()
    assert(twice == 0L)
    // canonical URLs never retain variants: no userinfo, no fragment,
    // no tracking params, no default port, all-lowercase scheme+host
    rows.foreach { case (_, _, c) =>
      assert(!c.contains("@") && !c.contains("#") && !c.contains("utm_")
        && !c.contains("ref=tw") && !c.contains(":80/")
        && !c.contains(":443/"), c)
      assert(c.startsWith("http://") || c.startsWith("https://"), c)
    }
  }

  test("domainCensus: blocklist anti-join removes exactly the listed " +
       "domains; dup accounting is consistent") {
    val docs = (0L until 500L).toDF("doc_id")
      .withColumn("n_chars", lit(10L))
    val all = UrlOps.domainCensus(docs, col("doc_id"),
      UrlOps.synthesizeUrl(col("doc_id")), col("n_chars"), Nil)
    val blocked = UrlOps.domainCensus(docs, col("doc_id"),
      UrlOps.synthesizeUrl(col("doc_id")), col("n_chars"),
      Seq("site0.com", "site2.co.uk"))
    val allDoms = all.select("registered_domain")
      .collect().map(_.getString(0)).toSet
    val keptDoms = blocked.select("registered_domain")
      .collect().map(_.getString(0)).toSet
    assert(allDoms.contains("site0.com") && allDoms.contains("site2.co.uk"))
    assert(keptDoms == allDoms -- Set("site0.com", "site2.co.uk"))
    // dup_rate ∈ [0,1) and n_canonical ≤ n_docs on every row
    blocked.collect().foreach { r =>
      val nd = r.getAs[Long]("n_docs"); val nc = r.getAs[Long]("n_canonical")
      val dr = r.getAs[Double]("dup_rate")
      assert(nc <= nd && dr >= 0.0 && dr < 1.0)
      assert(dr == (nd - nc).toDouble / nd)
    }
  }

  test("domainReputation: exact mean quality, near-dup and dup rates on a hand fixture") {
    // two domains: a.com (3 docs, one canonical collapse, quality
    // 0.5/0.7/0.9, two near-dup participants) and b.org (1 doc,
    // quality 0.2, no near-dups); c.net is blocklisted away
    val docs = Seq(
      (1L, "http://a.com/x?utm_source=f", 10L),
      (2L, "http://A.COM/x",              20L),
      (3L, "https://a.com/y",             30L),
      (4L, "http://b.org/z",              40L),
      (5L, "http://c.net/w",              50L)
    ).toDF("doc_id", "url", "n_chars")
    val quality = Map(1L -> 5000L, 2L -> 7000L, 3L -> 9000L,
      4L -> 2000L, 5L -> 100L)
    val qCol = quality.foldLeft(lit(0L)) { case (acc, (id, q)) =>
      when(col("doc_id") === id, lit(q)).otherwise(acc)
    }
    val ndDomains = Seq(("a.com", 2L)).toDF("registered_domain", "n_near_dup")
    val out = UrlOps.domainReputation(docs, col("doc_id"), col("url"),
        col("n_chars"), qCol, ndDomains, Seq("c.net"))
      .orderBy("registered_domain").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a.com", "b.org"))
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_canonical") == 2L) // docs 1+2 collapse
    assert(a.getAs[Double]("dup_rate") == 1.0 / 3)
    assert(a.getAs[Double]("mean_quality") == 21000.0 / 30000)
    assert(a.getAs[Long]("n_near_dup") == 2L)
    assert(a.getAs[Double]("near_dup_rate") == 2.0 / 3)
    assert(a.getAs[Long]("total_chars") == 60L)
    assert(b.getAs[Long]("n_near_dup") == 0L) // absent -> coalesced 0
    assert(b.getAs[Double]("near_dup_rate") == 0.0)
    assert(b.getAs[Double]("mean_quality") == 0.2)
  }
}
