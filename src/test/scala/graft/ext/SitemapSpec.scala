package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Sitemap]] — the q229 parser. Goldens are hand-written
  * (never via the fixture builder); profile violations fail closed;
  * fuzz never throws.
  */
class SitemapSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes("UTF-8")

  test("golden urlset: loc required, lastmod optional, extensions " +
      "skipped, entities decoded, whitespace trimmed") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      "<url><loc> https://a.test/p?x=1&amp;y=2 </loc>" +
      "<lastmod>2026-01-02</lastmod><priority>0.8</priority>" +
      "<changefreq>daily</changefreq></url>" +
      "<url><loc>https://a.test/q</loc></url>" +
      "</urlset>"
    val Some((kind, entries)) = Sitemap.parse(b(xml))
    assert(kind == "urlset")
    assert(entries == Seq(
      ("https://a.test/p?x=1&y=2", "2026-01-02"),
      ("https://a.test/q", "")))
  }

  test("golden sitemapindex: sitemap groups parse the same way") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>https://a.test/s1.xml</loc>" +
      "<lastmod>2026-02-03</lastmod></sitemap>" +
      "<sitemap><loc>https://a.test/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    val Some((kind, entries)) = Sitemap.parse(b(xml))
    assert(kind == "sitemapindex")
    assert(entries.map(_._1) ==
      Seq("https://a.test/s1.xml", "https://a.test/s2.xml"))
  }

  test("profile violations fail closed") {
    // wrong root
    assert(Sitemap.parse(b("<html><url><loc>x</loc></url></html>")).isEmpty)
    // group without loc
    assert(Sitemap.parse(b(
      "<urlset><url><lastmod>2026</lastmod></url></urlset>")).isEmpty)
    // duplicate loc in one group
    assert(Sitemap.parse(b(
      "<urlset><url><loc>a</loc><loc>b</loc></url></urlset>")).isEmpty)
    // nested group
    assert(Sitemap.parse(b(
      "<urlset><url><url><loc>a</loc></url></url></urlset>")).isEmpty)
    // unterminated group
    assert(Sitemap.parse(b("<urlset><url><loc>a</loc>")).isEmpty)
    // comment / numeric entity / markup inside loc
    assert(Sitemap.parse(b(
      "<!-- c --><urlset><url><loc>a</loc></url></urlset>")).isEmpty)
    assert(Sitemap.parse(b(
      "<urlset><url><loc>a&#65;</loc></url></urlset>")).isEmpty)
    assert(Sitemap.parse(b(
      "<urlset><url><loc>a<b/>c</loc></url></urlset>")).isEmpty)
    // loc outside a group
    assert(Sitemap.parse(b("<urlset><loc>a</loc></urlset>")).isEmpty)
    // not xml at all / empty / null
    assert(Sitemap.parse(b("plain text, definitely not xml!!")).isEmpty)
    assert(Sitemap.parse(Array.emptyByteArray).isEmpty)
    assert(Sitemap.parse(null).isEmpty)
  }

  test("resolveTree: pages attribute to their index, orphans carry " +
      "null index, fetch gaps and unparseables surface as roles") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    def urlset(locs: String*): Array[Byte] = b(
      "<urlset>" + locs.map(l => s"<url><loc>$l</loc></url>").mkString +
        "</urlset>")
    val idx = b("<sitemapindex>" +
      "<sitemap><loc>https://a.test/sm_0.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.test/sm_1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.test/sm_2.xml</loc></sitemap>" +
      "</sitemapindex>")
    val rows = Seq(
      (1L, "https://a.test/sitemap_index.xml", idx),
      // sm_0 fetched and parsed; sm_1 fetched but garbage; sm_2 never
      // fetched; sm_x un-indexed orphan
      (1L, "https://a.test/sm_0.xml",
        urlset("https://a.test/p0", "https://a.test/p1")),
      (1L, "https://a.test/sm_1.xml", b("garbage, not xml")),
      (1L, "https://a.test/sm_x.xml", urlset("https://a.test/px")),
      // a second site must not cross-contaminate attribution
      (2L, "https://b.test/sm_0.xml", urlset("https://b.test/q0")))
      .toDF("site_id", "url", "media")
    val got = Sitemap.resolveTree(rows)
      .select(col("site_id"), col("role"), col("page_url"),
        col("sitemap_url"), col("index_url"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(got == Set(
      (1L, "page", "https://a.test/p0", Some("https://a.test/sm_0.xml"),
        Some("https://a.test/sitemap_index.xml")),
      (1L, "page", "https://a.test/p1", Some("https://a.test/sm_0.xml"),
        Some("https://a.test/sitemap_index.xml")),
      (1L, "page", "https://a.test/px", Some("https://a.test/sm_x.xml"),
        None),
      (1L, "missing_child", "https://a.test/sm_1.xml", None,
        Some("https://a.test/sitemap_index.xml")),
      (1L, "missing_child", "https://a.test/sm_2.xml", None,
        Some("https://a.test/sitemap_index.xml")),
      (1L, "unparsed", "https://a.test/sm_1.xml", None, None),
      (2L, "page", "https://b.test/q0", Some("https://b.test/sm_0.xml"),
        None)), s"unexpected: $got")
  }

  test("fuzz: single-byte mutations and truncations never throw") {
    val base = b("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://a.test/p?x=1&amp;y=2</loc>" +
      "<lastmod>2026-01-02</lastmod></url></urlset>")
    val rnd = new scala.util.Random(229)
    (0 until 300).foreach { _ =>
      val m = base.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Sitemap.parse(m)
    }
    (0 until base.length).foreach { n =>
      Sitemap.parse(java.util.Arrays.copyOf(base, n))
    }
  }
}
