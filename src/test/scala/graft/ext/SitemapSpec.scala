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
