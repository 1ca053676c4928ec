package graft.ext

import org.apache.spark.sql.Dataset

/** sitemaps.org XML parsing — the crawl-coverage side of the
  * compliance pair ([[Robots]] says what MUST NOT be fetched; the
  * sitemap says what the site WANTS fetched, with freshness hints).
  * A coverage audit joining the sitemap against the crawl snapshot
  * answers the two scheduling questions a refresh run starts from:
  * which listed pages are missing, and which fetched pages the site
  * never listed.
  *
  * Restricted profile (the sitemaps.org protocol, minus extensions):
  * root `<urlset>` (page entries) or `<sitemapindex>` (index
  * entries), groups `<url>`/`<sitemap>` each with a REQUIRED `<loc>`
  * and optional `<lastmod>`; other child tags (changefreq, priority)
  * are skipped. The five XML entities are decoded in text (URLs
  * routinely carry `&amp;`); comments, CDATA, DTD, numeric refs,
  * nested groups, or a group without `<loc>` are fail-closed None —
  * the [[DocText.DocxTextExtract]] walking discipline.
  */
object Sitemap {

  /** (kind, entries) — kind is "urlset" or "sitemapindex", each entry
    * (loc, lastmod) with lastmod "" when absent. None on any profile
    * violation.
    */
  def parse(b: Array[Byte]): Option[(String, Seq[(String, String)])] = {
    if (b == null || b.length < 16) return None
    val x = new String(b, "UTF-8")
    var kind: String = null
    var groupTag: String = null
    var inGroup = false
    var loc: String = null
    var lastmod = ""
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    while (i < x.length) {
      val lt = x.indexOf('<', i)
      if (lt < 0) {
        i = x.length
      } else {
        val gt = x.indexOf('>', lt)
        if (gt < 0) return None
        val tag = x.substring(lt + 1, gt)
        if (tag.startsWith("?")) i = gt + 1 // prolog
        else if (tag.startsWith("!")) return None // comment/CDATA/DTD
        else {
          val selfClosing = tag.endsWith("/")
          val body = if (selfClosing) tag.dropRight(1) else tag
          val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
            ch != '\r' && ch != '\n')
          name match {
            case "urlset" | "sitemapindex" if kind == null =>
              kind = name
              groupTag = if (name == "urlset") "url" else "sitemap"
              i = gt + 1
            case n if kind == null => return None // wrong root
            case n if n == groupTag =>
              if (inGroup || selfClosing) return None // nested / empty
              inGroup = true; loc = null; lastmod = ""
              i = gt + 1
            case n if n == "/" + groupTag =>
              if (!inGroup || loc == null) return None // loc required
              out += ((loc, lastmod))
              inGroup = false
              i = gt + 1
            case "loc" | "lastmod" =>
              if (!inGroup || selfClosing) return None
              val closer = s"</$name>"
              val end = x.indexOf(closer, gt + 1)
              if (end < 0) return None
              if (x.indexOf('<', gt + 1) != end) return None // markup in text
              DocText.DocxTextExtract.unescape(
                x.substring(gt + 1, end).trim) match {
                case Some(t) =>
                  if (name == "loc") {
                    if (loc != null) return None // duplicate loc
                    loc = t
                  } else lastmod = t
                case None => return None
              }
              i = end + closer.length
            case n if n == "/urlset" || n == "/sitemapindex" =>
              if (inGroup) return None
              i = gt + 1
            case other if other.startsWith("/") => i = gt + 1
            case _ => // changefreq, priority, extensions: skip the
              // open tag; its text and closer fall through the walk
              i = gt + 1
          }
        }
        if (lt >= i) return None // safety: always advance
      }
    }
    if (kind == null || inGroup) None else Some((kind, out.result()))
  }

  final case class SitemapEntry(
      media_id: Long,
      kind: String,
      loc: String,
      lastmod: String,
      ok: Boolean,
      error: Option[String])

  /** Extraction stage: one row per sitemap entry, one ok=false row for
    * unparseable payloads — the [[Warc.extractWarc]] discipline.
    */
  def extractSitemap(media: Dataset[Multimodal.MediaRecord])
      : Dataset[SitemapEntry] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      try {
        parse(r.media) match {
          case Some((kind, entries)) =>
            entries.map { case (loc, mod) =>
              SitemapEntry(r.media_id, kind, loc, mod, ok = true, None)
            }
          case None =>
            Seq(SitemapEntry(r.media_id, "", "", "", ok = false, None))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          Seq(SitemapEntry(r.media_id, "", "", "", ok = false,
            Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
      }
    }
  }
}
