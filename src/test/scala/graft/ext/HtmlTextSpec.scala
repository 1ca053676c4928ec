package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-14 HTML main-text extraction ([[graft.ext.HtmlText]]):
  * hand-built pages with known block structure — prose kept, nav/ad/
  * footer dropped by the length + link-density rule — plus edge cases
  * (everything boilerplate → NULL md5, minWords knob, inline tags
  * stripped but not splitting, case-insensitive block tags).
  */
class HtmlTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(html: String, minWords: Int = 5) =
    HtmlText.htmlExtract(Seq((1L, html)).toDF("id", "h"),
      col("id"), col("h"), minWords).collect().head

  test("prose blocks survive; nav, ad and footer blocks drop") {
    val prose = (1 to 12).map(i => s"word$i").mkString(" ")
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        s"<p>$prose</p>" +
        "<div><a href=\"/b\">Buy</a> <a href=\"/n\">now</a> cheap</div>" +
        s"<p>$prose end</p>" +
        "<footer><a href=\"/t\">Terms</a> site</footer>" +
        "</body></html>"
    val r = run(html)
    assert(r.getAs[Int]("n_blocks") == 5)
    assert(r.getAs[Int]("n_kept") == 2)
    assert(r.getAs[Long]("kept_words") == 12L + 13L)
    // extracted text is the two paragraphs joined with one space
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$prose $prose end".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("extracted_md5") == expect)
  }

  test("a long but link-stuffed block drops on density, not length") {
    // 10 words, 2 links: 2*10 = 20 > 10 -> dropped even though long
    val linky = "<p>" + (1 to 8).map(i => s"w$i").mkString(" ") +
      " <a href=\"/1\">x</a> <a href=\"/2\">y</a></p>"
    val clean = "<p>" + (1 to 10).map(i => s"c$i").mkString(" ") + "</p>"
    val r = run(s"<body>$linky$clean</body>")
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[Long]("kept_words") == 10L)
  }

  test("all-boilerplate page: zero kept, NULL md5 and sane counts") {
    val r = run("<body><nav><a href=\"/\">Home</a></nav>" +
      "<footer><a href=\"/t\">Terms</a> site</footer></body>")
    assert(r.getAs[Int]("n_kept") == 0)
    assert(r.getAs[Long]("kept_words") == 0L)
    assert(r.isNullAt(r.fieldIndex("extracted_md5")))
    assert(r.getAs[Double]("kept_frac") == 0.0)
  }

  test("inline tags are stripped but do not split blocks; " +
       "block tags match case-insensitively") {
    val r = run("<BODY><P>one <b>two</b> three <span>four</span> five" +
      " six</P></BODY>")
    assert(r.getAs[Int]("n_blocks") == 1)
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[Long]("kept_words") == 6L)
  }

  test("minWords knob: the same page keeps more at a lower floor") {
    val html = "<body><p>just four small words</p>" +
      "<p>a longer paragraph with six words</p></body>"
    assert(run(html, minWords = 5).getAs[Int]("n_kept") == 1)
    assert(run(html, minWords = 4).getAs[Int]("n_kept") == 2)
  }
}
