package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.ext.Robots]] — the q218 crawl-policy operator. Pins the
  * RFC 9309 decision rules on hand fixtures: longest-match,
  * Allow-wins-ties, specific-agent-group-overrides-star, empty
  * Disallow as allow-all, lenient line parsing.
  */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("parse: groups, case tolerance, comments, junk lines, " +
      "multi-agent groups, empty Disallow") {
    val body =
      """# policy
        |User-agent: A
        |User-agent: B
        |Disallow: /x   # inline comment
        |ALLOW: /x/ok
        |
        |User-Agent: C
        |Disallow:
        |junk line without colon
        |Crawl-delay: 5
        |""".stripMargin
    val rules = Robots.parse("d.test", body)
    assert(rules.count(_.agent == "a") == 2)
    assert(rules.count(_.agent == "b") == 2)
    assert(rules.filter(_.agent == "a").map(r => (r.allow, r.path)).toSet ==
      Set((false, "/x"), (true, "/x/ok")))
    // empty Disallow is recorded as an allow-all marker
    assert(rules.filter(_.agent == "c") ==
      Seq(Robots.Rule("d.test", "c", allow = true, path = "")))
  }

  test("evaluate: longest match, allow wins ties, specific agent " +
      "beats *, unmatched and unknown domains allowed") {
    import spark.implicits._
    val rules = (
      Robots.parse("a.test",
        "User-agent: *\nDisallow: /p\nAllow: /p/ok\n") ++
      Robots.parse("b.test",
        "User-agent: *\nDisallow: /\n\nUser-agent: bot\nAllow: /q\nDisallow: /\n") ++
      Robots.parse("c.test",
        "User-agent: *\nDisallow: /t\nAllow: /t\n")).toDF()
    val urls = Seq(
      ("u1", "a.test", "/p/blocked"),
      ("u2", "a.test", "/p/ok/page"),
      ("u3", "a.test", "/free"),
      ("u4", "b.test", "/q/fine"),
      ("u5", "b.test", "/r/blocked"),
      ("u6", "c.test", "/t/tie"),
      ("u7", "nowhere.test", "/anything")).toDF("url", "domain", "path")
    val got = Robots.evaluate(urls, rules, "Bot").collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(3), Option(r.get(4)).map(_.toString))).toMap
    assert(got("u1") == (false, Some("/p")))       // longest = /p
    assert(got("u2") == (true, Some("/p/ok")))     // longer allow wins
    assert(got("u3") == (true, None))              // no rule matched
    assert(got("u4") == (true, Some("/q")))        // bot group, not *
    assert(got("u5") == (false, Some("/")))        // bot group disallow
    assert(got("u6") == (true, Some("/t")))        // tie -> allow
    assert(got("u7") == (true, None))              // no robots at all
  }

  test("empty Disallow in the selected group allows everything even " +
      "when * blocks it") {
    import spark.implicits._
    val rules = Robots.parse("e.test",
      "User-agent: *\nDisallow: /\n\nUser-agent: bot\nDisallow:\n").toDF()
    val urls = Seq(("u", "e.test", "/deep/path")).toDF("url", "domain", "path")
    val r = Robots.evaluate(urls, rules, "bot").collect()(0)
    assert(r.getBoolean(3) && r.getString(4) == "")
  }
}
