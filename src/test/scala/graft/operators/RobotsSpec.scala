package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import sqlImplicits._

  private def rules(host: String, txt: String) =
    Robots.robotsRules(Seq((host, txt)).toDF("host", "robots_txt"))
      .as[(String, String, Boolean, String, Int)].collect()
      .map(r => (r._2, r._3, r._4)).toSet

  test("grouping: consecutive agent headers share rules; an agent " +
      "line after rules starts a NEW group") {
    val got = rules("h",
      "User-agent: A\nUser-agent: B\nDisallow: /x\n" +
        "User-agent: C\nDisallow: /y")
    assert(got == Set(("a", false, "/x"), ("b", false, "/x"),
      ("c", false, "/y")))
  }

  test("comments, blanks, case, unknown directives, empty values") {
    val got = rules("h",
      "# top comment\nUser-Agent: Bot\nCrawl-delay: 5\n\n" +
        "DisAllow: /a # inline comment\nDisallow:\nAllow: /a/b\n")
    // directive names case-fold, agents case-fold, values keep case;
    // Crawl-delay is ignored, the empty Disallow carries no rule
    assert(got == Set(("bot", false, "/a"), ("bot", true, "/a/b")))
  }

  test("rules before any user-agent header are void") {
    assert(rules("h", "Disallow: /x\nUser-agent: *\nDisallow: /y")
      == Set(("*", false, "/y")))
  }

  private def gate(robotsTxt: Map[String, String],
                   urls: Seq[(String, String)], agent: String) = {
    val r = Robots.robotsRules(
      robotsTxt.toSeq.toDF("host", "robots_txt"))
    Robots.gateUrls(urls.toDF("host", "path"), r, agent)
      .as[(String, String, Boolean, Option[String])].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
  }

  test("longest match wins, length ties go to Allow, silence allows") {
    val g = gate(
      Map("h" -> ("User-agent: *\nDisallow: /p/\nAllow: /p/ok\n" +
        "Disallow: /q\nAllow: /q")),
      Seq(("h", "/p/x"), ("h", "/p/okay"), ("h", "/q"), ("h", "/z"),
        ("nope", "/anything")),
      "anybot")
    assert(g(("h", "/p/x")) == ((false, Some("/p/"))))
    assert(g(("h", "/p/okay")) == ((true, Some("/p/ok")))) // longer Allow
    assert(g(("h", "/q")) == ((true, Some("/q")))) // tie -> Allow
    assert(g(("h", "/z")) == ((true, None))) // no rule matched
    assert(g(("nope", "/anything")) == ((true, None))) // no robots at all
  }

  test("exact agent group beats '*'; agent match is case-insensitive") {
    val txt = "User-agent: *\nDisallow: /d/\n\n" +
      "User-agent: graftbot\nDisallow: /t/"
    val g = gate(Map("h" -> txt),
      Seq(("h", "/d/1"), ("h", "/t/1")), "GraftBot")
    // the exact group exists, so the star group's /d/ ban is VOID
    assert(g(("h", "/d/1")) == ((true, None)))
    assert(g(("h", "/t/1")) == ((false, Some("/t/"))))
    // a crawler with no exact group gets the star rules
    val g2 = gate(Map("h" -> txt),
      Seq(("h", "/d/1"), ("h", "/t/1")), "otherbot")
    assert(g2(("h", "/d/1")) == ((false, Some("/d/"))))
    assert(g2(("h", "/t/1")) == ((true, None)))
  }

  test("merged groups: two headers for the same agent both apply") {
    val g = gate(
      Map("h" -> ("User-agent: bot\nDisallow: /a\n" +
        "User-agent: bot\nDisallow: /b")),
      Seq(("h", "/a1"), ("h", "/b1"), ("h", "/c1")), "bot")
    assert(g(("h", "/a1"))._1 == false)
    assert(g(("h", "/b1"))._1 == false)
    assert(g(("h", "/c1"))._1 == true)
  }
}
