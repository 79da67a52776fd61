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

  test("crawlDelays: most-specific group only, max merge, non-numeric " +
      "dropped, silent exact group yields no row") {
    val robots = Seq(
      // h1: star 3 only → bot inherits star
      ("h1", "User-agent: *\nCrawl-delay: 3\nDisallow: /x"),
      // h2: exact group with its own delay beats star's
      ("h2", "User-agent: *\nCrawl-delay: 9\n" +
        "User-agent: bot\nCrawl-delay: 2.5\nDisallow: /x"),
      // h3: exact group exists but declares NO delay → no row,
      // even though star has one
      ("h3", "User-agent: *\nCrawl-delay: 7\n" +
        "User-agent: bot\nDisallow: /x"),
      // h4: two merged exact groups → max wins; junk value dropped
      ("h4", "User-agent: bot\nCrawl-delay: 1\n" +
        "User-agent: bot\nCrawl-delay: 4\nCrawl-delay: soon"))
      .toDF("host", "robots_txt")
    val got = Robots.crawlDelays(robots, "Bot")
      .as[(String, Double)].collect().toMap
    assert(got == Map("h1" -> 3.0, "h2" -> 2.5, "h4" -> 4.0))
  }

  test("Frontier.schedule: per-host pacing, defaults, pinned order, " +
      "exact long micros") {
    val urls = Seq(
      ("a", "/p1", 0.9), ("a", "/p2", 0.5), ("a", "/p0", 0.9),
      ("b", "/q1", 0.1)).toDF("host", "path", "priority")
    val delays = Seq(("a", 2.5)).toDF("host", "delay_sec")
    val got = Frontier.schedule(urls, delays,
        orderBy = Seq(col("priority").desc, col("path")),
        defaultDelaySec = 1.0, startUs = 100L)
      .select("host", "path", "delay_us", "slot", "fetch_at_us")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // host a at 2.5 s: priority 0.9 ties break on path
      ("a", "/p0", 2500000L, 0L, 100L),
      ("a", "/p1", 2500000L, 1L, 2500100L),
      ("a", "/p2", 2500000L, 2L, 5000100L),
      // host b: no declared delay → the 1 s default
      ("b", "/q1", 1000000L, 0L, 100L)))
  }
}
