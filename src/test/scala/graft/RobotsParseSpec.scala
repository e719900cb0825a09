package graft

import org.apache.spark.sql.functions._
import graft.politeness.Politeness

/** robots.txt parsing (Politeness.parseRobots): group scoping, agent
  * matching, comment/blank handling, multi-group merge, delay units —
  * and Allow longest-match precedence through robotsFilter.
  */
class RobotsParseSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(body: String, agent: String = "*") =
    Politeness.parseRobots(Seq(("h.test", body)).toDF("host", "body"),
      agent = agent)
      .select(col("host"), col("disallow"), col("allow"), col("crawlDelayMs"))
      .as[(String, Seq[String], Seq[String], Long)].collect().toList

  test("star group only; other agents' rules excluded") {
    val body =
      """User-agent: googlebot
        |Disallow: /google-only
        |Crawl-delay: 9
        |User-agent: *
        |Disallow: /a
        |Disallow: /b""".stripMargin
    assert(parse(body) == List(("h.test", Seq("/a", "/b"), Seq.empty, 0L)))
  }

  test("comments, blanks, empty values, unknown keys ignored; delay in ms") {
    val body =
      """# top comment
        |User-agent: *
        |
        |Disallow: /x # trailing comment
        |Disallow:
        |Allow: /x/public
        |Sitemap: http://h.test/sitemap.xml
        |Crawl-delay: 2.5""".stripMargin
    assert(parse(body) ==
      List(("h.test", Seq("/x"), Seq("/x/public"), 2500L)))
  }

  test("multiple matching groups merge: union of prefixes, max delay") {
    val body =
      """User-agent: *
        |Disallow: /first
        |Crawl-delay: 1
        |User-agent: googlebot
        |Disallow: /not-ours
        |User-agent: *
        |Disallow: /second
        |Crawl-delay: 3""".stripMargin
    assert(parse(body) ==
      List(("h.test", Seq("/first", "/second"), Seq.empty, 3000L)))
  }

  test("stacked User-agent lines share ONE group (RFC 9309)") {
    // the Disallow attaches to BOTH googlebot and * — the old parser
    // opened a fresh group per UA line and the * crawler dropped it
    val body =
      """User-agent: *
        |User-agent: googlebot
        |Disallow: /x
        |User-agent: other
        |Disallow: /other-only""".stripMargin
    assert(parse(body) == List(("h.test", Seq("/x"), Seq.empty, 0L)))
    assert(parse(body, agent = "googlebot") ==
      List(("h.test", Seq("/x"), Seq.empty, 0L)))
    assert(parse(body, agent = "other") ==
      List(("h.test", Seq("/other-only"), Seq.empty, 0L)))
  }

  test("User-agent VALUE matching is case-insensitive (RFC 9309)") {
    val body =
      """User-agent: GoogleBot
        |Disallow: /g""".stripMargin
    assert(parse(body, agent = "googlebot") ==
      List(("h.test", Seq("/g"), Seq.empty, 0L)))
    assert(parse(body, agent = "GOOGLEBOT") ==
      List(("h.test", Seq("/g"), Seq.empty, 0L)))
  }

  test("specific agent selects its group; case-insensitive keys") {
    val body =
      """USER-AGENT: googlebot
        |DISALLOW: /google
        |User-agent: *
        |Disallow: /star""".stripMargin
    assert(parse(body, agent = "googlebot") ==
      List(("h.test", Seq("/google"), Seq.empty, 0L)))
  }

  test("host with no matching group parses to no row (fully allowed)") {
    val body = "User-agent: googlebot\nDisallow: /g"
    assert(parse(body).isEmpty)
  }

  test("robotsFilter longest-match precedence: Allow overrides shorter Disallow") {
    val rules = Politeness.parseRobots(Seq(("h.test",
      """User-agent: *
        |Disallow: /admin
        |Allow: /admin/public
        |Disallow: /admin/public/secret""".stripMargin))
      .toDF("host", "body"))
      .select(col("host"), col("disallow"), col("crawlDelayMs"),
        lit(100).as("hostBudget"), col("allow"))
      .as[graft.model.RobotsRule]
    val frontier = Seq(
      ("http://h.test/admin/x", "h.test"),          // blocked: /admin
      ("http://h.test/admin/public/ok", "h.test"),  // allowed: longer Allow
      ("http://h.test/admin/public/secret/f", "h.test"), // blocked: longest
      ("http://h.test/open", "h.test"),             // no rule matches
      ("http://other.test/admin", "other.test"))    // host without rules
      .toDF("canonical", "host")
    val allowed = Politeness.robotsFilter(frontier, rules)
      .select(col("canonical")).as[String].collect().toSet
    assert(allowed == Set(
      "http://h.test/admin/public/ok",
      "http://h.test/open",
      "http://other.test/admin"))
  }

  test("tie between Allow and Disallow of equal length -> allowed") {
    val rules = Seq(graft.model.RobotsRule("h.test",
      disallow = Seq("/dir"), crawlDelayMs = 0L, hostBudget = 100,
      allow = Seq("/dir"))).toDS()
    val frontier = Seq(("http://h.test/dir/x", "h.test"))
      .toDF("canonical", "host")
    assert(Politeness.robotsFilter(frontier, rules).count() == 1)
  }
}
