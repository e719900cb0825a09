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

  test("product token: group 'googlebot' matches crawler 'Googlebot/2.1'") {
    val body =
      """User-agent: googlebot
        |Disallow: /g
        |User-agent: *
        |Disallow: /star""".stripMargin
    // token match, full-UA match, and the specific group SHADOWS '*'
    assert(parse(body, agent = "Googlebot/2.1") ==
      List(("h.test", Seq("/g"), Seq.empty, 0L)))
    val bodyFull = "User-agent: googlebot/2.1\nDisallow: /exact"
    assert(parse(bodyFull, agent = "Googlebot/2.1") ==
      List(("h.test", Seq("/exact"), Seq.empty, 0L)))
  }

  test("no specific group -> '*' group applies (RFC 9309 fallback)") {
    val body =
      """User-agent: otherbot
        |Disallow: /other
        |User-agent: *
        |Disallow: /star
        |Crawl-delay: 2""".stripMargin
    assert(parse(body, agent = "GraftBot/1.2") ==
      List(("h.test", Seq("/star"), Seq.empty, 2000L)))
  }

  test("RFC 9309 path patterns: '*' and '$' (matcher core)") {
    import graft.politeness.RobotsExpr
    import org.apache.spark.unsafe.types.UTF8String
    def m(path: String, pat: String) =
      RobotsExpr.matches(UTF8String.fromString(path),
        UTF8String.fromString(pat))
    assert(m("/private/x", "/private*"))
    assert(m("/private", "/private*"))     // '*' matches empty
    assert(m("/a/b.pdf", "*.pdf$"))
    assert(!m("/a/b.pdfx", "*.pdf$"))      // '$' anchors end
    assert(m("/a/b.pdfx", "*.pdf"))        // un-anchored: substring-prefix
    assert(m("/x/y/secret/z", "/*/secret"))
    assert(!m("/secret/z", "/*/secret"))   // '*' must span one segment+
    assert(m("/p/q", "/p/q$"))
    assert(!m("/p/qq", "/p/q$"))
    assert(m("/p/q", ""))                  // empty pattern: matches all
    assert(m("/fish*head", "/fish*"))      // literal path '*' irrelevant
    assert(m("/a$b", "/a$b"))              // '$' mid-pattern is literal
    assert(!m("/ab", "/a$b"))
    assert(m("/axyb/c", "/a*b/c$"))        // backtracking star
  }

  test("wildcard rules end-to-end through robotsFilter") {
    val rules = Politeness.parseRobots(Seq(("h.test",
      """User-agent: graftbot
        |Disallow: /private*
        |Allow: /private/ok$
        |Disallow: *.pdf$""".stripMargin)).toDF("host", "body"),
      agent = "GraftBot/1.2")
      .select(col("host"), col("disallow"), col("crawlDelayMs"),
        lit(100).as("hostBudget"), col("allow"))
      .as[graft.model.RobotsRule]
    val frontier = Seq(
      "http://h.test/private/x",    // blocked: /private* (9)
      "http://h.test/private/ok",   // allowed: /private/ok$ (12) wins
      "http://h.test/private/okk",  // blocked: '$' stops the allow
      "http://h.test/public",       // allowed: unmatched
      "http://h.test/docs/a.pdf",   // blocked: *.pdf$
      "http://h.test/docs/a.pdfx")  // allowed: '$' anchor fails
      .map(u => (u, "h.test")).toDF("canonical", "host")
    val allowed = Politeness.robotsFilter(frontier, rules)
      .select(col("canonical")).as[String].collect().toSet
    assert(allowed == Set(
      "http://h.test/private/ok",
      "http://h.test/public",
      "http://h.test/docs/a.pdfx"))
  }
}
