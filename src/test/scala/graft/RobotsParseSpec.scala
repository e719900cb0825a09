package graft

import org.apache.spark.sql.functions._
import graft.politeness.Politeness

/** robots.txt parsing (Politeness.parseRobots): group scoping, agent
  * matching, comment/blank handling, multi-group merge, delay units.
  */
class RobotsParseSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(body: String, agent: String = "*") =
    Politeness.parseRobots(Seq(("h.test", body)).toDF("host", "body"),
      agent = agent)
      .select(col("host"), col("disallow"), col("crawlDelayMs"))
      .as[(String, Seq[String], Long)].collect().toList

  test("star group only; other agents' rules excluded") {
    val body =
      """User-agent: googlebot
        |Disallow: /google-only
        |Crawl-delay: 9
        |User-agent: *
        |Disallow: /a
        |Disallow: /b""".stripMargin
    assert(parse(body) == List(("h.test", Seq("/a", "/b"), 0L)))
  }

  test("comments, blanks, empty Disallow, unknown keys ignored; delay in ms") {
    val body =
      """# top comment
        |User-agent: *
        |
        |Disallow: /x # trailing comment
        |Disallow:
        |Allow: /public
        |Crawl-delay: 2.5""".stripMargin
    assert(parse(body) == List(("h.test", Seq("/x"), 2500L)))
  }

  test("multiple matching groups merge: union of disallows, max delay") {
    val body =
      """User-agent: *
        |Disallow: /first
        |Crawl-delay: 1
        |User-agent: googlebot
        |Disallow: /not-ours
        |User-agent: *
        |Disallow: /second
        |Crawl-delay: 3""".stripMargin
    assert(parse(body) == List(("h.test", Seq("/first", "/second"), 3000L)))
  }

  test("specific agent selects its group; case-insensitive keys") {
    val body =
      """USER-AGENT: googlebot
        |DISALLOW: /google
        |User-agent: *
        |Disallow: /star""".stripMargin
    assert(parse(body, agent = "googlebot") ==
      List(("h.test", Seq("/google"), 0L)))
  }

  test("host with no matching group parses to no row (fully allowed)") {
    val body = "User-agent: googlebot\nDisallow: /g"
    assert(parse(body).isEmpty)
  }

  test("parsed rules drive robotsFilter directly") {
    val rules = Politeness.parseRobots(Seq(
      ("h.test", "User-agent: *\nDisallow: /admin")).toDF("host", "body"))
      .select(col("host"), col("disallow"),
        col("crawlDelayMs"), lit(100).as("hostBudget"))
      .as[graft.model.RobotsRule]
    val frontier = Seq(
      ("http://h.test/admin/x", "h.test"),
      ("http://h.test/ok", "h.test"),
      ("http://other.test/admin", "other.test"))
      .toDF("canonical", "host")
    val allowed = Politeness.robotsFilter(frontier, rules)
      .select(col("canonical")).as[String].collect().toSet
    assert(allowed == Set("http://h.test/ok", "http://other.test/admin"))
  }
}
