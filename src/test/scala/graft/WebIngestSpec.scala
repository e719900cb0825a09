package graft

import org.apache.spark.sql.functions._
import graft.engine.WebIngest

/** Sitemap ingestion: loc extraction, urlset-vs-index classification,
  * whitespace/multiline handling, document order.
  */
class WebIngestSpec extends SparkTestBase {
  import spark.implicits._

  test("urlset entries in document order, whitespace trimmed") {
    val body =
      """<?xml version="1.0"?>
        |<urlset>
        |<url><loc> http://h.test/a </loc><lastmod>2026-01-01</lastmod></url>
        |<url>
        |  <loc>http://h.test/b</loc>
        |</url>
        |</urlset>""".stripMargin
    val rows = WebIngest.sitemapUrls(Seq(("h.test", body)).toDF("host", "body"))
      .select(col("kind"), col("ord"), col("url"))
      .as[(String, Int, String)].collect().toList.sortBy(r => (r._1, r._2))
    assert(rows == List(
      ("url", 0, "http://h.test/a"), ("url", 1, "http://h.test/b")))
  }

  test("sitemap-index entries classified separately") {
    val body =
      """<sitemapindex>
        |<sitemap><loc>http://h.test/sm-1.xml</loc></sitemap>
        |<sitemap><loc>http://h.test/sm-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val rows = WebIngest.sitemapUrls(Seq(("h.test", body)).toDF("host", "body"))
      .select(col("kind"), col("ord"), col("url"))
      .as[(String, Int, String)].collect().toList.sortBy(_._2)
    assert(rows == List(
      ("index", 0, "http://h.test/sm-1.xml"),
      ("index", 1, "http://h.test/sm-2.xml")))
  }

  test("body without loc entries yields no rows") {
    val rows = WebIngest.sitemapUrls(
      Seq(("h.test", "<html>not a sitemap</html>")).toDF("host", "body"))
    assert(rows.count() == 0)
  }
}
