package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-source ingestion helpers: raw fetched artifacts -> candidate
  * URLs. Complements the robots.txt parser (Politeness.parseRobots) on
  * the "what a crawler bootstraps from" side: sitemap.xml and
  * sitemap-index documents -> seed/frontier rows.
  */
object WebIngest {

  /** Extract `<loc>` URLs from sitemap XML bodies (urlset entries AND
    * nested sitemap-index entries), preserving document order.
    *
    * Output: (host, kind, ord, url) — kind `index` for `<sitemap><loc>`
    * entries (another sitemap to fetch), `url` for `<url><loc>` entries
    * (page candidates, ready for [[CrawlEngine.seedCandidates]]-style
    * intake). Pure regexp extraction per row (codegen'd, no UDF, no
    * shuffle); assumes the standard generator layout where `<loc>` is
    * the first child of its `<url>`/`<sitemap>` parent.
    */
  def sitemapUrls(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body"): DataFrame = {
    def locs(parent: String) = regexp_extract_all(col(bodyCol),
      lit(s"(?s)<$parent>\\s*<loc>\\s*([^<]+?)\\s*</loc>"), lit(1))
    bodies.select(col(hostCol).as("host"),
      array(
        struct(lit("index").as("kind"), locs("sitemap").as("us")),
        struct(lit("url").as("kind"), locs("url").as("us"))).as("groups"))
      .select(col("host"), explode(col("groups")).as("g"))
      .select(col("host"), col("g.kind").as("kind"),
        posexplode(col("g.us")).as(Seq("ord", "url")))
  }
}
