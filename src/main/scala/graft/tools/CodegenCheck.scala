package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-gate check for VERDICT r01 item 1: run the flagship crawl + the
  * e2e BFS query with codegen-failure logging visible; exit non-zero if
  * any stage fell back to interpreted execution ("Code grows beyond 64 KB"
  * or any other CodeGenerator error).
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fail loud instead of falling back, so regressions can't hide
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n1 = graft.SparkEntry.entry(spark).count()
    val n2 = graft.SparkEntry.queries("q_crawl_bfs")(spark, "/root/testdata/sf0.001").count()
    // dedup-on crawl with bloom prefilter + mid-crawl compaction: the
    // BloomSeenProbe filter and the compaction path must stay codegen'd
    // (round-2 verdict #4)
    val spec = graft.corpus.Corpus.Spec(nDocs = 3000, nHosts = 20, maxLinks = 5)
    val docs = graft.corpus.Corpus.docs(spark, spec)
    val router = graft.router.Router(
      Map("page" -> graft.router.Handler.linkFollower()),
      fallback = graft.router.Handler.linkFollower())
    import spark.implicits._
    val r = graft.engine.CrawlEngine.run(spark, docs,
      graft.corpus.Corpus.seedsLocal(4, spec),
      spark.emptyDataset[graft.model.RobotsRule], router,
      graft.model.CrawlConfig(maxRounds = 5, maxDepth = 6,
        frontierPartitions = 8, bloomExpectedItems = 10000L,
        compactSeenEvery = 2),
      java.nio.file.Files.createTempDirectory("graft-cgc").toString)
    val n3 = r.totalScheduled
    println(s"CODEGEN_CHECK_OK entry=$n1 bfs=$n2 dedup_crawl=$n3")
    spark.stop()
  }
}
