package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.engine.Recrawl

/** Recrawl scheduling: the Cho/Garcia-Molina change-rate estimator and
  * the per-host revisit top-k, exact-integer priority arithmetic.
  */
class RecrawlSpec extends SparkTestBase {
  import spark.implicits._

  // (url, host, round, content_hash)
  private val history = Seq(
    ("a", "h1", 1L, "x"), ("a", "h1", 2L, "y"), ("a", "h1", 3L, "z"),
    ("b", "h1", 1L, "x"), ("b", "h1", 2L, "x"), ("b", "h1", 3L, "x"),
    ("c", "h1", 1L, "x"), ("c", "h1", 3L, "y"),
    ("d", "h2", 4L, "w")
  ).toDF("url", "host", "round", "content_hash")

  test("changeStats: visits, changes vs previous hash, exact priority") {
    val got = Recrawl.changeStats(history, currentRound = 5L)
      .select("url", "visits", "changes", "last_round", "staleness",
        "priority_milli")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // a: 3 visits, 2 changes, staleness 2 -> (2*2*1000) div 2 = 2000
      ("a", 3L, 2L, 3L, 2L, 2000L),
      // b: never changed -> 0
      ("b", 3L, 0L, 3L, 2L, 0L),
      // c: 2 visits 1 change, staleness 2 -> (1*2*1000) div 1 = 2000
      ("c", 2L, 1L, 3L, 2L, 2000L),
      // d: single visit -> no revisit evidence, priority 0 (div by
      // greatest(visits-1,1) guards the 0 denominator)
      ("d", 1L, 0L, 4L, 1L, 0L)))
  }

  test("scheduleRevisits: per-host top-k by (priority, staleness, url)") {
    val stats = Recrawl.changeStats(history, currentRound = 5L)
    val got = Recrawl.scheduleRevisits(stats, perHostBudget = 2)
      .select("host", "revisit_rank", "url")
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2))
    // h1: a and c tie at 2000 and tie on staleness -> url asc breaks it;
    // b (priority 0) falls outside the budget of 2.
    assert(got.toSeq == Seq(
      ("h1", 1, "a"), ("h1", 2, "c"), ("h2", 1, "d")))
  }

  test("changeStats plans ONE exchange: lag window and per-url aggregate share the url partitioning") {
    val plan = Recrawl.changeStats(history, 5L).queryExecution.executedPlan
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = inner.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1,
      s"expected 1 shuffle (shared url partitioning), got ${exchanges.size}")
  }

  test("salted revisit schedule == plain (selection AND ranks), incl. hot host") {
    // hot host h0: 60 urls; h1: 5 — varied priorities via varied hashes
    val hist = (0 until 65).flatMap { i =>
      val host = if (i < 60) "h0" else "h1"
      val u = s"u$i"
      // visits 1..3 with per-url change pattern
      (0 to (i % 3)).map(r => (u, host, r.toLong, s"h${i % 4}-${r / (1 + i % 2)}"))
    }.toDF("url", "host", "round", "content_hash")
    val stats = Recrawl.changeStats(hist, 5L)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("host", "revisit_rank", "url")
        .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    for (salts <- Seq(2, 7)) {
      assert(norm(Recrawl.scheduleRevisitsSalted(stats, 10, salts)) ==
        norm(Recrawl.scheduleRevisits(stats, 10)), s"salts=$salts")
    }
  }

  test("historyFromRecords: two identical crawls -> zero changes, visits=2") {
    import graft.corpus.Corpus
    import graft.engine.CrawlEngine
    import graft.model.CrawlConfig
    import graft.router.{Handler, Router}
    val spec = Corpus.Spec(nDocs = 60, nHosts = 5, maxLinks = 3)
    val docs = Corpus.docs(spark, spec)
    val seeds = Corpus.seedsLocal(3, spec)
    val router = Router(Map.empty, fallback = Handler.linkFollower())
    val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3,
      frontierPartitions = 4, bloomShards = 2, bloomExpectedItems = 1000L)
    def crawl() = CrawlEngine.run(spark, docs, seeds,
      spark.emptyDataset[graft.model.RobotsRule], router, cfg,
      SparkTestBase.tmpDir("recrawl"))
    val r1 = crawl()
    val r2 = crawl()
    val hist = Recrawl.historyFromRecords(
      Seq((r1.records(spark), 1L), (r2.records(spark), 2L)))
    val stats = Recrawl.changeStats(hist, currentRound = 3L)
    val rows = stats.select("visits", "changes", "priority_milli")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // deterministic corpus + deterministic engine: every URL fetched in
    // run 1 is fetched identically in run 2 -> 2 visits, 0 changes
    assert(rows.forall(_ == ((2L, 0L, 0L))),
      rows.filterNot(_ == ((2L, 0L, 0L))).take(3).toSeq.toString)
  }

  test("single-visit-only history schedules at priority 0, deterministically") {
    val h = Seq(("u1", "h", 1L, "x"), ("u2", "h", 2L, "y"))
      .toDF("url", "host", "round", "content_hash")
    val got = Recrawl.scheduleRevisits(Recrawl.changeStats(h, 3L), 5)
      .select("revisit_rank", "url").as[(Int, String)].collect().sortBy(_._1)
    // priority 0 for both; staleness desc puts u1 (staleness 2) first
    assert(got.toSeq == Seq((1, "u1"), (2, "u2")))
  }
}
