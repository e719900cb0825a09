package graft

import org.apache.spark.sql.functions._
import graft.engine.{ContinuousCrawl, CrawlEngine}
import graft.model.{CrawlConfig, RobotsRule, Seed, Span}
import graft.router.{Handler, Router}

/** The continuous-crawl tier inside the engine loop (round-4 verdict
  * task #3): 3xx fetch semantics (corpus `redirect_to` -> status 301 +
  * location), hop-per-round chain discovery, warm-started bulk
  * resolution ([[graft.engine.Redirects.resolve]] rewriting candidates
  * before dedup/politeness), cycle screening, and the crawl ->
  * change-stats -> revisit-seeded epoch loop
  * ([[graft.engine.ContinuousCrawl.runEpochs]]).
  */
class RedirectCrawlSpec extends SparkTestBase {
  import spark.implicits._

  private def noRobots = spark.emptyDataset[RobotsRule]
  private val follower = Router(Map.empty, fallback = Handler.linkFollower())

  // ---- redirect tree corpus ----------------------------------------
  // Clean pages form a ternary TREE (node i links to 3i+1..3i+3, bounded
  // by nNodes) so every node has exactly one discovery path and depth is
  // unambiguous. Link targets are aliased by target id j:
  //   j % 4 == 3          -> 2-hop chain  b/j -> a/j -> clean j
  //   j % 2 == 1 (else)   -> 1-hop chain  a/j -> clean j
  //   even j              -> direct clean link
  private val nNodes = 13L // depth 1 + 3 + 9 under maxDepth 3

  private def clean(i: Long) = s"http://t${i % 3}.test/c/$i"
  private def alias1(i: Long) = s"http://a.test/a/$i"
  private def alias2(i: Long) = s"http://b.test/b/$i"
  private def linkTarget(j: Long): String =
    if (j % 4 == 3) alias2(j) else if (j % 2 == 1) alias1(j) else clean(j)
  private def childIds(i: Long): Seq[Long] =
    (1L to 3L).map(3 * i + _).filter(_ < nNodes)

  private def treeCorpus = {
    val cleanRows = (0L until nNodes).map { i =>
      (clean(i),
        childIds(i).zipWithIndex.map { case (j, k) =>
          Span("link", s"anchor$k", linkTarget(j), k) },
        Option.empty[String])
    }
    val a1 = (0L until nNodes).filter(_ % 2 == 1).map(i =>
      (alias1(i), Seq.empty[Span], Some(clean(i))))
    val a2 = (0L until nNodes).filter(_ % 4 == 3).map(i =>
      (alias2(i), Seq.empty[Span], Some(alias1(i))))
    // plus a 2-cycle x <-> y, linked from the root
    val cycle = Seq(
      ("http://c.test/x", Seq.empty[Span], Some("http://c.test/y")),
      ("http://c.test/y", Seq.empty[Span], Some("http://c.test/x")))
    (cleanRows ++ a1 ++ a2 ++ cycle)
      .toDF("doc_id", "spans", "redirect_to")
  }

  private def treeCorpusWithCycleLink = {
    val base = treeCorpus
    // root additionally links into the cycle
    base.withColumn("spans",
      when(col("doc_id") === clean(0),
        concat(col("spans"), array(
          struct(lit("link").as("kind"), lit("anchorX").as("text"),
            lit("http://c.test/x").as("media_ref"), lit(9).as("offset")))))
        .otherwise(col("spans")))
  }

  private def depthOf(i: Long): Int = {
    // tree depth: root=1, children of i at depth(i)+1
    @scala.annotation.tailrec
    def go(j: Long, d: Int): Int = if (j == 0) d else go((j - 1) / 3, d + 1)
    go(i, 1)
  }

  private val cfgRedir = CrawlConfig(maxRounds = 14, maxDepth = 3,
    frontierPartitions = 4, bloomShards = 4, bloomExpectedItems = 10000L,
    followRedirects = true)

  test("3xx loop: chains discovered hop-per-round; 200-set and depths match the effective tree") {
    val dir = SparkTestBase.tmpDir("redir")
    val r = CrawlEngine.run(spark, treeCorpusWithCycleLink,
      Seq(Seed(clean(0), null, 0)), noRobots, follower, cfgRedir, dir)
    val trace = r.trace(spark)
      .select("canonical", "status", "depth").as[(String, Int, Int)]
      .collect()

    val oks = trace.filter(_._2 == 200).map(t => (t._1, t._3)).toSet
    val wantOks = (0L until nNodes).map(i => (clean(i), depthOf(i)))
      .filter(_._2 <= 3).toSet
    assert(oks == wantOks)

    // every alias on a discovered link was fetched exactly once, as 301,
    // at the depth of the link that introduced it (branch +1, redirect +0)
    val redirs = trace.filter(_._2 == 301).map(t => (t._1, t._3)).toSet
    val discovered = (0L until nNodes)
      .filter(i => depthOf(i) <= 3 && depthOf(i) >= 2) // linked-to nodes
    val wantRedirs =
      discovered.filter(_ % 4 == 3).map(j => (alias2(j), depthOf(j))) ++
      discovered.filter(j => j % 2 == 1).map(j => (alias1(j), depthOf(j))) ++
      // the cycle: x fetched (301 -> y), y fetched (301 -> x), then dies
      Seq(("http://c.test/x", 2), ("http://c.test/y", 2))
    assert(redirs == wantRedirs.toSet)
    // discovered redirect edges are durable
    val edges = r.redirectEdges(spark).get.as[(String, String)].collect().toSet
    assert(edges.contains((alias1(1), clean(1))))
    assert(edges.contains(("http://c.test/x", "http://c.test/y")))
  }

  test("warm-started crawl resolves known chains: zero 3xx fetches, same 200-set, cycle candidates dropped") {
    val dirA = SparkTestBase.tmpDir("redir")
    val a = CrawlEngine.run(spark, treeCorpusWithCycleLink,
      Seq(Seed(clean(0), null, 0)), noRobots, follower, cfgRedir, dirA)
    val dirB = SparkTestBase.tmpDir("redir")
    val b = CrawlEngine.run(spark, treeCorpusWithCycleLink,
      Seq(Seed(clean(0), null, 0)), noRobots, follower, cfgRedir, dirB,
      initialRedirects = a.redirectEdges(spark))
    val tb = b.trace(spark).select("canonical", "status", "depth")
      .as[(String, Int, Int)].collect()
    assert(tb.count(_._2 == 301) == 0,
      "warm map must pre-resolve every chain")
    val oks = tb.filter(_._2 == 200).map(t => (t._1, t._3)).toSet
    val wantOks = (0L until nNodes).map(i => (clean(i), depthOf(i)))
      .filter(_._2 <= 3).toSet
    assert(oks == wantOks)
    // warm crawl needs no redirect-hop rounds: strictly fewer rounds
    assert(b.rounds < a.rounds, s"warm ${b.rounds} vs cold ${a.rounds}")
  }

  test("driver-side redirect resolution (redirectDriverMax) leaves the trace exactly equal") {
    // default config resolves the small ledger on the driver; forcing
    // the distributed doubling (redirectDriverMax = 0) must produce the
    // identical crawl — both phases, cold and warm
    def runBoth(cfg: graft.model.CrawlConfig) = {
      val d1 = SparkTestBase.tmpDir("redir-drv")
      val cold = CrawlEngine.run(spark, treeCorpusWithCycleLink,
        Seq(Seed(clean(0), null, 0)), noRobots, follower, cfg, d1)
      val d2 = SparkTestBase.tmpDir("redir-drv")
      val warm = CrawlEngine.run(spark, treeCorpusWithCycleLink,
        Seq(Seed(clean(0), null, 0)), noRobots, follower, cfg, d2,
        initialRedirects = cold.redirectEdges(spark))
      def key(r: CrawlEngine.RunResult) = r.trace(spark)
        .select("seq", "canonical", "status", "depth")
        .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
      (key(cold), key(warm))
    }
    val (cd, wd) = runBoth(cfgRedir) // driver path (default threshold)
    val (cx, wx) = runBoth(cfgRedir.copy(redirectDriverMax = 0)) // doubling
    assert(cd == cx, "cold trace must not depend on the resolve tier")
    assert(wd == wx, "warm trace must not depend on the resolve tier")
  }

  // ---- continuous-crawl epochs --------------------------------------
  // Star corpus: page 0 links to 1..6 spread over 2 hosts; doc i's title
  // is "v<e>" at epoch e when i changes every epoch (i % 2 == 1), else
  // "v0" forever. Epoch 0 discovers everything; epoch 1 revisits top-2
  // per host (priority all 0 -> url order); epoch 2's revisit priority
  // must rank CHANGED urls first.
  private def starUrl(i: Long) = s"http://e${i % 2}.test/p/$i"
  private def starCorpus(epoch: Int) = {
    val pages = (0L to 6L).map { i =>
      val title = if (i % 2 == 1) s"v$epoch" else "v0"
      val links =
        if (i == 0) (1L to 6L).zipWithIndex.map { case (j, k) =>
          Span("link", s"anchor$k", starUrl(j), k + 1) }
        else Seq.empty[Span]
      (starUrl(i), Span("text", title, null, 0) +: links)
    }
    pages.toDF("doc_id", "spans")
  }

  test("fused scheduled checkpoint (fusedCheckpointMin=0) leaves the trace exactly equal") {
    import graft.corpus.Corpus
    val spec = Corpus.Spec(nDocs = 200, nHosts = 10, maxLinks = 4)
    val docs = Corpus.docs(spark, spec)
    val seeds = Corpus.seedsLocal(4, spec)
    val base = CrawlConfig(maxRounds = 4, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, bloomShards = 4,
      bloomExpectedItems = 10000L, lineageStats = false)
    def rows(cfg: CrawlConfig) = {
      val dir = SparkTestBase.tmpDir("fused")
      val r = CrawlEngine.run(spark, docs, seeds, noRobots,
        Router(Map.empty, fallback = graft.router.Handler.linkFollower()),
        cfg, dir)
      (r.metrics.map(m => (m.round, m.scheduledRows, m.frontierRows)),
        r.trace(spark).select("seq", "url", "depth", "parentSeq")
          .as[(Long, String, Int, Long)].collect().sortBy(_._1).toSeq)
    }
    val (mFused, tFused) = rows(base.copy(fusedCheckpointMin = 0L))
    val (mPlain, tPlain) = rows(base.copy(fusedCheckpointMin = -1L))
    assert(mFused == mPlain) // incl. exact scheduled counts (Observation
                             // through the fused saveAsTable write)
    assert(tFused == tPlain)
  }

  test("fused checkpoint's large-round fetch join plans ZERO exchanges on either side") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.engine.BucketedJoinFetcher
    val n = 8
    // corpus as a bucketed catalog table (the 100 TB layout)
    spark.sql("DROP TABLE IF EXISTS fused_docs")
    (0L until 50L).map(i => (s"http://f.test/$i",
        Seq(Span("text", s"t$i", null, 0))))
      .toDF("doc_id", "spans")
      .write.bucketBy(n, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("fused_docs")
    val fetcher = new BucketedJoinFetcher("fused_docs", n,
      broadcastMax = 1L) // force the large-round path
    val sched = (0L until 20L).map(i => (s"http://f.test/$i",
        s"http://f.test/$i", i)).toDF("url", "canonical", "urlHash")
    val dir = SparkTestBase.tmpDir("fusedplan")
    val Some((back, rows)) =
      fetcher.checkpointScheduled(sched, s"$dir/scheduled/round=0")
    assert(rows == 20L)
    val fetched = fetcher.fetch(back, rows)
    val plan = fetched.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"fused join must be exchange-free, got ${exchanges.size}:\n$plan")
    assert(fetched.filter(col("status") === 200).count() == 20L)
    fetcher.endRound()
    // external table: the catalog entry is gone, the round files survive
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/scheduled/round=0")))
    spark.sql("DROP TABLE IF EXISTS fused_docs")
  }

  test("runEpochs: change-driven revisit priority across three epochs") {
    val work = SparkTestBase.tmpDir("epochs")
    val cfg = CrawlConfig(maxRounds = 2, maxDepth = 2,
      frontierPartitions = 4, bloomShards = 4, bloomExpectedItems = 10000L)
    val rs = ContinuousCrawl.runEpochs(spark, starCorpus,
      Seq(Seed(starUrl(0), null, 0)), noRobots, follower, cfg, work,
      epochs = 3, revisitPerHost = 2,
      revisitCfg = Some(cfg.copy(maxRounds = 1)))
    assert(rs.length == 3)

    // epoch 0 visits all 7 pages
    val v0 = rs(0).records(spark).select("url").as[String].collect().toSet
    assert(v0 == (0L to 6L).map(starUrl).toSet)

    // epoch 1: priorities all zero (one visit each) -> top-2 per host by
    // url asc: e0 host pages {0,2,4,6} -> /p/0, /p/2; e1 host {1,3,5}
    // -> /p/1, /p/3
    val v1 = rs(1).records(spark).select("url").as[String].collect().toSet
    assert(v1 == Set(starUrl(0), starUrl(2), starUrl(1), starUrl(3)))

    // epoch-1 titles come from the epoch-1 corpus (changed odd pages)
    val t1 = rs(1).records(spark).select("url", "title")
      .as[(String, String)].collect().toMap
    assert(t1(starUrl(1)) == "v1" && t1(starUrl(3)) == "v1")
    assert(t1(starUrl(0)) == "v0" && t1(starUrl(2)) == "v0")

    // epoch 2: urls visited twice with a change (1, 3) outrank the
    // never-changing twice-visited (0, 2) and the stale once-visited
    // (4, 5, 6). Host e1: {1, 3} changed -> both win. Host e0: 0 and 2
    // have priority 0 like 4 and 6, but staleness 1 < 2 -> 4 and 6 win.
    val v2 = rs(2).records(spark).select("url").as[String].collect().toSet
    assert(v2 == Set(starUrl(1), starUrl(3), starUrl(4), starUrl(6)))
    // and their content is epoch-2's
    val t2 = rs(2).records(spark).select("url", "title")
      .as[(String, String)].collect().toMap
    assert(t2(starUrl(1)) == "v2" && t2(starUrl(3)) == "v2")
    assert(t2(starUrl(4)) == "v0" && t2(starUrl(6)) == "v0")
  }
}
