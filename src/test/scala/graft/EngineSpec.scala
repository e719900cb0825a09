package graft

import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.{CrawlEngine, TableIO}
import graft.model.{CrawlConfig, RobotsRule}
import graft.oracle.Oracle
import graft.router.{Handler, Router}

/** Golden-trace equality between the Spark engine and the sequential
  * in-memory oracle (SURVEY §3.4, §5.2): crawl order (seq), URL-seen set,
  * depth/tag/parent bookkeeping — exact match required (north rule).
  */
class EngineSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = Corpus.Spec(nDocs = 200, nHosts = 10, maxLinks = 4)
  private lazy val docsDf = Corpus.docs(spark, spec).cache()
  private lazy val docsMap = Corpus.docsLocal(spec)
    .map(d => d.doc_id -> d.spans).toMap
  private val seeds = Corpus.seedsLocal(4, spec)
  // fallback also follows links: the oracle models link discovery for
  // every request regardless of tag (routing is exercised separately)
  private val router = Router(Map("page" -> Handler.linkFollower()),
    fallback = Handler.linkFollower())

  private def noRobots = spark.emptyDataset[RobotsRule]

  private def runEngine(cfg: CrawlConfig, robots: Seq[RobotsRule] = Seq.empty) = {
    val dir = SparkTestBase.tmpDir("engine")
    val r = CrawlEngine.run(spark, docsDf, seeds,
      if (robots.isEmpty) noRobots else robots.toDS(), router, cfg, dir)
    (r, r.trace(spark).collect().map(row => Oracle.TraceRow(
      row.getAs[Long]("seq"), row.getAs[String]("url"),
      row.getAs[String]("tag"), row.getAs[Int]("depth"),
      row.getAs[Long]("parentSeq"),
      row.getAs[scala.collection.Seq[Long]]("path").toList)))
  }

  test("engine-mode golden trace: dedup + budget + robots == oracle") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val cfg = CrawlConfig(maxRounds = 6, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, bloomShards = 4,
      bloomExpectedItems = 10000L)
    val (_, got) = runEngine(cfg, robots)
    val want = Oracle.crawlEngineMode(docsMap, seeds, robots,
      maxDepth = 4, maxRounds = 6, defaultBudget = 3)
    val gotSorted = got.sortBy(_.seq).map(t =>
      (t.seq, t.url, t.tag, t.depth, t.parentSeq))
    val wantSorted = want.sortBy(_.seq).map(t =>
      (t.seq, t.url, t.tag, t.depth, t.parentSeq))
    assert(gotSorted.length == wantSorted.length,
      s"row count: got ${gotSorted.length}, want ${wantSorted.length}")
    gotSorted.zip(wantSorted).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first mismatch at trace position $i")
    }
    // URL-seen set equality (north rule)
    assert(got.map(_.url).toSet == want.map(_.url).toSet)
  }

  test("trap screen (opt-in) drops machine-generated URLs; rest of the trace exact") {
    import graft.model.Seed
    val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3,
      frontierPartitions = 4, bloomShards = 4, bloomExpectedItems = 10000L)
    // trap seeds: a /x/x/x run and a 12-deep path — both screened; the
    // real seeds keep their registration indices so the control trace
    // (trap seeds never supplied, screen off) must match EXACTLY.
    val trapSeeds = Seq(
      Seed("http://h0.test/x/x/x/cal", "page", seeds.size),
      Seed("http://h1.test" + (1 to 12).map("/s" + _).mkString, "page",
        seeds.size + 1))
    val dirA = SparkTestBase.tmpDir("engine")
    val a = CrawlEngine.run(spark, docsDf, seeds ++ trapSeeds, noRobots,
      router, cfg.copy(trapScreen = true), dirA)
    val dirB = SparkTestBase.tmpDir("engine")
    val b = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg, dirB)
    def rows(r: CrawlEngine.RunResult) = r.trace(spark)
      .select("seq", "url", "tag", "depth", "parentSeq")
      .as[(Long, String, String, Int, Long)].collect().sortBy(_._1).toSeq
    val ra = rows(a)
    assert(ra == rows(b))
    assert(!ra.exists(_._2.contains("/x/x/")))
  }

  test("reference-exact FIFO: no dedup, unlimited budget == sequential oracle") {
    val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3, dedup = false,
      useBloomPrefilter = false, frontierPartitions = 4)
    val (_, got) = runEngine(cfg)
    val want = Oracle.crawlReference(docsMap, seeds, lifo = false, maxDepth = 3)
    assert(got.length == want.length)
    got.sortBy(_.seq).zip(want).foreach { case (g, w) =>
      assert((g.seq, g.url, g.depth, g.tag) == (w.seq, w.url, w.depth, w.tag))
    }
  }

  test("reference-exact LIFO: DFS order via path key == sequential oracle") {
    val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3, dedup = false,
      useBloomPrefilter = false, lifo = true, frontierPartitions = 4)
    val (_, got) = runEngine(cfg)
    val want = Oracle.crawlReference(docsMap, seeds, lifo = true, maxDepth = 3)
    import scala.math.Ordering.Implicits._
    val gotOrdered = got.sortBy(_.path.toList).map(t => (t.url, t.depth))
    assert(gotOrdered.length == want.length)
    gotOrdered.zip(want.map(t => (t.url, t.depth))).zipWithIndex.foreach {
      case ((g, w), i) => assert(g == w, s"DFS position $i") }
  }

  test("per-host budget is never exceeded in any round") {
    val budget = 2
    val cfg = CrawlConfig(maxRounds = 5, maxDepth = 4,
      defaultHostBudget = budget, frontierPartitions = 4)
    val (r, _) = runEngine(cfg)
    val perRoundHost = r.trace(spark)
      .groupBy($"round", $"host").count()
      .agg(max($"count")).as[Long].head()
    assert(perRoundHost <= budget)
  }

  test("resume from checkpoint == straight-through run") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val base = CrawlConfig(maxRounds = 5, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4,
      bloomExpectedItems = 10000L)
    val dirA = SparkTestBase.tmpDir("straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds, robots.toDS(),
      router, base, dirA)
    val dirB = SparkTestBase.tmpDir("resumed")
    CrawlEngine.run(spark, docsDf, seeds, robots.toDS(), router,
      base.copy(maxRounds = 2), dirB)
    assert(TableIO.latestCompletedRound(dirB) == 1)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, robots.toDS(),
      router, base, dirB)
    def key(dir: CrawlEngine.RunResult) = dir.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
    assert(straight.totalScheduled == resumed.totalScheduled)
  }

  test("defer enforcement: deferred tag skips rounds, crawl still completes") {
    // a handler that waits 2 logical rounds on every 'page' request
    val waitingRouter = Router(Map("page" ->
      Handler(Handler.linkFollower().children,
        graft.router.FlowControl.waitOwner(lit(2000L)))))
    val cfg = CrawlConfig(maxRounds = 8, maxDepth = 3, enforceDefer = true,
      msPerRound = 1000L, frontierPartitions = 4,
      bloomExpectedItems = 10000L)
    val dir = SparkTestBase.tmpDir("defer")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, waitingRouter,
      cfg, dir)
    val trace = r.trace(spark)
    // 'page'-tagged requests must never run in the round right after a
    // page round (the 2-round defer)
    val pageRounds = trace.filter($"tag" === "page")
      .select($"round").distinct().as[Int].collect().sorted
    pageRounds.sliding(2).foreach {
      case Array(a, b) => assert(b - a >= 2, s"defer violated: $a -> $b")
      case _ =>
    }
    assert(r.totalScheduled > 0)
  }

  test("TagQuery::List defer blocks every listed tag (F10)") {
    import graft.model.Seed
    import graft.router.FlowControl
    val listSeeds = Seq(Seed(Corpus.url(0L, spec), "a", 0),
      Seed(Corpus.url(1L, spec), "b", 1))
    def runWith(aOutcome: org.apache.spark.sql.Column) = {
      val router = Router(Map(
        "a" -> Handler(Handler.linkFollower().children, aOutcome),
        "b" -> Handler.linkFollower()))
      val cfg = CrawlConfig(maxRounds = 4, maxDepth = 3, enforceDefer = true,
        msPerRound = 1000L, frontierPartitions = 4,
        bloomExpectedItems = 10000L)
      val r = CrawlEngine.run(spark, docsDf, listSeeds, noRobots, router,
        cfg, SparkTestBase.tmpDir("listdefer"))
      r.trace(spark).filter($"tag" === "b" && $"round" > 0)
        .select(min($"round")).as[Int].head()
    }
    // Wait(List(a,b), 2 rounds): b's children blocked until round 2...
    val blocked = runWith(FlowControl.waitTags(Seq("a", "b"), lit(2000L)))
    assert(blocked >= 2, s"list defer ignored: b ran at round $blocked")
    // ...whereas Wait(Owner) from route 'a' never blocks 'b'
    val owner = runWith(FlowControl.waitOwner(lit(2000L)))
    assert(owner == 1, s"owner defer wrongly blocked b until $owner")
  }

  test("runOnce: single request processed, children left queued") {
    val cfg = CrawlConfig(maxDepth = 3, frontierPartitions = 4,
      useBloomPrefilter = false)
    val dir = SparkTestBase.tmpDir("once")
    val r = CrawlEngine.runOnce(spark, docsDf, seeds.head.url, "page",
      noRobots, router, cfg, dir)
    assert(r.totalScheduled == 1)
    val queued = TableIO.readRound(spark, dir, "frontier", 0).count()
    val outDeg = docsMap(seeds.head.url).count(_.kind == "link")
    assert(queued == outDeg)
  }

  test("router layer wraps every route (middleware, R5)") {
    // a layer that forces outcome to skip everywhere
    val wrapped = router.layer(h =>
      h.copy(outcome = graft.router.FlowControl.mk(
        lit("skip"), lit(null).cast("string"), lit(0L))))
    val cfg = CrawlConfig(maxRounds = 2, maxDepth = 3,
      frontierPartitions = 4, useBloomPrefilter = false)
    val dir = SparkTestBase.tmpDir("layer")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, wrapped, cfg, dir)
    val outcomes = r.trace(spark).select($"outcome").distinct()
      .as[String].collect().toSet
    assert(outcomes == Set("skip"))
    // skip counts as failure in the reference accounting
    assert(r.metrics.forall(m => m.success == 0))
  }

  test("seen compaction: identical trace + resume across snapshot boundary") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val base = CrawlConfig(maxRounds = 5, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4,
      bloomExpectedItems = 10000L, compactSeenEvery = 2)
    val dirA = SparkTestBase.tmpDir("compact")
    val withCompact = CrawlEngine.run(spark, docsDf, seeds, robots.toDS(),
      router, base, dirA)
    val dirB = SparkTestBase.tmpDir("nocompact")
    val without = CrawlEngine.run(spark, docsDf, seeds, robots.toDS(),
      router, base.copy(compactSeenEvery = 0), dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(withCompact) == key(without))
    // snapshot actually exists and resume reads through it
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dirA, "seen_compact")))
    val dirC = SparkTestBase.tmpDir("compact-resume")
    CrawlEngine.run(spark, docsDf, seeds, robots.toDS(), router,
      base.copy(maxRounds = 3), dirC)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, robots.toDS(),
      router, base, dirC)
    assert(key(resumed) == key(without))
  }

  test("abort enforcement: Fail permanently kills the matching tag") {
    val failing = Router(
      Map("page" -> Handler(Handler.linkFollower().children,
        graft.router.FlowControl.mk(lit("fail"), lit("single:page"), lit(0L)))),
      fallback = Handler.linkFollower())
    val cfg = CrawlConfig(maxRounds = 4, maxDepth = 4, enforceAbort = true,
      frontierPartitions = 4, useBloomPrefilter = false)
    val dir = SparkTestBase.tmpDir("abort")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, failing, cfg, dir)
    val pageRounds = r.trace(spark).filter($"tag" === "page")
      .select($"round").distinct().as[Int].collect().toSeq
    assert(pageRounds == Seq(0), s"page tag ran in rounds $pageRounds")
    // untagged (fallback) branches keep crawling
    assert(r.trace(spark).filter($"tag".isNull && $"round" > 0).count() > 0)
  }

  test("crawl-delay enforcement: golden trace + delayed hosts shift rounds") {
    // every host waits 2 logical rounds between visits; budget still applies
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
      .map(_.copy(crawlDelayMs = 2000L))
    val cfg = CrawlConfig(maxRounds = 10, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, msPerRound = 1000L,
      bloomExpectedItems = 10000L)
    val (r, got) = runEngine(cfg, robots)
    val want = Oracle.crawlEngineMode(docsMap, seeds, robots,
      maxDepth = 4, maxRounds = 10, defaultBudget = 3)
    val gotSorted = got.sortBy(_.seq).map(t =>
      (t.seq, t.url, t.tag, t.depth, t.parentSeq))
    val wantSorted = want.sortBy(_.seq).map(t =>
      (t.seq, t.url, t.tag, t.depth, t.parentSeq))
    assert(gotSorted.length == wantSorted.length,
      s"rows: got ${gotSorted.length}, want ${wantSorted.length}")
    gotSorted.zip(wantSorted).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first mismatch at trace position $i")
    }
    // a delayed host's scheduled rounds are always >= 2 apart
    val gaps = r.trace(spark)
      .select($"host", $"round").distinct().as[(String, Int)]
      .collect().groupBy(_._1).values
      .flatMap(_.map(_._2).sorted.toSeq.sliding(2).collect {
        case Seq(a, b) => b - a
      }).toSeq
    assert(gaps.nonEmpty && gaps.forall(_ >= 2),
      s"crawl delay violated: min gap ${if (gaps.isEmpty) -1 else gaps.min}")
  }

  test("bucketed seen mirror: trace identical to the plain exact tier, " +
      "resume reuses the table") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val cfg = CrawlConfig(maxRounds = 6, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, bloomShards = 4,
      bloomExpectedItems = 10000L)
    val (_, plain) = runEngine(cfg.copy(bucketedSeenMin = -1), robots)
    val (_, mirrored) = runEngine(cfg.copy(bucketedSeenMin = 0), robots)
    assert(plain.sortBy(_.seq).toSeq == mirrored.sortBy(_.seq).toSeq)
    // resume path: a stopped mirrored crawl resumes to the same trace
    val base = cfg.copy(bucketedSeenMin = 0)
    val dirA = SparkTestBase.tmpDir("mirror-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds,
      robots.toDS(), router, base, dirA)
    val dirB = SparkTestBase.tmpDir("mirror-resume")
    CrawlEngine.run(spark, docsDf, seeds, robots.toDS(), router,
      base.copy(maxRounds = 2), dirB)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, robots.toDS(),
      router, base, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
  }

  test("fresh crawl in a reused workDir drops the stale seen mirror (bench-trial bug)") {
    // the bench pattern: same workDir PATH, dir wiped between runs, same
    // warehouse/session. Run 1 builds the mirror (bucketedSeenMin=0);
    // before the fix run 2 adopted run 1's table and silently
    // under-scheduled (its bloom false-positives were wrongly confirmed
    // "seen" by the stale rows). Run 2's trace must be IDENTICAL.
    val cfg = CrawlConfig(maxRounds = 4, maxDepth = 4,
      frontierPartitions = 4, bloomShards = 4, bloomExpectedItems = 100L,
      useBloomPrefilter = false, // EVERY candidate consults the exact tier
      bucketedSeenMin = 0)
    val dir = SparkTestBase.tmpDir("reused-workdir")
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    val run1 = CrawlEngine.run(spark, docsDf, seeds, noRobots, router,
      cfg, dir)
    val k1 = key(run1)
    // wipe the dir contents like Bench.wipe does, keep the same path
    def wipe(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try { s.forEach(c => wipe(c)) } finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    wipe(java.nio.file.Paths.get(dir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val run2 = CrawlEngine.run(spark, docsDf, seeds, noRobots, router,
      cfg, dir)
    assert(key(run2) == k1)
  }

  test("distributed crawl-delay ledger: trace identical to driver ledger") {
    // distributedDelayHosts = 0 forces the web-scale path: delays as a
    // DataFrame (no robots.collect), (host, notBefore) as a checkpointed
    // round table, split/update as joins — same arithmetic, same trace
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
      .map(_.copy(crawlDelayMs = 2000L))
    val cfg = CrawlConfig(maxRounds = 10, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, msPerRound = 1000L,
      bloomExpectedItems = 10000L)
    val (_, viaDriver) = runEngine(cfg, robots)
    val (_, viaJoins) = runEngine(cfg.copy(distributedDelayHosts = 0), robots)
    assert(viaDriver.sortBy(_.seq).toSeq == viaJoins.sortBy(_.seq).toSeq)
  }

  test("distributed delay ledger survives resume (table checkpoint)") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
      .map(_.copy(crawlDelayMs = 2000L)).toDS()
    val base = CrawlConfig(maxRounds = 8, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4, msPerRound = 1000L,
      bloomExpectedItems = 10000L, distributedDelayHosts = 0)
    val dirA = SparkTestBase.tmpDir("dledger-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds, robots, router,
      base, dirA)
    val dirB = SparkTestBase.tmpDir("dledger-resume")
    CrawlEngine.run(spark, docsDf, seeds, robots, router,
      base.copy(maxRounds = 2), dirB)
    // the interrupted crawl checkpointed its ledger as a round table
    assert(TableIO.readHostLedgerRound(dirB, 1).isDefined)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, robots, router,
      base, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth", $"round")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
  }

  test("resume under enforceDefer+enforceAbort restores ledgers (ADVICE r01)") {
    // page requests defer 3 rounds AND media-tagged requests get killed:
    // resuming right after round 0 must carry both ledgers forward
    val mixed = Router(
      Map(
        "page" -> Handler(Handler.linkFollower().children,
          graft.router.FlowControl.waitOwner(lit(3000L))),
        "kill" -> Handler(Handler.linkFollower().children,
          graft.router.FlowControl.mk(lit("fail"), lit("single:kill"), lit(0L)))),
      fallback = Handler.linkFollower())
    val seeds2 = seeds :+ graft.model.Seed(Corpus.url(50L, spec), "kill", 4)
    val base = CrawlConfig(maxRounds = 6, maxDepth = 4, enforceDefer = true,
      enforceAbort = true, msPerRound = 1000L, frontierPartitions = 4,
      bloomExpectedItems = 10000L)
    val dirA = SparkTestBase.tmpDir("enf-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds2, noRobots, mixed,
      base, dirA)
    val dirB = SparkTestBase.tmpDir("enf-resume")
    CrawlEngine.run(spark, docsDf, seeds2, noRobots, mixed,
      base.copy(maxRounds = 1), dirB)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds2, noRobots, mixed,
      base, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"tag", $"depth", $"round")
      .as[(Long, String, String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
    // the killed tag stayed dead after resume
    assert(resumed.trace(spark)
      .filter($"tag" === "kill" && $"round" > 0).count() == 0)
  }

  test("salted budget rank selects the identical trace (hot-host skew)") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val base = CrawlConfig(maxRounds = 6, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4,
      bloomExpectedItems = 10000L)
    val (_, plain) = runEngine(base, robots)
    val (_, salted) = runEngine(base.copy(budgetSalts = 4), robots)
    assert(plain.sortBy(_.seq).toSeq == salted.sortBy(_.seq).toSeq)
  }

  test("cooperative stop (F8): stops at round boundary, resume completes") {
    val robots = Corpus.robotsLocal(spec, hostBudget = 3)
    val base = CrawlConfig(maxRounds = 5, maxDepth = 4,
      defaultHostBudget = 3, frontierPartitions = 4,
      bloomExpectedItems = 10000L)
    val dirA = SparkTestBase.tmpDir("stop-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds, robots.toDS(),
      router, base, dirA)
    val dirB = SparkTestBase.tmpDir("stop-coop")
    // signal trips once 2 rounds are durably committed
    val stopped = CrawlEngine.run(spark, docsDf, seeds, robots.toDS(),
      router, base, dirB,
      stopSignal = () => TableIO.latestCompletedRound(dirB) >= 1)
    assert(stopped.rounds == 2, s"stopped after ${stopped.rounds} rounds")
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, robots.toDS(),
      router, base, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
  }

  test("cuckoo seen tier: trace identical to the bloom tier") {
    val cfg = CrawlConfig(maxRounds = 5, maxDepth = 4,
      frontierPartitions = 4, bloomShards = 4, bloomExpectedItems = 10000L)
    val (_, viaBloom) = runEngine(cfg)
    val (_, viaCuckoo) = runEngine(cfg.copy(seenFilterKind = "cuckoo"))
    assert(viaBloom.sortBy(_.seq).toSeq == viaCuckoo.sortBy(_.seq).toSeq)
  }

  test("mid-round cancel: poll aborts before fetch, partials gone, " +
      "resume == straight-through") {
    val base = CrawlConfig(maxRounds = 4, maxDepth = 4,
      frontierPartitions = 4, bloomExpectedItems = 10000L)
    val dirA = SparkTestBase.tmpDir("mid-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds, noRobots,
      router, base, dirA)
    val dirB = SparkTestBase.tmpDir("mid-poll")
    // trips INSIDE round 1: true as soon as round 1's scheduled table is
    // on disk but its manifest is not — exactly the poll-#1 window
    val sched1 = java.nio.file.Paths.get(dirB, "scheduled", "round=1")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, base,
      dirB, stopSignal = () => java.nio.file.Files.isDirectory(sched1))
    assert(r.stoppedMidRound, "expected a mid-round abort")
    assert(r.rounds == 1, s"round 0 only, got ${r.rounds}")
    assert(TableIO.latestCompletedRound(dirB) == 0)
    // the aborted round left no table dirs (trace()/records() list dirs)
    assert(!java.nio.file.Files.exists(sched1))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dirB, "trace", "round=1")))
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, noRobots,
      router, base, dirB)
    def key(rr: CrawlEngine.RunResult) = rr.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
  }

  test("mid-round cancel: watcher kills in-flight jobs, resume exact") {
    val base = CrawlConfig(maxRounds = 4, maxDepth = 4,
      frontierPartitions = 4, bloomExpectedItems = 10000L)
    val dirA = SparkTestBase.tmpDir("midw-straight")
    val straight = CrawlEngine.run(spark, docsDf, seeds, noRobots,
      router, base, dirA)
    val dirB = SparkTestBase.tmpDir("midw-cancel")
    val flag = new java.util.concurrent.atomic.AtomicBoolean(false)
    // flips the signal from inside round 1's fetch: the watcher thread (or
    // the post-fetch poll) must abort the round wherever it happens to be
    val tripping = new graft.engine.Fetcher {
      private val inner = graft.engine.Fetcher.auto(docsDf, autoBuckets = 4)
      private var calls = 0
      def fetch(s: org.apache.spark.sql.DataFrame, n: Long)
          : org.apache.spark.sql.DataFrame = {
        calls += 1
        if (calls >= 2) flag.set(true)
        inner.fetch(s, n)
      }
      override def endRound(): Unit = inner.endRound()
      override def close(): Unit = inner.close()
    }
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, base,
      dirB, fetcher = Some(tripping), stopSignal = () => flag.get())
    assert(r.stoppedMidRound, "expected a mid-round abort")
    assert(TableIO.latestCompletedRound(dirB) == 0)
    val resumed = CrawlEngine.resume(spark, docsDf, seeds, noRobots,
      router, base, dirB)
    def key(rr: CrawlEngine.RunResult) = rr.trace(spark)
      .select($"seq", $"url", $"depth").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(key(straight) == key(resumed))
  }

  test("manifest lineage: per-bucket stats present and complete") {
    val cfg = CrawlConfig(maxRounds = 2, maxDepth = 3,
      frontierPartitions = 4, bloomExpectedItems = 10000L)
    val (r, _) = runEngine(cfg)
    val m = TableIO.readManifest(r.workDir, 0)
    assert(m.contains("\"completed\":true"))
    assert(m.contains("\"scheduled\""))
    assert(m.contains("content_hash"))
    // per-route Metric-middleware accounting (F11/F12): both the "page"
    // route and the fallback ("") appear with success counts
    assert(m.contains("\"metrics_by_tag\""))
    assert(m.contains("\"page\":{\"success\""), m)
    assert(TableIO.latestCompletedRound(r.workDir) == r.rounds - 1)
  }

  test("ledger parse survives hostile route names (ADVICE r02)") {
    // routes literally named "defer" / "ledgers" / "host_not_before"
    // serialize into metrics_by_tag BEFORE the ledgers object — the parse
    // must anchor on the real object, not the first lookalike
    val dir = SparkTestBase.tmpDir("hostile-manifest")
    val m = graft.model.RoundMetrics(3, 10, 10, 20, 10, 9, 1, 5L)
    TableIO.writeManifest(dir, 3, TableIO.manifestJson(3,
      Seq(TableIO.TableStat("scheduled", 10, Seq.empty)), m,
      completed = true,
      deferLedger = Map("x" -> 5, "host_not_before" -> 7),
      hostNotBefore = Map("h.test" -> 9),
      byTag = Map("defer" -> ((1L, 2L)), "ledgers" -> ((3L, 4L)),
        "host_not_before" -> ((5L, 6L)))))
    val (defer, hnb) = TableIO.readLedgers(dir, 3)
    assert(defer == Map("x" -> 5, "host_not_before" -> 7), defer)
    assert(hnb == Map("h.test" -> 9), hnb)
  }

  test("three-level seq prefix sum == two-level, no single-partition stage") {
    // skewed synthetic candidates: parent p has (p % 37) + 1 children,
    // parents not contiguous (gaps + seeds at -1) — exercises bucketing
    val cand = spark.range(0, 4000)
      .select((col("id") * 3 - 1).as("parentSeq"),
        explode(sequence(lit(0), (col("id") % 37).cast("int")))
          .as("emissionIdx"))
      .withColumn("urlHash", xxhash64(col("parentSeq"), col("emissionIdx")))
    val twoLevel = CrawlEngine.assignSeq(cand, nextSeq = 100L)
      .select("parentSeq", "emissionIdx", "seq")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val caches = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val threeLevelDf = CrawlEngine.assignSeq(cand, nextSeq = 100L,
      broadcastOffsets = false, rangeBuckets = 7, roundCaches = Some(caches))
    val threeLevel = threeLevelDf
      .select("parentSeq", "emissionIdx", "seq")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(threeLevel == twoLevel)
    // seq is a dense global FIFO range starting at nextSeq
    assert(threeLevel.map(_._3).sorted == (100L until (100L + cand.count())))
    // plan: no stage funnels all parents through one task (the two-level
    // form's global window plans an Exchange SinglePartition)
    val plan = threeLevelDf.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition stage:\n$plan")
    caches.foreach(_.unpersist(blocking = true))
  }
}
