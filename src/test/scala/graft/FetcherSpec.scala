package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.engine.{ConnectionPool, CrawlEngine, PageBackend, PageConnection, PooledFetcher}
import graft.model.{CrawlConfig, RobotsRule, Span}
import graft.router.{Handler, Router}

/** S8 pooled fetch: executor-local lazy pool, checkout health check,
  * bounded retry-with-backoff — against a deterministic flaky backend
  * (mirrors spire-thirtyfour pool/builder.rs:222-290, pool/manager.rs,
  * pool/connection.rs:121-180).
  */
object FetcherSpec {
  // JVM-static test-observable state (local mode: executors share the JVM)
  val attempted: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()

  /** Optionally fails every URL's FIRST fetch attempt (transient);
    * connections go stale after `staleAfter` uses so the
    * health-check/recycle path runs.
    */
  class FlakyBackend(pages: Map[String, Seq[Span]], staleAfter: Int,
      failFirst: Boolean = true) extends PageBackend {
    def connect(): PageConnection = new PageConnection {
      private var uses = 0
      def isHealthy: Boolean = uses < staleAfter
      def fetch(url: String): Option[Seq[Span]] = {
        uses += 1
        if (failFirst && attempted.add(url))
          throw new RuntimeException(s"transient: $url")
        pages.get(url)
      }
    }
  }

  /** Never succeeds: exercises retry exhaustion -> 503 -> engine hold. */
  class DeadBackend extends PageBackend {
    def connect(): PageConnection = new PageConnection {
      def isHealthy = true
      def fetch(url: String): Option[Seq[Span]] =
        throw new RuntimeException("always down")
    }
  }
}

class FetcherSpec extends SparkTestBase {
  import spark.implicits._
  import FetcherSpec._

  private val spec = Corpus.Spec(nDocs = 120, nHosts = 8, maxLinks = 3)
  private lazy val docsDf = Corpus.docs(spark, spec).cache()
  private lazy val pages = Corpus.docsLocal(spec)
    .map(d => d.doc_id -> d.spans).toMap
  private val seeds = Corpus.seedsLocal(3, spec)
  private val router = Router(Map("page" -> Handler.linkFollower()),
    fallback = Handler.linkFollower())
  private def noRobots = spark.emptyDataset[RobotsRule]
  private val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3,
    frontierPartitions = 4, useBloomPrefilter = false)

  test("pooled fetch: retries recover transients; trace == join fetcher") {
    attempted.clear()
    val poolId = "flaky-1"
    // staleAfter=1: any pooled reuse attempt hits the recycle path
    val pooled = new PooledFetcher(new FlakyBackend(pages, staleAfter = 1),
      poolId, poolSize = 3, maxRetries = 2)
    val dirA = SparkTestBase.tmpDir("pooled")
    val a = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg,
      dirA, fetcher = Some(pooled))
    val dirB = SparkTestBase.tmpDir("joined")
    val b = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth", $"status", $"n_links")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(key(a) == key(b)) // every transient recovered -> identical crawl
    val st = ConnectionPool.statsFor(poolId)
    assert(st.retries.get() > 0, "flaky backend never triggered a retry")
    assert(st.recycledUnhealthy.get() > 0, "stale connections never recycled")
    assert(st.created.get() >= 1)
    ConnectionPool.drain(poolId)
  }

  test("pool initializes lazily and reuses connections across rounds") {
    attempted.clear()
    val poolId = "reuse-1"
    val pooled = new PooledFetcher(
      new FlakyBackend(pages, staleAfter = 1000000, failFirst = false),
      poolId, poolSize = 2, maxRetries = 2)
    val dir = SparkTestBase.tmpDir("pooled-reuse")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg,
      dir, fetcher = Some(pooled))
    val st = ConnectionPool.statsFor(poolId)
    // connections created ~ poolSize x concurrent tasks, NOT per row/round:
    // with healthy connections, creations are bounded by peak concurrency
    // (32 local threads), far below the number of fetches
    assert(r.totalScheduled > st.created.get(),
      s"created ${st.created.get()} connections for ${r.totalScheduled} fetches")
    ConnectionPool.drain(poolId)
  }

  test("bucketed fetch join: identical trace, corpus never shuffled") {
    import graft.engine.BucketedJoinFetcher
    docsDf.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("graft_test_corpus")
    // broadcastMax=1 forces the bucketed SortMergeJoin path every round
    val bucketed = new BucketedJoinFetcher("graft_test_corpus", 4,
      broadcastMax = 1, schedTable = "graft_test_sched")
    val dirA = SparkTestBase.tmpDir("bucketed")
    val a = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg,
      dirA, fetcher = Some(bucketed))
    val dirB = SparkTestBase.tmpDir("plainjoin")
    val b = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth", $"status", $"n_links")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(key(a) == key(b))
    // plan shape: co-located SortMergeJoin, ZERO exchanges — the corpus
    // (100TB side) is never shuffled. The test corpus is tiny, so disable
    // auto-broadcast to plan the large-corpus regime.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fakeSched = docsDf.select($"doc_id".as("canonical"),
        xxhash64($"doc_id").as("urlHash"))
      val plan = bucketed.fetch(fakeSched, Long.MaxValue)
        .queryExecution.executedPlan.toString
      bucketed.endRound()
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("engine DEFAULT fetch is scale-safe: bucketed tables auto-detected, " +
      "other corpora bucket themselves once, corpus never shuffled") {
    import graft.engine.{AutoBucketJoinFetcher, BucketedJoinFetcher, Fetcher}
    docsDf.write.mode("overwrite")
      .bucketBy(4, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("graft_auto_corpus")
    // detection: a bucketed catalog table selects the co-located fetcher...
    val tbl = spark.table("graft_auto_corpus")
    assert(Fetcher.bucketedTableOf(tbl).exists(_._2 == 4))
    assert(Fetcher.auto(tbl).isInstanceOf[BucketedJoinFetcher])
    // ...a derived DataFrame selects the one-time auto-bucketing variant
    assert(Fetcher.bucketedTableOf(docsDf).isEmpty)
    assert(Fetcher.auto(docsDf).isInstanceOf[AutoBucketJoinFetcher])

    // auto-bucket path end-to-end (broadcastMax=1 forces it every round):
    // identical trace to the broadcast-join default
    val auto = new AutoBucketJoinFetcher(docsDf, 4, broadcastMax = 1)
    val dirA = SparkTestBase.tmpDir("autobucket")
    val a = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg,
      dirA, fetcher = Some(auto))
    val dirB = SparkTestBase.tmpDir("autobucket-ref")
    val b = CrawlEngine.run(spark, docsDf, seeds, noRobots, router, cfg, dirB)
    def key(r: CrawlEngine.RunResult) = r.trace(spark)
      .select($"seq", $"url", $"depth", $"status", $"n_links")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(key(a) == key(b))
    // plan shape on the auto-bucketed copy: zero-Exchange SortMergeJoin
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fakeSched = docsDf.select($"doc_id".as("canonical"),
        xxhash64($"doc_id").as("urlHash"))
      val plan = auto.fetch(fakeSched, Long.MaxValue)
        .queryExecution.executedPlan.toString
      auto.endRound()
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // close() drops the one-time corpus copy
    val autoTables = spark.catalog.listTables()
      .filter($"name".startsWith("graft_docs_auto_")).count()
    assert(autoTables == 1L, s"expected the auto corpus copy, got $autoTables")
    auto.close()
    assert(spark.catalog.listTables()
      .filter($"name".startsWith("graft_docs_auto_")).count() == 0L)
  }

  test("retry exhaustion -> 503 -> engine holds the row, crawl completes") {
    val poolId = "dead-1"
    val pooled = new PooledFetcher(new FetcherSpec.DeadBackend, poolId,
      poolSize = 2, maxRetries = 1)
    val dir = SparkTestBase.tmpDir("pooled-dead")
    val r = CrawlEngine.run(spark, docsDf, seeds, noRobots, router,
      cfg.copy(maxRounds = 2), dir, fetcher = Some(pooled))
    // all seeds scheduled, every fetch exhausted -> hold, no children
    assert(r.rounds == 1) // frontier empties after round 0 (no children)
    val t = r.trace(spark).select($"status", $"outcome")
      .as[(Int, String)].collect()
    assert(t.nonEmpty && t.forall(x => x._1 == 503 && x._2 == "hold"))
    ConnectionPool.drain(poolId)
  }
}
