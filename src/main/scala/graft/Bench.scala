package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.CrawlEngine
import graft.model.{CrawlConfig, Seed}
import graft.router.{Handler, Router}

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"urls_scheduled_per_sec","value":N,"unit":"urls/sec",
  *  "queries":{<name>:sec,...},"sf":"<dir>", ...}
  *
  * Two parts:
  *  1. headline operator queries over SPARK_GRAFT_SF_DIR (per-query secs)
  *  2. crawl throughput: a synthetic BENCH_DOCS-document corpus (written
  *     to parquet first, so fetch reads a real table) crawled for
  *     BENCH_ROUNDS rounds with dedup + budgets; the headline value is
  *     URLs scheduled per second (BASELINE.json metric). Run this main at
  *     two parallelism levels (SPARK_GRAFT_CPUS=8 / 32) on the SAME input
  *     for the N->4N scaling-efficiency evidence (see BENCH/BASELINE.md).
  *
  * Self-defense (round-3 verdict #2 — that round's record was poisoned
  * by hypervisor throttling): every timing is best-of-
  * SPARK_GRAFT_BENCH_TRIALS (default 2), and the JSON embeds a no-Spark
  * hardware control (JvmControl canonicalize rows/s) measured before the
  * queries and after the crawl, plus the round-2-era reference value, so
  * a throttled VM is visible in the record itself.
  */
object Bench {

  /** Per-run scratch base: env-overridable (point at /dev/shm for the
    * checkpoint-light tmpfs scaling runs), PID-suffixed by default so two
    * concurrent invocations never wipe each other's live corpus mid-run
    * (ADVICE r02). Each run wipes ONLY its own base.
    */
  def runBase: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASE",
    s"/tmp/graft-bench-${ProcessHandle.current().pid()}")

  def wipe(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  def crawlBench(spark: SparkSession, nDocs: Long, rounds: Int,
      partitions: Int): (Long, Double, Double) = {
    import spark.implicits._
    val spec = Corpus.Spec(nDocs = nDocs, nHosts = 1000, maxLinks = 10,
      hotHostPct = 20)
    // work base wiped per run: repeated bench invocations would otherwise
    // accumulate tens of GB, and a stale managed-table LOCATION from a
    // previous JVM blocks saveAsTable (warehouse lives under the same base)
    val base = java.nio.file.Paths.get(runBase, "work")
    wipe(base.toString)
    java.nio.file.Files.createDirectories(base)
    // corpus write is setup, not timed. Written as a BUCKETED table
    // (CLUSTERED BY doc_id) so large-round fetch joins are exchange-free
    // on the corpus side (BucketedJoinFetcher) — the 100TB layout.
    Corpus.docs(spark, spec)
      .repartition(partitions)
      .write.mode("overwrite")
      .bucketBy(64, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable("graft_corpus")
    val docs = spark.table("graft_corpus")
    val seeds = (0 until 1000).map(j =>
      Seed(Corpus.url(j.toLong * 97 % nDocs, spec), "page", j))
    val robots = Corpus.robotsLocal(spec, hostBudget = Int.MaxValue)
    val cfg = CrawlConfig(maxRounds = rounds, maxDepth = rounds + 1,
      defaultHostBudget = Int.MaxValue, frontierPartitions = partitions,
      bloomShards = 8, bloomExpectedItems = 2000000L, bloomFpp = 0.03,
      // throughput run: skip per-bucket lineage hashes (manifests keep
      // exact row counts; the stats read-back doubles round I/O) and the
      // DFS path key (dead weight in FIFO mode)
      lineageStats = false, trackPath = false)
    val work = s"$base/crawl"
    val router = Router(Map("page" -> Handler.linkFollower()),
      fallback = Handler.linkFollower())
    // no explicit fetcher: the bench exercises the ENGINE DEFAULT, which
    // must auto-detect the bucketed corpus table (round-2 verdict #1)
    val t0 = System.nanoTime()
    val r = CrawlEngine.run(spark, docs, seeds, robots.toDS(), router, cfg,
      work)
    val secs = (System.nanoTime() - t0) / 1e9
    if (sys.env.get("SPARK_GRAFT_BENCH_VERBOSE").contains("1"))
      r.metrics.foreach(m => System.err.println(
        s"[round ${m.round}] frontier=${m.frontierRows} " +
          s"scheduled=${m.scheduledRows} children=${m.emittedChildren} " +
          s"wall=${m.wallMs}ms"))
    (r.totalScheduled, secs, r.totalScheduled / secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
    val benchRounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "6").toInt
    // stale warehouse state only possible under a FIXED env-pinned base
    // (e.g. back-to-back tmpfs scaling runs); wipe before the session binds
    wipe(s"$runBase/warehouse")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the crawl's heavy rounds are disk-bound while cores idle (see
      // BENCH/BASELINE.md §0): trade spare CPU for bytes on both the
      // checkpoint and shuffle paths
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "zstd"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.warehouse.dir", s"$runBase/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val crawlOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("1")
    // session warmup OUTSIDE the timings: scheduler + codegen compiler +
    // parquet reader footprint all spin up on the first job, which
    // otherwise lands ~4-5s on whatever query sorts first alphabetically
    // (q_ann_bruteforce measured scale-INDEPENDENT at sf0.001 vs sf0.1 —
    // it was paying the session, not the cosine math)
    if (!crawlOnly) {
      spark.range(1000000L).selectExpr("sum(id * 2)").collect()
      try spark.read.parquet(s"$sfDir/documents.parquet").limit(100).count()
      catch { case _: Throwable => () }
    }
    // hardware control (round-3 verdict #2): the r3 record was 17x
    // slower than r2 on UNCHANGED code — hypervisor throttling with no
    // in-record evidence. Every bench now carries its own no-Spark
    // ceiling measurement (canonicalize rows/s on `cpus` plain threads,
    // the engine's hot workload class), taken BEFORE the queries and
    // AFTER the crawl so a mid-run throttle window is visible too.
    // Round-2-era reference on this VM class: ~10.8M rows/s at 32t.
    val ctrlRows = sys.env.getOrElse("SPARK_GRAFT_CTRL_ROWS", "6000000").toLong
    val ctrlPre = graft.tools.JvmControl.rate(cpus.toInt, ctrlRows)
    // best-of-N (round-3 verdict #2): one throttled window must not
    // poison a query's record; N=2 by default, each timing is min(N)
    val trials = math.max(1, sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_TRIALS", "2").toInt)
    // a failed query is an ERROR in the output, never a (fast-looking)
    // timing — the bench must not look healthier than it is (VERDICT r02)
    val attempts: Seq[(String, Either[String, Double])] =
      if (crawlOnly) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (try {
          Right((1 to trials).map { t =>
            // drop CacheManager entries a previous trial's query may have
            // registered internally: trial 2 must re-measure the
            // computation, not scan trial 1's cache
            if (t > 1) spark.catalog.clearCache()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }.min)
        } catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        })
      }
    val results = attempts.collect { case (n, Right(s)) => n -> s }
    val errors = attempts.collect { case (n, Left(m)) => n -> m }
    val crawlRuns = (1 to trials).map { _ =>
      crawlBench(spark, benchDocs, benchRounds, cpus.toInt)
    }
    val (scheduled, crawlSecs, rate) = crawlRuns.minBy(_._2)
    val ctrlPost = graft.tools.JvmControl.rate(cpus.toInt, ctrlRows)

    def f3(d: Double): String = f"$d%.3f"
    def jstr(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val qs = (results :+ ("crawl_bench" -> crawlSecs))
      .map { case (k, v) => s""""$k":${f3(v)}""" }
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, m) => s""""$k":"${jstr(m)}"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + crawlSecs
    val json =
      s"""{"metric":"urls_scheduled_per_sec","value":${f3(rate)},""" +
        s""""unit":"urls/sec","queries":$qs,"errors":$errJson,""" +
        s""""sf":"$sfDir","total_sec":${f3(total)},""" +
        s""""crawl_urls_scheduled":$scheduled,""" +
        s""""crawl_sec":${f3(crawlSecs)},"cpus":$cpus,""" +
        s""""trials":$trials,""" +
        s""""control_canon_rows_per_sec_pre":${f3(ctrlPre)},""" +
        s""""control_canon_rows_per_sec_post":${f3(ctrlPost)},""" +
        s""""control_ref_rows_per_sec_32t":10800000.0}"""
    // the metric line must survive log interleaving (round-1 driver parse
    // failed on a mid-run stack trace): write it to a dedicated file FIRST,
    // then print it as the LAST stdout line, after the session is down
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
    System.out.flush()
    println(json)
  }
}
