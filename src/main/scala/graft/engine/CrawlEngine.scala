package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.canon.{Canon, UrlTraps}
import graft.dedup.Seen
import graft.model._
import graft.politeness.Politeness
import graft.router.{FlowControl, Router}

/** The batch-iterative crawl loop (SURVEY §3.1): each round is ONE typed
  * Dataset job
  *
  *   frontier_k -> canonicalize -> dedup(bloom ⊕ anti-join seen) ->
  *   robots filter -> politeness window-rank/limit -> scheduled_k ->
  *   fetch (join docs) -> routed handlers -> children ∪ overBudget ->
  *   frontier_{k+1}; seen ∪= scheduled_k; manifest_k
  *
  * re-expressing the reference run loop
  * (spire-rs/spire crates/spire-core/src/process/runner.rs:103-177).
  * The reference executes requests effectively sequentially
  * (runner.rs:146-155 — `.then` before `buffer_unordered`), which is what
  * makes "exact crawl order" well-defined; here the ORDER is the contract,
  * not the schedule: every scheduled row gets a deterministic global FIFO
  * `seq` (SURVEY §3.4) while execution is fully parallel.
  *
  * Scale notes (axis A):
  *  - frontier/seen are explicitly hash-partitioned on urlHash
  *    (cfg.frontierPartitions buckets) — the dedup anti-join co-partitions.
  *  - seq assignment is two-level: a per-parent `row_number` window
  *    (parallel, partitioned by parentSeq) plus a prefix-sum over the
  *    per-parent counts (one row per parent — orders of magnitude smaller
  *    than the children set), so no global window ever sees the full
  *    frontier.
  *  - fetch joins broadcast the scheduled side when it is under the
  *    per-round budget threshold (docs is the 100TB side; never shuffle it
  *    on the build path).
  *  - every round ends in a parquet checkpoint + manifest: cuts the
  *    iterative lineage AND provides resume (north rule).
  */
object CrawlEngine {

  /** Candidate (pre-schedule) frontier columns. */
  private[engine] val candCols = Seq(
    "url", "canonical", "urlHash", "host", "tag", "depth", "priority",
    "discoveryRound", "parentSeq", "emissionIdx", "path")

  /** Sink-write pool: ALL of a round's post-fetch actions — the four
    * sink writes (trace, records, next frontier, seen delta), the
    * outcome/metrics aggregate, the bloom build, the seen-mirror append
    * and the crawl-delay ledger — run concurrently here; the round floor
    * pays ONE max-latency instead of their sum (round-4 verdict #1).
    * Spark actions are thread-safe, and concurrent first reads of the
    * persisted fetch are safe: the block manager's in-progress locks
    * compute each cached partition exactly once while other consumers
    * wait on it.
    */
  private lazy val sinkEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(8,
      r => { val t = new Thread(r, "graft-sink"); t.setDaemon(true); t }))

  /** Thrown by the engine's own mid-round polls; carries no stack (it is
    * pure control flow on the driver, thrown at most once per crawl).
    */
  private final class MidRoundStop extends RuntimeException(null, null, false, false)

  case class RunResult(
      rounds: Int,
      totalScheduled: Long,
      metrics: Seq[RoundMetrics],
      workDir: String,
      /** true when the crawl was cancelled INSIDE a round (cancelMidRound):
        * the partial round left no tables and no manifest; resume replays
        * it from the last committed manifest.
        */
      stoppedMidRound: Boolean = false) {
    private def roundDirs(name: String): Seq[String] = {
      val base = java.nio.file.Paths.get(workDir, name)
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(base) // close: runs on every trace()
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("round="))
        .map(_.toString).toSeq.sorted
      finally s.close()
    }
    def trace(spark: SparkSession): DataFrame =
      spark.read.parquet(roundDirs("trace"): _*).drop("_bucket")
    def records(spark: SparkSession): DataFrame =
      spark.read.parquet(roundDirs("records"): _*).drop("_bucket")
    /** (src, dst) redirect edges this crawl discovered (followRedirects),
      * None when the crawl saw no 3xx — feed into the next epoch's
      * `initialRedirects` so known chains cost zero fetches there.
      */
    def redirectEdges(spark: SparkSession): Option[DataFrame] = {
      val base = java.nio.file.Paths.get(workDir, "redirects")
      if (!java.nio.file.Files.isDirectory(base)) None
      else Some(spark.read.parquet(roundDirs("redirects"): _*)
        .select(org.apache.spark.sql.functions.col("src"),
          org.apache.spark.sql.functions.col("dst")))
    }
  }

  /** Canonicalize seeds into candidate rows. Seeds enter in REVERSE
    * registration order (reference drains its seed Vec from the end:
    * runner.rs:110-121): emissionIdx = maxIdx - registrationIdx.
    * In LIFO mode the reversal is cancelled by stack pops — seeds process
    * in registration order (SURVEY §3.4) — hence path = [registrationIdx].
    */
  def seedCandidates(spark: SparkSession, seeds: Seq[Seed], lifo: Boolean): DataFrame = {
    import spark.implicits._
    val maxIdx = seeds.size - 1
    val df = seeds.toDF()
    df.select(
      col("url"),
      Canon.canonicalize(col("url")).as("canonical"),
      col("tag"),
      lit(1).as("depth"),
      lit(0).as("priority"),
      lit(0).as("discoveryRound"),
      lit(-1L).as("parentSeq"),
      (if (lifo) col("registrationIdx")
       else lit(maxIdx) - col("registrationIdx")).cast("int").as("emissionIdx"),
      array(col("registrationIdx").cast("long")).as("path"))
      .filter(col("canonical").isNotNull)
      .withColumn("urlHash", Canon.urlHash(col("canonical")))
      .withColumn("host", Canon.host(col("canonical")))
      .select(candCols.map(col).toIndexedSeq: _*)
  }

  /** Deterministic global FIFO seq for this round's scheduled rows.
    *
    * THREE-level prefix sum (round-2 verdict #3 — the two-level form ran
    * `sum over (orderBy _ps)` with no partitionBy, a single-partition sort
    * over the per-parent count table, ~10^8 rows through ONE task at a
    * 10^9-URL round):
    *   L1 within-parent rank: window partitioned by parentSeq (parallel)
    *   L2 per-parent offsets, bucketed: range-partition the count table on
    *      _ps into `rangeBuckets` order-preserving buckets; prefix-sum
    *      WITHIN each bucket (window partitioned by bucket id — parallel)
    *   L3 bucket offsets: one total per bucket (<= rangeBuckets rows,
    *      config-bounded), prefix-summed on the DRIVER and folded back as
    *      a literal map — control-plane, same pattern as the politeness
    *      ledgers. No single-partition window or sort anywhere.
    *
    * The bucketed count table is PERSISTED before its two consumers (the
    * totals collect and the offsets join): range-partitioner sampling and
    * spark_partition_id are only deterministic across jobs when both read
    * the same materialized blocks. Callers pass `roundCaches` to unpersist
    * after the downstream action (the engine does, right after the
    * scheduled checkpoint); with None the handle is left to LRU eviction.
    *
    * `rangeBuckets <= 1` keeps the two-level form — right for small rounds
    * where the count table fits one task and the extra shuffle+persist
    * would dominate.
    */
  def assignSeq(scheduled: DataFrame, nextSeq: Long,
      broadcastOffsets: Boolean = true,
      rangeBuckets: Int = 0,
      roundCaches: Option[scala.collection.mutable.Buffer[DataFrame]] = None
  ): DataFrame = {
    val wIn = Window.partitionBy(col("parentSeq")).orderBy(col("emissionIdx"))
    val ranked = scheduled.withColumn("_rk", row_number().over(wIn))
    val counts = ranked.groupBy(col("parentSeq").as("_ps"))
      .agg(count(lit(1)).as("_cnt"))
    val offsets =
      if (rangeBuckets > 1) {
        val local = counts
          .repartitionByRange(rangeBuckets, col("_ps"))
          .withColumn("_pid", spark_partition_id())
          .withColumn("_loc",
            coalesce(
              sum(col("_cnt")).over(
                Window.partitionBy(col("_pid")).orderBy(col("_ps"))
                  .rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        roundCaches.foreach(_ += local)
        // L3: <= rangeBuckets rows — driver-side prefix, literal map back
        val totals = local.groupBy(col("_pid"))
          .agg(sum(col("_cnt")).as("_tot"))
          .collect().map(r => (r.getInt(0), r.getLong(1)))
          .sortBy(_._1)
        var acc = 0L
        val bucketOff: Map[Int, Long] = totals.map { case (pid, tot) =>
          val off = (pid, acc); acc += tot; off
        }.toMap
        val poff =
          if (bucketOff.isEmpty) lit(0L)
          else coalesce(element_at(typedlit(bucketOff), col("_pid")), lit(0L))
        local.select(col("_ps"), (col("_loc") + poff).as("_off"))
      } else {
        counts.withColumn("_off",
          coalesce(
            sum(col("_cnt")).over(
              Window.orderBy(col("_ps"))
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .drop("_cnt")
      }
    // offsets has one row per parent — usually tiny vs children, so
    // broadcast; above ~10^6 parents fall back to a shuffled join
    val offSide =
      if (broadcastOffsets && rangeBuckets <= 1) broadcast(offsets) else offsets
    ranked
      .join(offSide, ranked("parentSeq") === col("_ps"))
      .withColumn("seq", lit(nextSeq) + col("_off") + col("_rk") - 1)
      .drop("_ps", "_off", "_rk")
  }

  /** Checkpointed state handed from [[resume]] into [[run]]: the frontier,
    * the accumulated seen table, the next global seq, and both politeness
    * ledgers (checkpointed per round in the manifest — without them, resume
    * under enforceDefer/enforceAbort/crawl-delay would resurrect killed
    * tags and drop pending defers, breaking resume == straight-through).
    */
  case class ResumeState(
      frontier: DataFrame,
      seen: DataFrame,
      nextSeq: Long,
      deferLedger: Map[String, Int],
      hostNotBefore: Map[String, Int],
      /** checkpointed (host, _notBefore) table when the crawl ran in
        * distributed-ledger mode (CrawlConfig.distributedDelayHosts). */
      hostLedger: Option[DataFrame] = None,
      /** round the hostLedger table was written under (for manifest
        * carry-forward on rounds that schedule nothing). */
      hostLedgerRound: Option[Int] = None)

  /** One full crawl. `docs` is the corpus table (doc_id = canonical URL,
    * spans = interleaved content). Returns per-round metrics; the trace /
    * records / seen tables live under `workDir`.
    */
  def run(
      spark: SparkSession,
      docs: DataFrame,
      seeds: Seq[Seed],
      robots: Dataset[RobotsRule],
      router: Router,
      cfg: CrawlConfig,
      workDir: String,
      startRound: Int = 0,
      resumeState: Option[ResumeState] = None,
      fetcher: Option[Fetcher] = None,
      /** Cooperative cancellation (F8, reference CancellationToken ->
        * AbortHandle.abort, runner.rs:86-88,131-144): polled at each round
        * boundary; when true the crawl stops AFTER the last completed
        * round's manifest commit, so the stop is always resumable. Rounds
        * are the engine's atomic unit — mid-round state is never exposed,
        * which is what makes "stop anywhere, resume exactly" possible.
        */
      stopSignal: () => Boolean = () => false,
      /** Seed the crawl from a CANDIDATE DataFrame (candCols shape)
        * instead of a driver-side Seq[Seed] — the continuous-crawl tier's
        * entry: a revisit frontier can be 10^9 rows and must never pass
        * through the driver. Ignored when resumeState is set; `seeds` is
        * ignored when this is set.
        */
      seedFrontier: Option[DataFrame] = None,
      /** Warm-start redirect edges (src, dst) from a PRIOR crawl of the
        * same URL space: with followRedirects on, known chains rewrite
        * candidates to their final targets from round 0 — zero fetches
        * spent re-walking chains the last epoch already discovered.
        */
      initialRedirects: Option[DataFrame] = None
  ): RunResult = {
    import spark.implicits._
    // default = scale-safe co-located fetch (round-2 verdict #1): bucketed
    // catalog tables join with zero corpus Exchanges; anything else buckets
    // itself once on the first large round. A caller-provided fetcher is
    // caller-owned and never closed here.
    val theFetcher = fetcher.getOrElse(
      Fetcher.auto(docs, autoBuckets = cfg.frontierPartitions))

    // Mid-round cancellation (reference CancellationToken, runner.rs:86-88,
    // 131-144: aborts BETWEEN requests, not only between rounds). All of
    // this crawl's jobs — including the concurrent sink writes — run in one
    // job group; a daemon watcher cancels the group's active jobs as soon
    // as stopSignal fires, so even a long fetch stage is interruptible.
    // The cancelled round's partials are deleted and its manifest never
    // commits: the abort is indistinguishable from a crash before commit,
    // which resume already handles exactly.
    val jobGroup = s"graft-crawl-${java.util.UUID.randomUUID()}"
    @volatile var watcherLive = cfg.cancelMidRound
    def inGroup[T](body: => T): T = {
      spark.sparkContext.setJobGroup(jobGroup, "graft crawl round",
        interruptOnCancel = true)
      body
    }
    if (cfg.cancelMidRound) {
      val w = new Thread(() => {
        while (watcherLive) {
          // keep re-cancelling while the signal holds: jobs submitted
          // after the first cancel (cleanup races) die too
          if (stopSignal()) spark.sparkContext.cancelJobGroup(jobGroup)
          Thread.sleep(50)
        }
      }, "graft-stop-watcher")
      w.setDaemon(true)
      w.start()
    }

    // a caller-provided seed frontier (continuous-crawl revisit sets) is
    // an arbitrary plan (joins over prior epochs' records/trace): persist
    // it so the initial sizing count and round 0's pipeline execute it
    // once, not twice (r6). Unpersisted at crawl end; resume frontiers
    // are parquet scans and need no pin.
    val seedFrontierPinned = seedFrontier.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var frontier = resumeState.map(_.frontier)
      .orElse(seedFrontierPinned)
      .getOrElse(seedCandidates(spark, seeds, cfg.lifo))
    var seen = resumeState.map(_.seen).getOrElse(
      spark.emptyDataset[SeenEntry].toDF())
    var nextSeq = resumeState.map(_.nextSeq).getOrElse(0L)
    var round = startRound
    var metrics = Vector.empty[RoundMetrics]
    // politeness defer ledger (reference apply_defer, runner.rs:289-306):
    // tag -> earliest eligible round. "__every__" mirrors the reference
    // deferring Tag::Fallback on TagQuery::Every.
    var deferLedger = resumeState.map(_.deferLedger)
      .getOrElse(Map.empty[String, Int])
    // per-HOST crawl-delay ledger (north-rule robots rules): host ->
    // earliest eligible round, apply_defer semantics (max(existing, now)+d,
    // runner.rs:289-306) in round units. Enforced in the BATCH path too —
    // round 1 only enforced crawlDelayMs in the streaming demo.
    var hostNotBefore = resumeState.map(_.hostNotBefore)
      .getOrElse(Map.empty[String, Int])
    // one row per host: tiny for most crawls, 10^6-10^8 rows at web
    // scale. One count() decides the regime; below the threshold the
    // delay ledger lives on the driver (zero extra jobs per round), above
    // it everything stays distributed: the delay table is a DataFrame,
    // the (host, notBefore) ledger a checkpointed round table, splits and
    // updates are joins. Same arithmetic on both paths (spec-proven
    // trace equality); robots stops being broadcast past the same bar.
    val robotsEmpty = robots.isEmpty
    val delayHostCount: Long =
      if (robotsEmpty) 0L
      else robots.toDF().filter(col("crawlDelayMs") > 0).count()
    val delayDistributed =
      delayHostCount > math.max(cfg.distributedDelayHosts, 0).toLong
    val broadcastRobots = !delayDistributed
    val delayRounds: Map[String, Int] =
      if (robotsEmpty || delayDistributed || delayHostCount == 0) Map.empty
      else robots.collect().iterator
        .filter(_.crawlDelayMs > 0)
        .map(r => r.host -> math.max(1,
          math.ceil(r.crawlDelayMs.toDouble / cfg.msPerRound).toInt))
        .toMap
    // distributed-mode delay table: host -> delay in rounds (no collect)
    val delaysDf: Option[DataFrame] =
      if (!delayDistributed) None
      else Some(robots.toDF()
        .filter(col("crawlDelayMs") > 0)
        .select(col("host"),
          greatest(lit(1L),
            ceil(col("crawlDelayMs") / lit(cfg.msPerRound.toDouble))
              .cast("long")).as("_dRounds")))
    var hostLedgerDf: Option[DataFrame] =
      resumeState.flatMap(_.hostLedger)
    var lastHostLedgerRound: Option[Int] =
      resumeState.flatMap(_.hostLedgerRound)
    // hostledger snapshots superseded by a newer write; deletable only
    // AFTER the manifest that references the newer one commits (an abort
    // before that must still find the old snapshot for resume)
    var staleLedgerRounds: List[Int] = Nil

    // bucketed seen mirror (exact-tier twin of the fetcher's bucketed
    // corpus copy): activates once the seen set is past broadcast size;
    // a RESUME in the same warehouse adopts the table (stale rows from
    // aborted rounds are harmless — identical to the replay's rows, see
    // BucketedSeenStore scaladoc), a resume in a fresh warehouse
    // recreates it from the dir deltas at the next threshold check.
    // A FRESH crawl must NOT adopt it: the table then belongs to a
    // PREVIOUS crawl that used the same workDir path (e.g. back-to-back
    // bench trials wiping the dir between runs), and its rows are other
    // runs' seen URLs — adopting them silently under-schedules from the
    // first round whose candidates reach the exact tier. Found as a
    // 24%-compounding under-schedule in bench trial 2 at 30M docs.
    val resuming = startRound > 0 || resumeState.nonEmpty
    var seenStore: Option[graft.dedup.BucketedSeenStore] = {
      if (cfg.dedup && cfg.bucketedSeenMin >= 0) {
        val s = new graft.dedup.BucketedSeenStore(spark,
          graft.dedup.BucketedSeenStore.tableFor(workDir),
          cfg.frontierPartitions)
        if (s.exists) {
          if (resuming) Some(s)
          else { s.drop(); None }
        } else None
      } else None
    }
    // bloom ledger = FAMILY of per-round shard maps, each sized to its
    // round's delta (no merge, no fixed oversized buffers — keeps the
    // partial-aggregate shuffle proportional to actual new URLs). Members
    // are broadcast ONCE when built and destroyed when the family is
    // merged at seen compaction (ADVICE r01: re-broadcasting the family
    // every round pinned every superseded copy forever).
    var bloomLedger =
      Vector.empty[org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]]]
    def bcast(m: Map[Int, Array[Byte]]) = spark.sparkContext.broadcast(m)
    // build one sharded family member with the configured filter tier —
    // bloom or cuckoo (north rule: "partitioned bloom/cuckoo URL-seen
    // filter"); the probe/broadcast/compaction machinery is shared, the
    // serialized bytes self-describe (Filters.deserialize dispatch)
    def buildSeenFilter(df: DataFrame, expectedPerShard: Long) =
      cfg.seenFilterKind match {
        case "cuckoo" =>
          graft.dedup.CuckooFilter.buildSharded(df, cfg.bloomShards,
            expectedPerShard)
        case _ =>
          Seen.buildShardedBlooms(df, cfg.bloomShards, expectedPerShard,
            cfg.bloomFpp)
      }
    // on resume, rebuild one family member from the checkpointed seen table
    if (resumeState.isDefined && cfg.dedup && cfg.useBloomPrefilter &&
        nextSeq > 0) {
      bloomLedger = Vector(bcast(buildSeenFilter(seen,
        math.max(nextSeq / cfg.bloomShards, 1000L))))
    }

    // redirect-edge ledger (followRedirects): discovered (src -> dst)
    // edges live as durable "redirects" round deltas; the RESOLVED map
    // (src -> final target | looped) is rebuilt lazily at the next round
    // start whenever edges changed — log-hop pointer doubling
    // ([[Redirects.resolve]]), never per-hop iteration. A resumed crawl
    // (or a warm start via `initialRedirects`) rebuilds from what exists.
    var redirectMap: Option[DataFrame] = None
    var redirectDeltasThrough: Int =
      if (cfg.followRedirects && resuming &&
          java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(s"$workDir/redirects")))
        TableIO.latestCompletedRound(workDir)
      else -1
    var redirectsDirty: Boolean = cfg.followRedirects &&
      (initialRedirects.nonEmpty || redirectDeltasThrough >= 0)
    def rebuildRedirectMap(): Unit = {
      redirectMap.foreach(_.unpersist(blocking = false))
      val stored =
        if (redirectDeltasThrough >= 0)
          Some(TableIO.readDeltas(spark, workDir, "redirects",
            redirectDeltasThrough).select(col("src"), col("dst")))
        else None
      val all = (initialRedirects.map(_.select(col("src"), col("dst")))
        .toSeq ++ stored.toSeq).reduceOption(_.unionByName(_))
      redirectMap = all.map { e =>
        // one outgoing edge per src (resolve's contract); max() makes the
        // pick deterministic if observations ever disagree
        val edges = e.groupBy(col("src")).agg(max(col("dst")).as("dst"))
        // driver fast path (r6): small ledgers collect + resolve locally
        // (Redirects.resolveLocal, differential-spec'd against resolve)
        // and the rewrite map BROADCASTS — the distributed doubling is
        // ~5 shuffle stages per rebuild, pure serial floor on
        // redirect-heavy crawls with tiny ledgers. limit(max+1) bounds
        // the collect; an over-limit ledger falls through to doubling.
        val local: Option[Array[org.apache.spark.sql.Row]] =
          if (cfg.redirectDriverMax <= 0) None
          else {
            val rows = edges.limit(cfg.redirectDriverMax + 1).collect()
            if (rows.length > cfg.redirectDriverMax) None else Some(rows)
          }
        local match {
          case Some(rows) =>
            import spark.implicits._
            val m = rows.iterator
              .map(r => r.getString(0) -> r.getString(1)).toMap
            broadcast(
              Redirects.resolveLocal(m, cfg.redirectMaxHops)
                .map { case (src, fin, _, loop) => (src, Option(fin), loop) }
                .toDF("_rsrc", "_rfin", "_rloop"))
          case None =>
            Redirects.resolve(edges, cfg.redirectMaxHops)
              .select(col("url").as("_rsrc"), col("final_url").as("_rfin"),
                col("looped").as("_rloop"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
      }
      redirectsDirty = false
    }

    // politeness fast path: when every budget is effectively unbounded the
    // per-host window rank is a no-op — skip the per-host shuffle+sort
    // (the hot host would otherwise sort all its rows in one task per
    // round for nothing). robots is tiny by construction.
    val budgetUnbounded = cfg.defaultHostBudget == Int.MaxValue && {
      import org.apache.spark.sql.functions.{min => fmin}
      robots.isEmpty ||
        robots.toDF().agg(fmin(col("hostBudget"))).head.getInt(0) >=
          Int.MaxValue / 2
    }

    // adaptive bucket count: layout tracks round size (see
    // CrawlConfig.rowsPerBucket); capped by frontierPartitions, the
    // 10^10-scale knob
    def bucketsFor(rows: Long): Int =
      if (cfg.rowsPerBucket <= 0) cfg.frontierPartitions
      else math.max(1, math.min(cfg.frontierPartitions.toLong,
        (rows + cfg.rowsPerBucket - 1) / cfg.rowsPerBucket)).toInt

    // a fresh seed crawl knows its frontier size on the driver — the
    // count here is only a loop/sizing input (exact counts land with
    // each round's write Observation), so skip the extra job
    var frontierCount =
      if (resumeState.isEmpty && seedFrontier.isEmpty) seeds.size.toLong
      else inGroup(frontier.count())
    var stopped = false
    var pinned: Option[DataFrame] = None // persisted fetch, for abort cleanup
    // persisted small-round scheduled table (memCheckpointMax path)
    var pinnedSched: Option[DataFrame] = None
    // every concurrent-stage future of the CURRENT round, so the cancel
    // path can drain stragglers before deleting the round's dirs (a
    // straggler read-job racing the delete + the resumed crawl's
    // overwrite is the one nondeterminism the job-group cancel can't
    // close on its own)
    val inflight = scala.collection.mutable.ArrayBuffer.empty[
      scala.concurrent.Future[_]]
    def track[T](f: scala.concurrent.Future[T]): scala.concurrent.Future[T] = {
      inflight += f; f
    }
    try {
    while (frontierCount > 0 && round < cfg.maxRounds && !stopped &&
        !stopSignal()) try {
      inGroup(())
      inflight.clear()
      val t0 = System.nanoTime()

      // 0.5 tiny-round single-partition head (r6, guide §2.4): every
      // operator in the candidate pipeline (dedup window, budget window,
      // seq windows, aggregations, joins) requires only a Clustered
      // Distribution, which a SINGLE partition satisfies — so coalescing
      // a tiny frontier to one partition makes the whole pipeline
      // exchange-free (one stage instead of 4-5 AQE stage-jobs of
      // 80-200 ms each, the measured floor). Gated on BOTH the frontier
      // and the accumulated seen set being small: a big seen side would
      // otherwise be forced into the single partition by the exact
      // anti-join's co-partitioning requirement. Results are identical —
      // every operator is deterministic under any partitioning (total
      // order keys / exact aggregation).
      val frontierIn =
        if (cfg.singlePartitionMax > 0 &&
            frontierCount < cfg.singlePartitionMax &&
            nextSeq < cfg.singlePartitionMax)
          frontier.coalesce(1)
        else frontier

      // 1. defer enforcement (engine mode only; reference records but
      //    never consumes its ledger — runner.rs:224-226)
      val (eligible0, deferred) =
        if ((cfg.enforceDefer || cfg.enforceAbort) && deferLedger.nonEmpty) {
          // killed tags (Fail + enforceAbort) are dropped outright;
          // temporarily deferred tags are carried to the next round
          val killedTags = deferLedger
            .filter(_._2 == Int.MaxValue).keys.toSeq
          val blockedTags = deferLedger
            .filter(v => v._2 > round && v._2 != Int.MaxValue).keys.toSeq
          val alive =
            if (killedTags.contains("__every__")) frontierIn.limit(0)
            else if (killedTags.isEmpty) frontierIn
            else frontierIn.filter(col("tag").isNull ||
              !col("tag").isin(killedTags: _*))
          if (blockedTags.contains("__every__")) (alive.limit(0), alive)
          else if (blockedTags.isEmpty) (alive, frontierIn.limit(0))
          else (alive.filter(col("tag").isNull ||
                  !col("tag").isin(blockedTags: _*)),
                alive.filter(col("tag").isNotNull &&
                  col("tag").isin(blockedTags: _*)))
        } else (frontierIn, frontierIn.limit(0))

      // 1.3 redirect rewrite (followRedirects): candidates whose canonical
      //     is a KNOWN redirect source jump straight to the chain's final
      //     target — before dedup (so they dedup against the target) and
      //     before politeness (the slot is charged to the FINAL host).
      //     Known cycles / over-cap chains are dropped: unfetchable.
      if (cfg.followRedirects && redirectsDirty) rebuildRedirectMap()
      val eligible0r = redirectMap match {
        case Some(rm) if cfg.followRedirects =>
          eligible0.join(rm, col("canonical") === col("_rsrc"), "left")
            .filter(col("_rloop").isNull || !col("_rloop"))
            .withColumn("canonical",
              coalesce(col("_rfin"), col("canonical")))
            .drop("_rsrc", "_rfin", "_rloop")
            .withColumn("urlHash", Canon.urlHash(col("canonical")))
            .withColumn("host", Canon.host(col("canonical")))
        case _ => eligible0
      }

      // 1.5 structural trap screen (opt-in, NOT a reference behavior —
      //     golden traces run with it off): machine-generated URL shapes
      //     ([[graft.canon.UrlTraps]]) are dropped BEFORE they cost bloom
      //     probes, seen anti-join work or a politeness slot. Dropped,
      //     never deferred — a trap URL cannot become fetchable later.
      val eligible0s =
        if (!cfg.trapScreen) eligible0r
        else eligible0r.filter(!UrlTraps.isTrap(col("canonical"),
          cfg.trapMaxRun, cfg.trapMaxDepth, cfg.trapMaxParams))

      // 2. dedup: bloom prefilter (fast negatives, per-shard broadcast)
      //    -> exact anti-join (only bloom-positive candidates pay it)
      //    -> in-batch first-occurrence. Exactness is guaranteed by the
      //    anti-join regardless of bloom fpp.
      val eligible1 =
        if (!cfg.dedup) eligible0s
        else {
          // exact tier: the bucketed mirror when active (seen side never
          // shuffled), the plain anti-join (broadcastable seen) below it
          def exact(cand: DataFrame): DataFrame = seenStore match {
            case Some(st) => st.antiJoin(cand)
            case None => Seen.exactAntiJoin(cand, seen)
          }
          val notSeen =
            if (cfg.useBloomPrefilter && bloomLedger.nonEmpty) {
              val (defNew, maybe) =
                Seen.bloomPrefilterMulti(eligible0s, bloomLedger, cfg.bloomShards)
              defNew.unionByName(exact(maybe))
            } else if (nextSeq == 0) eligible0s // seen is empty on round 0
            else exact(eligible0s)
          Seen.firstOccurrence(notSeen,
            struct(col("parentSeq"), col("emissionIdx")))
        }

      // 3. robots + crawl-delay + politeness budget
      val allowed0 = Politeness.robotsFilter(eligible1, robots,
        broadcastRobots = broadcastRobots)
      // crawl-delay block: hosts inside their delay window carry their
      // candidates to the next round (per-host analogue of the tag defer)
      val (allowed, delayBlocked) =
        if (delayDistributed) {
          hostLedgerDf match {
            case Some(ledger) =>
              // join split on host — the same key the budget-rank window
              // partitions by right after, so the frontier-side exchange
              // is shared, not added
              val blocked = ledger.filter(col("_notBefore") > round)
                .select(col("host"))
              (allowed0.join(blocked, Seq("host"), "left_anti"),
                allowed0.join(blocked, Seq("host"), "left_semi"))
            case None => (allowed0, allowed0.limit(0))
          }
        } else {
          val delayedNow = hostNotBefore.filter(_._2 > round).keys.toSeq
          if (delayedNow.isEmpty) (allowed0, allowed0.limit(0))
          else (allowed0.filter(!col("host").isin(delayedNow: _*)),
            allowed0.filter(col("host").isin(delayedNow: _*)))
        }
      val (underBudget, overBudget) =
        if (budgetUnbounded) (allowed.drop("_hostBudget"), allowed.limit(0))
        else if (cfg.budgetSalts > 1)
          Politeness.budgetRankSalted(allowed, cfg.defaultHostBudget,
            cfg.budgetSalts)
        else Politeness.budgetRank(allowed, cfg.defaultHostBudget)

      // 4. depth bound + seq assignment. Above ~10^6 candidates the
      //    per-parent count table stops being "tiny": switch to the
      //    three-level bucketed prefix sum (and a shuffled offsets join)
      val bounded = underBudget.filter(col("depth") <= cfg.maxDepth)
      val bigRound = frontierCount >= 1000000L
      val seqCaches = scala.collection.mutable.ListBuffer.empty[DataFrame]
      val scheduled = assignSeq(bounded, nextSeq,
        broadcastOffsets = !bigRound,
        rangeBuckets = if (bigRound) cfg.frontierPartitions else 0,
        roundCaches = Some(seqCaches))
      // write WITHOUT the stats read-back: the write is the round's one
      // serial checkpoint (fetch reads it), but hashing what was written
      // needn't block the fetch — the read-back rides the concurrent
      // stage and folds into the manifest at the barrier. LARGE rounds
      // offer the checkpoint to the fetcher instead
      // (CrawlConfig.fusedCheckpointMin): one write in the fetch-join
      // layout replaces the urlHash checkpoint + the fetcher's own
      // bucketed rewrite — a redundant full shuffle+write+read of every
      // heavy round's scheduled table, gone.
      val fused: Option[(DataFrame, Long)] =
        if (cfg.fusedCheckpointMin >= 0 && !cfg.lineageStats &&
            frontierCount >= cfg.fusedCheckpointMin)
          theFetcher.checkpointScheduled(scheduled,
            TableIO.roundPath(workDir, "scheduled", round))
        else None
      // small rounds (memCheckpointMax) materialize the scheduled table
      // as a persist instead of a parquet round table: nothing ever reads
      // the file back (resume needs only frontier/seen/manifests), so the
      // write+commit+read was pure per-round floor (r6, guide §1/§6).
      // (!bigRound: the three-level seq path's range sampling is only
      // replay-stable while its persisted count table lives — never leave
      // a big round's scheduled table re-computable past that)
      val memCk = fused.isEmpty && cfg.memCheckpointMax >= 0 &&
        !cfg.lineageStats && !bigRound && frontierCount < cfg.memCheckpointMax
      val (schedStat0, scheduledBack) = fused match {
        case Some((df, rows)) =>
          (TableIO.TableStat("scheduled", rows, Seq.empty), df)
        case None if memCk =>
          val p = scheduled.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinnedSched = Some(p)
          (TableIO.TableStat("scheduled", inGroup(p.count()), Seq.empty), p)
        case None =>
          val st = TableIO.writeRound(
            scheduled, workDir, "scheduled", round, "urlHash",
            bucketsFor(frontierCount), withStats = false)
          (st, TableIO.readRound(spark, workDir, "scheduled", round))
      }
      val fSchedStats: scala.concurrent.Future[Seq[TableIO.PartStat]] =
        if (!cfg.lineageStats)
          scala.concurrent.Future.successful(Seq.empty)
        else track(scala.concurrent.Future(inGroup(TableIO.bucketStats(
          spark, TableIO.roundPath(workDir, "scheduled", round))))(sinkEc))
      seqCaches.foreach(_.unpersist(blocking = false))
      // mid-round poll #1: abort before paying the fetch
      if (cfg.cancelMidRound && stopSignal()) throw new MidRoundStop
      val scheduledCount = schedStat0.rows
      // zero-scheduled fast path (r6): a round that schedules nothing
      // (delay-blocked hosts, deferred tags, or a fully-deduped tail) has
      // nothing to fetch, trace, record or add to seen — skip the fetch
      // and those sinks outright instead of running them over an empty
      // table (they were ~the whole round floor: q_crawl_delay pays 4 of
      // its 8 rounds fully blocked). Equivalent by construction: an empty
      // write produced a row-less dir and every reader (trace(),
      // records(), readDeltas) unions dirs to zero rows / skips missing
      // dirs. Round 0 is never skipped so each table's base dir + schema
      // exists for RunResult readers and resume.
      val emptyRound = scheduledCount == 0 && round > 0

      // 5. fetch via the pluggable backend (S6/S7; default JoinFetcher =
      //    deterministic join against docs). `fetched` feeds several
      //    downstream actions (trace, records, children, metrics); persist
      //    it so the corpus is scanned exactly ONCE per round.
      val fetchedOpt: Option[DataFrame] =
        if (emptyRound) None
        else {
          val fetchedRaw = theFetcher.fetch(scheduledBack, scheduledCount)
          val f = (if (fetchedRaw.columns.contains("location")) fetchedRaw
            else fetchedRaw.withColumn("location", lit(null).cast("string")))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinned = Some(f)
          Some(f)
        }

      // 6. route through handlers -> children + outcome columns. A 3xx
      //    with followRedirects emits its Location as ONE non-branching
      //    child (depth inherited — a redirect is not a link hop) and
      //    counts as success; the chain advances a hop per round as each
      //    hop is discovered, and step 1.3 short-circuits any chain the
      //    edge ledger already knows.
      val isRedirect = col("status") >= 300 && col("status") <= 399 &&
        col("location").isNotNull
      val nonOkChildren =
        if (!cfg.followRedirects) graft.router.Handler.noChildren
        else when(isRedirect, array(struct(
            col("location").as("url"),
            lit(null).cast("string").as("tag"),
            lit(false).as("branch"),
            lit(0).cast("int").as("emissionIdx"),
            col("priority").cast("int").as("priority"))))
          .otherwise(graft.router.Handler.noChildren)
      val nonOkOutcome = {
        val hold = FlowControl.mk(lit("hold"), lit("owner"), lit(0L))
        if (!cfg.followRedirects) hold
        else when(isRedirect, FlowControl.continueOutcome).otherwise(hold)
      }
      val routedOpt: Option[DataFrame] = fetchedOpt.map(f => router(f)
        .withColumn("children",
          when(col("status") === 200, col("children"))
            .otherwise(nonOkChildren))
        .withColumn("outcome",
          when(col("status") === 200, col("outcome"))
            .otherwise(nonOkOutcome)))

      // 6.5 ONE aggregation pass carries all per-round driver facts —
      // per-tag metrics (full Metric-middleware semantics,
      // metric.rs:126-155: success = Continue|Wait, per route) AND the
      // defer/abort outcome groups that step 8 folds into the ledger
      // (round-4 verdict #1: these were two serial collects; the group
      // keys are tags x outcomes x defer queries, so the collect stays
      // tiny). Launched CONCURRENTLY with the sink writes below — Spark's
      // block manager computes each persisted fetch partition exactly
      // once (in-progress block locks), so racing consumers are safe.
      val fOutcomes = routedOpt match {
        case Some(routed) => track(scala.concurrent.Future(inGroup(
          routed.groupBy(col("tag"),
              col("outcome.outcome").as("o"),
              col("outcome.deferQuery").as("q"))
            .agg(count(lit(1)).as("n"),
              max(coalesce(col("outcome.deferMs"), lit(0L))).as("ms"))
            .collect()))(sinkEc))
        case None => scala.concurrent.Future.successful(
          Array.empty[org.apache.spark.sql.Row])
      }
      // mid-round poll #2: abort before launching the sink stage
      if (cfg.cancelMidRound && stopSignal()) throw new MidRoundStop

      // 7. trace + records sink (S4: typed data sink -> parquet append);
      //    writes launched concurrently with the frontier/seen writes below
      val noWrite = scala.concurrent.Future.successful(
        TableIO.TableStat("", 0L, Seq.empty))
      val fTrace = routedOpt match {
        case Some(routed) =>
          val trace = routed.select(
            col("seq"), col("url"), col("canonical"), col("urlHash"),
            col("host"), col("tag"), col("depth"), col("priority"),
            col("discoveryRound"), col("parentSeq"), col("path"),
            col("status"), col("outcome.outcome").as("outcome"),
            lit(round).as("round"),
            size(filter(col("spans"), s => s("kind") === "link"))
              .as("n_links"))
          track(scala.concurrent.Future(inGroup(
            TableIO.writeRoundLite(trace, workDir, "trace", round, "urlHash",
              bucketsFor(scheduledCount), scheduledCount)))(sinkEc))
        case None => noWrite
      }
      // records rows = this round's 200s (<= scheduled; exact count lands
      // with the outcome aggregate, after this write is already running —
      // scheduledCount is the sizing proxy)
      val fRecords = routedOpt match {
        case Some(routed) =>
          val records = routed.filter(col("status") === 200).select(
            col("canonical").as("url"),
            get(filter(col("spans"), s => s("kind") === "text"), lit(0))
              .getField("text").as("title"),
            size(col("spans")).cast("long").as("contentLength"),
            size(filter(col("spans"), s => s("kind") === "link")).as("nLinks"),
            size(filter(col("spans"), s => s("kind") === "media"))
              .as("nMedia"),
            lit(round).as("scrapedRound"),
            col("urlHash"))
          track(scala.concurrent.Future(inGroup(
            TableIO.writeRoundLite(records, workDir, "records", round,
              "urlHash", bucketsFor(scheduledCount), scheduledCount)))(sinkEc))
        case None => noWrite
      }

      // 9. children -> next-round candidates (F9 depth rules: branch = +1,
      //    inherit tag when child tag is null)
      val childrenOpt = routedOpt.map(routed => routed
        .select(col("seq").as("parentSeq"), col("tag").as("_ptag"),
          col("depth").as("_pdepth"), col("path").as("_ppath"),
          explode_outer(col("children")).as("c"))
        .filter(col("c").isNotNull)
        .select(
          col("c.url").as("url"),
          Canon.canonicalize(col("c.url")).as("canonical"),
          coalesce(col("c.tag"), col("_ptag")).as("tag"),
          (col("_pdepth") +
            when(col("c.branch"), lit(1)).otherwise(lit(0))).as("depth"),
          col("c.priority").as("priority"),
          lit(round + 1).as("discoveryRound"),
          col("parentSeq"),
          col("c.emissionIdx").as("emissionIdx"),
          (if (cfg.trackPath)
            concat(col("_ppath"),
              // LIFO stack pops last-emitted first: sibling order key is
              // -emissionIdx (SURVEY §3.4); FIFO ignores path.
              array((lit(0L) - col("c.emissionIdx")).cast("long")))
          else array().cast("array<long>")).as("path"))
        .filter(col("canonical").isNotNull && col("depth") <= cfg.maxDepth)
        .withColumn("urlHash", Canon.urlHash(col("canonical")))
        .withColumn("host", Canon.host(col("canonical")))
        .select(candCols.map(col).toIndexedSeq: _*))

      // 10. next frontier (rewritten: it mutates) + seen DELTA (append-only
      //     Iceberg-style: only this round's new hashes are written, the
      //     read path unions all round deltas — avoids the O(total) seen
      //     rewrite per round that would make long crawls quadratic).
      //     An empty round carries only the blocked/deferred candidates.
      val carried = overBudget.select(candCols.map(col).toIndexedSeq: _*)
        .unionByName(deferred.select(candCols.map(col).toIndexedSeq: _*))
        .unionByName(delayBlocked.select(candCols.map(col).toIndexedSeq: _*))
      val nextFrontier = childrenOpt match {
        case Some(children) => children.unionByName(carried)
        case None => carried
      }
      val newSeen = scheduledBack.select(
        col("urlHash"), col("canonical"),
        col("seq").as("firstSeq"), lit(round).as("round"))

      // children typically outnumber scheduled by the mean out-degree;
      // cheap proxy (exact count not yet known): scheduled x 8
      val fFront = track(scala.concurrent.Future(inGroup(
        TableIO.writeRound(nextFrontier, workDir, "frontier",
          round, "urlHash", bucketsFor(scheduledCount * 8),
          cfg.lineageStats)))(sinkEc))
      val fSeen =
        if (emptyRound)
          scala.concurrent.Future.successful(
            TableIO.TableStat("seen", 0L, Seq.empty))
        else track(scala.concurrent.Future(inGroup(
          TableIO.writeRound(newSeen, workDir, "seen", round,
            "urlHash", bucketsFor(scheduledCount), cfg.lineageStats)))(sinkEc))

      // Everything that used to run serially AFTER the sink awaits rides
      // the same concurrent stage (round-4 verdict #1 — these serial
      // actions were ~40% of the 8-core wall at 10M docs): the
      // seen-mirror append and the compaction+bloom-merge chain behind
      // the seen delta's durability; the bloom delta and the crawl-delay
      // ledger need only the (already durable) scheduled table. The
      // driver folds every result after ONE barrier below.
      val compactNow = cfg.compactSeenEvery > 0 && round > 0 &&
        (round + 1) % cfg.compactSeenEvery == 0
      val bloomOn = cfg.dedup && cfg.useBloomPrefilter
      type FilterBc = org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]]

      // bucketed seen-mirror maintenance (after the dir delta is durable):
      // append this round's hashes, or bulk-load the mirror the first time
      // the crawl crosses the threshold (also heals a lost warehouse)
      val mirrorOn = cfg.dedup && cfg.bucketedSeenMin >= 0 &&
        nextSeq + scheduledCount >= cfg.bucketedSeenMin
      val fMirror: scala.concurrent.Future[Option[graft.dedup.BucketedSeenStore]] =
        if (!mirrorOn) scala.concurrent.Future.successful(None)
        else track(fSeen.map { _ =>
          inGroup(seenStore match {
            case Some(st) =>
              if (scheduledCount > 0) st.append(newSeen)
              None
            case None =>
              val st = new graft.dedup.BucketedSeenStore(spark,
                graft.dedup.BucketedSeenStore.tableFor(workDir),
                cfg.frontierPartitions)
              // raw deltas, NOT readDeltas: this branch runs concurrently
              // with fBloom's compactDeltas when the threshold round is
              // also a compaction round, and snapshot selection could see
              // a partially-written snapshot (ADVICE r05 medium). The raw
              // delta family is append-only and already durable (fSeen).
              st.bulkLoad(
                TableIO.readDeltasRaw(spark, workDir, "seen", round))
              Some(st)
          })
        }(sinkEc))

      // periodic seen compaction (Iceberg-style snapshot, bounds the
      // delta-union fan-in) + bloom maintenance. Compact rounds rebuild
      // ONE filter sized to the full seen set from the fresh snapshot;
      // plain rounds aggregate a delta-sized family member from only
      // this round's new hashes.
      val fBloom: scala.concurrent.Future[Option[FilterBc]] =
        if (compactNow) track(fSeen.map { _ =>
          inGroup {
            TableIO.compactDeltas(spark, workDir, "seen", round, "urlHash",
              bucketsFor(nextSeq + scheduledCount))
            if (!bloomOn) None
            else {
              val totalSeen = nextSeq + scheduledCount
              Some(bcast(buildSeenFilter(
                TableIO.readDeltas(spark, workDir, "seen", round),
                math.max(totalSeen / cfg.bloomShards, 1000L))))
            }
          }
        }(sinkEc))
        else if (bloomOn && scheduledCount > 0)
          track(scala.concurrent.Future(inGroup(Some(bcast(buildSeenFilter(
            newSeen,
            math.max(scheduledCount / cfg.bloomShards, 1000L))))))(sinkEc))
        else scala.concurrent.Future.successful(None)

      // crawl-delay ledger update: every delay-host scheduled this round
      // gets notBefore = max(existing, now) + d (runner.rs:289-306). A
      // scheduled host was necessarily eligible (existing <= round), so
      // max(existing, round) == round on both paths. Distributed mode
      // checkpoints the merged (host, notBefore) table; broadcast mode
      // collects the delay hosts hit. Driver-state mutations fold after
      // the barrier.
      val fLedger: scala.concurrent.Future[Boolean] =
        if (delayDistributed && scheduledCount > 0)
          track(scala.concurrent.Future(inGroup {
            val updates = scheduledBack
              .join(delaysDf.get, Seq("host"))
              .groupBy(col("host"))
              .agg((lit(round.toLong) + max(col("_dRounds"))).as("_notBefore"))
            val merged = hostLedgerDf match {
              case Some(old) =>
                old.join(updates.select(col("host")), Seq("host"), "left_anti")
                  .unionByName(updates)
              case None => updates
            }
            // prune entries that can never block again (notBefore <= next
            // round): the ledger stays O(currently-delayed hosts), not
            // O(all hosts ever scheduled)
            val pruned = merged.filter(col("_notBefore") > round + 1)
              .withColumn("_hostHash", xxhash64(col("host")))
            TableIO.writeRound(pruned, workDir, "hostledger", round,
              "_hostHash", bucketsFor(delayHostCount), withStats = false)
            true
          })(sinkEc))
        else scala.concurrent.Future.successful(false)
      val fHostsHit: scala.concurrent.Future[Array[String]] =
        if (!delayDistributed && delayRounds.nonEmpty && scheduledCount > 0)
          track(scala.concurrent.Future(inGroup(scheduledBack
            .filter(col("host").isin(delayRounds.keys.toSeq: _*))
            .select(col("host")).distinct().collect()
            .map(_.getString(0))))(sinkEc))
        else scala.concurrent.Future.successful(Array.empty[String])
      // redirect-edge delta (followRedirects): this round's discovered
      // (src -> dst) hops, durably checkpointed like seen; rows>0 marks
      // the resolved map dirty for the next round start
      val fRedir: scala.concurrent.Future[Long] =
        if (cfg.followRedirects && scheduledCount > 0)
          track(scala.concurrent.Future(inGroup {
            val edges = routedOpt.get.filter(isRedirect)
              .select(col("canonical").as("src"),
                Canon.canonicalize(col("location")).as("dst"))
              .filter(col("dst").isNotNull)
              .withColumn("_srcHash", xxhash64(col("src")))
            TableIO.writeRound(edges, workDir, "redirects", round,
              "_srcHash", bucketsFor(scheduledCount),
              withStats = false).rows
          })(sinkEc))
        else scala.concurrent.Future.successful(0L)

      // ---- the round's ONE barrier ----
      import scala.concurrent.duration.Duration
      val frontStat = scala.concurrent.Await.result(fFront, Duration.Inf)
      val seenStat = scala.concurrent.Await.result(fSeen, Duration.Inf)
      scala.concurrent.Await.result(fTrace, Duration.Inf)
      scala.concurrent.Await.result(fRecords, Duration.Inf)
      val outcomeRows = scala.concurrent.Await.result(fOutcomes, Duration.Inf)
      scala.concurrent.Await.result(fMirror, Duration.Inf)
        .foreach(st => seenStore = Some(st))
      scala.concurrent.Await.result(fBloom, Duration.Inf).foreach { built =>
        if (compactNow) {
          // probe cost returns to O(1) per candidate; the superseded
          // broadcasts are destroyed (their executor cache entries age
          // out via the weak-keyed Filters cache)
          val old = bloomLedger
          bloomLedger = Vector(built)
          old.foreach(_.destroy())
        } else bloomLedger :+= built
      }
      if (scala.concurrent.Await.result(fLedger, Duration.Inf)) {
        hostLedgerDf = Some(
          TableIO.readRound(spark, workDir, "hostledger", round)
            .select(col("host"), col("_notBefore")))
        staleLedgerRounds = lastHostLedgerRound.toList ::: staleLedgerRounds
        lastHostLedgerRound = Some(round)
      }
      scala.concurrent.Await.result(fHostsHit, Duration.Inf).foreach { h =>
        val base = math.max(hostNotBefore.getOrElse(h, round), round)
        hostNotBefore += h -> (base + delayRounds(h))
      }
      if (cfg.followRedirects && scheduledCount > 0) {
        redirectDeltasThrough = round
        if (scala.concurrent.Await.result(fRedir, Duration.Inf) > 0L)
          redirectsDirty = true
      }

      // driver fold of the outcome aggregate — columns: tag, o(utcome),
      // q(uery), n, ms, ok
      def tagOf(r: org.apache.spark.sql.Row): String =
        if (r.isNullAt(0)) null else r.getString(0)
      val byTag = outcomeRows.groupBy(r => Option(tagOf(r)).getOrElse(""))
        .map { case (t, rs) =>
          val (s, f) = rs.foldLeft((0L, 0L)) { case ((s0, f0), r) =>
            if (FlowControl.successOutcomes(r.getString(1)))
              (s0 + r.getLong(3), f0) else (s0, f0 + r.getLong(3))
          }
          t -> (s, f)
        }
      val succ = byTag.valuesIterator.map(_._1).sum
      val fail = byTag.valuesIterator.map(_._2).sum

      // 8. defer ledger update from outcomes (apply_defer semantics:
      //    notBefore[key] = max(existing, now) + d, in round units).
      //    Engine mode also honors Fail as a per-tag kill switch
      //    (reference apply_abort is a documented no-op, runner.rs:308-323)
      if (cfg.enforceDefer || cfg.enforceAbort) {
        outcomeRows
          .filter(r => r.getLong(4) > 0 || r.getString(1) == "fail")
          .foreach { r =>
            val tag = tagOf(r)
            val isFail = r.getString(1) == "fail"
            val q = r.getString(2)
            val dRounds = math.max(1,
              math.ceil(r.getLong(4).toDouble / cfg.msPerRound).toInt)
            // TagQuery resolution (flow_control.rs:36-53, is_match :55-65):
            // Owner / Single / Every / List — a list query expands to one
            // ledger key per member (F10; "list:a,b" encoding, SURVEY §1.1)
            val keys: Seq[String] = q match {
              case "every" => Seq("__every__")
              case s if s != null && s.startsWith("single:") =>
                Seq(s.stripPrefix("single:"))
              case s if s != null && s.startsWith("list:") =>
                s.stripPrefix("list:").split(",").toSeq.filter(_.nonEmpty)
              case _ => // owner; null tag (Fallback) never matches: skip
                if (tag != null) Seq(tag) else Seq.empty
            }
            keys.foreach { key =>
              if (isFail && cfg.enforceAbort)
                deferLedger += key -> Int.MaxValue // permanent kill
              else if (!isFail && cfg.enforceDefer) {
                val base = math.max(deferLedger.getOrElse(key, round), round)
                deferLedger += key -> (base + dRounds)
              }
            }
          }
      }

      // 11. manifest commit (includes both politeness ledgers: resume must
      //     not resurrect killed tags or forget pending defers/delays)
      val schedStat = schedStat0.copy(
        parts = scala.concurrent.Await.result(fSchedStats, Duration.Inf))
      val m = RoundMetrics(round, frontierCount, scheduledCount,
        frontStat.rows, seenStat.rows,
        succ, fail, (System.nanoTime() - t0) / 1000000L)
      TableIO.writeManifest(workDir, round,
        TableIO.manifestJson(round, Seq(schedStat, frontStat, seenStat), m,
          completed = true, deferLedger, hostNotBefore, byTag,
          hostLedgerRound = lastHostLedgerRound))
      metrics :+= m
      // the round is durable from here: leave the cancellable job group so
      // a stop signal racing the (trivial) advance steps below cannot
      // cancel them — a cancel here would claim a COMMITTED round aborted.
      // Next iteration re-enters the group via inGroup(()).
      spark.sparkContext.clearJobGroup()
      // rotate superseded hostledger snapshots now that this round's
      // manifest (which references the newest one) is committed
      staleLedgerRounds.foreach(
        TableIO.deleteTableRound(workDir, "hostledger", _))
      staleLedgerRounds = Nil

      // 12. advance (read back from checkpoint: plan restarts at scan)
      pinned.foreach(_.unpersist(blocking = false))
      pinned = None
      pinnedSched.foreach(_.unpersist(blocking = false))
      pinnedSched = None
      theFetcher.endRound()
      frontier = TableIO.readRound(spark, workDir, "frontier", round)
      seen = TableIO.readDeltas(spark, workDir, "seen", round)
      nextSeq += scheduledCount
      frontierCount = frontStat.rows
      round += 1
    } catch {
      // mid-round abort: our own poll (MidRoundStop) or a Spark job the
      // watcher cancelled. Anything that fails while the stop signal is
      // NOT set is a real error and propagates.
      case _: Throwable if cfg.cancelMidRound && stopSignal() =>
        // drain the concurrent stage FIRST: a straggler sink job must not
        // race the round-dir delete below (or the resumed crawl's
        // overwrite). The watcher is still live and keeps cancelling the
        // job group, so these awaits terminate promptly; failures
        // (cancelled jobs) are expected and ignored.
        inflight.foreach { f =>
          scala.util.Try(scala.concurrent.Await.ready(f,
            scala.concurrent.duration.Duration(60, "s")))
        }
        pinned.foreach(_.unpersist(blocking = false))
        pinned = None
        pinnedSched.foreach(_.unpersist(blocking = false))
        pinnedSched = None
        theFetcher.endRound()
        // belt-and-braces: never delete a committed round (the clearJobGroup
        // above makes a committed-round cancel unreachable, but a custom
        // fetcher/stop racing in its own jobs could still land here)
        if (TableIO.latestCompletedRound(workDir) < round)
          TableIO.deleteRoundDirs(workDir, round)
        stopped = true
    }
    } finally {
      // kill the watcher even when a non-stop error propagates — it must
      // never outlive this run and cancel a later crawl's jobs
      watcherLive = false
    }

    spark.sparkContext.clearJobGroup()
    redirectMap.foreach(_.unpersist(blocking = false))
    seedFrontierPinned.foreach(_.unpersist(blocking = false))
    if (fetcher.isEmpty) theFetcher.close()
    RunResult(round, nextSeq, metrics, workDir, stoppedMidRound = stopped)
  }

  /** Entry point 2 (reference Client::run_once, process/client.rs:132-134):
    * process a single request for one round; discovered children are left
    * queued in the frontier checkpoint, unprocessed.
    */
  def runOnce(
      spark: SparkSession,
      docs: DataFrame,
      url: String,
      tag: String,
      robots: Dataset[RobotsRule],
      router: Router,
      cfg: CrawlConfig,
      workDir: String
  ): RunResult =
    run(spark, docs, Seq(Seed(url, tag, 0)), robots, router,
      cfg.copy(maxRounds = 1), workDir)

  /** Resume after the latest completed round's manifest (north rule:
    * any round is resumable from checkpoint).
    */
  def resume(
      spark: SparkSession,
      docs: DataFrame,
      seeds: Seq[Seed],
      robots: Dataset[RobotsRule],
      router: Router,
      cfg: CrawlConfig,
      workDir: String
  ): RunResult = {
    val last = TableIO.latestCompletedRound(workDir)
    if (last < 0) return run(spark, docs, seeds, robots, router, cfg, workDir)
    val frontier = TableIO.readRound(spark, workDir, "frontier", last)
    val seen = TableIO.readDeltas(spark, workDir, "seen", last)
    val nextSeq = seen.count()
    val (deferLedger, hostNotBefore) = TableIO.readLedgers(workDir, last)
    // distributed-ledger mode: the manifest points at the checkpointed
    // (host, notBefore) table instead of carrying an inline map
    val ledgerRound = TableIO.readHostLedgerRound(workDir, last)
    val hostLedger = ledgerRound.map(r =>
      TableIO.readRound(spark, workDir, "hostledger", r)
        .select(col("host"), col("_notBefore")))
    run(spark, docs, seeds, robots, router, cfg, workDir,
      startRound = last + 1,
      resumeState =
        Some(ResumeState(frontier, seen, nextSeq, deferLedger, hostNotBefore,
          hostLedger, ledgerRound)))
  }
}
