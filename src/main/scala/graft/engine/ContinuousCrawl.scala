package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.Canon
import graft.model.{CrawlConfig, RobotsRule, Seed}
import graft.router.Router

/** The continuous-crawl tier, end to end: crawl epoch 0 from seeds, then
  * for every later epoch derive a REVISIT frontier from the accumulated
  * visit history (Cho & Garcia-Molina change-rate estimator,
  * [[Recrawl.changeStats]] -> [[Recrawl.scheduleRevisits]]) and crawl
  * again — carrying the discovered redirect-edge ledger forward so known
  * chains cost zero fetches in later epochs. The reference's scheduler is
  * one-shot (crates/spire-core/src/process/runner.rs:103-177 drains the
  * queue once and stops); this is the loop a production crawler wraps
  * around it.
  *
  * Scale shape: nothing epoch-scoped passes through the driver. The
  * revisit frontier is a DataFrame fed to [[CrawlEngine.run]] via
  * `seedFrontier` (a 10^9-row revisit set never collects); its
  * deterministic seq contract is kept WITHOUT a global sort by keying
  * each revisit row as its own parent group (parentSeq = urlHash — the
  * three-level prefix sum then orders rows by urlHash, a total
  * deterministic order with no skewed window), while the REVISIT order
  * that actually matters — who wins a host's politeness budget — rides
  * the existing priority column (priority = revisit_rank, and
  * [[graft.politeness.Politeness.budgetRank]] orders ascending).
  */
object ContinuousCrawl {

  def epochDir(workDir: String, epoch: Int): String = s"$workDir/epoch=$epoch"

  /** Revisit frontier (candCols shape) from a revisit schedule.
    *
    * @param revisits [[Recrawl.scheduleRevisits]] output
    *                 (url, host, revisit_rank, ...)
    * @param tags     optional (canonical, tag) lookup — the route each URL
    *                 was last fetched under (see [[latestTags]]); absent
    *                 or unmatched URLs seed with the fallback route
    */
  def revisitFrontier(revisits: DataFrame, tags: Option[DataFrame]): DataFrame = {
    val tagged = tags match {
      case Some(t) =>
        revisits.join(
          t.select(col("canonical").as("_tc"), col("tag").as("_tag")),
          revisits("url") === col("_tc"), "left")
      case None => revisits.withColumn("_tag", lit(null).cast("string"))
    }
    tagged.select(
      col("url"),
      Canon.canonicalize(col("url")).as("canonical"),
      col("_tag").as("tag"),
      lit(1).as("depth"),
      col("revisit_rank").cast("int").as("priority"),
      lit(0).as("discoveryRound"),
      xxhash64(col("url")).as("parentSeq"),
      lit(0).as("emissionIdx"),
      array(xxhash64(col("url"))).as("path"))
      .filter(col("canonical").isNotNull)
      .withColumn("urlHash", Canon.urlHash(col("canonical")))
      .withColumn("host", Canon.host(col("canonical")))
      .select(CrawlEngine.candCols.map(col): _*)
  }

  /** (canonical, tag) of each URL's LATEST successful fetch across the
    * given epoch results — so a revisit is routed through the same
    * handler that produced it. Deterministic: max_by over the unique
    * (epoch, seq) visit key.
    */
  def latestTags(spark: SparkSession,
      results: Seq[CrawlEngine.RunResult]): Option[DataFrame] =
    if (results.isEmpty) None
    else Some(results.zipWithIndex.map { case (r, k) =>
      r.trace(spark).filter(col("status") === 200)
        .select(col("canonical"), col("tag"),
          struct(lit(k).as("e"), col("seq").as("s")).as("_vk"))
    }.reduce(_.unionByName(_))
      .groupBy(col("canonical"))
      .agg(expr("max_by(tag, _vk)").as("tag")))

  /** Run `epochs` crawl epochs under `workDir/epoch=<k>`.
    *
    * @param docsForEpoch corpus for epoch k — the live web changes
    *                     between epochs; pass a constant function for a
    *                     static corpus
    * @param revisitPerHost per-host revisit budget for epochs >= 1
    * @param revisitSalts   >1 uses the salted two-phase top-k (hot hosts)
    * @param includeSeedsEachEpoch re-inject the original seeds every
    *                     epoch (discover NEW pages, not just refresh) —
    *                     off: epochs >= 1 are pure revisit
    */
  def runEpochs(
      spark: SparkSession,
      docsForEpoch: Int => DataFrame,
      seeds: Seq[Seed],
      robots: Dataset[RobotsRule],
      router: Router,
      cfg: CrawlConfig,
      workDir: String,
      epochs: Int,
      revisitPerHost: Int,
      revisitSalts: Int = 0,
      includeSeedsEachEpoch: Boolean = false,
      /** config override for epochs >= 1 (e.g. maxRounds = 1 for a pure
        * refresh pass vs the discovery epoch's full depth) */
      revisitCfg: Option[CrawlConfig] = None
  ): Seq[CrawlEngine.RunResult] = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val results = scala.collection.mutable.ArrayBuffer.empty[CrawlEngine.RunResult]
    for (e <- 0 until epochs) {
      val dir = epochDir(workDir, e)
      val r =
        if (e == 0)
          CrawlEngine.run(spark, docsForEpoch(0), seeds, robots, router,
            cfg, dir)
        else {
          val hist = Recrawl.historyFromRecords(
            (0 until e).map(k => (results(k).records(spark), k.toLong)))
          val stats = Recrawl.changeStats(hist, e.toLong)
          val revisits =
            if (revisitSalts > 1)
              Recrawl.scheduleRevisitsSalted(stats, revisitPerHost,
                revisitSalts)
            else Recrawl.scheduleRevisits(stats, revisitPerHost)
          val front0 = revisitFrontier(revisits,
            latestTags(spark, results.toSeq))
          val front =
            if (!includeSeedsEachEpoch || seeds.isEmpty) front0
            else CrawlEngine.seedCandidates(spark, seeds, cfg.lifo)
              // seeds already revisiting this epoch keep the revisit row
              .join(front0.select(col("urlHash").as("_rh")),
                col("urlHash") === col("_rh"), "left_anti")
              .drop("_rh")
              .unionByName(front0)
          // warm-start the redirect ledger from every prior epoch: known
          // chains rewrite to final targets from round 0
          val priorEdges =
            if (!cfg.followRedirects) None
            else results.toSeq.flatMap(_.redirectEdges(spark))
              .reduceOption(_.unionByName(_))
          CrawlEngine.run(spark, docsForEpoch(e), Seq.empty, robots,
            router, revisitCfg.getOrElse(cfg), dir,
            seedFrontier = Some(front), initialRedirects = priorEdges)
        }
      results += r
    }
    results.toSeq
  }
}
