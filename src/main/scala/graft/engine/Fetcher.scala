package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable fetch backend (reference: any `tower::Service<Request,
  * Response>` can back the client — spire-rs/spire
  * crates/spire-reqwest/src/client/backend.rs:97-132). A Fetcher turns
  * the round's scheduled frontier rows into fetched rows carrying
  * `status` and `spans`.
  */
trait Fetcher extends Serializable {
  /** @param scheduled checkpointed scheduled rows for this round
    * @param scheduledCount its known row count (from the round manifest)
    * @return scheduled columns + (status: int, spans: array<span>)
    */
  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame

  /** Fuse the round's scheduled CHECKPOINT with the fetch-side layout:
    * durably write `scheduled` under `path` in exactly the layout
    * [[fetch]] joins zero-Exchange against, and return the read-back
    * plus its exact row count. The engine offers this for large rounds
    * (CrawlConfig.fusedCheckpointMin) so the scheduled table is
    * shuffled+written ONCE instead of twice (engine checkpoint by
    * urlHash, then the fetcher's own bucketed rewrite — measured as a
    * full redundant shuffle+write+read of every heavy round's frontier
    * slice). None (the default) keeps the engine's TableIO checkpoint.
    */
  def checkpointScheduled(scheduled: DataFrame,
      path: String): Option[(DataFrame, Long)] = None

  /** Called by the engine at end-of-round; release per-round resources. */
  def endRound(): Unit = {}

  /** Called by the engine after the crawl loop; release run-scoped
    * resources (e.g. [[AutoBucketJoinFetcher]]'s one-time corpus copy).
    */
  def close(): Unit = {}

  protected val emptySpansT =
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
}

/** 3xx support shared by the corpus-join fetchers: a corpus row whose
  * optional `redirect_to` column is non-null models an HTTP redirect —
  * the fetch surfaces it as `status` [[Fetchers.StatusRedirect]] with the
  * target in a `location` column (and no spans), exactly the shape a
  * live HTTP backend would produce. Corpora without the column fetch as
  * before with `location` null everywhere, so downstream schemas are
  * uniform.
  */
object Fetchers {
  val StatusRedirect = 301
  val RedirectCol = "redirect_to"

  def hasRedirects(docs: DataFrame): Boolean =
    docs.columns.contains(RedirectCol)

  /** Status / spans / location columns for a corpus-join result whose
    * corpus side kept `_doc_id` (null = miss). Shared by the broadcast
    * and shuffled paths so 3xx semantics cannot drift between them.
    */
  private[engine] def statusAndLocation(joined: DataFrame,
      spansT: String): DataFrame = {
    val withStatus =
      if (joined.columns.contains(RedirectCol))
        joined.withColumn("status",
          when(col("_doc_id").isNull, lit(404))
            .when(col(RedirectCol).isNotNull, lit(StatusRedirect))
            .otherwise(lit(200)))
          .withColumn("location",
            when(col("status") === StatusRedirect, col(RedirectCol)))
          .drop(RedirectCol)
      else
        joined.withColumn("status",
          when(col("_doc_id").isNull, lit(404)).otherwise(lit(200)))
          .withColumn("location", lit(null).cast("string"))
    withStatus
      .withColumn("spans",
        when(col("status") === 200, col("spans"))
          .otherwise(lit(null).cast(spansT)))
      .drop("_doc_id")
  }
}

/** Engine-default fetch selection (round-2 verdict #1: the default fetch
  * path must never re-shuffle the corpus on large rounds).
  */
object Fetcher {

  /** Pick the scale-safe default for `docs`:
    *  - `docs` IS a catalog table bucketed on doc_id (the 100 TB layout) ->
    *    [[BucketedJoinFetcher]]: large rounds are zero-Exchange co-located
    *    SortMergeJoins, the corpus is never shuffled.
    *  - anything else -> [[AutoBucketJoinFetcher]]: broadcast path under
    *    the ceiling; the FIRST large round pays a one-time bucketed corpus
    *    copy, then joins co-located forever — one full write beats
    *    re-shuffling 100 TB on every large round.
    */
  def auto(docs: DataFrame, broadcastMax: Long = 500000L,
      autoBuckets: Int = 64): Fetcher =
    bucketedTableOf(docs) match {
      case Some((table, n)) => new BucketedJoinFetcher(table, n, broadcastMax)
      case None => new AutoBucketJoinFetcher(docs, autoBuckets, broadcastMax)
    }

  /** (table name, bucket count) when `docs` is exactly a scan of a catalog
    * table bucketed on doc_id (aliases stripped; any other plan on top —
    * filters, projections — would not be bucket-layout-preserving in
    * general, so detection stays conservative).
    */
  def bucketedTableOf(docs: DataFrame): Option[(String, Int)] =
    bucketedTableOn(docs, "doc_id")

  /** Generalized form: table scan bucketed on exactly `bucketCol`. */
  def bucketedTableOn(df: DataFrame, bucketCol: String): Option[(String, Int)] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    @scala.annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => strip(s.child)
      case o => o
    }
    strip(df.queryExecution.analyzed) match {
      case l: LogicalRelation =>
        for {
          ct <- l.catalogTable
          bs <- ct.bucketSpec
          if bs.bucketColumnNames == Seq(bucketCol)
        } yield (ct.identifier.unquotedString, bs.numBuckets)
      case _ => None
    }
  }
}

/** Deterministic corpus fetch = join against the docs table on the
  * canonical URL (S6 — the reference's reqwest backend drops bodies in
  * both directions anyway: utils/conversion.rs:9-10,36-37; our corpus IS
  * the response). docs is the 100TB side: scanned once, never shuffled.
  * A plain left-outer join cannot broadcast its preserved (scheduled)
  * side, so under the threshold it decomposes to
  *   hits   = docs ⋈ broadcast(scheduled)   (inner, build = scheduled)
  *   misses = scheduled ⟕̸ hits              (small ⋈ small)
  */
class JoinFetcher(docs: DataFrame, broadcastMax: Long = 500000L)
    extends Fetcher {
  private val roundCaches =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  override def endRound(): Unit = {
    roundCaches.foreach(_.unpersist(blocking = false))
    roundCaches.clear()
  }

  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame =
    if (scheduledCount > 0 && scheduledCount < broadcastMax) {
      val hits = Fetchers.statusAndLocation(
        docs.withColumnRenamed("doc_id", "_doc_id")
          .join(broadcast(scheduled),
            col("canonical") === col("_doc_id"), "inner"),
        emptySpansT)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      roundCaches += hits
      val misses = scheduled
        .join(hits.select(col("urlHash").as("_hit")),
          col("urlHash") === col("_hit"), "left_anti")
        .withColumn("status", lit(404))
        .withColumn("spans", lit(null).cast(emptySpansT))
        .withColumn("location", lit(null).cast("string"))
      hits.unionByName(misses.select(hits.columns.map(col).toIndexedSeq: _*))
    } else {
      // large round: shuffled join. SHUFFLE_HASH avoids sorting the big
      // docs side (scheduled is the build side per partition).
      Fetchers.statusAndLocation(
        scheduled.hint("SHUFFLE_HASH")
          .join(docs.withColumnRenamed("doc_id", "_doc_id"),
            col("canonical") === col("_doc_id"), "left"),
        emptySpansT)
    }
}

/** Co-located fetch join over a BUCKETED corpus table (the 100 TB plan
  * shape): `docsTable` is CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO n
  * buckets; large rounds write the scheduled side bucketed the same way
  * on `canonical` (one small-side shuffle — which the engine pays anyway
  * to checkpoint the round) and the join plans as a SortMergeJoin with
  * ZERO exchanges: the corpus is never shuffled, ever. This is the
  * Iceberg bucket-transform layout the north rule's table design implies;
  * [[JoinFetcher]]'s SHUFFLE_HASH fallback re-shuffles the whole corpus
  * every large round — fine at 10^7 docs, fatal at 10^10.
  *
  * Below the broadcast ceiling the plain broadcast-inner decomposition is
  * used unchanged (the corpus side is a scan either way).
  */
class BucketedJoinFetcher(
    docsTable: String,
    buckets: Int,
    broadcastMax: Long = 500000L,
    schedTable: String = "graft_sched_round"
) extends Fetcher {
  // driver round loop is single-threaded: one delegate per round
  private var small: JoinFetcher = null
  // per-round table (unique name): overwriting one shared table would be
  // read-from-target in the same round and a lineage hazard across rounds
  private var liveTable: Option[(org.apache.spark.sql.SparkSession, String)] = None
  private var roundN = 0

  override def endRound(): Unit = {
    if (small != null) { small.endRound(); small = null }
    // the round's outputs are durably checkpointed before endRound(), so
    // nothing reads this round's scheduled table again. (A fused
    // checkpoint is an EXTERNAL table: the drop releases the catalog
    // entry, the round dir's files stay durable.)
    liveTable.foreach { case (s, t) => s.sql(s"DROP TABLE IF EXISTS $t") }
    liveTable = None
  }

  /** The fused round checkpoint (see [[Fetcher.checkpointScheduled]]):
    * ONE shuffle+write puts the scheduled table durably at `path` in the
    * exact bucketed-on-canonical layout the large-round join needs —
    * [[fetch]] then detects the layout and joins with zero Exchanges on
    * either side, instead of re-bucketing what the engine just wrote.
    */
  override def checkpointScheduled(scheduled: DataFrame,
      path: String): Option[(DataFrame, Long)] = {
    val spark = scheduled.sparkSession
    roundN += 1
    val t = s"${schedTable}_ckpt_$roundN"
    val obs = org.apache.spark.sql.Observation()
    scheduled.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").options(TableIO.writeOpts).option("path", path)
      .bucketBy(buckets, "canonical").sortBy("canonical")
      .format("parquet").saveAsTable(t)
    liveTable = Some((spark, t))
    Some((spark.table(t), obs.get("rows").asInstanceOf[Long]))
  }

  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame = {
    val spark = scheduled.sparkSession
    val docs = spark.table(docsTable)
    // a scheduled side ALREADY in the join layout (fused checkpoint)
    // joins co-located with ZERO exchanges on either side — always
    // cheaper than the broadcast decomposition, which pays a build+ship
    // of the whole scheduled set, a misses anti-join and an extra
    // persist while scanning the corpus side just the same (r6,
    // measured: bench rounds 4-5 were broadcasting 359k/427k rows
    // below broadcastMax despite the fused layout).
    val fusedLayout = Fetcher.bucketedTableOn(scheduled, "canonical")
      .exists(_._2 == buckets)
    if (!fusedLayout && scheduledCount > 0 && scheduledCount < broadcastMax) {
      small = new JoinFetcher(docs, broadcastMax)
      small.fetch(scheduled, scheduledCount)
    } else {
      val sched =
        if (fusedLayout) scheduled
        else {
          roundN += 1
          val t = s"${schedTable}_$roundN"
          scheduled.write.mode("overwrite").options(TableIO.writeOpts)
            .bucketBy(buckets, "canonical").sortBy("canonical")
            .format("parquet").saveAsTable(t)
          liveTable = Some((spark, t))
          spark.table(t)
        }
      Fetchers.statusAndLocation(
        sched.join(docs.withColumnRenamed("doc_id", "_doc_id"),
          col("canonical") === col("_doc_id"), "left"),
        emptySpansT)
    }
  }
}

/** [[JoinFetcher]] semantics with a scale-safe large-round path for a
  * NON-table corpus DataFrame: the first round over `broadcastMax` writes
  * `docs` ONCE as a bucketed table (CLUSTERED BY doc_id), then delegates to
  * [[BucketedJoinFetcher]] — every subsequent large round is a co-located
  * zero-Exchange join. One full corpus write amortizes against the
  * per-round corpus re-shuffle the old SHUFFLE_HASH fallback paid
  * (round-2 verdict: "fine at 10^7 docs, fatal at 10^10").
  * [[close]] drops the copy (a resumed crawl rebuilds it on its first
  * large round — the copy is a cache, not state).
  */
class AutoBucketJoinFetcher(
    docs: DataFrame,
    buckets: Int,
    broadcastMax: Long = 500000L
) extends Fetcher {
  private var small: JoinFetcher = null
  private var bucketed: BucketedJoinFetcher = null
  private val tableName =
    s"graft_docs_auto_${java.util.UUID.randomUUID().toString.replace("-", "_")}"

  override def endRound(): Unit = {
    if (small != null) { small.endRound(); small = null }
    if (bucketed != null) bucketed.endRound()
  }

  override def close(): Unit = {
    if (bucketed != null) {
      bucketed.close()
      docs.sparkSession.sql(s"DROP TABLE IF EXISTS $tableName")
      bucketed = null
    }
  }

  private def ensureBucketed(): BucketedJoinFetcher = {
    if (bucketed == null) {
      docs.write.mode("overwrite").options(TableIO.writeOpts)
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .format("parquet").saveAsTable(tableName)
      bucketed = new BucketedJoinFetcher(tableName, buckets, broadcastMax,
        schedTable = s"${tableName}_sched")
    }
    bucketed
  }

  /** Fused checkpoint for large rounds (the engine offers it before the
    * fetch): also the trigger for the one-time bucketed corpus copy, so
    * the first large round fuses too.
    */
  override def checkpointScheduled(scheduled: DataFrame,
      path: String): Option[(DataFrame, Long)] =
    ensureBucketed().checkpointScheduled(scheduled, path)

  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame =
    if (scheduledCount > 0 && scheduledCount < broadcastMax) {
      small = new JoinFetcher(docs, broadcastMax)
      small.fetch(scheduled, scheduledCount)
    } else ensureBucketed().fetch(scheduled, scheduledCount)
}

/** Test double (reference Noop backend,
  * crates/spire-core/src/backend/utils/debug.rs:59-156): every request
  * resolves to an empty response with a fixed status.
  */
class NoopFetcher(succeed: Boolean = true) extends Fetcher {
  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame =
    scheduled
      .withColumn("status", lit(if (succeed) 200 else 404))
      .withColumn("spans",
        array().cast(emptySpansT))
      .withColumn("location", lit(null).cast("string"))
}
