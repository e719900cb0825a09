package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exchange-free exact URL-seen tier for large crawls: the seen set
  * mirrored as a bucketed catalog table (CLUSTERED BY urlHash), appended
  * per round, probed with a co-partitioned join.
  *
  * Why: the plain anti-join `candidates ⟕̸ seen` broadcasts the seen side
  * only while it is small; past that, Spark shuffles BOTH sides — at
  * 10^10 seen URLs that re-shuffles ~100 GB of hashes EVERY round, the
  * same quadratic-over-the-crawl pattern the bucketed fetch join removed
  * for the corpus (round-2 verdict #1). With the mirror, the seen side
  * is scanned pre-partitioned (zero Exchange on the 10^10 side); only
  * the bloom-surviving candidate slice — small by construction — is
  * shuffled to match.
  *
  * Correctness under aborts needs no reconciliation machinery, because
  * the engine's crawl is DETERMINISTIC and the store is used for
  * EXISTENCE only: a mid-round abort may leave rows appended for a round
  * whose manifest never committed, but the resumed replay of that round
  * schedules the identical URL set, so every stale row is identical to a
  * row the replay re-appends. Duplicates and stale-but-identical rows
  * cannot change `might-have-seen` answers. (The durable seen TRUTH —
  * counts, bloom rebuilds, resume state — stays in the manifest-gated
  * round deltas; this table is a join-layout cache, exactly like the
  * fetcher's bucketed corpus copy.)
  */
class BucketedSeenStore(
    spark: SparkSession,
    val table: String,
    buckets: Int
) extends Serializable {

  def exists: Boolean = spark.catalog.tableExists(table)

  private def write(df: DataFrame, mode: String): Unit =
    df.select(col("urlHash"))
      .write.mode(mode).options(graft.engine.TableIO.writeOpts)
      .bucketBy(buckets, "urlHash").sortBy("urlHash")
      .format("parquet").saveAsTable(table)

  /** One-time bulk load when the crawl crosses the mirror threshold (or
    * after a lost warehouse): the full dir-delta union, written once.
    */
  def bulkLoad(seen: DataFrame): Unit = write(seen, "overwrite")

  /** Per-round delta append (bucket spec must match — enforced by Spark). */
  def append(delta: DataFrame): Unit = write(delta, "append")

  /** `candidates` without the already-seen rows. SHUFFLE_HASH keeps the
    * bucketed seen scan streaming (no sort, no Exchange on the seen
    * side); only the candidate side repartitions to the table's layout.
    */
  def antiJoin(candidates: DataFrame): DataFrame =
    candidates.hint("SHUFFLE_HASH")
      .join(spark.table(table).select(col("urlHash")),
        Seq("urlHash"), "left_anti")

  def drop(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")
}

object BucketedSeenStore {
  /** Deterministic per-workDir table name so resume in a fresh session
    * finds (or cleanly recreates) the same mirror.
    */
  def tableFor(workDir: String): String = {
    val slug = workDir.replaceAll("[^A-Za-z0-9]", "_").takeRight(40)
    s"graft_seen_${slug}_${Integer.toHexString(workDir.hashCode)}"
  }
}
