package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recrawl (freshness) scheduling — the continuous-crawl half of the
  * frontier that the reference's one-shot scheduler
  * (crates/spire-core/src/runner.rs:146-155 drains the queue once and
  * stops) never reaches, but every production crawler needs: once a URL
  * has been fetched, WHEN is it worth fetching again?
  *
  * The estimator is the classic visits-vs-changes frequency model
  * (Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT
  * 2003, §3 — the naive estimator r = X/n over equal-spaced accesses):
  * each revisit whose content hash differs from the previous visit's is
  * a CHANGE OBSERVATION; the per-URL change rate is
  * changes / (visits - 1), and the expected number of changes missed by
  * NOT having revisited since the last visit is
  *
  *   priority = change_rate * (currentRound - last_round)
  *
  * kept in EXACT integer milli-units (Long `div`, like
  * [[graft.graph.GraphOps.pageRank]]'s RankScale arithmetic) so the
  * revisit ORDER is bit-identical at any parallelism / any engine.
  *
  * Scale shape (10^10 visited URLs):
  *  - [[changeStats]] is ONE hash partitioning by url: the lag() window
  *    and the per-url aggregate share the same key, so Catalyst plans a
  *    single Exchange for both (window, then partial-free groupBy on the
  *    window's partitioning).
  *  - [[scheduleRevisits]] is the same per-host top-k window shape as
  *    [[graft.politeness.Politeness.budgetRank]] — rank <= k filters
  *    plan as WindowGroupLimit, so each map task keeps only its local
  *    top-k per host before the host Exchange ships anything.
  */
object Recrawl {

  /** Milli-unit scale for the exact-integer priority. */
  val PriorityScale = 1000L

  /** Per-URL change statistics from a visit history.
    *
    * @param history columns (url, host, round, content_hash) — one row
    *                per completed fetch; `round` is the crawl round (or
    *                any monotone revisit clock) the fetch happened in.
    *                (url, round) is assumed unique (one fetch per URL per
    *                round — the engine's politeness ledger guarantees it).
    * @param currentRound the round about to be scheduled
    * @return (url, host, visits, changes, last_round, staleness,
    *         priority_milli) — priority_milli =
    *         (changes * staleness * 1000) div max(visits - 1, 1)
    */
  def changeStats(history: DataFrame, currentRound: Long): DataFrame = {
    val w = Window.partitionBy(col("url")).orderBy(col("round").asc)
    history
      .withColumn("_prevHash", lag(col("content_hash"), 1).over(w))
      .groupBy(col("url"))
      .agg(
        max(col("host")).as("host"),
        count(lit(1)).as("visits"),
        sum(when(col("_prevHash").isNotNull &&
          col("_prevHash") =!= col("content_hash"), 1L)
          .otherwise(0L)).as("changes"),
        max(col("round")).as("last_round"))
      .withColumn("staleness", lit(currentRound) - col("last_round"))
      .withColumn("priority_milli",
        expr(s"(changes * staleness * $PriorityScale)" +
          " div greatest(visits - 1, 1)"))
  }

  /** Glue from the engine's own outputs: build a visit history from the
    * `records` tables of SUCCESSIVE crawls of the same URL space (one
    * crawl fetches each URL at most once — dedup — so revisit evidence
    * only exists ACROSS runs). Each run supplies its records table plus
    * the monotone clock value for that run (crawl epoch). Content
    * identity is xxhash64 over the stable content columns the engine
    * records (title, contentLength, nLinks, nMedia) — a change in any
    * of them is a change observation.
    */
  def historyFromRecords(runs: Seq[(DataFrame, Long)]): DataFrame = {
    require(runs.nonEmpty, "need at least one records table")
    runs.map { case (r, clock) =>
      r.select(col("url"),
        graft.canon.Canon.host(col("url")).as("host"),
        lit(clock).as("round"),
        xxhash64(col("title"), col("contentLength"), col("nLinks"),
          col("nMedia")).cast("string").as("content_hash"))
    }.reduce(_.unionByName(_))
  }

  /** The deterministic revisit order within a host: most-expected-missed-
    * changes first, then most-stale, then url for totality.
    */
  private val revisitOrder = Seq(col("priority_milli").desc,
    col("staleness").desc, col("url").asc)

  /** Top `perHostBudget` URLs per host by [[revisitOrder]] — the revisit
    * slice of the next round's frontier. Output adds `revisit_rank`
    * (1-based within host).
    */
  def scheduleRevisits(stats: DataFrame, perHostBudget: Int): DataFrame = {
    val w = Window.partitionBy(col("host")).orderBy(revisitOrder: _*)
    stats
      .withColumn("revisit_rank", row_number().over(w))
      .filter(col("revisit_rank") <= perHostBudget)
  }

  /** Salted two-phase form of [[scheduleRevisits]] for hot-host skew —
    * the same argument as `Politeness.budgetRankSalted`: a salt-local
    * rank above the budget implies the host-global rank is too (rows
    * ahead in the salt are a subset of rows ahead in the host), so phase
    * 1 discards them within (host, salt) partitions and phase 2 computes
    * the exact global rank over <= salts*budget survivors per host. The
    * order key is total ([[revisitOrder]] ends on url), so the selected
    * rows AND their ranks are identical to the plain form.
    */
  def scheduleRevisitsSalted(stats: DataFrame, perHostBudget: Int,
      salts: Int): DataFrame = {
    val w1 = Window.partitionBy(col("host"), col("_salt"))
      .orderBy(revisitOrder: _*)
    val pre = stats
      .withColumn("_salt", pmod(xxhash64(col("url")), lit(salts.toLong))
        .cast("int"))
      .withColumn("_lrk", row_number().over(w1))
      .filter(col("_lrk") <= perHostBudget)
    val w2 = Window.partitionBy(col("host")).orderBy(revisitOrder: _*)
    pre.withColumn("revisit_rank", row_number().over(w2))
      .filter(col("revisit_rank") <= perHostBudget)
      .drop("_salt", "_lrk")
  }
}
