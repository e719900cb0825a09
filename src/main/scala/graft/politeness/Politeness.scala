package graft.politeness

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.RobotsRule

/** Per-host politeness: robots.txt prefix rules + window-ranked budgets.
  *
  * The reference only records politeness signals — `FlowControl::Wait/Hold`
  * write `tag -> deadline` into a ledger that is never consumed
  * (spire-rs/spire crates/spire-core/src/process/runner.rs:224-226,
  * 289-306). The north rule requires actual enforcement. Mapping:
  *
  *  - robots rules -> broadcast join on `host` + a higher-order
  *    `exists(disallow, p -> startswith(path, p))` filter (Catalyst
  *    built-ins, codegen-friendly, no UDF);
  *  - per-host budget -> `row_number() over (partition by host order by
  *    priority, discoveryRound, seq) <= hostBudget` — the "window-ranked
  *    priority queue keyed by (host, priority, discovery_ts)" of the
  *    north star. Partitioning by host keeps the rank computation fully
  *    parallel; the hot-host partition is bounded by per-round candidate
  *    count, and AQE skew handling splits it if needed.
  */
object Politeness {

  /** Split eligible / blocked by robots rules. `robots` is small by
    * construction (one row per host) -> broadcast hint. Hosts without a
    * rule are fully allowed.
    */
  def robotsFilter(frontier: DataFrame, robots: Dataset[RobotsRule]): DataFrame = {
    val r = broadcast(
      robots.toDF().select(
        col("host"),
        col("disallow").as("_disallow"),
        col("hostBudget").as("_hostBudget")))
    val joined = frontier.join(r, Seq("host"), "left")
    val path = regexp_extract(col("canonical"), "^[a-z]+:\\/\\/[^\\/]*([^?#]*)", 1)
    joined
      .withColumn("_path", when(path === "", lit("/")).otherwise(path))
      .filter(
        col("_disallow").isNull ||
          !exists(col("_disallow"), p => startswith(col("_path"), p)))
      .drop("_path", "_disallow")
  }

  /** Keep at most `hostBudget` rows per host per round, best-first by
    * (priority asc, discoveryRound asc, parentSeq asc, emissionIdx asc) —
    * a deterministic total order within each host. Rows above budget stay
    * in the frontier for later rounds (caller unions them back).
    * Returns (scheduled, overBudget).
    */
  def budgetRank(
      frontier: DataFrame,
      defaultBudget: Int
  ): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").asc, col("discoveryRound").asc,
        col("parentSeq").asc, col("emissionIdx").asc)
    val budget =
      if (frontier.columns.contains("_hostBudget"))
        coalesce(col("_hostBudget"), lit(defaultBudget))
      else lit(defaultBudget)
    val ranked = frontier
      .withColumn("_hrk", row_number().over(w))
      .withColumn("_within", col("_hrk") <= budget)
    (ranked.filter(col("_within")).drop("_hrk", "_within", "_hostBudget"),
      ranked.filter(!col("_within")).drop("_hrk", "_within", "_hostBudget"))
  }
}
