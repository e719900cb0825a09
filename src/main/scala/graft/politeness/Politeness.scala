package graft.politeness

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
  *  - robots rules -> broadcast join on `host` + longest-match
  *    Disallow-vs-Allow precedence via the fused `LongestMatchLen`
  *    expression (codegen'd; no UDF; RFC 9309 `*`/`$` path patterns);
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
  def robotsFilter(frontier: DataFrame, robots: Dataset[RobotsRule],
      broadcastRobots: Boolean = true): DataFrame = {
    val r0 = robots.toDF().select(
      col("host"),
      col("disallow").as("_disallow"),
      col("allow").as("_allow"),
      col("hostBudget").as("_hostBudget"))
    // at web scale robots cover 10^6-10^8 hosts — past the engine's
    // threshold the join runs un-hinted (hash-partitioned on host, the
    // same partitioning the budget-rank window needs right after, so the
    // frontier shuffle is shared, not added)
    val r = if (broadcastRobots) broadcast(r0) else r0
    val joined = frontier.join(r, Seq("host"), "left")
    // LONGEST-match precedence (de-facto Google semantics): blocked iff
    // the longest matching Disallow pattern is strictly longer than the
    // longest matching Allow pattern (tie -> allow; no allows == classic
    // disallow-only). Patterns may use RFC 9309 '*'/'$' wildcards;
    // LongestMatchLen is a fused codegen'd expression — this filter runs
    // once per frontier candidate per round.
    def lpl(arr: Column): Column = {
      import org.apache.spark.sql.GraftExpr
      GraftExpr.column(RobotsExpr.LongestMatchLen(
        GraftExpr.expression(col("_path")), GraftExpr.expression(arr)))
    }
    joined
      .withColumn("_path", pathCol(col("canonical")))
      .filter(
        col("_disallow").isNull ||
          !(lpl(col("_disallow")) > lpl(col("_allow"))))
      .drop("_path", "_disallow", "_allow")
  }

  /** Path component of a canonical URL, empty path -> "/" — the ONE
    * definition of "the path robots rules match against", shared by
    * [[robotsFilter]] and the streaming scheduler (batch/stream parity:
    * a change here changes both tiers together).
    */
  def pathCol(canonical: Column): Column = {
    val raw =
      regexp_extract(canonical, "^[a-z]+:\\/\\/[^\\/]*([^?#]*)", 1)
    when(raw === "", lit("/")).otherwise(raw)
  }

  /** Parse raw robots.txt bodies into per-host rules — the ingestion
    * step between fetching /robots.txt and [[robotsFilter]]. Standard
    * grammar subset: `#` comments stripped, a RUN of consecutive
    * `User-agent:` lines opens ONE group shared by all the stacked
    * agents (RFC 9309 §2.2.1 — a group has multiple start-of-group
    * lines); `Disallow:` / `Allow:` path patterns (`*`/`$` wildcards
    * honored downstream by [[robotsFilter]]) and `Crawl-delay:` seconds
    * apply to the matching groups. Agent matching is RFC 9309 §2.2.1:
    * a group matches when its agent value CASE-INSENSITIVELY equals
    * `agent` or `agent`'s PRODUCT TOKEN (the part before the first `/`
    * — so group `googlebot` matches crawler `Googlebot/2.1`); per host,
    * if NO specific group matches, the `*` groups apply instead (the
    * RFC's fallback — specific groups SHADOW `*`, they don't merge with
    * it). Unknown keys and empty values are ignored; multiple matching
    * groups merge (union of patterns in line order, max delay). Allow
    * participates in [[robotsFilter]]'s longest-match precedence.
    *
    * Fully declarative scan: one posexplode per body, the group id is a
    * running `sum() over (partition by host order by line)` — per-host
    * windows, so parsing 10^8 robots bodies parallelizes by host with a
    * single shuffle, and the output feeds [[robotsFilter]]'s distributed
    * (non-broadcast) mode directly.
    */
  def parseRobots(bodies: DataFrame, hostCol: String = "host",
      bodyCol: String = "body", agent: String = "*"): DataFrame = {
    val lines = bodies
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("ord", "raw")))
      .withColumn("line", trim(split(col("raw"), "#").getItem(0)))
      .filter(col("line") =!= "")
      .withColumn("key", lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
    val wGrp = Window.partitionBy(col("host")).orderBy(col("ord"))
    // group id increments only when a user-agent line FOLLOWS a
    // non-user-agent line: stacked UA lines ('User-agent: *' directly
    // over 'User-agent: googlebot') share one group per RFC 9309
    val grouped = lines
      .withColumn("_prevKey", lag(col("key"), 1).over(wGrp))
      .withColumn("grp",
        sum(when(col("key") === "user-agent" &&
          (col("_prevKey").isNull || col("_prevKey") =!= "user-agent"),
          1).otherwise(0)).over(wGrp))
      .drop("_prevKey")
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val tokenLc = agentLc.takeWhile(_ != '/')
    // per (host, grp): does any stacked UA line match the crawler
    // specifically (full UA or product token)? the '*' group?
    val uaGroups = grouped
      .filter(col("key") === "user-agent")
      .groupBy(col("host"), col("grp"))
      .agg(
        max(lower(col("value")) === agentLc ||
          lower(col("value")) === tokenLc).as("_spec"),
        max(col("value") === "*").as("_star"))
    // RFC 9309 fallback: specific groups shadow '*' groups per host
    val wHost = Window.partitionBy(col("host"))
    val chosenGroups = uaGroups
      .withColumn("_hasSpec", max(col("_spec")).over(wHost))
      .filter(when(col("_hasSpec"), col("_spec")).otherwise(col("_star")))
      .select(col("host").as("_h"), col("grp").as("_g"))
    val inStar = grouped.join(chosenGroups,
      col("host") === col("_h") && col("grp") === col("_g"), "left_semi")
    def ordered(key: String) = transform(
      array_sort(collect_list(
        when(col("key") === key && col("value") =!= "",
          struct(col("ord"), col("value").as("v"))))),
      x => x("v"))
    inStar.groupBy(col("host")).agg(
      ordered("disallow").as("disallow"),
      ordered("allow").as("allow"),
      coalesce(
        (max(when(col("key") === "crawl-delay",
          col("value").cast("double"))) * 1000).cast("long"),
        lit(0L)).as("crawlDelayMs"))
  }

  /** The deterministic total order within each host: best-first by
    * (priority asc, discoveryRound asc, parentSeq asc, emissionIdx asc).
    * (parentSeq, emissionIdx) is globally unique — each parent emits a
    * child position once — so the order is total and both rank variants
    * below select the exact same rows.
    */
  private val hostOrder = Seq(col("priority").asc, col("discoveryRound").asc,
    col("parentSeq").asc, col("emissionIdx").asc)

  private def budgetCol(frontier: DataFrame, defaultBudget: Int) =
    if (frontier.columns.contains("_hostBudget"))
      coalesce(col("_hostBudget"), lit(defaultBudget))
    else lit(defaultBudget)

  /** Keep at most `hostBudget` rows per host per round. Rows above budget
    * stay in the frontier for later rounds (caller unions them back).
    * Returns (scheduled, overBudget).
    */
  def budgetRank(
      frontier: DataFrame,
      defaultBudget: Int
  ): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("host")).orderBy(hostOrder: _*)
    val ranked = frontier
      .withColumn("_hrk", row_number().over(w))
      .withColumn("_within", col("_hrk") <= budgetCol(frontier, defaultBudget))
    (ranked.filter(col("_within")).drop("_hrk", "_within", "_hostBudget"),
      ranked.filter(!col("_within")).drop("_hrk", "_within", "_hostBudget"))
  }

  /** Salted two-phase budget rank for hot-host skew (north-rule "hot-host
    * skew" op): a 20%-hot host would otherwise sort its whole candidate
    * set in ONE task inside [[budgetRank]]'s window.
    *
    * Phase 1 ranks within (host, salt = urlHash % salts): any row whose
    * salt-local rank exceeds the budget cannot be within the host-global
    * budget either (rows ahead of it in its salt are a subset of rows
    * ahead of it in the host), so it is over-budget immediately — no
    * single task ever sorts more than the hot host's share / salts.
    * Phase 2 computes the exact global rank over the <= salts*budget
    * survivors per host (a bounded set). Selected rows are IDENTICAL to
    * [[budgetRank]] because the order key is total.
    */
  def budgetRankSalted(
      frontier: DataFrame,
      defaultBudget: Int,
      salts: Int
  ): (DataFrame, DataFrame) = {
    val budget = budgetCol(frontier, defaultBudget)
    val w1 = Window.partitionBy(col("host"), col("_salt")).orderBy(hostOrder: _*)
    val pre = frontier
      .withColumn("_salt", pmod(col("urlHash"), lit(salts.toLong)).cast("int"))
      .withColumn("_lrk", row_number().over(w1))
    val cut = pre.filter(col("_lrk") > budget)
      .drop("_salt", "_lrk", "_hostBudget")
    val w2 = Window.partitionBy(col("host")).orderBy(hostOrder: _*)
    val ranked = pre.filter(col("_lrk") <= budget)
      .withColumn("_hrk", row_number().over(w2))
    val under = ranked.filter(col("_hrk") <= budget)
      .drop("_salt", "_lrk", "_hrk", "_hostBudget")
    val over = ranked.filter(col("_hrk") > budget)
      .drop("_salt", "_lrk", "_hrk", "_hostBudget")
    (under, over.unionByName(cut))
  }
}
