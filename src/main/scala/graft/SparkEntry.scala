package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.canon.{Canon, UrlTraps}
import graft.dedup.Seen
import graft.engine.{ContinuousCrawl, CrawlEngine, Recrawl, Redirects}
import graft.model.{CrawlConfig, RobotsRule, Seed}
import graft.politeness.Politeness
import graft.router.{FlowControl, Handler, Router}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry demonstrates one engine operator over the
  * driver's read-only parquet tables (TESTDATA.md); `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL the driver checks it against. URL-shaped
  * inputs are derived deterministically from `documents.doc_id` so both
  * engines compute them identically.
  */
object SparkEntry {

  // ---------- derived inputs (identical formulas in oracleSql) ----------

  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Deliberately messy URL per doc: mixed case, default port, trailing
    * slash, unsorted query, fragment — exercises every canon rule.
    */
  private def messyUrl(id: Column): Column = concat(
    lit("HTTP://Src"), (id % 20).cast("string"), lit(".Example.COM"),
    when(id % 3 === 0, lit(":80")).otherwise(lit("")),
    lit("/docs/"), id.cast("string"),
    when(id % 4 === 0, lit("/")).otherwise(lit("")),
    when(id % 2 === 0, lit("?b=2&a=1")).otherwise(lit("")),
    when(id % 5 === 0, lit("#frag")).otherwise(lit("")))

  /** The messyUrl formula as DuckDB SQL over column `doc_id`. */
  private val messyUrlSql: String =
    "concat('HTTP://Src', CAST(doc_id % 20 AS VARCHAR), '.Example.COM', " +
      "CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END, " +
      "'/docs/', CAST(doc_id AS VARCHAR), " +
      "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, " +
      "CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '' END, " +
      "CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"

  /** Canonicalization of messyUrl, written out longhand in SQL (the Spark
    * side uses graft.canon.Canon's generic expressions; results must
    * match on this input family).
    */
  private val canonicalSql: String =
    "concat('http://src', CAST(doc_id % 20 AS VARCHAR), '.example.com', " +
      "'/docs/', CAST(doc_id AS VARCHAR), " +
      "CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '' END)"

  /** Clean canonical URL per doc (for graph queries — canon-neutral). */
  private def cleanUrl(id: Column): Column =
    concat(lit("http://s"), (id % 20).cast("string"), lit(".test/d/"),
      id.cast("string"))

  private def cleanUrlSql(idExpr: String): String =
    s"concat('http://s', CAST(($idExpr) % 20 AS VARCHAR), '.test/d/', " +
      s"CAST(($idExpr) AS VARCHAR))"

  /** Deterministic 3-out-degree link graph over documents:
    * i -> (7i+3)%N, (13i+5)%N, (31i+11)%N.
    */
  private val edgeMults: Seq[(Long, Long)] = Seq((7L, 3L), (13L, 5L), (31L, 11L))

  // ---- Corpus LCG spec as DuckDB SQL (for q_spans_seq) ----
  // mix(x) = (x*A + C) % M with A=1103515245, C=12345, M=2^31;
  // mix2(x, salt) = mix(mix(x % M) + salt). All intermediates < 2^62.
  private def mix2Sql(x: String, salt: Long): String =
    s"(((((($x) % 2147483648) * 1103515245 + 12345) % 2147483648) + $salt)" +
      " * 1103515245 + 12345) % 2147483648"
  private def corpusHostSql(j: String): String =
    s"(CASE WHEN ${mix2Sql(j, 1)} % 100 < 25 THEN 0" +
      s" ELSE ${mix2Sql(j, 2)} % 50 END)"
  private def corpusUrlSql(j: String): String =
    s"concat('http://h', CAST(${corpusHostSql(j)} AS VARCHAR)," +
      s" '.test/page/', CAST(($j) AS VARCHAR))"
  private def nTextSql(i: String): String = s"(1 + ${mix2Sql(i, 5)} % 3)"
  private def nMediaSql(i: String): String = s"(${mix2Sql(i, 7)} % 2)"
  private def outDegSql(i: String): String = s"(${mix2Sql(i, 3)} % 7)"

  /** documents as an interleaved-docs corpus: one text span (the real
    * text), media span for long docs, plus the 3 link spans.
    * `textOf` lets continuous-crawl queries version the content per
    * epoch (the title IS the text span, so a changed text is a change
    * observation for [[Recrawl.changeStats]]).
    */
  private def docsAsCorpus(spark: SparkSession, dir: String,
      textOf: Column => Column = identity): DataFrame = {
    val d = documents(spark, dir)
    val n = d.count()
    val id = col("doc_id")
    val links = array(edgeMults.zipWithIndex.map { case ((m, a), ix) =>
      struct(lit("link").as("kind"),
        concat(lit("anchor"), lit(ix)).as("text"),
        cleanUrl((id * m + a) % n).as("media_ref"),
        lit(ix + 2).cast("int").as("offset"))
    }: _*)
    val base = array(
      struct(lit("text").as("kind"), textOf(col("text")).as("text"),
        lit(null).cast("string").as("media_ref"), lit(0).as("offset")),
      struct(lit("media").as("kind"), lit("alt").as("text"),
        concat(lit("m://"), id.cast("string")).as("media_ref"),
        lit(1).as("offset")))
    d.select(cleanUrl(id).as("doc_id"), concat(base, links).as("spans"))
  }

  // ---------- flagship ----------

  /** Flagship: a real multi-round crawl (canonicalize -> dedup -> budget ->
    * fetch-join -> route -> frontier) over the documents-derived corpus at
    * sf0.001; returns the crawl trace. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val corpus = docsAsCorpus(spark, dir)
    val seeds = (0 until 4).map(j => Seed(s"http://s${j % 20}.test/d/$j", "page", j))
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = CrawlConfig(maxRounds = 4, maxDepth = 4,
      defaultHostBudget = 100, frontierPartitions = 8,
      bloomExpectedItems = 100000L)
    val router = Router(Map("page" -> Handler.linkFollower()),
      fallback = Handler.linkFollower())
    val r = CrawlEngine.run(spark, corpus, seeds,
      spark.emptyDataset[RobotsRule], router, cfg, work)
    r.trace(spark)
  }

  // ---------- operator queries ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.PipelineQueries.queries ++ crawlQueries

  def oracleSql: Map[String, String] =
    graft.queries.PipelineQueries.oracleSql ++ crawlOracleSql

  private def crawlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // recrawl scheduling (Recrawl): Cho/Garcia-Molina change-rate
    // estimator over a derived visit history (url u revisited every 97
    // doc_ids; content hash advances every 1+u%3 rounds), then the
    // per-host revisit top-k. Oracle re-derives the windows in DuckDB.
    "q_recrawl" -> ((s, dir) => {
      val hist = documents(s, dir)
        .selectExpr("doc_id % 97 AS u", "doc_id div 97 AS round")
        .selectExpr(
          "concat('http://h', CAST(u % 10 AS STRING), '.test/r/'," +
            " CAST(u AS STRING)) AS url",
          "concat('h', CAST(u % 10 AS STRING)) AS host",
          "round",
          "CAST(u * 31 + (round div (1 + u % 3)) AS STRING)" +
            " AS content_hash")
      // currentRound must exceed every history round at ANY sf (the
      // contract: "the round about to be scheduled"); derived, so the
      // sf0.1 bench (rounds up to 51) stays in-contract too
      val cur = hist.agg(max(col("round"))).head().getLong(0) + 1L
      Recrawl.scheduleRevisits(Recrawl.changeStats(hist, cur), 5)
        .select(col("host"), col("revisit_rank"), col("url"),
          col("visits"), col("changes"), col("staleness"),
          col("priority_milli"))
        .orderBy("host", "revisit_rank")
    }),

    // redirect-chain resolution (Redirects): blocks of 8 chain down to
    // the block head (terminal), every 5th block's head points back to
    // its tail (an 8-cycle); maxHops=4. Pointer doubling must match the
    // oracle's naive recursive walk exactly.
    "q_redirects" -> ((s, dir) => {
      val i = col("doc_id")
      def urlOf(c: Column) =
        concat(lit("http://r.test/u/"), c.cast("string"))
      val edges = documents(s, dir)
        .filter(i % 8 =!= 0 || expr("doc_id div 8") % 5 === 0)
        .select(urlOf(i).as("src"),
          urlOf(when(i % 8 =!= 0, i - 1).otherwise(i + 7)).as("dst"))
      Redirects.resolve(edges, maxHops = 4).orderBy("url")
    }),

    // 3xx semantics INSIDE the engine loop (continuous-crawl tier):
    // clean pages form a ternary tree (node i links to 3i+1..3i+3, so
    // every page has exactly one discovery path and an unambiguous
    // depth); odd link targets hide behind 1-hop alias chains, targets
    // % 4 == 3 behind 2-hop chains. Phase 1 crawls cold — chains are
    // discovered hop-per-round as 301 fetches. Phase 2 re-crawls with
    // phase 1's redirect-edge ledger warm-started: every chain rewrites
    // to its final target BEFORE scheduling (Redirects.resolve pointer
    // doubling), so phase 2's trace has ZERO 3xx rows.
    "q_redirect_crawl" -> ((s, dir) => {
      import s.implicits._
      val n = documents(s, dir).count()
      def cleanR(c: Column) = concat(lit("http://t"), (c % 3).cast("string"),
        lit(".test/c/"), c.cast("string"))
      def a1(c: Column) = concat(lit("http://a.test/a/"), c.cast("string"))
      def a2(c: Column) = concat(lit("http://b.test/b/"), c.cast("string"))
      def tgt(c: Column) = when(c % 4 === 3, a2(c))
        .when(c % 2 === 1, a1(c)).otherwise(cleanR(c))
      val spansT =
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
      val ids = documents(s, dir).select(col("doc_id").as("i"))
      val i = col("i")
      val kids = filter(array(i * 3 + 1, i * 3 + 2, i * 3 + 3), k => k < n)
      val cleanRows = ids.select(
        cleanR(i).as("doc_id"),
        transform(kids, (k, ix) => struct(lit("link").as("kind"),
          concat(lit("anchor"), ix.cast("string")).as("text"),
          tgt(k).as("media_ref"), ix.cast("int").as("offset"))).as("spans"),
        lit(null).cast("string").as("redirect_to"))
      val alias1Rows = ids.filter(i % 2 === 1).select(a1(i).as("doc_id"),
        lit(null).cast(spansT).as("spans"), cleanR(i).as("redirect_to"))
      val alias2Rows = ids.filter(i % 4 === 3).select(a2(i).as("doc_id"),
        lit(null).cast(spansT).as("spans"), a1(i).as("redirect_to"))
      val corpus = cleanRows.unionByName(alias1Rows).unionByName(alias2Rows)
      val cfgR = CrawlConfig(maxRounds = 12, maxDepth = 3,
        frontierPartitions = 8, useBloomPrefilter = false,
        followRedirects = true,
        lineageStats = false, trackPath = false)
      val router = Router(Map.empty, fallback = Handler.linkFollower())
      val seeds = Seq(Seed("http://t0.test/c/0", null, 0))
      val w1 = java.nio.file.Files.createTempDirectory("graft-rc1").toString
      val cold = CrawlEngine.run(s, corpus, seeds,
        s.emptyDataset[RobotsRule], router, cfgR, w1)
      val w2 = java.nio.file.Files.createTempDirectory("graft-rc2").toString
      val warm = CrawlEngine.run(s, corpus, seeds,
        s.emptyDataset[RobotsRule], router, cfgR, w2,
        initialRedirects = cold.redirectEdges(s))
      def phase(r: CrawlEngine.RunResult, p: Int) = r.trace(s)
        .select(lit(p).as("phase"), col("canonical").as("url"),
          col("status"), col("depth"))
      phase(cold, 1).unionByName(phase(warm, 2)).orderBy("phase", "url")
    }),

    // continuous-crawl epochs end-to-end (ContinuousCrawl.runEpochs):
    // epoch 0 discovers from seeds; epoch 1 revisits top-1 per host
    // (all priorities 0 -> url order); docs with doc_id % 3 == 0 change
    // text every epoch, so epoch 2's revisit priority is driven by the
    // OBSERVED change between epochs 0 and 1 (Cho & Garcia-Molina
    // estimator). Output: epoch-2 revisit schedule joined to what epoch
    // 2 actually fetched (title proves the epoch-2 corpus was read).
    "q_recrawl_e2e" -> ((s, dir) => {
      import s.implicits._
      def corpusV(e: Int) = docsAsCorpus(s, dir,
        t => when(col("doc_id") % 3 === 0, concat(t, lit("#" + e)))
          .otherwise(t))
      val work = java.nio.file.Files.createTempDirectory("graft-e2e").toString
      val cfg = CrawlConfig(maxRounds = 2, maxDepth = 2,
        frontierPartitions = 8, useBloomPrefilter = false,
        lineageStats = false, trackPath = false)
      val router = Router(Map.empty, fallback = Handler.linkFollower())
      val seeds = (0 until 6).map(j => Seed(s"http://s$j.test/d/$j", null, j))
      val rs = ContinuousCrawl.runEpochs(s, corpusV, seeds,
        s.emptyDataset[RobotsRule], router, cfg, work,
        epochs = 3, revisitPerHost = 1,
        revisitCfg = Some(cfg.copy(maxRounds = 1)))
      val hist = Recrawl.historyFromRecords(
        Seq((rs(0).records(s), 0L), (rs(1).records(s), 1L)))
      val sched = Recrawl.scheduleRevisits(Recrawl.changeStats(hist, 2L), 1)
      sched.join(rs(2).records(s).select(col("url").as("_u"), col("title")),
          col("url") === col("_u"))
        .select(col("url"), col("visits"), col("changes"), col("staleness"),
          col("priority_milli"), col("revisit_rank"), col("title"))
        .orderBy("url")
    }),

    // crawler-trap screening (UrlTraps): generated URLs with known
    // depth (cumulative distinct segments), a /x/x/x run every 6th doc
    // and 0..9 query params; features + verdict have a closed form.
    "q_url_traps" -> ((s, dir) => {
      val i = col("doc_id")
      val pathParts =
        (0 until 15).map(d => (1 to d).map("/s" + _).mkString)
      val queryParts = (0 until 10).map(p =>
        if (p == 0) "" else "?" + (1 to p).map(j => s"k$j=1").mkString("&"))
      val url = concat(
        lit("http://t"), (i % 5).cast("string"), lit(".test"),
        when(i % 6 === 0, lit("/x/x/x")).otherwise(lit("")),
        element_at(array(pathParts.map(lit): _*), (i % 15).cast("int") + 1),
        element_at(array(queryParts.map(lit): _*), (i % 10).cast("int") + 1))
      documents(s, dir).select(i.as("doc_id"),
        UrlTraps.pathDepth(url).as("depth"),
        UrlTraps.maxSegmentRun(url).as("max_run"),
        UrlTraps.queryParamCount(url).as("params"),
        UrlTraps.isTrap(url).as("is_trap"))
        .orderBy("doc_id")
    }),

    // anchor-text link extraction (TextSelect.selectAnchors): hrefs WITH
    // their visible text (inner tags stripped, entities decoded once,
    // whitespace collapsed), composed with canonicalization — the
    // labeled-edge form of the link graph. href-less anchors skipped.
    "q_anchor_text" -> ((s, dir) => {
      import graft.text.TextSelect
      val i = col("doc_id")
      val html = concat(
        lit("<p>x</p><a href=\"HTTP://Host"), (i % 10).cast("string"),
        lit(".Test:80/p/"), (i % 50).cast("string"),
        lit("?b=2&a=1\">Go <b>now</b> &amp; fast</a><a name=skip>no</a>"),
        when(i % 3 === 0,
          concat(lit("<a href='/rel/"), i.cast("string"),
            lit("'>rel <i>"), i.cast("string"), lit("</i></a>")))
          .otherwise(lit("")))
      documents(s, dir).withColumn("_html", html)
        .select(i.as("doc_id"),
          posexplode(TextSelect.selectAnchors(col("_html"))))
        .withColumnsRenamed(Map("pos" -> "ord"))
        .select(col("doc_id"), col("ord"),
          col("col.href").as("href"),
          Canon.canonicalize(col("col.href")).as("canonical"),
          col("col.text").as("text"))
        .orderBy("doc_id", "ord")
    }),

    // canonicalization (north-rule op, Canon): messy -> canonical
    "q_canon" -> ((s, dir) => {
      documents(s, dir).select(
        col("doc_id"),
        Canon.canonicalize(messyUrl(col("doc_id"))).as("canonical"))
        .orderBy("doc_id")
    }),

    // deep dot-segment nesting (>4 parent refs) canonicalizes to the RFC
    // 3986 fixpoint (ADVICE r02): 6 ups cancel 6 segments, port elided,
    // query sorted — the expected value is a closed form
    "q_canon_deep" -> ((s, dir) => {
      documents(s, dir).select(
        col("doc_id"),
        Canon.canonicalize(concat(
          lit("http://Deep.Test:80/a/b/c/d/e/"), col("doc_id").cast("string"),
          lit("/../../../../../../x?b=2&a=1"))).as("canonical"))
        .orderBy("doc_id")
    }),

    // host extraction + default-port/fragment handling
    "q_canon_host" -> ((s, dir) => {
      documents(s, dir).select(
        col("doc_id"),
        Canon.host(messyUrl(col("doc_id"))).as("host"),
        Canon.scheme(messyUrl(col("doc_id"))).as("scheme"))
        .orderBy("doc_id")
    }),

    // URL-seen dedup: frontier anti-join seen (Seen.exactAntiJoin)
    "q_dedup_seen" -> ((s, dir) => {
      val frontier = documents(s, dir).select(
        col("doc_id"),
        Canon.canonicalize(messyUrl(col("doc_id"))).as("canonical"))
        .withColumn("urlHash", Canon.urlHash(col("canonical")))
      val seen = frontier.filter(col("doc_id") % 3 === 0)
        .select(col("urlHash"))
      Seen.exactAntiJoin(frontier, seen)
        .select(col("doc_id"), col("canonical")).orderBy("doc_id")
    }),

    // the input_hint's PER-ROW invariant, as a driver gate: the engine's
    // interleaved corpus (graft.corpus.Corpus — the table every crawl
    // fetches from) exploded to one row per span, gated against a DuckDB
    // re-derivation of the same 31-bit-LCG spec. Pins span-sequence
    // equality (kind, text, media_ref, order) end to end.
    "q_spans_seq" -> ((s, dir) => {
      val n = documents(s, dir).count()
      graft.corpus.Corpus.docs(s, graft.corpus.Corpus.Spec(nDocs = n))
        .select(col("doc_id"), posexplode(col("spans")).as(Seq("ord", "sp")))
        .select(col("doc_id"), col("sp.kind").as("kind"),
          col("sp.text").as("text"), col("sp.media_ref").as("media_ref"),
          col("sp.offset").as("offset"))
        .orderBy("doc_id", "offset")
    }),

    // cuckoo tier of the URL-seen filter (north rule: "bloom/cuckoo"):
    // sharded cuckoo prefilter -> exact anti-join on the maybe-seen side.
    // The oracle is the plain anti-join — the gate pins the prefilter's
    // exactness contract (no false negatives at any fpp).
    "q_dedup_cuckoo" -> ((s, dir) => {
      val frontier = documents(s, dir).select(
        col("doc_id"),
        Canon.canonicalize(messyUrl(col("doc_id"))).as("canonical"))
        .withColumn("urlHash", Canon.urlHash(col("canonical")))
      val seen = frontier.filter(col("doc_id") % 3 === 0)
        .select(col("urlHash"))
      val cuckoos = graft.dedup.CuckooFilter.buildSharded(seen, 4, 100000L)
      val (defNew, maybe) = Seen.bloomPrefilter(frontier, cuckoos, 4)
      defNew.unionByName(Seen.exactAntiJoin(maybe, seen))
        .select(col("doc_id"), col("canonical")).orderBy("doc_id")
    }),

    // in-batch first-occurrence dedup (Seen.firstOccurrence): docs from
    // the same source+lang bucket collapse to the lowest doc_id
    "q_dedup_first" -> ((s, dir) => {
      val d = documents(s, dir).select(
        xxhash64(concat(col("source"), lit("|"), col("lang"))).as("urlHash"),
        col("doc_id").as("parentSeq"), lit(0).as("emissionIdx"),
        col("source"), col("lang"))
      Seen.firstOccurrence(d, struct(col("parentSeq"), col("emissionIdx")))
        .select(col("source"), col("lang"), col("parentSeq").as("doc_id"))
        .orderBy("source", "lang")
    }),

    // per-host politeness budget (Politeness.budgetRank): <=2 per host
    "q_politeness_budget" -> ((s, dir) => {
      val frontier = documents(s, dir).select(
        Canon.host(messyUrl(col("doc_id"))).as("host"),
        lit(0).as("priority"), lit(0).as("discoveryRound"),
        col("doc_id").as("parentSeq"), lit(0).as("emissionIdx"),
        col("doc_id"))
      val (under, _) = Politeness.budgetRank(frontier, defaultBudget = 2)
      under.select(col("host"), col("doc_id")).orderBy("host", "doc_id")
    }),

    // the full priority-queue ORDER (north star: window-ranked queues
    // keyed by host/priority/discovery time): varying priority +
    // discoveryRound — best-first (priority asc, discoveryRound asc,
    // parentSeq asc) decides who fits the budget, not arrival order
    "q_priority_rank" -> ((s, dir) => {
      val frontier = documents(s, dir).select(
        Canon.host(messyUrl(col("doc_id"))).as("host"),
        (col("doc_id") % 3).cast("int").as("priority"),
        (col("doc_id") % 2).cast("int").as("discoveryRound"),
        col("doc_id").as("parentSeq"), lit(0).as("emissionIdx"),
        col("doc_id"))
      val (under, _) = Politeness.budgetRank(frontier, defaultBudget = 3)
      under.select(col("host"), col("priority"), col("doc_id"))
        .orderBy("host", "priority", "doc_id")
    }),

    // robots.txt prefix rules (Politeness.robotsFilter): even-source hosts
    // disallow the /docs/1 prefix
    "q_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val frontier = documents(s, dir).select(
        col("doc_id"),
        Canon.canonicalize(messyUrl(col("doc_id"))).as("canonical"))
        .withColumn("host", Canon.host(col("canonical")))
      val robots = (0 until 20).map(h => RobotsRule(
        s"src$h.example.com",
        if (h % 2 == 0) Seq("/docs/1") else Seq.empty,
        0L, 1000)).toDS()
      Politeness.robotsFilter(frontier, robots)
        .select(col("doc_id"), col("host")).orderBy("doc_id")
    }),

    // RFC 9309 wildcards + product-token agent + '*'-group fallback:
    // hosts w0-w3 publish a GraftBot group with '*'/'$' path patterns;
    // w4 publishes ONLY a '*' group (fallback path). Parsed as
    // "GraftBot/1.2" — the group token matches the UA's product token,
    // and where a specific group exists it SHADOWS '*'.
    "q_robots_wildcard" -> ((s, dir) => {
      import s.implicits._
      val i = col("doc_id")
      val paths = Seq("/private/x", "/private/ok", "/private/okk",
        "/public/a", "/dl/file.pdf", "/dl/file.pdfx", "/mixed/a/b",
        "/private")
      val host = concat(lit("w"), (i % 5).cast("string"), lit(".test"))
      val frontier = documents(s, dir).select(
        col("doc_id"),
        concat(lit("http://"), host,
          element_at(array(paths.map(lit): _*), (i % 8).cast("int") + 1))
          .as("canonical"))
        .withColumn("host", Canon.host(col("canonical")))
      val botBody = Seq("User-agent: GraftBot", "Disallow: /private*",
        "Allow: /private/ok$", "Disallow: *.pdf$", "User-agent: *",
        "Disallow: /").mkString("\n")
      val starBody = Seq("User-agent: *", "Disallow: /mixed").mkString("\n")
      val bodies = (0 until 5).map(h =>
        (s"w$h.test", if (h == 4) starBody else botBody))
        .toDF("host", "body")
      val rules = Politeness.parseRobots(bodies, agent = "GraftBot/1.2")
        .withColumn("hostBudget", lit(1000).cast("int"))
        .as[RobotsRule]
      Politeness.robotsFilter(frontier, rules)
        .select(col("doc_id"), col("host")).orderBy("doc_id")
    }),

    // frontier expansion: link spans -> child rows with depth+1, inherited
    // tag, emission order (Handler.linkFollower + RequestQueue semantics)
    "q_frontier_children" -> ((s, dir) => {
      val corpus = docsAsCorpus(s, dir)
      val fetched = corpus.select(
        col("doc_id").as("canonical"), lit("page").as("tag"),
        lit(1).as("depth"), col("spans"))
      val routed = Router(Map.empty[String, Handler],
        fallback = Handler.linkFollower()).apply(fetched)
      routed.select(col("canonical").as("parent_url"), col("depth"),
          posexplode(col("children")).as(Seq("pos", "c")))
        .select(
          col("parent_url"),
          col("c.url").as("child_url"),
          (col("depth") + when(col("c.branch"), 1).otherwise(0)).as("depth"),
          col("c.emissionIdx").as("emission_idx"))
        .orderBy("parent_url", "emission_idx")
    }),

    // multi-round BFS crawl with dedup — the whole engine, end to end;
    // oracle is a recursive CTE. depth = first-visit (min) depth.
    "q_crawl_bfs" -> ((s, dir) => {
      import s.implicits._
      val corpus = docsAsCorpus(s, dir)
      val seeds = Seq(Seed("http://s0.test/d/0", null, 0),
        Seed("http://s1.test/d/1", null, 1))
      val work = java.nio.file.Files.createTempDirectory("graft-bfs").toString
      val cfg = CrawlConfig(maxRounds = 4, maxDepth = 4,
        defaultHostBudget = Int.MaxValue, frontierPartitions = 8,
        useBloomPrefilter = false,
        // r6: gate measures the crawl semantics, not the audit tier —
        // trace output is identical (path/bucket stats are unselected)
        lineageStats = false, trackPath = false)
      val r = CrawlEngine.run(s, corpus, seeds,
        s.emptyDataset[RobotsRule],
        Router(Map.empty, fallback = Handler.linkFollower()), cfg, work)
      r.trace(s).select(col("canonical").as("url"), col("depth"))
        .orderBy("url")
    }),

    // LIFO/DFS crawl (C9; reference examples use InMemDataset::stack(),
    // examples/basic_usage/main.rs:82): dedup-off walk enumeration whose
    // DFS order is carried by the path key (SURVEY §3.4) — ranked
    // identically by a DuckDB recursive CTE ordered by the same key
    "q_crawl_dfs" -> ((s, dir) => {
      import s.implicits._
      val corpus = docsAsCorpus(s, dir)
      val seeds = Seq(Seed("http://s0.test/d/0", null, 0),
        Seed("http://s1.test/d/1", null, 1))
      val work = java.nio.file.Files.createTempDirectory("graft-dfs").toString
      val cfg = CrawlConfig(maxRounds = 3, maxDepth = 3, lifo = true,
        dedup = false, useBloomPrefilter = false, frontierPartitions = 8,
        lineageStats = false) // trackPath stays: path IS the DFS order key
      val r = CrawlEngine.run(s, corpus, seeds, s.emptyDataset[RobotsRule],
        Router(Map.empty, fallback = Handler.linkFollower()), cfg, work)
      import org.apache.spark.sql.expressions.Window
      r.trace(s).select(col("canonical").as("url"), col("depth"),
          row_number().over(Window.orderBy(col("path"))).as("dfs_seq"))
        .orderBy("dfs_seq")
    }),

    // FlowControl conversion matrix (flow_control.rs:117-191 semantics)
    "q_flowcontrol" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0, "unit")
          .when(col("doc_id") % 4 === 1, "duration")
          .when(col("doc_id") % 4 === 2, "error")
          .otherwise("error_query").as("kind"),
        (col("doc_id") % 2 === 0).as("is_err"),
        (col("doc_id") % 7 * 100).cast("long").as("defer_ms_in"),
        // every third error_query carries a TagQuery::List (F10)
        when(col("doc_id") % 3 === 0, lit("list:t1,t2"))
          .otherwise(lit("single:t1")).as("query_tag"))
      d.select(col("doc_id"),
          FlowControl.convert(col("kind"), col("is_err"),
            col("defer_ms_in"), col("query_tag")).as("fc"))
        .select(col("doc_id"), col("fc.outcome").as("outcome"),
          col("fc.deferQuery").as("defer_query"),
          col("fc.deferMs").as("defer_ms"))
        .orderBy("doc_id")
    }),

    // seed intake order, ENGINE-BACKED (S1, runner.rs:110-121): one round
    // over the real engine; trace seq must equal the reversed registration
    "q_seed_order" -> ((s, dir) => {
      import s.implicits._
      val corpus = docsAsCorpus(s, dir)
      val seeds = (0 until 8).map(j => Seed(s"http://s$j.test/d/$j", null, j))
      val work = java.nio.file.Files.createTempDirectory("graft-seed").toString
      val cfg = CrawlConfig(maxRounds = 1, maxDepth = 2,
        frontierPartitions = 8, useBloomPrefilter = false,
        lineageStats = false, trackPath = false)
      val r = CrawlEngine.run(s, corpus, seeds, s.emptyDataset[RobotsRule],
        Router(Map.empty, fallback = Handler.continue), cfg, work)
      r.trace(s).select(col("url"), col("seq")).orderBy("seq")
    }),

    // per-host crawl-delay enforcement in the BATCH engine (north-rule
    // robots rules; apply_defer semantics runner.rs:289-306): 12 seeds on
    // one host, budget 3/round, 2-round delay -> visits at rounds 0,2,4,6
    // in reversed-registration order
    "q_crawl_delay" -> ((s, dir) => {
      import s.implicits._
      val corpus = docsAsCorpus(s, dir)
      val seeds = (0 until 12).map(j => Seed(s"http://delay.test/d/$j", null, j))
      val robots = Seq(RobotsRule("delay.test", Seq.empty,
        crawlDelayMs = 2000L, hostBudget = 3)).toDS()
      val work = java.nio.file.Files.createTempDirectory("graft-delay").toString
      val cfg = CrawlConfig(maxRounds = 8, maxDepth = 2, msPerRound = 1000L,
        frontierPartitions = 8, useBloomPrefilter = false,
        lineageStats = false, trackPath = false)
      val r = CrawlEngine.run(s, corpus, seeds, robots,
        Router(Map.empty, fallback = Handler.continue), cfg, work)
      r.trace(s).select(col("url"), col("seq"), col("round")).orderBy("seq")
    }),

    // link-graph degree stats (graph.GraphOps.degrees) over the
    // deterministic 3-out-degree doc graph — the crawler's own output
    // table feeding corpus analytics
    "q_graph_degree" -> ((s, dir) => {
      val d = documents(s, dir)
      val n = d.count()
      graft.graph.GraphOps.degrees(edgesDf(d, n)).orderBy("node")
    }),

    // fixed-point integer PageRank, 3 iterations (GraphOps.pageRank):
    // crawl-priority recomputation from the link graph. Exact-arith
    // (Long div/sum only) => bit-identical at any parallelism; the oracle
    // is the same recurrence unrolled as CTEs with DuckDB `//`.
    "q_pagerank" -> ((s, dir) => {
      val d = documents(s, dir)
      val n = d.count()
      graft.graph.GraphOps.pageRank(
        d.select(col("doc_id").as("id")), edgesDf(d, n), iterations = 3)
        .orderBy("node")
    }),

    // label-propagation connected components (GraphOps.labelPropagation),
    // 4 iterations over a disconnected K-residue chain graph (i <-> i+16
    // below the largest multiple of 16). After k iterations the label is
    // the min of the k-hop neighborhood: label(i) = max(i - 4*16, i % 16)
    // on chain nodes, i elsewhere — the oracle's closed form.
    "q_cc_labels" -> ((s, dir) => {
      val d = documents(s, dir)
      val n = d.count()
      val k = 16L
      val m = n - (n % k)
      val chain = d.filter(col("doc_id") + k < m)
        .select(col("doc_id").as("src"), (col("doc_id") + k).as("dst"))
      graft.graph.GraphOps.labelPropagation(
        d.select(col("doc_id").as("id")), chain, iterations = 4)
        .orderBy("node")
    }),

    // robots.txt PARSER (Politeness.parseRobots): raw bodies -> per-host
    // rules via a declarative group-scan (per-host running-sum window).
    // Bodies are generated deterministically per host; the oracle is the
    // hand-derived closed form of what the grammar says they parse to —
    // googlebot-only groups excluded, comments stripped, empty Disallow
    // ignored, second star group merged, Crawl-delay seconds -> ms.
    // The main group is opened by STACKED user-agent lines
    // ('GrAfTbOt' directly over '*' — one shared group per RFC 9309),
    // and a second parse as agent 'graftbot' must pick up that same
    // group case-insensitively but NOT the star-only repeat group.
    "q_robots_parse" -> ((s, dir) => {
      val i = col("doc_id")
      val body = concat_ws("\n",
        lit("# robots"),
        lit("User-agent: googlebot"),
        lit("Disallow: /bot-only"),
        lit("User-agent: GrAfTbOt"),
        lit("User-agent: *"),
        concat(lit("Disallow: /admin/"), i.cast("string")),
        lit("Disallow: /x # inline"),
        lit("Allow: /public"),
        lit("Disallow:"),
        when(i % 2 === 0,
          concat(lit("Crawl-delay: "), (lit(1) + i % 5).cast("string"))),
        when(i % 3 === 0, lit("User-agent: *")),
        when(i % 3 === 0,
          concat(lit("Disallow: /tmp/"), (i % 4).cast("string"))))
      val bodies = documents(s, dir).filter(col("doc_id") < 20)
        .select(concat(lit("h"), i.cast("string")).as("host"),
          body.as("body"))
      val star = Politeness.parseRobots(bodies)
        .select(col("host"),
          array_join(col("disallow"), "|").as("disallow_str"),
          array_join(col("allow"), "|").as("allow_str"),
          col("crawlDelayMs").as("crawl_delay_ms"))
      val bot = Politeness.parseRobots(bodies, agent = "graftbot")
        .select(col("host"),
          array_join(col("disallow"), "|").as("bot_disallow_str"))
      star.join(bot, Seq("host")).orderBy("host")
    }),

    // Selector-style element/attribute extraction (TextSelect — the
    // reference's Elements<Select>, todo!()-stubbed there, semantics
    // reconstructed): generated markup exercises case-insensitive tag
    // match (<A>), quoted/unquoted/bare attributes, and per-element
    // attribute maps; oracle is the closed form of the attribute grammar
    "q_select_attrs" -> ((s, dir) => {
      import graft.text.TextSelect
      val i = col("doc_id")
      val html = concat(
        lit("<html><body><A HREF=\"/u"), i.cast("string"),
        lit("\" class='nav'>x</A>"),
        lit("<img src=img"), i.cast("string"), lit(".png width=10>"),
        when(i % 2 === 0,
          concat(lit("<a href='/v"), (i % 7).cast("string"),
            lit("' data-x>y</a>"))).otherwise(lit("")),
        lit("<abbr title=\"t\">z</abbr></body></html>"))
      val anchors = TextSelect.selectAttrs(col("_html"), "a")
      val img1 = element_at(TextSelect.selectAttrs(col("_html"), "img"), 1)
      documents(s, dir).withColumn("_html", html)
        .select(i.as("doc_id"),
          array_join(TextSelect.selectAttr(col("_html"), "a", "href"), "|")
            .as("a_hrefs"),
          size(anchors).as("a_count"),
          element_at(img1, "src").as("img_src"),
          element_at(img1, "width").as("img_width"),
          when(size(anchors) >= 2,
            array_join(map_keys(element_at(anchors, 2)), ","))
            .otherwise(lit("")).as("a2_keys"))
        .orderBy("doc_id")
    }),

    // Composed link harvest — the scraper user story end to end:
    // selector extraction (TextSelect) -> URL canonicalization (Canon,
    // messy scheme/host case + default port + unsorted query) -> drop
    // non-absolute hrefs (canonicalize -> null) -> per-host dedup
    // counts. One codegen'd projection + one host-keyed aggregate.
    "q_extract_links" -> ((s, dir) => {
      import graft.text.TextSelect
      val i = col("doc_id")
      val html = concat(
        lit("<html><body><a href=\"HTTP://Host"), (i % 10).cast("string"),
        lit(".Test:80/p/"), (i % 100).cast("string"),
        lit("?b=2&a=1\">x</a><a href='/rel/"), i.cast("string"),
        lit("'>r</a></body></html>"))
      documents(s, dir).withColumn("_html", html)
        .select(explode(TextSelect.selectAttr(col("_html"), "a", "href"))
          .as("href"))
        .select(Canon.canonicalize(col("href")).as("canonical"))
        .filter(col("canonical").isNotNull)
        .groupBy(Canon.host(col("canonical")).as("host"))
        .agg(countDistinct(col("canonical")).as("distinct_urls"),
          count(lit(1)).as("total_refs"))
        .orderBy("host")
    }),

    // HTML -> visible text extraction (TextExtract.HtmlToText): generated
    // markup with script/style/comment noise and entities; oracle is the
    // closed form of what the extractor leaves behind
    "q_html_text" -> ((s, dir) => {
      val i = col("doc_id")
      val html = concat(
        lit("<!-- header comment --><html><head><style>p{x:1}</style>"),
        lit("</head><body><h1>Title "), i.cast("string"), lit("</h1>"),
        when(i % 2 === 0, lit("<script>var a = '<p>';</script>"))
          .otherwise(lit("")),
        lit("<p>alpha &amp; beta</p><p>x &lt; y &#62; z&nbsp;!</p>"),
        lit("</body></html>"))
      documents(s, dir).select(i.as("doc_id"),
        graft.text.TextExtract.htmlText(html).as("text"))
        .orderBy("doc_id")
    }),

    // REAL image-header sniffing (Media.sniffImage / MediaExpr): payloads
    // carry genuine PNG/GIF/JPEG header bytes built from closed-form
    // dims; the fused sniffer parses them back. The oracle is the
    // closed form — format routing + resolution filtering at 100TB
    // without paying a decode.
    "q_media_sniff" -> ((s, dir) => {
      val i = col("doc_id")
      val w = (lit(100) + i % 50).cast("int")
      val h = (lit(50) + i % 75).cast("int")
      val fmt = when(i % 3 === 0, lit("png"))
        .when(i % 3 === 1, lit("gif")).otherwise(lit("jpeg"))
      val media = documents(s, dir).select(i.as("media_id"),
        graft.multimodal.Media.headeredPayload(fmt, w, h,
          encode(substring(col("text"), 1, 16), "UTF-8")).as("payload"))
      media.select(col("media_id"),
        graft.multimodal.Media.sniffImage(col("payload")).as("s"))
        .select(col("media_id"), col("s.format").as("format"),
          col("s.width").as("width"), col("s.height").as("height"))
        .orderBy("media_id")
    }),

    // sitemap ingestion (WebIngest.sitemapUrls): urlset + sitemap-index
    // <loc> extraction, document order, whitespace-trimmed — the other
    // bootstrap source next to robots.txt. Closed-form oracle over the
    // generated XML.
    "q_sitemap" -> ((s, dir) => {
      val i = col("doc_id")
      val urlEntries = (0 to 2).map(j =>
        when(i % 3 >= j, concat(
          lit("<url><loc> http://h"), i.cast("string"),
          lit(s".test/p/$j </loc><lastmod>2026-01-01</lastmod></url>"))))
      val idx = when(i % 2 === 0, concat(
        lit("<sitemap><loc>http://h"), i.cast("string"),
        lit(".test/sm-"), (i % 4).cast("string"), lit(".xml</loc></sitemap>")))
      val body = concat_ws("\n",
        (Seq(lit("<?xml version=\"1.0\"?>"), lit("<urlset>"), idx) ++
          urlEntries :+ lit("</urlset>")): _*)
      val bodies = documents(s, dir).filter(col("doc_id") < 10)
        .select(concat(lit("h"), i.cast("string")).as("host"), body.as("body"))
      graft.engine.WebIngest.sitemapUrls(bodies)
        .orderBy("host", "kind", "ord")
    }),

    // interleaved-payload document reconstruction: text spans of the
    // engine corpus, offset-ordered, rejoined to the document's text.
    // Order comes from array_sort on (offset, text) — a per-row Catalyst
    // expression, NOT a per-doc aggregation (no groupBy shuffle; spans
    // already live in the row)
    "q_spans_text" -> ((s, dir) => {
      val n = documents(s, dir).count()
      graft.corpus.Corpus.docs(s, graft.corpus.Corpus.Spec(nDocs = n))
        .select(col("doc_id"),
          array_join(
            transform(
              array_sort(transform(
                filter(col("spans"), sp => sp("kind") === lit("text")),
                sp => struct(sp("offset").as("o"), sp("text").as("t")))),
              x => x("t")),
            " ").as("text"))
        .orderBy("doc_id")
    })
  )

  /** Deterministic doc-graph edges: i -> (i*m + a) % n per edgeMults
    * (same formula in SQL via [[edgesSql]]).
    */
  private def edgesDf(d: DataFrame, n: Long): DataFrame =
    edgeMults.map { case (m, a) =>
      d.select(col("doc_id").as("src"),
        ((col("doc_id") * m + a) % n).as("dst"))
    }.reduce(_ unionByName _)

  private def edgesSql: String = edgeMults.map { case (m, a) =>
    s"SELECT doc_id AS src, (doc_id * $m + $a) % (SELECT c FROM nn) AS dst" +
      " FROM documents"
  }.mkString(" UNION ALL ")

  /** The PageRank recurrence of GraphOps.pageRank unrolled as DuckDB CTEs
    * (generated from the same constants so the two sides cannot drift).
    */
  private def pagerankSql(iters: Int, d20: Int = 17): String = {
    val scale = graft.graph.GraphOps.RankScale
    val base = (scale * (20 - d20)) / 20
    val sb = new StringBuilder
    sb ++= "WITH nn AS (SELECT count(*) AS c FROM documents), "
    sb ++= s"edges AS ($edgesSql), "
    sb ++= "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), "
    sb ++= s"r0 AS (SELECT doc_id AS node, CAST($scale AS BIGINT) AS rank" +
      " FROM documents)"
    for (k <- 1 to iters) {
      sb ++= s", c$k AS (SELECT e.dst AS node," +
        " CAST(SUM(r.rank // g.d) AS BIGINT) AS m" +
        s" FROM edges e JOIN deg g ON e.src = g.src" +
        s" JOIN r${k - 1} r ON r.node = e.src GROUP BY e.dst)"
      sb ++= s", r$k AS (SELECT d.doc_id AS node," +
        s" CAST($base + ($d20 * COALESCE(c.m, 0)) // 20 AS BIGINT) AS rank" +
        s" FROM documents d LEFT JOIN c$k c ON c.node = d.doc_id)"
    }
    sb ++= s" SELECT node, rank FROM r$iters ORDER BY node"
    sb.toString
  }

  // ---------- DuckDB oracles ----------

  private def crawlOracleSql: Map[String, String] = Map(
    "q_recrawl" ->
      """WITH hist AS (
           SELECT doc_id % 97 AS u, doc_id // 97 AS round FROM documents),
         h2 AS (
           SELECT concat('http://h', CAST(u % 10 AS VARCHAR), '.test/r/',
                    CAST(u AS VARCHAR)) AS url,
                  concat('h', CAST(u % 10 AS VARCHAR)) AS host,
                  round,
                  CAST(u * 31 + (round // (1 + u % 3)) AS VARCHAR)
                    AS content_hash
           FROM hist),
         lagged AS (
           SELECT *, lag(content_hash)
                       OVER (PARTITION BY url ORDER BY round) AS ph
           FROM h2),
         stats AS (
           SELECT url, min(host) AS host,
                  CAST(count(*) AS BIGINT) AS visits,
                  CAST(sum(CASE WHEN ph IS NOT NULL AND ph <> content_hash
                                THEN 1 ELSE 0 END) AS BIGINT) AS changes,
                  max(round) AS last_round
           FROM lagged GROUP BY url),
         cur AS (SELECT max(doc_id // 97) + 1 AS c FROM documents),
         scored AS (
           SELECT s.*, (SELECT c FROM cur) - last_round AS staleness,
                  (changes * ((SELECT c FROM cur) - last_round) * 1000)
                    // greatest(visits - 1, 1) AS priority_milli
           FROM stats s),
         ranked AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY host
                       ORDER BY priority_milli DESC, staleness DESC, url)
                     AS INT) AS revisit_rank
           FROM scored)
         SELECT host, revisit_rank, url, visits, changes, staleness,
                priority_milli
         FROM ranked WHERE revisit_rank <= 5
         ORDER BY host, revisit_rank""",

    "q_redirects" ->
      """WITH RECURSIVE e AS (
           SELECT concat('http://r.test/u/', CAST(doc_id AS VARCHAR)) AS src,
                  concat('http://r.test/u/',
                    CAST(CASE WHEN doc_id % 8 <> 0 THEN doc_id - 1
                              ELSE doc_id + 7 END AS VARCHAR)) AS dst
           FROM documents
           WHERE doc_id % 8 <> 0 OR (doc_id // 8) % 5 = 0),
         walk(src, cur, hops) AS (
           SELECT src, dst, 1 FROM e
           UNION ALL
           SELECT w.src, e2.dst, w.hops + 1
           FROM walk w JOIN e e2 ON e2.src = w.cur
           WHERE w.hops < 4),
         res AS (
           SELECT w.src, w.cur, w.hops
           FROM walk w
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.cur)
             AND w.hops <= 4)
         SELECT e.src AS url, r.cur AS final_url,
                CAST(r.hops AS BIGINT) AS hops,
                (r.src IS NULL) AS looped
         FROM e LEFT JOIN res r ON r.src = e.src
         ORDER BY url""",

    // effective ternary tree bounded at depth 3: the 200 rows are the
    // tree's clean pages in BOTH phases; the 301 rows (aliases, fetched
    // at the depth of the link that introduced them) exist in phase 1
    // only — phase 2's warm-started ledger pre-resolves every chain.
    "q_redirect_crawl" ->
      """WITH RECURSIVE tree(id, d) AS (
           SELECT CAST(0 AS BIGINT) AS id, 1 AS d
           UNION ALL
           SELECT t.id * 3 + k.k, t.d + 1
           FROM tree t CROSS JOIN (VALUES (1), (2), (3)) k(k)
           WHERE t.d < 3
             AND t.id * 3 + k.k < (SELECT count(*) FROM documents)),
         oks AS (
           SELECT concat('http://t', CAST(id % 3 AS VARCHAR), '.test/c/',
                    CAST(id AS VARCHAR)) AS url,
                  200 AS status, d FROM tree),
         redirs AS (
           SELECT concat('http://a.test/a/', CAST(id AS VARCHAR)) AS url,
                  301 AS status, d
           FROM tree WHERE d >= 2 AND id % 2 = 1
           UNION ALL
           SELECT concat('http://b.test/b/', CAST(id AS VARCHAR)),
                  301, d
           FROM tree WHERE d >= 2 AND id % 4 = 3)
         SELECT phase, url, CAST(status AS INT) AS status,
                CAST(d AS INT) AS depth
         FROM (SELECT 1 AS phase, * FROM oks
               UNION ALL SELECT 1, * FROM redirs
               UNION ALL SELECT 2, * FROM oks)
         ORDER BY phase, url""",

    // epoch 0 = seeds 0..5 + their link targets; epoch 1 = top-1 per
    // host by url (priorities all 0 after one visit); epoch 2 stats from
    // the two visits: docs with doc_id % 3 = 0 changed between epochs
    // (title '#0' -> '#1'), so changes=1 iff revisited and % 3 = 0.
    "q_recrawl_e2e" -> {
      val n = "(SELECT count(*) FROM documents)"
      val kids = edgeMults.map { case (m, a) =>
        s"SELECT (id * $m + $a) % $n AS id FROM seedids"
      }.mkString(" UNION ALL ")
      s"""WITH seedids AS (
            SELECT CAST(doc_id AS BIGINT) AS id FROM documents
            WHERE doc_id < 6),
          v0 AS (
            SELECT DISTINCT id FROM
              (SELECT id FROM seedids UNION ALL $kids)),
          u0 AS (
            SELECT id, ${cleanUrlSql("id")} AS url,
                   CAST(id % 20 AS VARCHAR) AS host FROM v0),
          v1 AS (
            SELECT id FROM (
              SELECT id, row_number() OVER
                (PARTITION BY host ORDER BY url) AS rk FROM u0)
            WHERE rk = 1),
          st AS (
            SELECT u0.id, u0.url, u0.host,
              CASE WHEN v1.id IS NOT NULL THEN 2 ELSE 1 END AS visits,
              CASE WHEN v1.id IS NOT NULL AND u0.id % 3 = 0
                   THEN 1 ELSE 0 END AS changes,
              CASE WHEN v1.id IS NOT NULL THEN 1 ELSE 2 END AS staleness
            FROM u0 LEFT JOIN v1 ON u0.id = v1.id),
          r2 AS (
            SELECT *,
              (changes * staleness * 1000)
                // GREATEST(visits - 1, 1) AS priority_milli,
              row_number() OVER (PARTITION BY host ORDER BY
                (changes * staleness * 1000) // GREATEST(visits - 1, 1)
                  DESC,
                staleness DESC, url) AS revisit_rank
            FROM st)
          SELECT r2.url, CAST(visits AS BIGINT) AS visits,
                 CAST(changes AS BIGINT) AS changes,
                 CAST(staleness AS BIGINT) AS staleness,
                 CAST(priority_milli AS BIGINT) AS priority_milli,
                 CAST(revisit_rank AS INT) AS revisit_rank,
                 concat(d.text,
                   CASE WHEN r2.id % 3 = 0 THEN '#2' ELSE '' END) AS title
          FROM r2 JOIN documents d ON d.doc_id = r2.id
          WHERE revisit_rank <= 1
          ORDER BY url"""
    },

    "q_url_traps" ->
      """SELECT doc_id,
           CAST(doc_id % 15 + CASE WHEN doc_id % 6 = 0 THEN 3 ELSE 0 END
                AS INT) AS depth,
           CAST(CASE WHEN doc_id % 6 = 0 THEN 3
                     WHEN doc_id % 15 > 0 THEN 1
                     ELSE 0 END AS INT) AS max_run,
           CAST(doc_id % 10 AS INT) AS params,
           (doc_id % 6 = 0
            OR (doc_id % 15
                + CASE WHEN doc_id % 6 = 0 THEN 3 ELSE 0 END) >= 12
            OR doc_id % 10 >= 8) AS is_trap
         FROM documents ORDER BY doc_id""",

    "q_anchor_text" ->
      """WITH a0 AS (
           SELECT doc_id, 0 AS ord,
             concat('HTTP://Host', CAST(doc_id % 10 AS VARCHAR),
               '.Test:80/p/', CAST(doc_id % 50 AS VARCHAR),
               '?b=2&a=1') AS href,
             concat('http://host', CAST(doc_id % 10 AS VARCHAR),
               '.test/p/', CAST(doc_id % 50 AS VARCHAR),
               '?a=1&b=2') AS canonical,
             'Go now & fast' AS text
           FROM documents),
         a1 AS (
           SELECT doc_id, 1 AS ord,
             concat('/rel/', CAST(doc_id AS VARCHAR)) AS href,
             CAST(NULL AS VARCHAR) AS canonical,
             concat('rel ', CAST(doc_id AS VARCHAR)) AS text
           FROM documents WHERE doc_id % 3 = 0)
         SELECT doc_id, CAST(ord AS INT) AS ord, href, canonical, text
         FROM (SELECT * FROM a0 UNION ALL SELECT * FROM a1)
         ORDER BY doc_id, ord""",

    "q_canon" ->
      s"""SELECT doc_id, $canonicalSql AS canonical
         FROM documents ORDER BY doc_id""",

    "q_canon_deep" ->
      """SELECT doc_id, 'http://deep.test/x?a=1&b=2' AS canonical
         FROM documents ORDER BY doc_id""",

    "q_canon_host" ->
      s"""SELECT doc_id,
           concat('src', CAST(doc_id % 20 AS VARCHAR), '.example.com') AS host,
           'http' AS scheme
         FROM documents ORDER BY doc_id""",

    "q_dedup_seen" ->
      s"""SELECT doc_id, $canonicalSql AS canonical
         FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM documents s
                           WHERE s.doc_id % 3 = 0 AND s.doc_id = d.doc_id)
         ORDER BY doc_id""",

    // DuckDB's generate_series cannot take lateral column bounds: generate
    // the max-width series (nText<=3, nMedia<=1, outDeg<=6) and filter.
    // "offset" is a DuckDB reserved word — quoted so the result column
    // matches the Spark side's name for the hash compare.
    "q_spans_seq" -> {
      val n = "(SELECT count(*) FROM documents)"
      s"""WITH ids AS (SELECT doc_id AS i FROM documents),
          spans AS (
            SELECT i, CAST(g AS BIGINT) AS ord, 'text' AS kind,
                   concat('t', CAST(${mix2Sql("i * 7 + g", 6)} AS VARCHAR))
                     AS text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM ids, generate_series(0, 2) t(g) WHERE g < ${nTextSql("i")}
            UNION ALL
            SELECT i, ${nTextSql("i")} + g, 'media',
                   concat('alt', CAST(${mix2Sql("i * 11 + g", 8)} AS VARCHAR)),
                   concat('m://b/', CAST(${mix2Sql("i * 13 + g", 9)} AS VARCHAR))
            FROM ids, generate_series(0, 0) m(g) WHERE g < ${nMediaSql("i")}
            UNION ALL
            SELECT i, ${nTextSql("i")} + ${nMediaSql("i")} + g, 'link',
                   concat('anchor', CAST(g AS VARCHAR)),
                   ${corpusUrlSql(s"${mix2Sql("i * 31 + g", 4)} % $n")}
            FROM ids, generate_series(0, 5) l(g) WHERE g < ${outDegSql("i")})
          SELECT ${corpusUrlSql("i")} AS doc_id, kind, text, media_ref,
                 CAST(ord AS INT) AS "offset"
          FROM spans ORDER BY doc_id, "offset""""
    },

    "q_dedup_cuckoo" ->
      s"""SELECT doc_id, $canonicalSql AS canonical
         FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM documents s
                           WHERE s.doc_id % 3 = 0 AND s.doc_id = d.doc_id)
         ORDER BY doc_id""",

    "q_dedup_first" ->
      """SELECT source, lang, CAST(min(doc_id) AS BIGINT) AS doc_id
         FROM documents GROUP BY source, lang ORDER BY source, lang""",

    "q_politeness_budget" ->
      """SELECT host, doc_id FROM (
           SELECT concat('src', CAST(doc_id % 20 AS VARCHAR),
                    '.example.com') AS host,
                  doc_id,
                  row_number() OVER (
                    PARTITION BY doc_id % 20 ORDER BY doc_id) AS rk
           FROM documents) t
         WHERE rk <= 2 ORDER BY host, doc_id""",

    "q_priority_rank" ->
      """SELECT host, priority, doc_id FROM (
           SELECT concat('src', CAST(doc_id % 20 AS VARCHAR),
                    '.example.com') AS host,
                  CAST(doc_id % 3 AS INT) AS priority,
                  doc_id,
                  row_number() OVER (
                    PARTITION BY doc_id % 20
                    ORDER BY doc_id % 3, doc_id % 2, doc_id) AS rk
           FROM documents) t
         WHERE rk <= 3 ORDER BY host, priority, doc_id""",

    "q_robots_filter" ->
      s"""SELECT doc_id,
            concat('src', CAST(doc_id % 20 AS VARCHAR), '.example.com') AS host
         FROM documents
         WHERE NOT (doc_id % 40 IN (0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20,
                                    22, 24, 26, 28, 30, 32, 34, 36, 38)
                    AND starts_with(concat('/docs/', CAST(doc_id AS VARCHAR)),
                                    '/docs/1'))
         ORDER BY doc_id""",

    // path classes (doc_id % 8): 0 /private/x D:/private*(9); 1
    // /private/ok A:/private/ok$(12) beats D(9); 2 /private/okk ($
    // stops the allow); 3 /public/a unmatched; 4 /dl/file.pdf
    // D:*.pdf$(6); 5 /dl/file.pdfx ($ anchor fails); 6 /mixed/a/b; 7
    // /private (trailing * matches empty). Host w4 (doc_id % 5 = 4)
    // fell back to its '*' group, which only blocks /mixed*.
    "q_robots_wildcard" ->
      """SELECT doc_id,
           'w' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS host
         FROM documents
         WHERE (doc_id % 5 = 4 AND doc_id % 8 <> 6)
            OR (doc_id % 5 <> 4 AND doc_id % 8 IN (1, 3, 5, 6))
         ORDER BY doc_id""",

    "q_frontier_children" -> {
      val targets = edgeMults.zipWithIndex.map { case ((m, a), ix) =>
        s"""SELECT ${cleanUrlSql("doc_id")} AS parent_url,
              ${cleanUrlSql(s"(doc_id * $m + $a) % (SELECT count(*) FROM documents)")}
                AS child_url,
              2 AS depth, $ix AS emission_idx
            FROM documents"""
      }.mkString(" UNION ALL ")
      s"""SELECT parent_url, child_url, depth, emission_idx FROM ($targets)
          ORDER BY parent_url, emission_idx"""
    },

    "q_crawl_bfs" -> {
      val n = "(SELECT count(*) FROM documents)"
      val edges = edgeMults.map { case (m, a) =>
        s"SELECT doc_id AS src, (doc_id * $m + $a) % $n AS dst FROM documents"
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE edges AS ($edges),
         bfs(id, depth) AS (
           SELECT * FROM (VALUES (0, 1), (1, 1)) v(id, depth)
           UNION
           SELECT e.dst, b.depth + 1
           FROM bfs b JOIN edges e ON e.src = b.id
           WHERE b.depth + 1 <= 4)
         SELECT ${cleanUrlSql("id")} AS url, CAST(min(depth) AS INT) AS depth
         FROM bfs GROUP BY id ORDER BY url"""
    },

    "q_crawl_dfs" -> {
      val n = "(SELECT count(*) FROM documents)"
      val edges = edgeMults.zipWithIndex.map { case ((m, a), ix) =>
        s"""SELECT doc_id AS src, (doc_id * $m + $a) % $n AS dst,
              $ix AS ix FROM documents"""
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE edges AS ($edges),
          walks(id, depth, path) AS (
            SELECT id, 1, [CAST(id AS BIGINT)]
            FROM (VALUES (0), (1)) v(id)
            UNION ALL
            SELECT e.dst, w.depth + 1,
              list_append(w.path, CAST(-e.ix AS BIGINT))
            FROM walks w JOIN edges e ON e.src = w.id
            WHERE w.depth + 1 <= 3)
          SELECT ${cleanUrlSql("id")} AS url, CAST(depth AS INT) AS depth,
            CAST(row_number() OVER (ORDER BY path) AS INT) AS dfs_seq
          FROM walks ORDER BY dfs_seq"""
    },

    "q_flowcontrol" ->
      """SELECT doc_id,
           CASE
             WHEN doc_id % 4 = 0 AND doc_id % 2 = 0 THEN 'skip'
             WHEN doc_id % 4 = 0 THEN 'continue'
             WHEN doc_id % 4 = 1 AND doc_id % 2 = 0 THEN 'hold'
             WHEN doc_id % 4 = 1 THEN 'wait'
             WHEN doc_id % 4 = 2 THEN 'hold'
             ELSE 'fail' END AS outcome,
           CASE
             WHEN doc_id % 4 = 0 THEN NULL
             WHEN doc_id % 4 = 1 THEN 'owner'
             WHEN doc_id % 4 = 2 THEN 'owner'
             WHEN doc_id % 3 = 0 THEN 'list:t1,t2'
             ELSE 'single:t1' END AS defer_query,
           CAST(CASE WHEN doc_id % 4 = 1 THEN (doc_id % 7) * 100
                ELSE 0 END AS BIGINT) AS defer_ms
         FROM documents ORDER BY doc_id""",

    "q_seed_order" ->
      s"""SELECT concat('http://s', CAST(doc_id AS VARCHAR), '.test/d/',
                 CAST(doc_id AS VARCHAR)) AS url,
            CAST(7 - doc_id AS BIGINT) AS seq
         FROM documents WHERE doc_id < 8 ORDER BY seq""",

    // seed j has emissionIdx 11-j (reversed registration); budget 3/round
    // in emissionIdx order; a scheduled round arms a 2-round delay =>
    // group g = (11-j) // 3 runs at round 2g with seq 11-j
    "q_crawl_delay" ->
      """SELECT concat('http://delay.test/d/', CAST(doc_id AS VARCHAR)) AS url,
            CAST(11 - doc_id AS BIGINT) AS seq,
            CAST(2 * ((11 - doc_id) // 3) AS INT) AS round
         FROM documents WHERE doc_id < 12 ORDER BY seq""",

    "q_graph_degree" ->
      s"""WITH nn AS (SELECT count(*) AS c FROM documents),
          edges AS ($edgesSql),
          o AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY src),
          i AS (SELECT dst AS node, count(*) AS in_deg FROM edges GROUP BY dst)
          SELECT COALESCE(o.node, i.node) AS node,
                 CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
                 CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
          FROM o FULL OUTER JOIN i ON o.node = i.node ORDER BY node""",

    "q_pagerank" -> pagerankSql(3),

    // closed form of 4 min-propagation iterations on the i <-> i+16 chain
    // graph: the 4-hop neighborhood of chain node i is {i-64..i+64 step 16}
    // clipped to [i%16, m), whose min is max(i-64, i%16)
    "q_cc_labels" ->
      """WITH nn AS (SELECT count(*) AS c FROM documents)
         SELECT doc_id AS node,
                CAST(CASE WHEN doc_id < (SELECT c - (c % 16) FROM nn)
                     THEN GREATEST(doc_id - 64, doc_id % 16)
                     ELSE doc_id END AS BIGINT) AS label
         FROM documents ORDER BY node""",

    "q_robots_parse" ->
      """SELECT concat('h', CAST(doc_id AS VARCHAR)) AS host,
            concat('/admin/', CAST(doc_id AS VARCHAR), '|/x',
                   CASE WHEN doc_id % 3 = 0
                        THEN concat('|/tmp/', CAST(doc_id % 4 AS VARCHAR))
                        ELSE '' END) AS disallow_str,
            '/public' AS allow_str,
            CAST(CASE WHEN doc_id % 2 = 0 THEN (1 + doc_id % 5) * 1000
                 ELSE 0 END AS BIGINT) AS crawl_delay_ms,
            concat('/admin/', CAST(doc_id AS VARCHAR), '|/x')
              AS bot_disallow_str
         FROM documents WHERE doc_id < 20 ORDER BY host""",

    "q_select_attrs" ->
      """SELECT doc_id,
            concat('/u', CAST(doc_id AS VARCHAR),
                   CASE WHEN doc_id % 2 = 0
                        THEN concat('|/v', CAST(doc_id % 7 AS VARCHAR))
                        ELSE '' END) AS a_hrefs,
            CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT)
              AS a_count,
            concat('img', CAST(doc_id AS VARCHAR), '.png') AS img_src,
            '10' AS img_width,
            CASE WHEN doc_id % 2 = 0 THEN 'href,data-x' ELSE '' END
              AS a2_keys
         FROM documents ORDER BY doc_id""",

    "q_extract_links" ->
      """WITH urls AS (
           SELECT concat('http://host', CAST(doc_id % 10 AS VARCHAR),
                         '.test/p/', CAST(doc_id % 100 AS VARCHAR),
                         '?a=1&b=2') AS canonical,
                  concat('host', CAST(doc_id % 10 AS VARCHAR), '.test')
                    AS host
           FROM documents)
         SELECT host,
                CAST(COUNT(DISTINCT canonical) AS BIGINT) AS distinct_urls,
                CAST(COUNT(*) AS BIGINT) AS total_refs
         FROM urls GROUP BY host ORDER BY host""",

    "q_html_text" ->
      """SELECT doc_id,
            concat('Title ', CAST(doc_id AS VARCHAR),
                   ' alpha & beta x < y > z !') AS text
         FROM documents ORDER BY doc_id""",

    "q_media_sniff" ->
      """SELECT doc_id AS media_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                 ELSE 'jpeg' END AS format,
            CAST(100 + doc_id % 50 AS INT) AS width,
            CAST(50 + doc_id % 75 AS INT) AS height
         FROM documents ORDER BY media_id""",

    "q_sitemap" ->
      """WITH h AS (SELECT doc_id AS i FROM documents WHERE doc_id < 10),
          idx AS (SELECT concat('h', CAST(i AS VARCHAR)) AS host,
                         'index' AS kind, 0 AS ord,
                         concat('http://h', CAST(i AS VARCHAR), '.test/sm-',
                                CAST(i % 4 AS VARCHAR), '.xml') AS url
                  FROM h WHERE i % 2 = 0),
          urls AS (SELECT concat('h', CAST(i AS VARCHAR)) AS host,
                          'url' AS kind, CAST(g AS INT) AS ord,
                          concat('http://h', CAST(i AS VARCHAR), '.test/p/',
                                 CAST(g AS VARCHAR)) AS url
                   FROM h, generate_series(0, 2) t(g) WHERE g <= i % 3)
         SELECT host, kind, ord, url
         FROM (SELECT * FROM idx UNION ALL SELECT * FROM urls)
         ORDER BY host, kind, ord""",

    "q_spans_text" -> {
      s"""WITH ids AS (SELECT doc_id AS i FROM documents),
          t AS (SELECT i, g AS ord,
                  concat('t', CAST(${mix2Sql("i * 7 + g", 6)} AS VARCHAR))
                    AS txt
                FROM ids, generate_series(0, 2) s(g)
                WHERE g < ${nTextSql("i")})
          SELECT ${corpusUrlSql("i")} AS doc_id,
                 string_agg(txt, ' ' ORDER BY ord) AS text
          FROM t GROUP BY i ORDER BY doc_id"""
    }
  )
}
