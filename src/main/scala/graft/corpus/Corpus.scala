package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Doc, RobotsRule, Seed, Span}

/** Deterministic synthetic crawl corpus (FIXTURES.md §1): an
  * interleaved-docs table `docs(doc_id, spans)` whose link graph, host
  * skew, out-degrees and span mix are all pure functions of `doc_id`
  * through a 31-bit LCG. Two implementations of the SAME spec:
  *
  *  - [[Corpus.docs]]: distributed, pure Catalyst expressions over
  *    `spark.range(n)` — scales to any n (bench uses 10^6..10^7 rows as
  *    the sandbox stand-in for the 10^10 design point).
  *  - [[Corpus.docsLocal]]: plain-Scala rows, used by the sequential
  *    reference oracle (SURVEY §3.4) and unit tests.
  *
  * Tests assert the two are identical row-for-row, which is what makes the
  * golden-trace comparison meaningful.
  *
  * The LCG keeps every intermediate < 2^62 so the arithmetic is exact in
  * Spark (ANSI-safe), Scala, and DuckDB alike.
  */
object Corpus {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  /** Deterministic corpus shape parameters. */
  case class Spec(
      nDocs: Long,
      nHosts: Int = 50,
      maxLinks: Int = 6,
      hotHostPct: Int = 25 // % of docs mapped to host 0 (skew)
  )

  // ---- scalar spec (single source of truth, mirrored as Columns below) ----
  def mix(x: Long): Long = (x * A + C) % M
  def mix2(x: Long, salt: Long): Long = mix(mix(x % M) + salt)

  def hostId(i: Long, s: Spec): Long =
    if (mix2(i, 1) % 100 < s.hotHostPct) 0L else mix2(i, 2) % s.nHosts
  def hostName(h: Long): String = s"h$h.test"
  def url(i: Long, s: Spec): String =
    s"http://${hostName(hostId(i, s))}/page/$i"
  def outDeg(i: Long, s: Spec): Long = mix2(i, 3) % (s.maxLinks + 1)
  def target(i: Long, e: Long, s: Spec): Long = mix2(i * 31 + e, 4) % s.nDocs
  def nText(i: Long): Long = 1 + mix2(i, 5) % 3
  def nMedia(i: Long): Long = mix2(i, 7) % 2

  /** All spans of doc i, in order: text*, media*, link* with offsets 0.. */
  def spansLocal(i: Long, s: Spec): Seq[Span] = {
    val texts = (0L until nText(i)).map(t =>
      Span("text", s"t${mix2(i * 7 + t, 6)}", null, 0))
    val media = (0L until nMedia(i)).map(m =>
      Span("media", s"alt${mix2(i * 11 + m, 8)}", s"m://b/${mix2(i * 13 + m, 9)}", 0))
    val links = (0L until outDeg(i, s)).map(e =>
      Span("link", s"anchor$e", url(target(i, e, s), s), 0))
    (texts ++ media ++ links).zipWithIndex.map { case (sp, o) => sp.copy(offset = o) }
  }

  def docLocal(i: Long, s: Spec): Doc = Doc(url(i, s), spansLocal(i, s))

  def docsLocal(s: Spec): Seq[Doc] = (0L until s.nDocs).map(docLocal(_, s))

  // ---- Column mirror of the spec ----
  def mixC(x: Column): Column = (x * A + C) % M
  def mix2C(x: Column, salt: Long): Column = mixC(mixC(x % M) + salt)

  def hostIdC(i: Column, s: Spec): Column =
    when(mix2C(i, 1) % 100 < s.hotHostPct, lit(0L))
      .otherwise(mix2C(i, 2) % s.nHosts)
  def urlC(i: Column, s: Spec): Column =
    concat(lit("http://h"), hostIdC(i, s), lit(".test/page/"), i)

  /** Distributed docs table: doc_id string (canonical URL) + interleaved
    * spans. One narrow projection over `range(n)` — no shuffle, no UDF;
    * whole-stage codegen end to end.
    */
  def docs(spark: SparkSession, s: Spec): DataFrame = {
    val i = col("id")
    val texts = transform(
      sequence(lit(0L), nTextC(i) - 1),
      t => struct(lit("text").as("kind"),
        concat(lit("t"), mix2C(i * 7 + t, 6)).as("text"),
        lit(null).cast("string").as("media_ref"),
        lit(0).as("offset")))
    val media = transform(
      sequence(lit(0L), nMediaC(i) - 1),
      m => struct(lit("media").as("kind"),
        concat(lit("alt"), mix2C(i * 11 + m, 8)).as("text"),
        concat(lit("m://b/"), mix2C(i * 13 + m, 9)).as("media_ref"),
        lit(0).as("offset")))
    // sequence(0, n-1) with n == 0 would yield [0]; guard with filter-on-size
    val links = transform(
      sequence(lit(0L), outDegC(i, s) - 1),
      e => struct(lit("link").as("kind"),
        concat(lit("anchor"), e).as("text"),
        urlC(targetC(i, e, s), s).as("media_ref"),
        lit(0).as("offset")))
    val emptySpans = array().cast(
      "array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    val all = concat(
      when(nTextC(i) > 0, texts).otherwise(emptySpans),
      when(nMediaC(i) > 0, media).otherwise(emptySpans),
      when(outDegC(i, s) > 0, links).otherwise(emptySpans))
    val spans = transform(all, (sp, o) =>
      struct(sp("kind").as("kind"), sp("text").as("text"),
        sp("media_ref").as("media_ref"), o.cast("int").as("offset")))
    spark.range(s.nDocs)
      .select(urlC(i, s).as("doc_id"), spans.as("spans"))
  }

  def nTextC(i: Column): Column = lit(1L) + mix2C(i, 5) % 3
  def nMediaC(i: Column): Column = mix2C(i, 7) % 2
  def outDegC(i: Column, s: Spec): Column = mix2C(i, 3) % (s.maxLinks + 1)
  def targetC(i: Column, e: Column, s: Spec): Column =
    mix2C(i * 31 + e, 4) % s.nDocs

  /** Deterministic seed list: first k docs, tag = "page" for even
    * registration index, null (fallback) otherwise.
    */
  def seedsLocal(k: Int, s: Spec): Seq[Seed] =
    (0 until k).map(j => Seed(url(j.toLong, s), if (j % 2 == 0) "page" else null, j))

  /** Deterministic robots rules: every 5th host disallows the /page/1*
    * prefix; hot host 0 gets a tight budget to exercise the politeness
    * window. Small table by construction -> broadcast.
    */
  def robotsLocal(s: Spec, hostBudget: Int): Seq[RobotsRule] =
    (0L until s.nHosts).map { h =>
      val dis = if (mix2(h, 20) % 5 == 0) Seq("/page/1") else Seq.empty[String]
      val budget = if (h == 0) math.max(1, hostBudget / 2) else hostBudget
      RobotsRule(hostName(h), dis, crawlDelayMs = 0L, hostBudget = budget)
    }
}
