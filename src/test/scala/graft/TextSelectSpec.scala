package graft

import org.apache.spark.sql.functions._
import graft.text.TextSelect

/** Selector-style attribute extraction (TextSelect): element scanning,
  * attribute grammar, case handling, and the codegen contract.
  */
class TextSelectSpec extends SparkTestBase {
  import spark.implicits._

  private def attrs(html: String, tag: String): Seq[Map[String, String]] =
    Seq(html).toDF("h")
      .select(TextSelect.selectAttrs(col("h"), tag).as("a"))
      .as[Seq[Map[String, String]]].head()

  test("quoted / single-quoted / unquoted / bare attributes; doc order") {
    val html =
      """<a href="/one" class='Nav' target=_blank data-x>first</a>
        |<p>noise</p>
        |<a href="/two">second</a>""".stripMargin
    assert(attrs(html, "a") == Seq(
      Map("href" -> "/one", "class" -> "Nav", "target" -> "_blank",
        "data-x" -> ""),
      Map("href" -> "/two")))
  }

  test("tag matching is case-insensitive and prefix-safe; names lowercased") {
    val html = """<A HREF="/up"></A><abbr title="t">x</abbr><a href=/low>"""
    // <a> must match <A> but never <abbr>
    assert(attrs(html, "a") ==
      Seq(Map("href" -> "/up"), Map("href" -> "/low")))
  }

  test("duplicate attribute: first occurrence wins; self-closing ok") {
    val html = """<img src="a.png" width=10 src="b.png"/><img src='c.png'>"""
    assert(attrs(html, "img") == Seq(
      Map("src" -> "a.png", "width" -> "10"),
      Map("src" -> "c.png")))
  }

  test("no matching element -> empty array; attributeless tag -> empty map") {
    assert(attrs("<p>plain</p>", "a") == Seq.empty)
    assert(attrs("<a>bare</a>", "a") == Seq(Map.empty[String, String]))
  }

  test("null html -> null (nullIntolerant)") {
    val r = Seq(Option.empty[String]).toDF("h")
      .select(TextSelect.selectAttrs(col("h"), "a").as("a"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("selectAttr projects one attribute, skipping elements without it") {
    val html = """<a href="/u">x</a><a name=anchor>y</a><a href="/v">z</a>"""
    val hrefs = Seq(html).toDF("h")
      .select(TextSelect.selectAttr(col("h"), "a", "href").as("v"))
      .as[Seq[String]].head()
    assert(hrefs == Seq("/u", "/v"))
  }

  test("stays codegen'd (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // non-foldable input (html depends on range id) so the expression
      // actually executes inside whole-stage codegen, not constant-folded
      val df = spark.range(3)
        .select(concat(lit("<a href=/u"), col("id").cast("string"),
          lit(">")).as("h"))
        .select(TextSelect.selectAttrs(col("h"), "a").as("a"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), plan) // whole-stage codegen span
      assert(df.as[Seq[Map[String, String]]].collect().toSeq ==
        (0 until 3).map(i => Seq(Map("href" -> s"/u$i"))))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  // ---------------- selectAnchors: href + inner text ----------------

  private def anchors(html: String): Seq[(String, String)] =
    Seq(html).toDF("h")
      .select(TextSelect.selectAnchors(col("h")).as("a"))
      .as[Seq[(String, String)]].head()

  test("anchors: href + visible text, inner tags stripped, entities decoded") {
    val html =
      """<a href="/one">first <b>bold</b> link</a>
        |<a href='/two' class=x>a &amp; b</a>
        |<a name="no-href">skipped</a>
        |<A HREF=/three>  spaced   out </A>""".stripMargin
    assert(anchors(html) == Seq(
      "/one" -> "first bold link",
      "/two" -> "a & b",
      "/three" -> "spaced out"))
  }

  test("anchors: empty text, bare href, unclosed anchor degrades shortest-match") {
    // the unclosed first <a> consumes up to the FIRST </a>; the inner
    // <a href=/y> opening tag inside that span is stripped as markup
    val html = """<a href=/x>outer <a href=/y>inner</a> tail</a>"""
    assert(anchors(html) == Seq("/x" -> "outer inner"))
    assert(anchors("""<a href="/e"></a>""") == Seq("/e" -> ""))
    assert(anchors("no anchors here") == Seq.empty)
  }
}
