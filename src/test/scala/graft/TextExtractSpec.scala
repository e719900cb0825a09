package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.text.TextExtract

/** HTML -> text extraction: tag/script/style/comment stripping, one-pass
  * entity decoding, whitespace collapse.
  */
class TextExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def x(s: String): String =
    TextExtract.htmlToText(UTF8String.fromString(s)).toString

  test("tags stripped, whitespace collapsed, trimmed") {
    assert(x("<html><body> <p>hello   world</p> </body></html>") ==
      "hello world")
    assert(x("a<br/>b<div class='x'>c</div>") == "a b c")
  }

  test("script/style bodies and comments removed entirely") {
    assert(x("<script>var a = '<p>not text</p>';</script>after") == "after")
    assert(x("<style>p { color: red }</style>text") == "text")
    assert(x("before<!-- <p>commented</p> -->after") == "before after")
    assert(x("<SCRIPT src='x'>ignore()</SCRIPT>kept") == "kept")
  }

  test("entities decode exactly one level, single pass") {
    assert(x("a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;") ==
      "a & b <tag> \"q\" 's'")
    assert(x("x&nbsp;y") == "x y")
    assert(x("&#65;&#66;&#67;") == "ABC")
    // no double decoding: literal "&lt;" must survive as text
    assert(x("&amp;lt;") == "&lt;")
    assert(x("&#38;lt;") == "&lt;")
    // out-of-range numeric entity left as-is
    assert(x("&#99999999;") == "&#99999999;")
  }

  test("unclosed script degrades to tag-strip; plain text untouched") {
    // no closing </script>: the block pattern cannot match, the lone
    // <script> tag strips like any tag and the content survives
    assert(x("keep<script>lost forever") == "keep lost forever")
    assert(x("no markup here") == "no markup here")
  }

  test("column form over a DataFrame") {
    import org.apache.spark.sql.functions._
    val out = Seq("<p>one</p>", "<b>two &amp; three</b>")
      .toDF("h")
      .select(TextExtract.htmlText(col("h")).as("t"))
      .as[String].collect().toList
    assert(out == List("one", "two & three"))
  }
}
