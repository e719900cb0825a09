package graft.text

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML -> visible text extraction (the reference's Text/Html extractor
  * family, spire-rs/spire crates/spire-core/src/extract/): script/style
  * blocks and comments removed, tags replaced by whitespace, the common
  * named + numeric entities decoded, whitespace collapsed. A fused
  * expression ([[HtmlToText]]) with statically-compiled patterns — the
  * per-page hot step between fetch and every text operator (tokens,
  * langId, dedup) in a crawl pipeline.
  *
  * Deliberately a TEXT EXTRACTOR, not an HTML5 parser: no tree, no
  * attribute semantics — the same scope the reference's `todo!()`-stubbed
  * `Elements` selector never implemented (select.rs:67-76); link
  * extraction lives in the corpus spans / Router, not here.
  */
object TextExtract {

  private val scriptP = Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val styleP = Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val commentP = Pattern.compile("(?s)<!--.*?-->")
  private val tagP = Pattern.compile("<[^>]+>")
  private val entP =
    Pattern.compile("&(#\\d{1,7}|amp|lt|gt|quot|apos|nbsp);")
  private val wsP = Pattern.compile("\\s+")

  /** JVM core. Entities decode in ONE pass over the text (never the
    * output of a previous replacement), so "&amp;lt;" yields "&lt;" and
    * "&#38;lt;" yields "&lt;" — exactly one level of decoding.
    */
  def htmlToText(html: UTF8String): UTF8String = {
    var t = scriptP.matcher(html.toString).replaceAll(" ")
    t = styleP.matcher(t).replaceAll(" ")
    t = commentP.matcher(t).replaceAll(" ")
    t = tagP.matcher(t).replaceAll(" ")
    val m = entP.matcher(t)
    val sb = new StringBuffer(t.length)
    while (m.find()) {
      val g = m.group(1)
      val rep = g match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case "nbsp" => " "
        case num =>
          val cp = num.substring(1).toLong
          if (cp > 0 && cp <= Character.MAX_CODE_POINT)
            new String(Character.toChars(cp.toInt))
          else m.group(0)
      }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    UTF8String.fromString(wsP.matcher(sb.toString).replaceAll(" ").trim)
  }

  case class HtmlToText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "html_to_text"

    override protected def nullSafeEval(input: Any): Any =
      htmlToText(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.text.TextExtract.htmlToText($c)")

    override protected def withNewChildInternal(newChild: Expression): HtmlToText =
      copy(child = newChild)
  }

  /** Column form. */
  def htmlText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(HtmlToText(GraftExpr.expression(html)))
  }
}
