package graft.canon

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook (the SURVEY §4 extension path, item (c)):
  * registers the fused canonicalization expressions as SQL-callable
  * functions, so pure-SQL users of the library get the same codegen'd
  * operators as the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT canonicalize_url(url), url_host(url) FROM frontier")
  * }}}
  *
  * Or via config (no code): spark.sql.extensions=graft.canon.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def unary(name: String, mk: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[CanonicalizeUrl].getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name(url) takes exactly one argument")
      mk(args.head)
    })

  /** The injected function set — also usable to register into a live
    * session's FunctionRegistry (tests do this; extensions only apply at
    * session construction).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      unary("canonicalize_url", CanonicalizeUrl.apply),
      unary("url_host", UrlHost.apply))
}
