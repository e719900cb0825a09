package graft.politeness

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest matching prefix length (in characters) of `path` over a
  * per-row prefix array — the primitive behind robots longest-match
  * precedence (blocked iff longestDisallow > longestAllow). One generated
  * loop per row; the prefix arrays are JOINED per-host data, not
  * literals, hence a binary expression rather than a reference-object
  * kernel. Null array -> 0 (no rule matched); null elements skipped.
  */
object RobotsExpr {

  case class LongestPrefixLen(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def prettyName: String = "longest_prefix_len"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val p = left.eval(input)
      val a = right.eval(input)
      if (p == null || a == null) return 0
      RobotsExpr.longest(p.asInstanceOf[UTF8String], a.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      ev.copy(code = code"""
        ${l.code}
        ${r.code}
        int ${ev.value} = 0;
        boolean ${ev.isNull} = false;
        if (!${l.isNull} && !${r.isNull}) {
          ${ev.value} = graft.politeness.RobotsExpr.longest(${l.value}, ${r.value});
        }""")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): LongestPrefixLen =
      copy(left = newLeft, right = newRight)
  }

  /** JVM core: max numChars over prefixes that `path` startsWith. */
  def longest(path: UTF8String, prefixes: ArrayData): Int = {
    var best = 0
    val n = prefixes.numElements()
    var i = 0
    while (i < n) {
      if (!prefixes.isNullAt(i)) {
        val p = prefixes.getUTF8String(i)
        if (path.startsWith(p)) {
          val len = p.numChars()
          if (len > best) best = len
        }
      }
      i += 1
    }
    best
  }
}
