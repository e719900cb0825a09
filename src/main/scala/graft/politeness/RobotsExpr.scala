package graft.politeness

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest matching rule length (in characters) of `path` over a
  * per-row pattern array — the primitive behind robots longest-match
  * precedence (blocked iff longestDisallow > longestAllow). Patterns are
  * RFC 9309 path patterns: matched as a PREFIX of the path, `*` matches
  * any character run (including empty), a trailing `$` anchors the match
  * at end-of-path; the match length is the pattern's own length (most
  * specific = longest pattern — the de-facto Google tiebreak). Plain
  * prefixes are the degenerate wildcard-free case and behave exactly as
  * before. One generated loop per row; the pattern arrays are JOINED
  * per-host data, not literals, hence a binary expression rather than a
  * reference-object kernel. Null array -> 0 (no rule matched); null
  * elements skipped.
  */
object RobotsExpr {

  case class LongestMatchLen(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def prettyName: String = "longest_match_len"

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
        newLeft: Expression, newRight: Expression): LongestMatchLen =
      copy(left = newLeft, right = newRight)
  }

  /** JVM core: max numChars over patterns that match `path`. */
  def longest(path: UTF8String, patterns: ArrayData): Int = {
    var best = 0
    val n = patterns.numElements()
    var i = 0
    while (i < n) {
      if (!patterns.isNullAt(i)) {
        val p = patterns.getUTF8String(i)
        if (matches(path, p)) {
          val len = p.numChars()
          if (len > best) best = len
        }
      }
      i += 1
    }
    best
  }

  /** RFC 9309 path-pattern match, byte-wise on the UTF-8 encoding (both
    * '*' and '$' are single ASCII bytes, so byte iteration is exact for
    * any UTF-8 path). Iterative glob with single-star backtracking:
    * worst case O(|pattern| * |path|), zero allocation. Anchored at the
    * start of the path; without '$' the pattern may end anywhere (prefix
    * semantics), with a trailing '$' it must consume the entire path. A
    * '$' anywhere else is a literal byte (de-facto standard).
    */
  def matches(path: UTF8String, pattern: UTF8String): Boolean = {
    val plen0 = pattern.numBytes()
    // exactly one trailing '$' is the anchor; any '$' before it is literal
    val requireEnd = plen0 > 0 && pattern.getByte(plen0 - 1) == '$'.toByte
    val plen = if (requireEnd) plen0 - 1 else plen0
    val slen = path.numBytes()
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    if (!requireEnd && plen == 0) return true
    while (si < slen) {
      if (pi == plen && !requireEnd) return true // pattern consumed: prefix hit
      if (pi < plen && pattern.getByte(pi) == '*'.toByte) {
        starPi = pi
        starSi = si
        pi += 1
      } else if (pi < plen && pattern.getByte(pi) == path.getByte(si)) {
        pi += 1
        si += 1
      } else if (starPi >= 0) {
        // backtrack: the last '*' eats one more byte
        pi = starPi + 1
        starSi += 1
        si = starSi
      } else {
        return false
      }
    }
    // path consumed: trailing '*'s match empty
    while (pi < plen && pattern.getByte(pi) == '*'.toByte) pi += 1
    pi == plen // with requireEnd this also certifies si == slen
  }
}
