package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused codegen'd text-dedup kernels (see [[TextHash]] for the JVM core
  * and the bit-compatibility contract). The Column twins in [[TextDedup]]
  * (`signatureCol`/`simhashCol`) walk the token/shingle arrays through
  * nested interpreted higher-order lambdas — k+1 array allocations per
  * shingle for MinHash, a 32-element array per token for SimHash; these
  * run the same arithmetic in one loop per row, with md5 evaluated
  * exactly once per element. TextDedupSpec pins fused == Column.
  */
object TextDedupExpr {

  /** k-slot MinHash signature of an array<string> of (distinct) shingles. */
  case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
      extends UnaryExpression {
    require(a.length == b.length, "coefficient arrays must align")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_sig"

    @transient private lazy val aArr: Array[Long] = a.toArray
    @transient private lazy val bArr: Array[Long] = b.toArray

    override protected def nullSafeEval(input: Any): Any =
      TextHash.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.dedup.TextHash.minhashSig($c, $aRef, $bRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Whole-pipeline MinHash: token array -> sliding n-gram windows ->
    * md5 -> k-permutation min, one static call (see
    * [[TextHash.minhashTokens]] for the equivalence argument to the
    * shingle-array form).
    */
  case class MinHashTokens(child: Expression, n: Int, a: Seq[Long], b: Seq[Long])
      extends UnaryExpression {
    require(a.length == b.length, "coefficient arrays must align")
    require(n >= 1, "shingle width >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_tokens"

    @transient private lazy val aArr: Array[Long] = a.toArray
    @transient private lazy val bArr: Array[Long] = b.toArray

    override protected def nullSafeEval(input: Any): Any =
      TextHash.minhashTokens(input.asInstanceOf[ArrayData], n, aArr, bArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.dedup.TextHash.minhashTokens($c, $n, $aRef, $bRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashTokens =
      copy(child = newChild)
  }

  /** Winnowing fingerprint set of a normalized ([a-z0-9]-only) string. */
  case class WinnowSet(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, "k-gram and window widths >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "winnow_set"

    override protected def nullSafeEval(input: Any): Any =
      TextHash.winnowSet(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.dedup.TextHash.winnowSet($c, $k, $w);")

    override protected def withNewChildInternal(newChild: Expression): WinnowSet =
      copy(child = newChild)
  }

  /** 32-bit SimHash of an array<string> of (distinct) tokens. */
  case class SimHash32(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash32"

    override protected def nullSafeEval(input: Any): Any =
      TextHash.simhash32(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.dedup.TextHash.simhash32($c)")

    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)
  }
}
