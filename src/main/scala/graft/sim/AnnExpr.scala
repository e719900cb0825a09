package graft.sim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused codegen'd vector arithmetic for the ANN tier.
  *
  * The Column forms in [[Ann]] (`aggregate(zip_with(...))` folds) are
  * higher-order functions: Catalyst evaluates their lambdas INTERPRETED,
  * one function-object call per element per row, and `cosineQ` walks both
  * arrays three separate times (dot, |a|^2, |b|^2). Same story as the
  * round-1 URL canonicalization: the declarative twin stays as the
  * executable spec (AnnSpec differential: fused == Column on random
  * vectors), the hot path gets ONE tight generated loop per row.
  *
  * Numeric contract (what makes the DuckDB oracles exact):
  *  - all accumulation in 64-bit integers (associative — bit-identical at
  *    any parallelism), floats touched only in the final
  *    dot / (sqrt(n2a) * sqrt(n2b)) — the same IEEE ops, in the same
  *    order, as the Column twin, so results are REPLACEABLE not just
  *    close.
  *  - null/shape semantics mirror the twins exactly: zip_with pads
  *    length-mismatched arrays with null and `acc + null` poisons the
  *    fold => mismatched lengths or a null element yield null (DotQ /
  *    CosineQ); LshBits maps a null dot through `when(d >= 0, bit)
  *    .otherwise(0)` => 0 contribution, i.e. any-null => bucket 0.
  */
object AnnExpr {

  /** Per-element floor(x * 1000) quantization: array<float|double> ->
    * array<long>. Null elements stay null (transform semantics).
    */
  case class QuantizeVec(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullIntolerant: Boolean = true

    // resolved lazily: child.dataType is only defined post-analysis
    @transient private lazy val getterJava: String = child.dataType match {
      case ArrayType(DoubleType, _) => "getDouble"
      case ArrayType(FloatType, _) => "getFloat"
      case ArrayType(LongType, _) => "getLong"
      case _ => "getInt"
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = getterJava match {
            case "getDouble" => arr.getDouble(i)
            case "getFloat" => arr.getFloat(i).toDouble
            case "getLong" => arr.getLong(i).toDouble
            case _ => arr.getInt(i).toDouble
          }
          out(i) = math.floor(d * 1000.0).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        val getter = s"(double) $a.$getterJava($i)"
        s"""
        final int $n = $a.numElements();
        Object[] $out = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            $out[$i] = (Long) (long) java.lang.Math.floor($getter * 1000.0);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
      copy(child = newChild)
  }

  /** Shared null/length contract of the integer folds. Returns Long
    * MinValue as a sentinel "null" via the eval path's null flag instead —
    * implemented per expression; this just documents the rule.
    */
  private def dotLoop(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Exact integer dot product: array<long> x array<long> -> long, one
    * generated loop (vs an interpreted zip_with + aggregate fold pair).
    */
  case class DotQ(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    // null is possible even with non-null children (length mismatch /
    // null element): without this, non-nullable inputs make codegen emit
    // a constant-false isNull that the generated `isNull = true` cannot
    // assign (Janino "not an rvalue")
    override def nullable: Boolean = true

    override def eval(input: InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      dotLoop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; }
        else {
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $a.getLong($i) * $b.getLong($i);
          }
          ${ev.value} = $s;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotQ =
      copy(left = newLeft, right = newRight)
  }

  /** Fused cosine: ONE pass accumulating dot, |a|^2, |b|^2, then the same
    * IEEE double ops as the Column twin (cast, sqrt, multiply, divide in
    * identical order).
    */
  case class CosineQ(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true // see DotQ.nullable

    override def eval(input: InternalRow): Any = {
      val av = left.eval(input)
      if (av == null) return null
      val bv = right.eval(input)
      if (bv == null) return null
      val a = av.asInstanceOf[ArrayData]
      val b = bv.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0L; var n2a = 0L; var n2b = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = a.getLong(i); val y = b.getLong(i)
        dot += x * y; n2a += x * x; n2b += y * y
        i += 1
      }
      java.lang.Double.valueOf(
        dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble)))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val n2a = ctx.freshName("n2a")
        val n2b = ctx.freshName("n2b")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; }
        else {
          long $dot = 0L; long $n2a = 0L; long $n2b = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            final long $x = $a.getLong($i);
            final long $y = $b.getLong($i);
            $dot += $x * $y; $n2a += $x * $x; $n2b += $y * $y;
          }
          if (!${ev.isNull}) {
            ${ev.value} = ((double) $dot) /
              (java.lang.Math.sqrt((double) $n2a) * java.lang.Math.sqrt((double) $n2b));
          }
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineQ =
      copy(left = newLeft, right = newRight)
  }

  /** All `planes.length` hyperplane sign bits in one generated loop:
    * bucket = sum over j of (dot(v, planes[j]) >= 0 ? 1<<j : 0). The
    * Column twin runs one interpreted aggregate-fold PER PLANE (8-24
    * full array walks per row). Null contract (matches
    * `when(dot >= 0, bit).otherwise(0)` under a null dot): any null
    * element or length mismatch => every bit 0 => bucket 0.
    */
  case class LshBits(child: Expression, planes: Seq[Seq[Long]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    @transient private lazy val planeArr: Array[Array[Long]] =
      planes.map(_.toArray).toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var j = 0
      var bucket = 0L
      while (j < planeArr.length) {
        val w = planeArr(j)
        if (w.length == n) {
          var s = 0L
          var i = 0
          var nul = false
          while (i < n && !nul) {
            if (v.isNullAt(i)) nul = true
            else s += w(i) * v.getLong(i)
            i += 1
          }
          if (!nul && s >= 0) bucket |= (1L << j)
        }
        j += 1
      }
      java.lang.Long.valueOf(bucket)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planeArr, "long[][]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val w = ctx.freshName("w")
        val bucket = ctx.freshName("bucket")
        val nul = ctx.freshName("nul")
        s"""
        final int $n = $v.numElements();
        long $bucket = 0L;
        for (int $j = 0; $j < $ref.length; $j++) {
          final long[] $w = $ref[$j];
          if ($w.length == $n) {
            long $s = 0L;
            boolean $nul = false;
            for (int $i = 0; $i < $n && !$nul; $i++) {
              if ($v.isNullAt($i)) { $nul = true; }
              else { $s += $w[$i] * $v.getLong($i); }
            }
            if (!$nul && $s >= 0L) { $bucket |= (1L << $j); }
          }
        }
        ${ev.value} = $bucket;
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): LshBits =
      copy(child = newChild)
  }

  /** IVF argmax in one generated loop over the centroid matrix: for each
    * row, cid of the max-cosine centroid (strict >, so ties keep the
    * FIRST = lowest cid — the fold twin's tie-break). `cents` carries
    * (cid, vector, precomputed sqrt(|c|^2)); the row norm sqrt(|v|^2) is
    * computed in the same pass. Null contract mirrors the fold twin: a
    * null element poisons every cosine (null > acc is false) => the
    * initial cid -1 survives.
    */
  case class IvfArgmax(child: Expression, cents: Seq[(Long, Seq[Long], Double)])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray
    @transient private lazy val cvecs: Array[Array[Long]] =
      cents.map(_._2.toArray).toArray
    @transient private lazy val cnorms: Array[Double] = cents.map(_._3).toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var n2 = 0L
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return java.lang.Long.valueOf(-1L)
        val x = v.getLong(i); n2 += x * x
        i += 1
      }
      val vn = math.sqrt(n2.toDouble)
      var best = -1L
      var bestCos = Double.NegativeInfinity
      var c = 0
      while (c < cvecs.length) {
        val w = cvecs(c)
        if (w.length == n) {
          var dot = 0L
          var k = 0
          while (k < n) { dot += w(k) * v.getLong(k); k += 1 }
          val cos = dot.toDouble / (vn * cnorms(c))
          if (cos > bestCos) { bestCos = cos; best = cids(c) }
        }
        c += 1
      }
      java.lang.Long.valueOf(best)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cidRef = ctx.addReferenceObj("cids", cids, "long[]")
      val vecRef = ctx.addReferenceObj("cvecs", cvecs, "long[][]")
      val nrmRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val k = ctx.freshName("k")
        val c = ctx.freshName("c")
        val n2 = ctx.freshName("n2")
        val vn = ctx.freshName("vn")
        val x = ctx.freshName("x")
        val dot = ctx.freshName("dot")
        val cos = ctx.freshName("cos")
        val best = ctx.freshName("best")
        val bestCos = ctx.freshName("bestCos")
        val w = ctx.freshName("w")
        val nul = ctx.freshName("nul")
        s"""
        final int $n = $v.numElements();
        long $n2 = 0L;
        boolean $nul = false;
        for (int $i = 0; $i < $n && !$nul; $i++) {
          if ($v.isNullAt($i)) { $nul = true; }
          else { final long $x = $v.getLong($i); $n2 += $x * $x; }
        }
        long $best = -1L;
        if (!$nul) {
          final double $vn = java.lang.Math.sqrt((double) $n2);
          double $bestCos = java.lang.Double.NEGATIVE_INFINITY;
          for (int $c = 0; $c < $vecRef.length; $c++) {
            final long[] $w = $vecRef[$c];
            if ($w.length == $n) {
              long $dot = 0L;
              for (int $k = 0; $k < $n; $k++) { $dot += $w[$k] * $v.getLong($k); }
              final double $cos = ((double) $dot) / ($vn * $nrmRef[$c]);
              if ($cos > $bestCos) { $bestCos = $cos; $best = $cidRef[$c]; }
            }
          }
        }
        ${ev.value} = $best;
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): IvfArgmax =
      copy(child = newChild)
  }
}
