package graft.dedup

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Fused bloom-family membership probe (round-2 verdict #4): `true` iff the
  * urlHash child MIGHT be in any member of the broadcast bloom family.
  *
  * The round-2 form was a Scala `udf` — a boxing/encoding boundary on the
  * dedup filter, the hottest per-candidate test in the crawl round. Same
  * escape hatch as [[graft.canon.CanonicalizeUrl]] (SURVEY §4(2)): the
  * generated code is ONE static call into [[Filters.probeFamily]], so the
  * filter stays inside whole-stage codegen with primitive (unboxed) long
  * inputs. The family travels as broadcast HANDLES via the codegen
  * reference array — each delta is still shipped to executors exactly once,
  * when the engine builds it.
  */
case class BloomSeenProbe(
    child: Expression,
    family: Seq[Broadcast[Map[Int, Array[Byte]]]],
    nShards: Int
) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_seen_probe"

  override protected def nullSafeEval(input: Any): Any =
    Filters.probeFamily(family, nShards, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fam = ctx.addReferenceObj("bloomFamily", family,
      "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev,
      c => s"graft.dedup.Filters.probeFamily($fam, $nShards, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomSeenProbe =
    copy(child = newChild)
}
