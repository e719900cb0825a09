package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-header sniffing — format + pixel dimensions straight from
  * the payload's header bytes (PNG IHDR, GIF logical screen descriptor,
  * JPEG SOF segment walk). Unlike the decode stage (StubDecoder — full
  * pixel decode needs codec libraries this sandbox lacks), header
  * sniffing is pure byte arithmetic: at 100 TB it is how a pipeline
  * filters/filters-by-resolution/routes media WITHOUT paying a decode.
  * One fused expression, one static call in generated code.
  */
object MediaExpr {

  private val outType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** binary -> struct(format, width, height); unknown/truncated headers
    * yield struct(null, null, null) (the row survives — sniffing is a
    * best-effort classifier, not a validator).
    */
  case class SniffImage(child: Expression) extends UnaryExpression {
    override def dataType: DataType = outType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sniff_image"

    override protected def nullSafeEval(input: Any): Any =
      MediaExpr.sniff(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.multimodal.MediaExpr.sniff($c);")

    override protected def withNewChildInternal(newChild: Expression): SniffImage =
      copy(child = newChild)
  }

  private def u8(b: Byte): Int = b & 0xff
  private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))
  private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)
  private def be32(a: Array[Byte], i: Int): Int =
    (u8(a(i)) << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))

  private val unknown: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
      Integer.valueOf(w), Integer.valueOf(h)))

  /** JVM core (also directly usable driver-side / in tests). */
  def sniff(b: Array[Byte]): InternalRow = {
    if (b == null) return unknown
    // PNG: 8-byte signature, IHDR length+type at 8..15, width/height 16..23
    if (b.length >= 24 &&
        u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen descriptor at 6..9, little-endian
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: SOI then marker-segment walk to a SOF marker
    if (b.length >= 4 && u8(b(0)) == 0xff && u8(b(1)) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b(i)) != 0xff) return unknown // desynced
        val marker = u8(b(i + 1))
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length
        } else if (marker == 0xd9 || marker == 0xda) {
          return unknown // EOI / start-of-scan before any SOF
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return unknown
          // SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 8 >= b.length) return unknown // need bytes up to i+8
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          }
          i += 2 + len
        }
      }
      return unknown
    }
    unknown
  }
}
