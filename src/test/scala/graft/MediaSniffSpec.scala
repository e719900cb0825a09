package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Media, MediaExpr}

/** Image-header sniffing: real byte-level parsers for PNG / GIF / JPEG
  * headers, including the JPEG marker-segment walk, plus the
  * generator-roundtrip through the Catalyst payload builder.
  */
class MediaSniffSpec extends SparkTestBase {
  import spark.implicits._

  private def sniffLocal(bytes: Array[Byte]): (String, Any, Any) = {
    val r = MediaExpr.sniff(bytes)
    (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getInt(1),
      if (r.isNullAt(2)) null else r.getInt(2))
  }

  test("PNG: signature + IHDR big-endian dims") {
    val b = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 1, 0, /* w=256 */ 0, 0, 0, 64 /* h=64 */).map(_.toByte)
    assert(sniffLocal(b) == ("png", 256, 64))
  }

  test("GIF87a/89a: little-endian logical screen descriptor") {
    def gif(v: Char) = (s"GIF8${v}a".getBytes("ASCII") ++
      Array[Int](0x34, 0x12, 0x10, 0x00).map(_.toByte))
    assert(sniffLocal(gif('9')) == ("gif", 0x1234, 0x10))
    assert(sniffLocal(gif('7')) == ("gif", 0x1234, 0x10))
  }

  test("JPEG: segment walk skips APPn/standalone markers to SOF2") {
    val app1 = Array[Int](0xff, 0xe1, 0x00, 0x04, 0x41, 0x42).map(_.toByte)
    val rst = Array[Int](0xff, 0xd0).map(_.toByte) // standalone, no length
    val sof2 = Array[Int](0xff, 0xc2, 0x00, 0x11, 0x08,
      0x01, 0x00, /* h=256 */ 0x02, 0x00 /* w=512 */).map(_.toByte)
    val b = Array[Int](0xff, 0xd8).map(_.toByte) ++ app1 ++ rst ++ sof2
    assert(sniffLocal(b) == ("jpeg", 512, 256))
  }

  test("unknown / truncated / desynced headers -> nulls") {
    assert(sniffLocal("not an image".getBytes) == (null, null, null))
    assert(sniffLocal(Array[Int](0x89, 'P', 'N', 'G').map(_.toByte)) ==
      (null, null, null)) // truncated PNG
    // JPEG that hits start-of-scan before any SOF
    val scanFirst = Array[Int](0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(sniffLocal(scanFirst) == (null, null, null))
    // desynced walk (non-FF where a marker should be)
    val desync = Array[Int](0xff, 0xd8, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(sniffLocal(desync) == (null, null, null))
  }

  test("generator roundtrip: headeredPayload sniffs back to its dims") {
    val d = (0L until 200L).toDF("id").select(col("id"),
      Media.headeredPayload(
        when(col("id") % 3 === 0, lit("png"))
          .when(col("id") % 3 === 1, lit("gif")).otherwise(lit("jpeg")),
        (lit(100) + col("id") % 617).cast("int"),
        (lit(50) + col("id") % 431).cast("int"),
        lit(Array[Byte](1, 2, 3))).as("payload"))
      .select(col("id"), Media.sniffImage(col("payload")).as("s"))
      .select(col("id"), col("s.format").as("f"),
        col("s.width").as("w"), col("s.height").as("h"))
      .as[(Long, String, Int, Int)].collect()
    assert(d.length == 200)
    d.foreach { case (id, f, w, h) =>
      val ef = (id % 3) match { case 0 => "png"; case 1 => "gif"; case _ => "jpeg" }
      assert(f == ef && w == 100 + id % 617 && h == 50 + id % 431,
        s"id=$id got ($f, $w, $h)")
    }
  }
}
