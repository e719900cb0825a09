package graft

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.functions._
import graft.multimodal.{Media, PpmDecoder}

/** The decoder-seam proof (round-3 verdict #8): a REAL pure-JVM pixel
  * decoder (binary PPM) swapped through the exact `MediaDecoder`
  * boundary the StubDecoder occupies, end to end through
  * `extractFeatures` and `resizeMedia` — demonstrating the one-class
  * swap claim with a second, genuinely-decoding implementation.
  */
class MediaPpmSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 6

  /** Deterministic P6 payload: pixel byte at raster offset j of image i
    * is (i * 31 + j * 7) % 256.
    */
  private def ppm(i: Int, w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n# test image $i\n$w $h\n255\n".getBytes("US-ASCII"))
    (0 until w * h * 3).foreach(j => out.write((i * 31 + j * 7) % 256))
    out.toByteArray
  }

  private def media(n: Int) = (0 until n).map { i =>
    (i.toLong, "ppm", ppm(i, 3 + i % 4, 2 + i % 3))
  }.toDF("media_id", "format", "payload")

  test("extractFeatures with PpmDecoder: real dims + real pixel means") {
    val n = 12
    val got = Media.extractFeatures(media(n), new PpmDecoder(dim))
      .orderBy("media_id").collect()
    assert(got.length == n)
    got.zipWithIndex.foreach { case (r, i) =>
      val (w, h) = (3 + i % 4, 2 + i % 3)
      val raster = (0 until w * h * 3).map(j => (i * 31 + j * 7) % 256)
      assert(r.getAs[Long]("media_id") == i.toLong)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("byte_len") > (w * h * 3).toLong) // header too
      // reference means with the decoder's exact arithmetic
      val expected = (0 until dim).map { k =>
        val bucket = raster.zipWithIndex.collect {
          case (b, j) if j % dim == k => b.toLong
        }
        (bucket.sum.toDouble / (bucket.size.toDouble * 255)).toFloat
      }
      assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq == expected, s"image $i")
    }
  }

  test("constant-color image decodes to that color's normalized value") {
    val w = 4; val h = 3
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    (0 until w * h * 3).foreach(_ => out.write(128))
    val df = Seq((9L, "ppm", out.toByteArray))
      .toDF("media_id", "format", "payload")
    val r = Media.extractFeatures(df, new PpmDecoder(dim)).collect().head
    val v = (128.0 / 255.0).toFloat
    assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq == Seq.fill(dim)(v))
  }

  test("malformed payload -> (0,0) zero features, stage does not throw") {
    val df = Seq(
      (1L, "ppm", "P6\n3 2\n255\n".getBytes("US-ASCII")), // truncated raster
      (2L, "ppm", "GARBAGE".getBytes("US-ASCII")),
      (3L, "ppm", Array.empty[Byte]),
      // w*h*3 overflows Int (2.7e9) — must hit the truncated-raster
      // guard via Long arithmetic, not wrap negative and "pass"
      (4L, "ppm", "P6\n30000 30000\n255\n".getBytes("US-ASCII")),
      // 16-bit samples (maxval > 255) are out of scope -> malformed,
      // never a half-read raster
      (5L, "ppm", ("P6\n2 1\n65535\n" + "x" * 12).getBytes("US-ASCII")))
      .toDF("media_id", "format", "payload")
    val rows = Media.extractFeatures(df, new PpmDecoder(dim))
      .orderBy("media_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("width") == 0 && r.getAs[Int]("height") == 0)
      assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq == Seq.fill(dim)(0f))
    }
  }

  test("resizeMedia consumes the REAL header dims (aspect-preserving)") {
    // 6x2 image into a 4x4 box -> width-limited: (4, max(1, 2*4/6)=1)
    val df = Seq((5L, "ppm", ppm(5, 6, 2)))
      .toDF("media_id", "format", "payload")
    val r = Media.resizeMedia(df, new PpmDecoder(dim), 4, 4).collect().head
    assert(r.getAs[Int]("width") == 6 && r.getAs[Int]("height") == 2)
    assert(r.getAs[Int]("out_w") == 4 && r.getAs[Int]("out_h") == 1)
  }
}
