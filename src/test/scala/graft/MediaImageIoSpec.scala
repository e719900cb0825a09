package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayOutputStream, ByteArrayInputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageIoDecoder, Media, PpmDecoder}

/** The real-codec half of the decoder seam (round-4 verdict #2): PNG,
  * GIF and BMP payloads decoded to REAL pixels by [[ImageIoDecoder]]
  * (JDK `javax.imageio`, zero external jars) through the same
  * `extractFeatures` / `resizeMedia` plumbing as the stub and PPM
  * decoders — plus a differential test pinning its feature arithmetic
  * to [[PpmDecoder]]'s on the identical raster.
  */
class MediaImageIoSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 6

  /** Deterministic raster: pixel (x, y) of image i has channels
    * r = (i*31 + (y*w+x)*7) % 256, g = r+1 mod 256, b = r+2 mod 256.
    */
  private def raster(i: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (i * 31 + (y * w + x) * 7) % 256
      img.setRGB(x, y, (r << 16) | (((r + 1) % 256) << 8) | ((r + 2) % 256))
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  /** The decoder's documented means, recomputed on the raw raster. */
  private def expectedFeats(img: BufferedImage): Seq[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val samples = for {
      y <- 0 until h; x <- 0 until w
      c <- 0 until 3
    } yield {
      val argb = img.getRGB(x, y)
      ((argb >> (16 - 8 * c)) & 0xff).toLong
    }
    (0 until dim).map { k =>
      val bucket = samples.zipWithIndex.collect {
        case (v, j) if j % dim == k => v
      }
      (bucket.sum.toDouble / (bucket.size.toDouble * 255)).toFloat
    }
  }

  test("PNG and BMP: real dims + exact per-bucket pixel means") {
    val cases = (0 until 8).map { i =>
      val (w, h) = (3 + i % 4, 2 + i % 3)
      val fmt = if (i % 2 == 0) "png" else "bmp"
      (i.toLong, fmt, encode(raster(i, w, h), fmt))
    }
    val got = Media.extractFeatures(
      cases.toDF("media_id", "format", "payload"), new ImageIoDecoder(dim))
      .orderBy("media_id").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val (w, h) = (3 + i % 4, 2 + i % 3)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h, s"dims $i")
      assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq ==
        expectedFeats(raster(i, w, h)), s"feats $i")
    }
  }

  /** Hand-built GIF89a: 2-color global palette, LZW stream with a clear
    * code before every pixel code (fixed 3-bit codes — no table growth),
    * LSB-first packing per the spec. The crawler only ever READS GIFs,
    * so the fixture exercises the read path byte-exactly (the JDK's GIF
    * writer is lossy on some rasters and is deliberately not used).
    */
  private def gifBytes(w: Int, h: Int, c0: Int, c1: Int,
      idx: (Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    def rgb(c: Int): Unit = {
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
      out.write(c & 0xff)
    }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h); out.write(0x80); out.write(0); out.write(0) // GCT, 2 colors
    rgb(c0); rgb(c1)
    out.write(0x2C); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(2) // LZW min code size -> clear=4, end=5, 3-bit codes
    val codes = (for (y <- 0 until h; x <- 0 until w)
      yield Seq(4, idx(x, y))).flatten :+ 5
    var acc = 0L; var nbits = 0
    val data = new ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= (c.toLong << nbits); nbits += 3
      while (nbits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    if (nbits > 0) data.write((acc & 0xff).toInt)
    val bytes = data.toByteArray
    out.write(bytes.length); out.write(bytes, 0, bytes.length)
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  test("GIF (palette color model) lands in the same sRGB channel order") {
    val (c0, c1) = (0xCC2010, 0x103050)
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if ((x + y) % 2 == 0) c0 else c1)
    val payload = gifBytes(4, 2, c0, c1, (x, y) => (x + y) % 2)
    // sanity: the fixture IS a decodable GIF with the intended raster
    val back = ImageIO.read(new ByteArrayInputStream(payload))
    for (y <- 0 until 2; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
        s"fixture raster ($x,$y)")
    val df = Seq((1L, "gif", payload)).toDF("media_id", "format", "payload")
    val r = Media.extractFeatures(df, new ImageIoDecoder(dim)).collect().head
    assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 2)
    assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq ==
      expectedFeats(img))
  }

  test("differential: PNG via ImageIO == P6 via PpmDecoder on one raster") {
    val imgs = (0 until 6).map(i => raster(i, 3 + i % 4, 2 + i % 3))
    val pngRows = imgs.zipWithIndex.map { case (img, i) =>
      (i.toLong, "png", encode(img, "png"))
    }
    val ppmRows = imgs.zipWithIndex.map { case (img, i) =>
      val out = new ByteArrayOutputStream()
      out.write(s"P6\n${img.getWidth} ${img.getHeight}\n255\n"
        .getBytes("US-ASCII"))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val argb = img.getRGB(x, y)
        out.write((argb >> 16) & 0xff); out.write((argb >> 8) & 0xff)
        out.write(argb & 0xff)
      }
      (i.toLong, "ppm", out.toByteArray)
    }
    def feats(rows: Seq[(Long, String, Array[Byte])],
        d: Media.MediaDecoder) =
      Media.extractFeatures(rows.toDF("media_id", "format", "payload"), d)
        .orderBy("media_id")
        .select("media_id", "width", "height", "feature").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getAs[scala.collection.Seq[Float]](3).toSeq)).toSeq
    assert(feats(pngRows, new ImageIoDecoder(dim)) ==
      feats(ppmRows, new PpmDecoder(dim)))
  }

  test("JPEG: exact dims, lossy features within tolerance of source means") {
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val df = Seq((1L, "jpeg", encode(img, "jpg")))
      .toDF("media_id", "format", "payload")
    val r = Media.extractFeatures(df, new ImageIoDecoder(dim)).collect().head
    assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 12)
    val v = 128.0f / 255.0f
    r.getAs[scala.collection.Seq[Float]]("feature").foreach(f =>
      assert(math.abs(f - v) < 0.02f, s"jpeg mean drifted: $f vs $v"))
  }

  test("malformed / non-image payloads -> (0,0) zero features, no throw") {
    val df = Seq(
      (1L, "png", "not an image at all".getBytes("US-ASCII")),
      (2L, "png", Array.empty[Byte]),
      // valid PNG signature, truncated immediately after
      (3L, "png", Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte)))
      .toDF("media_id", "format", "payload")
    val rows = Media.extractFeatures(df, new ImageIoDecoder(dim))
      .orderBy("media_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("width") == 0 && r.getAs[Int]("height") == 0)
      assert(r.getAs[scala.collection.Seq[Float]]("feature").toSeq ==
        Seq.fill(dim)(0f))
    }
  }

  test("resizeMedia consumes REAL decoded dims") {
    val df = Seq((7L, "png", encode(raster(7, 40, 10), "png")))
      .toDF("media_id", "format", "payload")
    val r = Media.resizeMedia(df, new ImageIoDecoder(dim), 20, 20)
      .collect().head
    assert(r.getAs[Int]("width") == 40 && r.getAs[Int]("height") == 10)
    assert(r.getAs[Int]("out_w") == 20 && r.getAs[Int]("out_h") == 5)
  }

  test("Catalyst bmpPayload is a real BMP the decoder recovers exactly") {
    // mirror of the q_media_imageio gate: per-channel constant colors
    val df = (0 until 20).map(i => Tuple1(i.toLong)).toSeq.toDF("i")
      .select(col("i").as("media_id"), lit("bmp").as("format"),
        Media.bmpPayload(pmod(col("i"), lit(256)),
          pmod(col("i") * 3 + 1, lit(256)),
          pmod(col("i") * 7 + 5, lit(256))).as("payload"))
    val rows = Media.extractFeatures(df, new ImageIoDecoder(3))
      .orderBy("media_id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("byte_len") == 78L)
      assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 2)
      val f = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(math.round(f(0) * 255) == i % 256, s"r $i")
      assert(math.round(f(1) * 255) == (i * 3 + 1) % 256, s"g $i")
      assert(math.round(f(2) * 255) == (i * 7 + 5) % 256, s"b $i")
    }
  }
}
