package graft.multimodal

import java.io.ByteArrayInputStream

import graft.multimodal.Media.{MediaDecoder, MediaFeatures}

/** REAL pixel decoder for the web's actual image formats — PNG, GIF,
  * BMP (and JPEG, see below) — via `javax.imageio`, which ships in the
  * JDK: zero external jars, executor-local, deterministic rasters for
  * the lossless formats. This is the production face of [[Media]]'s
  * decoder seam that [[PpmDecoder]] proved: the identical
  * `extractFeatures` / `resizeMedia` plumbing runs either.
  *
  * Feature semantics match [[PpmDecoder]] exactly so the two are
  * differential-testable on the same raster: pixels are visited
  * top-down / left-right in R,G,B interleaved order (offset
  * `(y*w + x)*3 + c`), `feature(k)` = mean of the sample bytes at
  * offsets ≡ k (mod featureDim) normalized by 255, accumulated in
  * exact integer sums — deterministic at any partitioning, and with
  * `featureDim % 3 == 0` the buckets are per-channel means. Alpha is
  * ignored; `getRGB` converts every color model to sRGB first, so
  * palette GIFs and BGR BMPs land in the same channel order.
  *
  * JPEG decodes too, but its IDCT output is implementation-defined
  * (libjpeg vs JDK differ in low bits) — treat JPEG features as
  * approximate (spec uses a tolerance), PNG/GIF/BMP as exact.
  *
  * Malformed / unsupported payloads -> dims (0,0) + zero features,
  * never a throw: one corrupt asset must not kill a 10^9-row decode
  * stage. Rasters are read one ROW at a time (bounded buffer), so a
  * maliciously huge-dimension header costs O(width) memory here —
  * `ImageIO` itself allocates the frame, which is why the engine
  * screens `byte_len` upstream before this stage runs.
  */
class ImageIoDecoder(featureDim: Int) extends MediaDecoder {
  ImageIoDecoder.init // disable ImageIO's temp-file disk cache once

  def decode(mediaId: Long, format: String,
      payload: Array[Byte]): MediaFeatures = {
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "no reader for payload")
      val w = img.getWidth
      val h = img.getHeight
      require(w > 0 && h > 0, "empty raster")
      val sums = new Array[Long](featureDim)
      val counts = new Array[Long](featureDim)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val argb = row(x)
          val base = (y.toLong * w + x) * 3L
          sums(((base) % featureDim).toInt) += ((argb >> 16) & 0xff).toLong
          counts((base % featureDim).toInt) += 1L
          sums(((base + 1) % featureDim).toInt) += ((argb >> 8) & 0xff).toLong
          counts(((base + 1) % featureDim).toInt) += 1L
          sums(((base + 2) % featureDim).toInt) += (argb & 0xff).toLong
          counts(((base + 2) % featureDim).toInt) += 1L
          x += 1
        }
        y += 1
      }
      val feats = (0 until featureDim).map { k =>
        if (counts(k) == 0L) 0f
        else (sums(k).toDouble / (counts(k).toDouble * 255.0)).toFloat
      }
      MediaFeatures(mediaId, format, payload.length.toLong, w, h, feats)
    } catch {
      case scala.util.control.NonFatal(_) =>
        MediaFeatures(mediaId, format, payload.length.toLong, 0, 0,
          Seq.fill(featureDim)(0f))
    }
  }
}

object ImageIoDecoder {
  /** One-time JVM-wide switch off of ImageIO's temp-file cache:
    * in-memory streams only — a decode stage must not write scratch
    * files on executors.
    */
  private lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)
}
