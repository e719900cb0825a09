package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a batched decode /
  * feature-extract stage.
  *
  * The Spark-side plumbing — schema, partition-preserving batched
  * iteration (mapPartitions over an executor-local decoder), feature
  * vector shape — is shared by three decoders behind one seam:
  * [[ImageIoDecoder]] (REAL pixels for PNG/GIF/BMP/JPEG via the JDK's
  * `javax.imageio`), [[PpmDecoder]] (REAL pixels for netpbm P6, pure
  * parser), and [[StubDecoder]] (deterministic fake whose output is a
  * closed-form function of the payload bytes, so stages over arbitrary
  * non-image payloads stay oracle-checkable end to end).
  */
object Media {

  /** One decoded media asset's metadata + features. */
  case class MediaFeatures(
      media_id: Long,
      format: String,
      byte_len: Long,
      width: Int,
      height: Int,
      feature: Seq[Float])

  /** A resize result: source dims + aspect-preserving fitted dims + a
    * deterministic content checksum of the (stub-)resized payload.
    */
  case class MediaResized(media_id: Long, format: String, width: Int,
      height: Int, out_w: Int, out_h: Int, checksum: Long)

  /** One sampled frame of a video asset. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Decoder boundary. A production implementation would wrap e.g. a
    * JNI codec initialized once per executor (hence the per-partition
    * instantiation in [[extractFeatures]]). `resize`/`frameCount`/
    * `frameHash` have deterministic stub defaults (integer arithmetic
    * only — exactly reproducible in the SQL oracle); a real codec
    * overrides them.
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, format: String, payload: Array[Byte]): MediaFeatures

    /** Aspect-preserving fit of (w, h) into (tw, th), integer-exact:
      * the limiting side is chosen by cross-multiplication (no floats).
      */
    def resize(m: MediaFeatures, tw: Int, th: Int): MediaResized = {
      val (w, h) = (m.width, m.height)
      val (ow, oh) =
        if (tw.toLong * h <= th.toLong * w)
          (tw, math.max(1, (h.toLong * tw / w).toInt))
        else
          (math.max(1, (w.toLong * th / h).toInt), th)
      MediaResized(m.media_id, m.format, w, h, ow, oh,
        (m.byte_len * ow + oh) % 997)
    }

    /** Stub frame count for video payloads: 1 + len % 240. */
    def frameCount(m: MediaFeatures): Int = (1 + m.byte_len % 240).toInt

    def frameHash(m: MediaFeatures, idx: Int): Long =
      (m.byte_len * 131 + idx) % 997
  }

  /** STUB: deterministic fake decode — dimensions and features derived
    * from payload length/bytes only. Stands in for the real codec.
    */
  class StubDecoder(featureDim: Int) extends MediaDecoder {
    def decode(mediaId: Long, format: String, payload: Array[Byte]): MediaFeatures = {
      val len = payload.length.toLong
      val width = (16 + len % 64).toInt
      val height = (16 + (len * 7 + 3) % 64).toInt
      val feature = (0 until featureDim).map { k =>
        (((len * 31 + k) % 997).toFloat / 997.0f)
      }
      MediaFeatures(mediaId, format, len, width, height, feature)
    }
  }

  /** REAL header sniffing — format + pixel dims from the payload's
    * header bytes (PNG IHDR / GIF LSD / JPEG SOF walk), no codec, one
    * fused expression ([[MediaExpr.SniffImage]]). Unknown/truncated
    * headers -> struct(null, null, null).
    */
  def sniffImage(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(MediaExpr.SniffImage(GraftExpr.expression(payload)))
  }

  /** Deterministic payloads with REAL image headers (valid PNG
    * signature+IHDR / GIF89a LSD / JPEG SOI+APP0+SOF0 byte sequences
    * encoding the given dims) followed by filler bytes — what the sniff
    * gate and specs parse back. Built from hex literals + unhex, i.e.
    * plain codegen'd Catalyst string ops.
    */
  def headeredPayload(format: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
      filler: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def hex32(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def hex16(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
    def le16(c: org.apache.spark.sql.Column) = concat(
      lpad(hex(pmod(c, lit(256))), 2, "0"),
      lpad(hex((c / 256).cast("int")), 2, "0"))
    val png = concat(lit("89504E470D0A1A0A"), lit("0000000D49484452"),
      hex32(w), hex32(h), lit("0806000000"))
    val gif = concat(lit("474946383961"), le16(w), le16(h), lit("F70000"))
    val jpeg = concat(lit("FFD8"),
      lit("FFE000104A46494600010100000100010000"),
      lit("FFC0001108"), hex16(h), hex16(w), lit("03011100021101031101"))
    concat(unhex(
      when(format === "png", png)
        .when(format === "gif", gif)
        .otherwise(jpeg)), filler)
  }

  /** Deterministic REAL images: a complete 24-bit uncompressed BMP
    * (BITMAPINFOHEADER, bottom-up, BI_RGB) of fixed 4x2 dims with every
    * pixel = (r, g, b) — built entirely from hex literals + unhex, i.e.
    * codegen'd Catalyst string ops, and decodable by ANY standards-
    * compliant BMP reader (here: [[ImageIoDecoder]]). Because the
    * raster is closed-form, the decoded per-channel means are too —
    * the real-codec path gets a DuckDB oracle without DuckDB decoding
    * anything.
    */
  def bmpPayload(r: org.apache.spark.sql.Column,
      g: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def hex2(c: org.apache.spark.sql.Column) =
      lpad(hex(pmod(c.cast("long"), lit(256L))), 2, "0")
    // 14-byte file header (size 78, pixel offset 54) + 40-byte
    // BITMAPINFOHEADER (4x2, 1 plane, 24 bpp, BI_RGB, raster 24 bytes)
    val header = "424D4E000000000000003600000028000000" +
      "0400000002000000010018000000000018000000" +
      "00000000000000000000000000000000"
    // 8 pixels x little-endian channel order B,G,R; rows are 12 bytes =
    // already 4-byte aligned, so no padding
    unhex(concat(lit(header), repeat(concat(hex2(b), hex2(g), hex2(r)), 8)))
  }

  /** Media table derived from a text corpus: payload = UTF-8 bytes (the
    * deterministic stand-in for real image bytes), format cycled.
    */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
        (col(idCol) % 4 + 1).cast("int")).as("format"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched decode: one decoder instance per partition, rows streamed
    * through it (the mapPartitions escape hatch is exactly the documented
    * last-resort boundary for imperative per-partition logic). Partitioning
    * of the input is preserved; no shuffle.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("media_id"), col("format"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        // decoder materialized once per partition (executor-local init)
        val d = decoder
        it.map { case (id, fmt, bytes) => d.decode(id, fmt, bytes) }
      }
      .toDF()
  }

  /** Batched resize stage: decode + aspect-preserving fit, one decoder
    * per partition (same boundary shape as [[extractFeatures]]).
    */
  def resizeMedia(media: DataFrame, decoder: MediaDecoder,
      targetW: Int, targetH: Int): DataFrame = {
    implicit val enc = Encoders.product[MediaResized]
    media.select(col("media_id"), col("format"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        val d = decoder
        it.map { case (id, fmt, bytes) =>
          d.resize(d.decode(id, fmt, bytes), targetW, targetH)
        }
      }
      .toDF()
  }

  /** Frame sampling for video assets: every `everyN`-th frame of each
    * mp4 payload, one decoder per partition; non-video rows emit nothing
    * (row-expanding flatMap inside the partition — no explode shuffle).
    */
  def sampleFrames(media: DataFrame, decoder: MediaDecoder,
      everyN: Int): DataFrame = {
    implicit val enc = Encoders.product[MediaFrame]
    media.select(col("media_id"), col("format"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        val d = decoder
        it.flatMap { case (id, fmt, bytes) =>
          if (fmt != "mp4") Iterator.empty
          else {
            val m = d.decode(id, fmt, bytes)
            (0 until d.frameCount(m) by everyN).iterator
              .map(i => MediaFrame(id, i, d.frameHash(m, i)))
          }
        }
      }
      .toDF()
  }

  /** Expression-only metadata path (no decode): byte length + stub
    * dimensions — the part of the pipeline that never needs the codec.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("format"),
      length(col("payload")).cast("long").as("byte_len"),
      (lit(16) + length(col("payload")) % 64).cast("int").as("width"),
      (lit(16) + (length(col("payload")).cast("long") * 7 + 3) % 64)
        .cast("int").as("height"))
}
