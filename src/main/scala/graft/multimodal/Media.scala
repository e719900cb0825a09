package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a batched decode /
  * feature-extract stage.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batched
  * iteration (mapPartitions over an executor-local decoder), feature
  * vector shape — while the codec itself is a clearly-marked
  * deterministic STUB ([[StubDecoder]]): no image/audio libraries ship in
  * this sandbox. Swapping in a real decoder is a one-class change; the
  * stub's output is a pure function of the payload bytes so the whole
  * stage is testable and oracle-checkable end to end.
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

  /** Decoder boundary. A production implementation would wrap e.g. a
    * JNI codec initialized once per executor (hence the per-partition
    * instantiation in [[extractFeatures]]).
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, format: String, payload: Array[Byte]): MediaFeatures
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
