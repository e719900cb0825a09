package graft

import graft.engine.MappedData

/** C6 `map_data`: the reference's URL-normalizing example
  * (dataset/utils/mod.rs:38-47 — store lowercased, read back verbatim)
  * over a real write/read table boundary.
  */
object MapDataSpec {
  case class Page(url: String, rank: Int)
  case class Raw(id: Long, score: Double)
  case class Stored(id: Long, milli: Long)
}

class MapDataSpec extends SparkTestBase {
  import spark.implicits._
  import MapDataSpec._

  test("write-path transform + read-path inverse roundtrip (C6)") {
    val mapped = MappedData[Page, Page](
      to = p => p.copy(url = p.url.toLowerCase), // the reference example
      from = identity)
    val in = Seq(Page("HTTP://A.test/X", 1), Page("http://b.test/y", 2)).toDS()
    val dir = SparkTestBase.tmpDir("mapdata")
    mapped.onWrite(in).write.mode("overwrite").parquet(dir)
    val back = mapped.onRead(spark.read.parquet(dir).as[Page])
      .collect().sortBy(_.rank).toSeq
    assert(back.map(_.url) == Seq("http://a.test/x", "http://b.test/y"))
  }

  test("asymmetric to/from: write quantized, read re-scaled") {
    val mapped = MappedData[Raw, Stored](
      to = r => Stored(r.id, math.floor(r.score * 1000).toLong),
      from = s => Raw(s.id, s.milli / 1000.0))
    val in = Seq(Raw(1, 0.5115), Raw(2, 2.25)).toDS()
    val out = mapped.onRead(mapped.onWrite(in)).collect().sortBy(_.id).toSeq
    assert(out == Seq(Raw(1, 0.511), Raw(2, 2.25)))
  }
}
