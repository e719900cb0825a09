package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.CrawlEvent

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  private val events = Seq(
    CrawlEvent(ts(0, 10), "a.test", "continue", 100L),
    CrawlEvent(ts(0, 20), "a.test", "fail", 0L),
    CrawlEvent(ts(0, 30), "b.test", "continue", 50L),
    CrawlEvent(ts(1, 5), "a.test", "continue", 200L),
    CrawlEvent(ts(1, 6), "b.test", "hold", 0L)
  )

  test("streaming hostRates == batch aggregation (micro-batch engine)") {
    val dir = SparkTestBase.tmpDir("stream-src")
    events.toDF().coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(events.toDF().schema)
      .parquet(dir)
    val got = StreamOps.runToMemory(spark,
      StreamOps.hostRates(src), "host_rates", OutputMode.Update())
      .as[(String, Timestamp, Long, Long, Long)].collect().toSet
    val want = StreamOps.hostRatesBatch(events.toDF())
      .as[(String, Timestamp, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(want.exists { case (h, _, req, fails, _) =>
      h == "a.test" && req == 2 && fails == 1 })
  }

  test("politeness state: notBefore = max(existing, now) + delay per host") {
    val src = events.toDS()
    // batch Dataset through the same mapGroupsWithState logic requires a
    // streaming source; use the memory-driven path:
    val dir = SparkTestBase.tmpDir("stream-src2")
    events.toDF().coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(src.toDF().schema).parquet(dir)
      .as[CrawlEvent]
    val decisions = StreamOps.runToMemory(spark,
      StreamOps.politenessState(stream, crawlDelayMs = 60000L).toDF(),
      "politeness", OutputMode.Update())
      .as[(String, Long, Long)].collect()
      .map { case (h, c, nb) => h -> ((c, nb)) }.toMap
    // a.test: 3 events at 10:00:10, 10:00:20, 10:01:05
    // nb after e1 = t1+60s; e2: max(t1+60, t2)+60 = t1+120; e3:
    // max(t1+120, t3)+60 = t1+110+60+... compute directly:
    val t1 = ts(0, 10).getTime
    val t2 = ts(0, 20).getTime
    val t3 = ts(1, 5).getTime
    val nb1 = t1 + 60000L
    val nb2 = math.max(nb1, t2) + 60000L
    val nb3 = math.max(nb2, t3) + 60000L
    assert(decisions("a.test") == (3L, nb3))
    assert(decisions("b.test")._1 == 2L)
  }
}
