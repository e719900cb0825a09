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

  test("streaming frontier scheduler: dedup/delay/budget across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps.{Discovered, HostRules, ScheduleDecision}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Discovered]
    val rules = Map(
      "slow.test" -> HostRules(Seq.empty, crawlDelayMs = 30000L, batchBudget = 10),
      "tight.test" -> HostRules(Seq("/private"), 0L, batchBudget = 1))
    // production state-store discipline: RocksDB provider (hashed seen
    // keys spill off-heap/disk instead of growing executor memory)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = StreamOps.scheduleStream(src.toDS(), rules, defaultBudget = 100)
      .toDF().writeStream.format("memory").queryName("sched")
      .outputMode("update").start()

    // batch 1: delay arms after the first slow.test URL; budget caps
    // tight.test at 1; robots blocks /private
    src.addData(
      Discovered(ts(0, 0), "http://slow.test/a"),
      Discovered(ts(0, 10), "http://slow.test/b"), // within 30s delay
      Discovered(ts(0, 0), "HTTP://Tight.test:80/x"),
      Discovered(ts(0, 1), "http://tight.test/y"), // over batch budget
      Discovered(ts(0, 2), "http://tight.test/private/z"), // robots
      Discovered(ts(0, 3), "not a url"))
    q.processAllAvailable()
    // batch 2: duplicate of a scheduled URL + a now-eligible slow.test URL
    src.addData(
      Discovered(ts(1, 0), "http://slow.test/a"), // cross-batch duplicate
      Discovered(ts(1, 0), "http://slow.test/b"), // past the delay now
      Discovered(ts(1, 0), "http://tight.test/y")) // budget reset per batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sched").as[ScheduleDecision].collect()
      .map(d => (d.url, d.action)).toMap
    assert(got("http://slow.test/a") == "duplicate") // batch-2 outcome (update mode)
    assert(got("HTTP://Tight.test:80/x") == "scheduled")
    assert(got("http://tight.test/private/z") == "robots")
    assert(got("not a url") == "invalid")
    // slow.test/b: delayed in batch 1, scheduled in batch 2
    val bDecisions = spark.table("sched").as[ScheduleDecision].collect()
      .filter(_.url == "http://slow.test/b").map(_.action).toSet
    assert(bDecisions == Set("delayed", "scheduled"))
    // tight.test/y: over_budget in batch 1, scheduled in batch 2
    val yDecisions = spark.table("sched").as[ScheduleDecision].collect()
      .filter(_.url == "http://tight.test/y").map(_.action).toSet
    assert(yDecisions == Set("over_budget", "scheduled"))
  }

  test("robots-wired scheduler: parseRobots rules drive blocking/delay " +
      "across micro-batches (longest-match Allow precedence)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps.{Discovered, ScheduleDecision}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // rules come from the BATCH robots parser, not a hand-built map
    val robots = graft.politeness.Politeness.parseRobots(Seq(
      ("guarded.test",
        """User-agent: *
          |Disallow: /admin
          |Allow: /admin/public
          |Crawl-delay: 30""".stripMargin),
      ("open.test", "User-agent: googlebot\nDisallow: /na"))
      .toDF("host", "body"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = MemoryStream[Discovered]
    val q = StreamOps.scheduleStreamWithRobots(src.toDS(), robots,
      defaultBudget = 100)
      .toDF().writeStream.format("memory").queryName("sched_robots")
      .outputMode("update").start()
    // batch 1: Disallow blocks /admin/secret but Allow (longer match)
    // admits /admin/public/x; the 30s crawl-delay arms after the first
    // scheduled guarded.test fetch
    src.addData(
      Discovered(ts(0, 0), "http://guarded.test/admin/secret"),
      Discovered(ts(0, 1), "http://guarded.test/admin/public/x"),
      Discovered(ts(0, 10), "http://guarded.test/ok"), // within 30s delay
      Discovered(ts(0, 0), "http://open.test/anything")) // * group absent
    q.processAllAvailable()
    // batch 2: robots STILL block (static side re-joined per batch);
    // the delayed URL is past the deadline now; dedup crosses batches
    src.addData(
      Discovered(ts(1, 0), "http://guarded.test/admin/secret2"),
      Discovered(ts(1, 0), "http://guarded.test/ok"),
      Discovered(ts(1, 1), "http://open.test/anything")) // duplicate
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sched_robots").as[ScheduleDecision].collect()
    val byUrl = all.groupBy(_.url)
      .map { case (u, ds) => u -> ds.map(_.action).toSet }
    assert(byUrl("http://guarded.test/admin/secret") == Set("robots"))
    assert(byUrl("http://guarded.test/admin/secret2") == Set("robots"))
    assert(byUrl("http://guarded.test/admin/public/x") == Set("scheduled"))
    assert(byUrl("http://guarded.test/ok") == Set("delayed", "scheduled"))
    assert(byUrl("http://open.test/anything") == Set("scheduled", "duplicate"))
  }

  test("scheduler state survives a query RESTART from checkpointLocation " +
      "(streaming resume story)") {
    import graft.streaming.StreamOps.{Discovered, HostRules, ScheduleDecision}
    val ckpt = SparkTestBase.tmpDir("stream-ckpt")
    val srcDir = SparkTestBase.tmpDir("stream-restart-src")
    val rules = Map.empty[String, HostRules]
    val schema = Seq.empty[Discovered].toDF().schema
    // file source + foreachBatch sink, not MemoryStream/memory: both
    // ends must be RECOVERABLE for checkpoint restart (a fresh
    // MemoryStream restarts its offsets against the recovered WAL and
    // the memory sink refuses recovery outright). Two query LIVES over
    // the same directory + checkpoint model the real stop/resume of a
    // continuous crawl.
    def runLife(): Seq[ScheduleDecision] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[ScheduleDecision]
      val src = spark.readStream.schema(schema).parquet(srcDir)
        .as[Discovered]
      val q = StreamOps.scheduleStream(src, rules, defaultBudget = 100)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[ScheduleDecision],
            _: Long) =>
          got.synchronized { got ++= batch.collect() }
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      got.toSeq
    }
    // life 1: schedule two URLs, graceful stop
    Seq(Discovered(ts(0, 0), "http://h.test/a"),
      Discovered(ts(0, 1), "http://h.test/b")).toDF()
      .coalesce(1).write.mode("append").parquet(srcDir)
    runLife()
    // life 2: a new file arrives; the restarted query must recover the
    // per-host seen-hash state, so the re-offered URL is a duplicate,
    // not a fresh schedule — the crawl-resume contract, streaming form
    Seq(Discovered(ts(1, 0), "http://h.test/a"), // seen in life 1
      Discovered(ts(1, 1), "http://h.test/c")).toDF() // fresh
      .coalesce(1).write.mode("append").parquet(srcDir)
    val d2 = runLife().map(d => d.url -> d.action).toMap
    assert(d2.get("http://h.test/a").contains("duplicate"))
    assert(d2.get("http://h.test/c").contains("scheduled"))
    // life-1 rows were NOT replayed into life 2 (offset log honored)
    assert(!d2.contains("http://h.test/b"))
  }

  test("FlowControl defer/abort ledger across micro-batches: " +
      "Wait defers its TagQuery targets, Fail kills permanently") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps.{TagDecision, TagEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[TagEvent]
    val q = StreamOps.deferStream(src.toDS(),
        routerTags = Seq("t1", "t2", "t3"))
      .toDF().writeStream.format("memory").queryName("defer")
      .outputMode("update").start()

    // batch 1: t1 handler says Wait(single:t1, 60s) at 10:00:00; a Fail
    // with list:t3 kills t3; t2 untouched
    src.addData(
      TagEvent.outcome(ts(0, 0), "t1", "wait", "single:t1", 60000L),
      TagEvent.outcome(ts(0, 0), "t1", "fail", "list:t3", 0L),
      TagEvent.cand(ts(0, 30), "t1", "u/a"), // inside the 60s defer
      TagEvent.cand(ts(0, 30), "t2", "u/b"), // other tag: passes
      TagEvent.cand(ts(0, 30), "t3", "u/c")) // killed
    q.processAllAvailable()
    // batch 2: the defer deadline (10:01:00) has passed for t1; t3 stays
    // killed across batches; an Every-query Wait then defers ALL tags
    src.addData(
      TagEvent.cand(ts(1, 30), "t1", "u/d"), // past deadline: passes
      TagEvent.cand(ts(1, 30), "t3", "u/e"), // still killed
      TagEvent.outcome(ts(1, 40), null, "wait", "every", 120000L))
    q.processAllAvailable()
    // batch 3: every-defer (armed 10:01:40 + 120s = 10:03:40) blocks t2
    // and the fallback (null tag) alike
    src.addData(
      TagEvent.cand(ts(2, 0), "t2", "u/f"),
      TagEvent.cand(ts(2, 0), null, "u/g"),
      TagEvent.cand(ts(4, 0), "t2", "u/h")) // past the every-defer
    q.processAllAvailable()
    q.stop()
    val got = spark.table("defer").as[TagDecision].collect()
      .map(d => d.url -> d.action).toMap
    assert(got == Map(
      "u/a" -> "deferred", "u/b" -> "pass", "u/c" -> "killed",
      "u/d" -> "pass", "u/e" -> "killed",
      "u/f" -> "deferred", "u/g" -> "deferred", "u/h" -> "pass"))
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
