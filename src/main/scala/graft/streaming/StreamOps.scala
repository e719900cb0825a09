package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming re-expression of the reference's stream-backed
  * dataset (spire-rs/spire crates/spire-core/src/dataset/future_dataset.rs:
  * 46-116 — a Dataset over an arbitrary futures Stream/Sink) and the
  * stream-terminates-on-empty contract (dataset/future/data_stream.rs:
  * 78-86).
  *
  * In the engine these are the continuous-ingest paths: discovered URLs or
  * fetch events arrive as an unbounded stream; politeness accounting and
  * crawl metrics become watermarked window aggregations and keyed state.
  */
object StreamOps {

  /** One fetch/crawl event on the stream. */
  case class CrawlEvent(ts: Timestamp, host: String, outcome: String,
      bytes: Long)

  case class HostWindowStats(host: String, windowStart: Timestamp,
      requests: Long, failures: Long, bytes: Long)

  /** Watermarked per-host fetch-rate aggregation: the streaming analogue
    * of the per-round metrics table (metric.rs:126-155 accounting).
    * 1-minute tumbling windows, 2-minute watermark for late events.
    */
  def hostRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("host"))
      .agg(
        count(lit(1)).as("requests"),
        sum(when(col("outcome").isin("skip", "hold", "fail"), 1L)
          .otherwise(0L)).as("failures"),
        sum(col("bytes")).as("bytes"))
      .select(col("host"), col("window.start").as("windowStart"),
        col("requests"), col("failures"), col("bytes"))

  /** Per-host politeness state machine via mapGroupsWithState: tracks a
    * running request count and the earliest next-allowed timestamp given
    * a crawl delay — the stateful-stream form of the defer ledger
    * (runner.rs:289-306).
    */
  case class HostState(count: Long, lastTs: Long, notBefore: Long)
  case class HostDecision(host: String, count: Long, notBefore: Long)

  def politenessState(events: Dataset[CrawlEvent], crawlDelayMs: Long)
      : Dataset[HostDecision] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.host)
      .mapGroupsWithState[HostState, HostDecision](
        GroupStateTimeout.NoTimeout()) {
        (host, evts, state: GroupState[HostState]) =>
          val prior = state.getOption.getOrElse(HostState(0L, 0L, 0L))
          val sorted = evts.toSeq.sortBy(_.ts.getTime)
          val next = sorted.foldLeft(prior) { (st, e) =>
            val t = e.ts.getTime
            // apply_defer rule: notBefore = max(existing, now) + delay
            HostState(st.count + 1, t, math.max(st.notBefore, t) + crawlDelayMs)
          }
          state.update(next)
          HostDecision(host, next.count, next.notBefore)
      }
  }

  /** Batch-parity version of [[hostRates]] (same plan shape minus the
    * watermark) — used for oracle checks and to keep one definition of
    * the aggregation semantics.
    */
  def hostRatesBatch(events: DataFrame): DataFrame = hostRates(events)

  /** Run a streaming query over a bounded source synchronously into a
    * memory sink; returns the collected result. Drives the real
    * micro-batch engine (used by tests and the streaming demo).
    */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
