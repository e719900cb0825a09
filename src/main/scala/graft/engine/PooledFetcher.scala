package graft.engine

import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingDeque}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import graft.model.{Schemas, Span}

/** Pooled, health-checked, retrying fetch backend (S8) — the Spark
  * re-expression of the reference's WebDriver pool
  * (spire-rs/spire crates/spire-thirtyfour: pool/builder.rs:222-290 builds
  * a deadpool with capacity + timeouts; pool/manager.rs:20-120 creates and
  * RECYCLES connections with a health check; pool/connection.rs:121-180
  * resolves a request through a pooled connection with bounded
  * retry-on-transient-error).
  *
  * Executor-side anatomy:
  *  - [[ConnectionPool]]: one JVM-static pool per `poolId` — connections
  *    are created lazily ON the executor (never serialized), reused across
  *    rows AND rounds, health-checked at checkout (stale ones recycled,
  *    mirroring deadpool's recycle hook).
  *  - [[PooledFetcher]]: `mapPartitions` over the scheduled rows — the one
  *    genuinely imperative per-partition boundary in the engine (external
  *    I/O through a stateful client), exactly what mapPartitions is for.
  *    Transient errors (thrown) retry up to `maxRetries` times with
  *    exponential backoff on a FRESH connection; absent pages (None) are
  *    404s — not retried; exhausted retries surface as status 503, which
  *    the engine's F3 rule maps to `hold` (a handler error never fails
  *    the round — runner.rs:189-247 semantics).
  */
trait PageConnection {
  /** Checkout-time health probe (pool/manager.rs recycle check). */
  def isHealthy: Boolean
  /** Some(spans) = fetched; None = page absent (404, final);
    * throw = transient failure (retried).
    */
  def fetch(url: String): Option[Seq[Span]]
  def close(): Unit = {}
}

/** Serializable factory shipped to executors; connections themselves are
  * executor-local and never cross the wire (S7 pluggability).
  */
trait PageBackend extends Serializable {
  def connect(): PageConnection
}

object ConnectionPool {
  final class Stats {
    val created = new AtomicInteger
    val recycledUnhealthy = new AtomicInteger
    val retries = new AtomicInteger
  }
  private val pools =
    new ConcurrentHashMap[String, LinkedBlockingDeque[PageConnection]]()
  private val stats = new ConcurrentHashMap[String, Stats]()

  def statsFor(id: String): Stats =
    stats.computeIfAbsent(id, _ => new Stats)

  /** Borrow a healthy connection (creating one if the idle pool is dry),
    * run `f`, return the connection to the pool (up to `maxIdle`) unless
    * `f` threw — a throwing connection is closed, not recycled.
    */
  def withConnection[T](id: String, backend: PageBackend, maxIdle: Int)(
      f: PageConnection => T): T = {
    val pool = pools.computeIfAbsent(id,
      _ => new LinkedBlockingDeque[PageConnection]())
    val st = statsFor(id)
    var conn = pool.pollFirst()
    while (conn != null && !conn.isHealthy) {
      st.recycledUnhealthy.incrementAndGet()
      conn.close()
      conn = pool.pollFirst()
    }
    if (conn == null) {
      st.created.incrementAndGet()
      conn = backend.connect()
    }
    try {
      val out = f(conn)
      if (pool.size < maxIdle) pool.addFirst(conn) else conn.close()
      out
    } catch {
      case e: Throwable => conn.close(); throw e
    }
  }

  /** Test/ops hook: drop a pool's idle connections. */
  def drain(id: String): Unit = {
    val pool = pools.remove(id)
    if (pool != null) pool.forEach(_.close())
  }
}

class PooledFetcher(
    backend: PageBackend,
    poolId: String,
    poolSize: Int = 4,
    maxRetries: Int = 2,
    backoffBaseMs: Long = 0L
) extends Fetcher {

  def fetch(scheduled: DataFrame, scheduledCount: Long): DataFrame = {
    val inSchema = scheduled.schema
    val outSchema = inSchema
      .add("status", IntegerType)
      .add("spans", ArrayType(Schemas.span))
    val urlIdx = inSchema.fieldIndex("canonical")
    // locals: the closure must not capture the Fetcher (DataFrame field)
    val (b, id, ps, retries, backoff) =
      (backend, poolId, poolSize, maxRetries, backoffBaseMs)
    scheduled.mapPartitions { rows =>
      rows.map { row =>
        val url = row.getString(urlIdx)
        var attempt = 0
        var outcome: Either[Int, Option[Seq[Span]]] = Left(503)
        var done = false
        while (!done) {
          try {
            outcome = Right(ConnectionPool.withConnection(id, b, ps)(_.fetch(url)))
            done = true
          } catch {
            // NonFatal ONLY (ADVICE r02): InterruptedException must
            // propagate (with the flag restored) so Spark task-kill
            // cancels promptly, and fatal JVM errors (OOM etc.) must
            // never be masked as a page-level 503
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              throw e
            case scala.util.control.NonFatal(_) if attempt < retries =>
              ConnectionPool.statsFor(id).retries.incrementAndGet()
              attempt += 1
              if (backoff > 0) Thread.sleep(backoff << (attempt - 1))
            case scala.util.control.NonFatal(_) =>
              // exhausted: 503 -> engine holds, job lives
              outcome = Left(503)
              done = true
          }
        }
        val (status, spans) = outcome match {
          case Right(Some(sp)) =>
            (200, sp.map(s => Row(s.kind, s.text, s.media_ref, s.offset)))
          case Right(None) => (404, null)
          case Left(code) => (code, null)
        }
        Row.fromSeq(row.toSeq :+ status :+ spans)
      }
    }(Encoders.row(outSchema))
  }
}
