package graft.model

import org.apache.spark.sql.types._

/** Core data model for the Spark-native crawl engine.
  *
  * Re-expresses the reference's request/response/dataset abstractions
  * (spire-rs/spire: crates/spire-core/src/context/http_body.rs:137,
  * request_extend.rs:39-184, dataset/mod.rs:143-176) as typed rows of
  * partitioned Datasets. See SURVEY.md §1.
  */

/** One frontier element == one pending request.
  *
  * Mirrors `http::Request` + its `Extensions` (Tag, Depth) from the
  * reference (crates/spire-core/src/context/request_extend.rs:39-114):
  *  - `tag`   null => fallback route (reference `Tag::Fallback`)
  *  - `depth` always >= 1 (reference `Depth(NonZeroU32)` clamps 0 -> 1)
  *  - `seq` is the global FIFO dequeue order (SURVEY §3.4): the crawl-order
  *    contract is carried by this column, not by the physical schedule.
  */
case class FrontierEntry(
    url: String,
    canonical: String,
    urlHash: Long,
    host: String,
    tag: String, // null => fallback
    depth: Int,
    priority: Int,
    discoveryRound: Int,
    seq: Long,
    parentSeq: Long, // -1 for seeds
    emissionIdx: Int
)

/** A seed registration (reference: Client::with_initial_request,
  * crates/spire-core/src/process/client.rs:196-250). Seeds enter the queue
  * in REVERSE registration order (process/runner.rs:110-121).
  */
case class Seed(url: String, tag: String, registrationIdx: Int)

/** One interleaved-document span (BASELINE.json input_hint).
  * kind: 'text' | 'media' | 'link'; mediaRef: null for text, the media
  * reference for media, the href for links. `offset` defines order.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One corpus document: doc_id is the canonical URL of the page. */
case class Doc(doc_id: String, spans: Seq[Span])

/** Fetch output for one scheduled request: frontier entry + resolved spans.
  * Re-expresses `Context::resolve` (context/mod.rs:49-55); in the engine
  * "fetch" is a deterministic join frontier >< docs on urlHash.
  */
case class FetchResult(
    url: String,
    canonical: String,
    urlHash: Long,
    host: String,
    tag: String,
    depth: Int,
    seq: Long,
    status: Int,
    spans: Seq[Span]
)

/** FlowControl outcome of one handled request (reference
  * crates/spire-core/src/context/flow_control.rs:74-90):
  * outcome in {continue, skip, wait, hold, fail};
  * deferQuery in {owner, single:<tag>, every, null}; deferMs the duration.
  */
case class RoundOutcome(
    seq: Long,
    urlHash: Long,
    tag: String,
    outcome: String,
    deferQuery: String,
    deferMs: Long
)

/** Extracted page record, modeled on the reference example record
  * (examples/basic_usage/data.rs:8-15 `PageContent`).
  */
case class PageRecord(
    url: String,
    title: String,
    contentLength: Long,
    nLinks: Int,
    nMedia: Int,
    scrapedRound: Int
)

/** URL-seen store row (SURVEY §2.6): hash-partitioned on urlHash. */
case class SeenEntry(urlHash: Long, canonical: String, firstSeq: Long, round: Int)

/** Politeness / robots rule for one host (broadcast table).
  * The reference only gestures at politeness via Wait/Hold signals
  * (flow_control.rs:84-86); the engine enforces budgets + robots.
  */
case class RobotsRule(
    host: String,
    disallow: Seq[String],
    crawlDelayMs: Long,
    hostBudget: Int,
    /** Allow prefixes overriding disallows by LONGEST-match precedence
      * (the de-facto Google semantics; ties -> allow). Empty = classic
      * disallow-only behavior. */
    allow: Seq[String] = Seq.empty
)

/** Per-round metrics, mirroring the reference success/failure accounting
  * (backend/utils/metric.rs:126-155): success = Continue|Wait,
  * failure = Skip|Hold|Fail.
  */
case class RoundMetrics(
    round: Int,
    frontierRows: Long,
    scheduledRows: Long,
    emittedChildren: Long,
    seenDelta: Long,
    success: Long,
    failure: Long,
    wallMs: Long
)

object Schemas {
  val span: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)
  ))
  val doc: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(span))
  ))
}

/** Engine configuration knobs (axis A: explicit partitioning choices).
  *
  * @param frontierPartitions shuffle/partition count for the frontier and
  *   seen tables — hash-partitioned on urlHash so the layout is scale-free:
  *   at 10^10 URLs only this count grows, the plan shape is unchanged.
  * @param lifo false = FIFO/BFS (reference registry default,
  *   dataset/registry.rs:115-131); true = LIFO/DFS ordering key
  *   (examples use InMemDataset::stack(), examples/basic_usage/main.rs:82).
  * @param dedup reference-exact mode never dedups (SURVEY §3.4); engine
  *   mode dedups against the seen table.
  * @param enforceDefer reference records Wait/Hold deadlines but never
  *   consumes them (runner.rs:224-226); engine mode re-queues deferred tags.
  * @param msPerRound logical-clock conversion for defer durations.
  */
case class CrawlConfig(
    maxRounds: Int = 10,
    maxDepth: Int = 10,
    defaultHostBudget: Int = Int.MaxValue,
    frontierPartitions: Int = 32,
    bloomShards: Int = 8,
    bloomExpectedItems: Long = 1000000L,
    bloomFpp: Double = 0.03,
    lifo: Boolean = false,
    dedup: Boolean = true,
    enforceDefer: Boolean = false,
    enforceAbort: Boolean = false,
    msPerRound: Long = 1000L,
    useBloomPrefilter: Boolean = true,
    /** approximate seen-prefilter tier: "bloom" (Spark sketch) or "cuckoo"
      * ([[graft.dedup.CuckooFilter]] — the north rule's other named
      * filter; supports delete, ~fewer bits/key at equal fpp). Exactness
      * never depends on the choice (the anti-join is the exact tier). */
    seenFilterKind: String = "bloom",
    /** Structural crawler-trap screen ([[graft.canon.UrlTraps]]): when
      * on, candidates whose canonical URL has a >=trapMaxRun consecutive
      * repeated path segment, >=trapMaxDepth path depth or >=trapMaxParams
      * query params are dropped before dedup/politeness. OFF by default —
      * the reference schedules whatever handlers emit, and golden traces
      * are defined with the screen off. */
    trapScreen: Boolean = false,
    trapMaxRun: Int = 3,
    trapMaxDepth: Int = 12,
    trapMaxParams: Int = 8,
    /** Above this many delay-bearing hosts, the per-host crawl-delay
      * ledger LEAVES THE DRIVER: the delay table stays a DataFrame (no
      * robots.collect), the (host, notBefore) ledger is a checkpointed
      * round table ("hostledger"), and the delay split/update are joins
      * instead of driver maps + isin literal lists. The driver path is
      * kept below the threshold (zero extra jobs; a typical crawl has
      * few delay hosts) — at web scale robots cover 10^6-10^8 hosts and
      * a driver map/IN-list would OOM. Set to 0 to force the distributed
      * path (the equivalence spec does). Traces are identical on both
      * paths. Default 10k (round-3 verdict #4: 100k distinct host
      * strings per round was a needlessly generous driver-side bound;
      * at 10k the collect is trivially small and crawls with broad
      * delay coverage promote to the distributed ledger sooner). */
    distributedDelayHosts: Int = 10000,
    /** Once the cumulative seen set reaches this many rows, mirror it as
      * a BUCKETED catalog table ([[graft.dedup.BucketedSeenStore]]) and
      * run the exact dedup anti-join co-partitioned against it — the
      * seen side (the 10^10 side) is never shuffled again; only the
      * bloom-surviving candidate slice repartitions. Below the
      * threshold Spark broadcasts the small seen side anyway. 0 forces
      * the mirror from round 0 (equivalence spec); -1 disables. */
    bucketedSeenMin: Long = 10000000L,
    /** compact the seen-delta family every K rounds (0 = off): bounds the
      * read-path union fan-in on long crawls; also merges the bloom family
      * into one right-sized filter (flat probe cost on long crawls).
      * ON by default (round-2 verdict #4: a long default-config crawl
      * accrued one bloom map per round and probed O(rounds) filters per
      * candidate): every 8 rounds bounds the family at <= 8 members while
      * short crawls never pay a compaction. */
    compactSeenEvery: Int = 8,
    /** salted two-phase per-host budget rank (<=1 = off): bounds the
      * hot-host window sort to 1/salts of the host's candidates per task.
      * Selected rows are identical to the unsalted rank. */
    budgetSalts: Int = 0,
    /** per-bucket row counts + content hashes in the round manifest. At
      * 10^10-row rounds the stats read-back doubles round I/O — disable
      * for throughput runs; manifests still carry exact row counts. */
    lineageStats: Boolean = true,
    /** carry the LIFO/DFS ordering key (`path` array<long>, grows one
      * element per depth) through frontier/trace. Only needed when the DFS
      * order is being reported — in FIFO production crawls it is dead
      * weight on every frontier/trace row; disable to cut round I/O. */
    trackPath: Boolean = true,
    /** MID-round cancellation (reference CancellationToken /
      * AbortHandle.abort, runner.rs:86-88,131-144, which aborts BETWEEN
      * requests): when true, `stopSignal` is additionally polled at stage
      * boundaries inside a round AND a watcher thread actively cancels the
      * crawl's running Spark jobs, so even a long fetch stage is
      * interruptible. The aborted round's partial tables are deleted and
      * its manifest never commits — resume replays it identically, so
      * stop-anywhere/resume-exactly still holds. false = round-boundary
      * stops only (round 2 behavior). */
    cancelMidRound: Boolean = true,
    /** target rows per hash bucket when writing round tables: the bucket
      * count ADAPTS to round size, capped at frontierPartitions. Crawl
      * rounds span orders of magnitude (10^3 seeds -> 10^7+ steady state);
      * a fixed count is wrong at both ends — tiny rounds pay per-file +
      * per-task overhead, huge rounds underpartition. 0 disables
      * (always frontierPartitions). */
    rowsPerBucket: Long = 250000L,
    /** Above this many frontier candidates, offer the round's scheduled
      * CHECKPOINT to the fetcher to write in its own join layout
      * ([[graft.engine.Fetcher.checkpointScheduled]]): one
      * bucketed-on-canonical shuffle+write instead of the engine's
      * urlHash checkpoint PLUS the fetcher's re-bucketed copy — heavy
      * rounds stop paying a redundant full shuffle+write+read of the
      * scheduled table. Skipped when lineageStats is on (per-bucket
      * manifest hashes follow the urlHash layout). -1 disables. */
    fusedCheckpointMin: Long = 500000L,
    /** Below this many frontier candidates (and with lineageStats off —
      * per-bucket manifest hashes need the written file), the round's
      * scheduled table is materialized as an in-memory/disk PERSIST
      * instead of a parquet checkpoint: small rounds pay the full
      * write+commit+read-back latency (the dominant per-round floor term
      * on the r5 floor probe) for a table nothing ever reads back —
      * resume needs only frontier/seen/manifests, and trace/records are
      * their own durable sinks. Crash-safety is unchanged: an uncommitted
      * round is replayed from the previous manifest either way. -1
      * disables (always write). */
    memCheckpointMax: Long = 500000L,
    /** Follow 3xx responses (continuous-crawl tier): a fetch whose corpus
      * row carries `redirect_to` surfaces as status 301 + `location`;
      * with this ON the engine (a) emits the location as a non-branching
      * child (the chain advances one hop per round as each hop is
      * discovered), (b) records every (src -> dst) redirect edge as a
      * durable round table, and (c) bulk-resolves the accumulated edges
      * ([[graft.engine.Redirects.resolve]], pointer doubling) and
      * REWRITES candidates whose canonical is a known redirect source to
      * the chain's final target BEFORE dedup/politeness — known chains
      * cost zero fetches and the politeness slot is charged to the FINAL
      * host; candidates resolving into a known cycle (or past
      * redirectMaxHops) are dropped. OFF by default: golden traces are
      * defined without 3xx semantics. */
    followRedirects: Boolean = false,
    /** Client redirect cap for [[followRedirects]] chain resolution
      * (chains longer than this, and true cycles, are dropped). */
    redirectMaxHops: Int = 8,
    /** Below this many redirect edges the per-round chain resolution
      * runs on the DRIVER ([[graft.engine.Redirects.resolveLocal]]) and
      * the rewrite map broadcasts — the distributed pointer doubling is
      * ~5 shuffle stages per rebuild, pure floor when the ledger holds a
      * handful of edges (same driver/distributed threshold pattern as
      * distributedDelayHosts; at web scale ledgers are 10^8+ edges and
      * stay on the doubling path). <= 0 forces the distributed path
      * (the equivalence spec does). */
    redirectDriverMax: Int = 100000,
    /** Below this many frontier candidates AND accumulated seen rows,
      * the round's candidate pipeline runs from a single-partition
      * coalesce of the frontier scan: SinglePartition satisfies every
      * operator's required distribution, so the dedup/budget/seq windows
      * and aggregations plan ZERO exchanges — one stage instead of 4-5
      * AQE stage-jobs of fixed overhead each (the measured small-round
      * floor). Identical results at any setting (total-order keys, exact
      * aggregation); <= 0 disables. The corpus/fetch side keeps its full
      * parallelism either way. */
    singlePartitionMax: Long = 10000L
)
