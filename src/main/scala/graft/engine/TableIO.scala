package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Iceberg-style table layout without an Iceberg runtime (none ships in
  * /opt/spark/jars — SURVEY §1.4): hash-partitioned parquet per round plus
  * a per-round JSON manifest carrying row counts, per-partition lineage
  * (rows + content hash per hash-bucket) and completion markers. Gives the
  * same operational capabilities the north rule asks of Iceberg here:
  * atomic round commits (manifest written last, via temp-file rename),
  * resumability (latest manifest with completed=true), and partition-level
  * audit.
  */
object TableIO {

  case class PartStat(bucket: Int, rows: Long, contentHash: Long)

  case class TableStat(name: String, rows: Long, parts: Seq[PartStat])

  /** Per-write Hadoop overrides for every round-table commit (guide §6 +
    * the r5 floor probe: each tiny parquet commit cost 150-800 ms on this
    * VM, and a crawl pays 3-5 commits per round). v2 task commits move
    * files straight to the destination (one rename instead of a
    * task-then-job double rename — safe here because every round dir is
    * either manifest-committed or deleted/overwritten wholesale on
    * replay), and the _SUCCESS marker is dead weight (completion is the
    * round MANIFEST, written last).
    */
  val writeOpts: Map[String, String] = Map(
    "mapreduce.fileoutputcommitter.algorithm.version" -> "2",
    "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false")

  /** Write `df` for round `round` under `dir/name/round=<k>` with a
    * `_bucket = hashCol % buckets` lineage column (axis A: the layout is
    * the scale knob — at 10^10 rows only `buckets` changes).
    *
    * The rows are NOT physically re-clustered by `_bucket` (r6): plain
    * parquet reads never recover a hash partitioning, so the old
    * `repartition(buckets, _bucket)` was one full Exchange of the round's
    * biggest table (the children/frontier write) for a layout no reader
    * exploited — the dedup anti-join re-shuffles both sides regardless,
    * and the per-bucket manifest stats group by the _bucket COLUMN, which
    * is file-layout-independent. Output file count now follows the
    * upstream partitioning (AQE-coalesced); single-bucket (small-round)
    * writes still coalesce to one file.
    */
  def writeRound(
      df: DataFrame,
      dir: String,
      name: String,
      round: Int,
      hashCol: String,
      buckets: Int,
      withStats: Boolean = true
  ): TableStat = {
    val path = s"$dir/$name/round=$round"
    val bucketed = df.withColumn("_bucket",
      pmod(col(hashCol), lit(buckets.toLong)).cast("int"))
    // row count via an Observation collected by the WRITE job itself —
    // zero extra actions (the old footer-count read-back was one more
    // job per table per round, a pure serial-floor cost at 10^4-round
    // crawls).
    val obs = org.apache.spark.sql.Observation()
    val observed = bucketed.observe(obs, count(lit(1)).as("rows"))
    (if (buckets == 1) observed.coalesce(1) else observed)
      .write.mode("overwrite").options(writeOpts).parquet(path)
    val rows = obs.get("rows").asInstanceOf[Long]
    if (!withStats) TableStat(name, rows, Seq.empty)
    else TableStat(name, rows, bucketStats(df.sparkSession, path))
  }

  /** Per-bucket (rows, content-hash) lineage stats of a WRITTEN round
    * table — hashes what is on disk. Callable separately from the write
    * so the engine can take it off the round's serial chain (the
    * scheduled table's stats overlap the fetch).
    */
  def bucketStats(spark: SparkSession, path: String): Seq[PartStat] = {
    val back = spark.read.parquet(path)
    val rowHash = xxhash64(back.columns.filterNot(_ == "_bucket")
      .sorted.map(col).toIndexedSeq: _*)
    back
      .select(col("_bucket"), rowHash.as("_h"))
      .groupBy(col("_bucket"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(_h)").as("ch"))
      .collect()
      .map(r => PartStat(r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_.bucket)
  }

  def roundPath(dir: String, name: String, round: Int): String =
    s"$dir/$name/round=$round"

  /** Write without the stats read-back (for sink tables whose row counts
    * are already known from the round's aggregates).
    */
  def writeRoundLite(
      df: DataFrame,
      dir: String,
      name: String,
      round: Int,
      hashCol: String,
      buckets: Int,
      rows: Long
  ): TableStat = {
    val path = s"$dir/$name/round=$round"
    val bucketed = df.withColumn("_bucket",
      pmod(col(hashCol), lit(buckets.toLong)).cast("int"))
    (if (buckets == 1) bucketed.coalesce(1) else bucketed)
      .write.mode("overwrite").options(writeOpts).parquet(path)
    TableStat(name, rows, Seq.empty)
  }

  /** Read a round's table back (lineage cut: the plan restarts from the
    * parquet scan — the known fix for iterative-Dataset plan growth).
    */
  def readRound(spark: SparkSession, dir: String, name: String, round: Int): DataFrame =
    spark.read.parquet(s"$dir/$name/round=$round").drop("_bucket")

  /** Read the union of ALL rounds <= `round` of an append-only (delta)
    * table — the Iceberg-style accumulating read path (the `seen` store
    * appends one delta per round instead of rewriting O(n) rows).
    * If a compaction snapshot exists at some round c <= round
    * (`<name>_compact/round=c`), read it plus only the deltas after c.
    */
  def readDeltas(spark: SparkSession, dir: String, name: String, round: Int): DataFrame = {
    val compactAt = (0 to round)
      .filter(r => Files.isDirectory(Paths.get(s"$dir/${name}_compact/round=$r")))
      .lastOption
    val base = compactAt.map(c => Seq(s"$dir/${name}_compact/round=$c"))
      .getOrElse(Seq.empty)
    val deltas = ((compactAt.map(_ + 1).getOrElse(0)) to round)
      .map(r => s"$dir/$name/round=$r")
      .filter(p => Files.isDirectory(Paths.get(p)))
    spark.read.parquet((base ++ deltas): _*).drop("_bucket")
  }

  /** Union of ALL round deltas <= `round`, IGNORING compaction snapshots.
    * For readers that may run CONCURRENTLY with [[compactDeltas]] (ADVICE
    * r05 medium: the seen-mirror bulkLoad raced the compactor — a snapshot
    * dir becomes visible at job setup, before its parquet files commit,
    * so snapshot selection could pick an empty/partial snapshot). Raw
    * deltas are append-only and stay on disk after compaction, so this
    * read is race-free by construction.
    */
  def readDeltasRaw(spark: SparkSession, dir: String, name: String,
      round: Int): DataFrame = {
    val deltas = (0 to round)
      .map(r => s"$dir/$name/round=$r")
      .filter(p => Files.isDirectory(Paths.get(p)))
    spark.read.parquet(deltas: _*).drop("_bucket")
  }

  /** Compact all deltas <= `round` into one snapshot
    * (`<name>_compact/round=<round>`). Subsequent [[readDeltas]] calls read
    * the snapshot + newer deltas only — bounds the union fan-in on very
    * long crawls. The old deltas stay on disk (lineage/audit); physical
    * GC is an operational concern outside the engine.
    */
  def compactDeltas(spark: SparkSession, dir: String, name: String,
      round: Int, hashCol: String, buckets: Int): TableStat = {
    val all = readDeltas(spark, dir, name, round)
    writeRoundCompact(all, dir, s"${name}_compact", round, hashCol, buckets)
  }

  private def writeRoundCompact(df: DataFrame, dir: String, name: String,
      round: Int, hashCol: String, buckets: Int): TableStat = {
    val path = s"$dir/$name/round=$round"
    // coalesce, not repartition (r6): the snapshot's only job is bounding
    // the delta-union fan-in, so bounding the FILE count needs a narrow
    // coalesce, not a full Exchange of the accumulated seen set
    df.withColumn("_bucket",
        pmod(col(hashCol), lit(buckets.toLong)).cast("int"))
      .coalesce(buckets)
      .write.mode("overwrite").options(writeOpts).parquet(path)
    val rows = df.sparkSession.read.parquet(path).count()
    TableStat(name, rows, Seq.empty)
  }

  // ---- manifest ----

  def manifestJson(
      round: Int,
      tables: Seq[TableStat],
      metrics: graft.model.RoundMetrics,
      completed: Boolean,
      deferLedger: Map[String, Int] = Map.empty,
      hostNotBefore: Map[String, Int] = Map.empty,
      /** per-route success/failure (reference Metric middleware,
        * metric.rs:126-155); "" = fallback route. */
      byTag: Map[String, (Long, Long)] = Map.empty,
      /** round whose "hostledger" table holds the DISTRIBUTED crawl-delay
        * ledger (CrawlConfig.distributedDelayHosts) — the inline
        * host_not_before map stays empty in that mode. */
      hostLedgerRound: Option[Int] = None
  ): String = {
    def parts(ps: Seq[PartStat]) = ps.map(p =>
      s"""{"bucket":${p.bucket},"rows":${p.rows},"content_hash":${p.contentHash}}""")
      .mkString("[", ",", "]")
    val ts = tables.map(t =>
      s""""${t.name}":{"rows":${t.rows},"partitions":${parts(t.parts)}}""")
      .mkString("{", ",", "}")
    val m = metrics
    s"""{"round":$round,"tables":$ts,"metrics":{"frontier_rows":${m.frontierRows},""" +
      s""""scheduled_rows":${m.scheduledRows},"emitted_children":${m.emittedChildren},""" +
      s""""seen_delta":${m.seenDelta},"success":${m.success},"failure":${m.failure},""" +
      s""""wall_ms":${m.wallMs}},"metrics_by_tag":${byTagJson(byTag)},""" +
      s""""ledgers":{"defer":${ledgerJson(deferLedger)},""" +
      s""""host_not_before":${ledgerJson(hostNotBefore)}""" +
      hostLedgerRound.map(r => s""","host_ledger_round":$r""").getOrElse("") +
      s"""},"completed":$completed}"""
  }

  private def byTagJson(m: Map[String, (Long, Long)]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, (s, f)) =>
        s""""${jsonEscape(k)}":{"success":$s,"failure":$f}""" }
      .mkString("{", ",", "}")

  // ---- politeness ledgers (checkpointed so resume == straight-through in
  //      enforce modes — ADVICE r01: round 1 restarted with empty ledgers,
  //      resurrecting killed tags and dropping pending defers) ----

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    // braces unicode-escaped (legal JSON) so parseLedger's object-bounds
    // scan can never be fooled by a brace inside a tag/host key
    case c if c < ' ' || c == '{' || c == '}' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonUnescape(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'u' =>
            sb += Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar
            i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def ledgerJson(m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${jsonEscape(k)}":$v""" }
      .mkString("{", ",", "}")

  /** Parse one ledger object out of a manifest this module wrote (values
    * are ints, keys are jsonEscape'd — a full JSON parser is not needed).
    *
    * The scan is ANCHORED inside the real `"ledgers"` object (ADVICE r02:
    * metrics_by_tag serializes BEFORE the ledgers and its keys are user
    * route names — a route literally tagged "defer" emitted an earlier
    * `"defer":{...}` and resume restored a garbage ledger). The anchor is
    * the LAST `"ledgers":{` — safe because ledger/tag KEYS are
    * brace-escaped by [[jsonEscape]] and ledger VALUES are ints, so the
    * real ledgers object (written after metrics_by_tag) can never be
    * followed by another occurrence; within the anchored scope, only
    * genuine ledger objects can match `"<name>":{`.
    */
  private def parseLedger(manifest: String, name: String): Map[String, Int] = {
    val anchor = manifest.lastIndexOf("\"ledgers\":{")
    if (anchor < 0) return Map.empty
    val scope = manifest.substring(anchor)
    val tag = s""""$name":{"""
    val start = scope.indexOf(tag)
    if (start < 0) return Map.empty
    val body = scope.substring(start + tag.length,
      scope.indexOf('}', start + tag.length))
    if (body.isEmpty) Map.empty
    else {
      val entry = """"((?:[^"\\]|\\.)*)":(-?\d+)""".r
      entry.findAllMatchIn(body).map { m =>
        jsonUnescape(m.group(1)) -> m.group(2).toInt
      }.toMap
    }
  }

  /** (deferLedger, hostNotBefore) from a round's manifest; empty maps for
    * pre-ledger manifests.
    */
  def readLedgers(dir: String, round: Int): (Map[String, Int], Map[String, Int]) = {
    val m = readManifest(dir, round)
    (parseLedger(m, "defer"), parseLedger(m, "host_not_before"))
  }

  /** Round of the distributed crawl-delay ledger table recorded in this
    * round's manifest, if the crawl ran in distributed-ledger mode.
    */
  def readHostLedgerRound(dir: String, round: Int): Option[Int] = {
    val m = readManifest(dir, round)
    val anchor = m.lastIndexOf("\"ledgers\":{")
    if (anchor < 0) return None
    """"host_ledger_round":(\d+)""".r
      .findFirstMatchIn(m.substring(anchor))
      .map(_.group(1).toInt)
  }

  /** Atomic manifest commit: write temp then rename. */
  def writeManifest(dir: String, round: Int, json: String): Unit = {
    val mdir = Paths.get(dir, "_manifests")
    Files.createDirectories(mdir)
    val tmp = mdir.resolve(s".round-$round.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, mdir.resolve(s"round-$round.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest round with a completed=true manifest, or -1. */
  def latestCompletedRound(dir: String): Int = {
    val mdir = Paths.get(dir, "_manifests")
    if (!Files.isDirectory(mdir)) return -1
    val s = Files.list(mdir) // closed below: each leak is one fd (ADVICE r01)
    try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("round-") && n.endsWith(".json") =>
          val body = new String(
            Files.readAllBytes(mdir.resolve(n)), StandardCharsets.UTF_8)
          (n.stripPrefix("round-").stripSuffix(".json").toInt,
            body.contains("\"completed\":true"))
        }
        .collect { case (r, true) => r }
        .foldLeft(-1)(math.max)
    } finally s.close()
  }

  def readManifest(dir: String, round: Int): String =
    new String(Files.readAllBytes(
      Paths.get(dir, "_manifests", s"round-$round.json")), StandardCharsets.UTF_8)

  /** Remove every table's `round=<k>` directory for an UNCOMMITTED round
    * (mid-round abort cleanup). Without this, `RunResult.trace/records` —
    * which list round dirs directly — would surface rows from a round
    * whose manifest never committed. Rounds with a committed manifest are
    * never deleted (the atomic unit stays the manifest commit).
    */
  def deleteRoundDirs(dir: String, round: Int): Unit = {
    require(round > latestCompletedRound(dir),
      s"refusing to delete committed round $round")
    Seq("scheduled", "trace", "records", "frontier", "seen",
        "hostledger", "redirects").foreach(deleteTableRound(dir, _, round))
  }

  /** Remove one table's `round=<k>` dir (no-op when absent). Used by the
    * mid-round abort cleanup and by hostledger snapshot rotation (each
    * hostledger round is a FULL snapshot, so once a later round's
    * manifest commits, earlier snapshots are dead).
    */
  def deleteTableRound(dir: String, table: String, round: Int): Unit = {
    val p = Paths.get(dir, table, s"round=$round")
    if (Files.isDirectory(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }
}
