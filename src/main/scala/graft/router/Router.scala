package graft.router

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tag-based dispatch, re-expressing the reference router
  * (spire-rs/spire crates/spire/src/routing/mod.rs:194-205,
  * tag_router.rs:144-167): exact tag lookup, miss -> fallback.
  *
  * Handlers here are COLUMN-LEVEL: each handler contributes expressions
  * evaluated over the fetched-row columns (`url, canonical, urlHash, host,
  * tag, depth, seq, status, spans`). Dispatch compiles to a single
  * `when($"tag" === t, ...)` chain per output column, so the whole routed
  * round stays in one Catalyst plan / one codegen stage — no per-tag job
  * fan-out, no driver loop over tags.
  */
final case class Handler(
    /** array<struct<url,tag,branch,emissionIdx,priority>> of discovered
      * children. `tag` null => inherit parent tag (reference RequestQueue
      * default-tag attachment, request_queue.rs:199-215); `branch` true =>
      * depth+1 (request_queue.rs:134-154).
      */
    children: Column,
    /** struct<outcome,deferQuery,deferMs> — see [[FlowControl]]. */
    outcome: Column
)

object Handler {
  val childType =
    "array<struct<url:string,tag:string,branch:boolean,emissionIdx:int,priority:int>>"

  val noChildren: Column = array().cast(childType)

  /** The default endpoint: Continue, no children (reference fallback,
    * routing/endpoint.rs:236-256).
    */
  val continue: Handler = Handler(noChildren, FlowControl.continueOutcome)

  /** Standard link-following handler: every `kind='link'` span becomes a
    * branched child (depth+1, inherited tag), page metadata recorded.
    */
  def linkFollower(priority: Column = lit(0)): Handler = {
    val links = filter(col("spans"), s => s("kind") === "link")
    val children = transform(links, (s, i) =>
      struct(
        s("media_ref").as("url"),
        lit(null).cast("string").as("tag"), // inherit parent tag
        lit(true).as("branch"),
        i.cast("int").as("emissionIdx"),
        priority.cast("int").as("priority")))
    Handler(children, FlowControl.continueOutcome)
  }
}

/** Router = tag -> handler + fallback. Duplicate registration fails fast at
  * build time, mirroring the reference's conflict panic
  * (routing/tag_router.rs:37-51); `merge` unions two routers
  * (routing/mod.rs:368-372).
  */
final case class Router(
    routes: Map[String, Handler],
    fallback: Handler = Handler.continue
) {
  def route(tag: String, h: Handler): Router = {
    require(!routes.contains(tag), s"duplicate route for tag '$tag'")
    copy(routes = routes + (tag -> h))
  }

  def merge(other: Router): Router = {
    val dup = routes.keySet.intersect(other.routes.keySet)
    require(dup.isEmpty, s"conflicting routes on merge: $dup")
    copy(routes = routes ++ other.routes)
  }

  /** Middleware: wrap every handler (reference Router::layer,
    * routing/mod.rs:388-404).
    */
  def layer(f: Handler => Handler): Router =
    Router(routes.map { case (k, v) => k -> f(v) }, f(fallback))

  private def dispatch(pick: Handler => Column): Column =
    routes.foldLeft(pick(fallback)) { case (acc, (t, h)) =>
      when(col("tag") === t, pick(h)).otherwise(acc)
    }

  /** Evaluate the routed handlers over a fetched-round DataFrame: adds
    * `children` and `outcome` columns in one projection.
    */
  def apply(fetched: DataFrame): DataFrame =
    fetched
      .withColumn("children", dispatch(_.children))
      .withColumn("outcome", dispatch(_.outcome))
}

/** FlowControl conversion matrix, mirroring the reference exactly
  * (crates/spire-core/src/context/flow_control.rs:117-191 and
  * error.rs:295-310):
  *
  *   ()                 -> Continue
  *   Duration d         -> Wait(Owner, d)
  *   Option None        -> Continue;  Some(x) -> conv(x)
  *   Result Ok(x)       -> conv(x);   Err(x)  -> FLIP(conv(x))
  *       where FLIP: Continue<->Skip, Wait<->Hold (queries preserved)
  *   Error (w/ query q) -> Fail(q);   Error (plain) -> Hold(Owner, 0)
  *
  * Success/failure accounting (backend/utils/metric.rs:126-155):
  * success = Continue|Wait, failure = Skip|Hold|Fail.
  */
object FlowControl {
  val outcomeType = "struct<outcome:string,deferQuery:string,deferMs:bigint>"

  def mk(outcome: Column, deferQuery: Column, deferMs: Column): Column =
    struct(outcome.as("outcome"), deferQuery.as("deferQuery"),
      deferMs.cast("long").as("deferMs"))

  val continueOutcome: Column =
    mk(lit("continue"), lit(null).cast("string"), lit(0L))

  def waitOwner(ms: Column): Column = mk(lit("wait"), lit("owner"), ms)

  /** TagQuery::List encoding "list:a,b" (flow_control.rs:49-50, is_match
    * :62 — matches every tag in the list). Commas are the separator, so
    * member tags must not contain one; fail fast at build time.
    */
  def listQuery(tags: Seq[String]): Column = {
    require(tags.nonEmpty, "TagQuery::List needs at least one tag")
    require(tags.forall(t => t != null && t.nonEmpty && !t.contains(",")),
      s"list tags must be non-empty and comma-free: $tags")
    lit("list:" + tags.mkString(","))
  }

  /** Wait(List(tags), ms) — defer every listed tag. */
  def waitTags(tags: Seq[String], ms: Column): Column =
    mk(lit("wait"), listQuery(tags), ms)

  /** Hold(List(tags), ms). */
  def holdTags(tags: Seq[String], ms: Column): Column =
    mk(lit("hold"), listQuery(tags), ms)

  /** Column-level conversion for a handler result encoded as
    * (kind, isErr, deferMs): kind in {unit, duration, error, error_query}.
    * `isErr` applies the Result-flip.
    */
  def convert(kind: Column, isErr: Column, deferMs: Column,
      queryTag: Column): Column = {
    val base = when(kind === "unit", continueOutcome)
      .when(kind === "duration", waitOwner(deferMs))
      .when(kind === "error_query",
        mk(lit("fail"), queryTag, lit(0L)))
      .otherwise(mk(lit("hold"), lit("owner"), lit(0L))) // plain error
    val flipped = when(kind === "unit",
        mk(lit("skip"), lit(null).cast("string"), lit(0L)))
      .when(kind === "duration", mk(lit("hold"), lit("owner"), deferMs))
      .when(kind === "error_query", mk(lit("fail"), queryTag, lit(0L)))
      .otherwise(mk(lit("hold"), lit("owner"), lit(0L)))
    when(isErr, flipped).otherwise(base)
  }

  /** Scala mirror of [[convert]] for the sequential oracle + tests. */
  def convertLocal(kind: String, isErr: Boolean, deferMs: Long,
      queryTag: String): (String, String, Long) = {
    val base = kind match {
      case "unit"        => ("continue", null, 0L)
      case "duration"    => ("wait", "owner", deferMs)
      case "error_query" => ("fail", queryTag, 0L)
      case _             => ("hold", "owner", 0L)
    }
    if (!isErr) base
    else kind match {
      case "unit"        => ("skip", null, 0L)
      case "duration"    => ("hold", "owner", deferMs)
      case "error_query" => ("fail", queryTag, 0L)
      case _             => ("hold", "owner", 0L)
    }
  }

  /** The Metric-middleware success set (metric.rs:126-155) — one
    * definition for the Column predicate and the driver-side fold.
    */
  val successOutcomes: Set[String] = Set("continue", "wait")

  def isSuccess(outcome: Column): Column =
    outcome.isin(successOutcomes.toSeq: _*)
}
