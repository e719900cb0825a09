package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.functions._

/** URL canonicalization (north-rule op; the reference has no canonicalizer —
  * its closest analogue is the `map_data` URL-lowercasing example,
  * spire-rs/spire crates/spire-core/src/dataset/utils/mod.rs:38-47).
  *
  * Rules (all standard WHATWG-ish):
  *   1. trim; strip fragment (`#...`)
  *   2. lowercase scheme + host; strip userinfo; keep bracketed IPv6 hosts
  *   3. drop default ports (:80 http, :443 https)
  *   4. empty path -> "/"; RFC 3986 §5.2.4 dot-segment removal
  *   5. strip trailing "/" on non-root paths
  *   6. sort query parameters; drop empty query ("?")
  *
  * TWO implementations with pinned-equal semantics:
  *   - [[canonicalize]]/[[host]]: fused Catalyst expressions
  *     ([[CanonicalizeUrl]]/[[UrlHost]] -> [[CanonCore]]) — one static call
  *     in generated code. This is what the engine uses: the round-1 Column
  *     tree re-expanded the URL regex per component and blew Janino's 64 KB
  *     method limit inside the crawl round's children projection,
  *     de-optimizing every round to interpreted execution.
  *   - [[canonicalizeCol]]/[[hostCol]]: the pure-Column form (regexp/string
  *     built-ins only) — kept as the executable spec: CanonSpec pins
  *     fused == Column on a property corpus, and the same transform is
  *     expressible in ANSI SQL for the DuckDB oracle (SparkEntry.oracleSql).
  */
object Canon {

  private val schemeR = "^([a-zA-Z][a-zA-Z0-9+.-]*):\\/\\/"
  // captures: 1=scheme, 2=authority (userinfo@host:port), 3=path, 4=?query
  private val urlR = "^([a-zA-Z][a-zA-Z0-9+.-]*):\\/\\/([^\\/?#]*)([^?#]*)(\\?[^#]*)?.*$"

  // ---- fused expressions (engine hot path) ----

  /** Full canonical form. Null/non-URL input -> null (dropped upstream). */
  def canonicalize(url: Column): Column =
    GraftExpr.column(CanonicalizeUrl(GraftExpr.expression(url)))

  /** host (authority minus userinfo/port), lowercased; "" for non-URLs. */
  def host(url: Column): Column =
    GraftExpr.column(UrlHost(GraftExpr.expression(url)))

  // ---- pure-Column form (executable spec / oracle portability) ----

  /** scheme, lowercased. */
  def scheme(url: Column): Column = lower(regexp_extract(url, urlR, 1))

  /** authority with userinfo stripped ("user:pass@h:80" -> "h:80"). */
  private def authority(url: Column): Column =
    regexp_replace(regexp_extract(url, urlR, 2), "^[^@]*@", "")

  /** host as a Column tree: bracketed IPv6 literal or up-to-first-colon. */
  def hostCol(url: Column): Column =
    lower(regexp_extract(authority(url), "^(\\[[^\\]]*\\]|[^:]*)", 1))

  /** explicit port or empty string. */
  def port(url: Column): Column =
    regexp_extract(authority(url), ":([0-9]+)$", 1)

  /** path; "" when absent. */
  def path(url: Column): Column = regexp_extract(url, urlR, 3)

  /** query string without the leading '?'; "" when absent. */
  def query(url: Column): Column =
    regexp_extract(regexp_extract(url, urlR, 4), "^\\?(.*)$", 1)

  /** Full canonical form as a pure Column tree — semantics identical to
    * [[canonicalize]] (pinned by CanonSpec's differential property).
    * NOT for wide projections: inlining re-expands the URL regex per
    * component (the round-1 64 KB-codegen defect).
    */
  def canonicalizeCol(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "") // strip fragment
    val sch = scheme(u)
    val h = hostCol(u)
    val p0 = port(u)
    // default-port elision
    val keepPort = (p0 =!= "") &&
      !((sch === "http" && p0 === "80") || (sch === "https" && p0 === "443"))
    val portPart = when(keepPort, concat(lit(":"), p0)).otherwise(lit(""))
    val rawPath = path(u)
    val p1 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val p1b = removeDotSegments(p1)
    // strip trailing slash on non-root
    val p2 = when(p1b =!= "/", regexp_replace(p1b, "\\/$", "")).otherwise(p1b)
    val q0 = query(u)
    val qSorted = concat_ws("&", sort_array(split(q0, "&")))
    val qPart = when(q0 === "", lit("")).otherwise(concat(lit("?"), qSorted))
    when(regexp_extract(u, schemeR, 1) === "", lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, p2, qPart))
  }

  /** RFC 3986 §5.2.4 dot-segment removal, bounded-iteration form:
    * "/./" collapses, "seg/../" cancels. Each pass eliminates ONE nesting
    * level of `seg/..` pairs (matches cannot overlap), so 8 passes handle
    * nesting depth <= 8 — this Column twin's DOCUMENTED bound. The fused
    * engine form ([[CanonCore.removeDotSegments]]) iterates the same pass
    * to fixpoint (data-dependent loops are not expressible in a Column
    * tree); CanonSpec's differential corpus stays within the bound.
    * Leading "/../" at the root clamps to "/".
    */
  def removeDotSegments(p: Column): Column = {
    def once(c: Column): Column = {
      val noDot = regexp_replace(c, "/\\.(?=/|$)", "")
      regexp_replace(noDot, "/(?!\\.\\.(?:/|$))[^/]+/\\.\\.(?=/|$)", "")
    }
    val reduced = (1 to 8).foldLeft(p)((c, _) => once(c))
    val clamped = regexp_replace(reduced, "^(/\\.\\.)+(/|$)", "/")
    when(clamped === "", lit("/")).otherwise(clamped)
  }

  /** Partition key for the frontier / seen tables (SURVEY §2.6). */
  def urlHash(canonical: Column): Column = xxhash64(canonical)
}
