package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawler-trap heuristics — the frontier-side defence a crawler needs
  * the moment it leaves a test corpus: calendar pages, session-id
  * mirrors and mis-rooted relative links generate unbounded URL spaces
  * that canonicalization alone cannot collapse (the URLs are all
  * DISTINCT), so the scheduler screens candidates structurally before
  * they reach the seen-filter. (Reference analogue: none — spire
  * schedules whatever handlers emit; this is standard crawler hygiene,
  * cf. Heydon & Najork, "Mercator: A scalable, extensible Web crawler",
  * WWW 1999 §3.2's URL filters.)
  *
  * All detectors are pure Column expressions over the canonical URL —
  * split / filter / aggregate over the path segments, zero UDFs, zero
  * shuffles: a trap screen is a projection and must stay one at 10^10
  * candidates/round.
  */
object UrlTraps {

  /** `/a/b/c` of the canonical URL, "" when pathless. Scheme matching is
    * case-insensitive: the screen may run on raw candidate URLs too, and
    * an uppercase scheme must not let a trap evade the detectors. Raw
    * candidates without an authority — protocol-relative (`//h/a/b`) and
    * bare/relative paths (`a/b/c`, `file:/a/b`) — are screened on their
    * full path, so a trap-shaped relative link cannot evade by omitting
    * the scheme.
    */
  private def rawPath(url: Column): Column =
    when(url.rlike("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//"),
      regexp_extract(url,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^?#]*)", 1))
      .otherwise(regexp_extract(url,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?([^?#]*)", 1))

  /** Path segments, empties dropped (`/a//b/` -> [a, b]). */
  def pathSegments(url: Column): Column =
    filter(split(rawPath(url), "/"), s => s =!= "")

  /** Number of path segments. */
  def pathDepth(url: Column): Column = size(pathSegments(url))

  /** Length of the longest run of CONSECUTIVE identical path segments
    * (1 for any non-empty path, 0 for pathless) — `/x/x/x/` mirrors
    * score 3 while a legitimate `/java/java.util/` scores 2 at most
    * once. One fold over the segment array: state (prev, run, best).
    */
  def maxSegmentRun(url: Column): Column = {
    val segs = pathSegments(url)
    aggregate(
      segs,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (st, s) => {
        val run = when(s === st.getField("prev"),
          st.getField("run") + 1).otherwise(lit(1))
        struct(s.as("prev"), run.as("run"),
          greatest(run, st.getField("best")).as("best"))
      },
      st => st.getField("best"))
  }

  /** Number of query parameters (`?a=1&b=2` -> 2; no query -> 0). The
    * query is anchored at the FIRST `?` before any `#`: a value that
    * itself contains `?` (redirect/tracking URLs like `?url=http://x?k=1`)
    * still counts from the real query start, and `page#frag?a&b` has a
    * fragment that merely contains a question mark, not a query.
    */
  def queryParamCount(url: Column): Column =
    size(filter(split(regexp_extract(url, "^[^?#]*\\?([^#]*)", 1), "&"),
      p => p =!= ""))

  /** Session-id marker (Mercator §3.2's other standard screen): a
    * `;jsessionid=` path parameter or a `phpsessid`/`sessionid`/`sid`/
    * `aspsessionid*` query key. These mint a fresh "distinct" URL per
    * visitor, so the same page re-enters the frontier forever unless
    * screened (canonicalization keeps the query — it is load-bearing on
    * real sites — so the screen, not the canonicalizer, owns this).
    */
  def hasSessionId(url: Column): Column =
    url.rlike("(?i)(;jsessionid=|[?&](phpsessid|sessionid|sid|aspsessionid[a-z0-9]*)=)")

  /** Mercator-style structural trap verdict. Defaults: a segment
    * repeated 3+ times in a row, 12+ path segments, 8+ query
    * parameters, or a session-id marker — each a shape real content
    * almost never has and generated URL spaces almost always develop.
    */
  def isTrap(url: Column, maxRun: Int = 3, maxDepth: Int = 12,
             maxParams: Int = 8, screenSessionIds: Boolean = true): Column = {
    val structural = (maxSegmentRun(url) >= maxRun) ||
      (pathDepth(url) >= maxDepth) ||
      (queryParamCount(url) >= maxParams)
    if (screenSessionIds) structural || hasSessionId(url) else structural
  }
}
