package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution with loop detection — what the frontier
  * must do with 3xx responses BEFORE scheduling: following a chain one
  * hop per crawl round wastes a politeness slot (and a round-trip) per
  * hop, so the scheduler resolves chains to their final target in bulk
  * and schedules only that. (The reference's backend surfaces redirects
  * as plain responses, crates/spire-core/src/backend.rs — chain policy
  * is left to the user; this is the Spark-native bulk version of the
  * standard "follow up to N redirects, abort cycles" client rule.)
  *
  * Semantics (per src URL in `edges`): follow (src -> dst) hops until a
  * TERMINAL node (one with no outgoing edge) is reached.
  *   - reached within `maxHops` hops -> (final_url, hops, looped=false)
  *   - not reached (cycle, or chain longer than maxHops)
  *                 -> (final_url=null, hops=null, looped=true)
  *
  * Execution is POINTER DOUBLING, not per-hop iteration: round k
  * composes the "follow 2^(k-1) hops or stop at a terminal" map with
  * itself via ONE self-join, so `ceil(log2(maxHops))` shuffles resolve
  * what naive iteration needs `maxHops` shuffles for (5 vs 32 at the
  * HTTP-client-standard cap). Composition stops at terminals for free:
  * the map's key set is exactly the nodes WITH an outgoing edge, so a
  * chain that has already hit a terminal finds no row to compose with
  * and passes through the left join unchanged, hop count exact.
  *
  * At 10^10 frontier scale both join sides are hash-partitioned on the
  * node key; no driver state, no broadcast of anything unbounded.
  */
object Redirects {

  /** @param edges   (src, dst) — at most one outgoing edge per src
    *                (an HTTP response has one Location). Callers with
    *                duplicate observations dedup first.
    * @param maxHops client redirect cap (chains longer than this are
    *                reported `looped` — indistinguishable from a cycle
    *                to a capped client, and treated the same).
    * @param checkpoint optional per-round materialization (default:
    *                none). The self-join consumes round k-1 through two
    *                differently-keyed Exchanges, but ReuseExchange
    *                dedups everything BELOW them (round k-1's own input
    *                shuffles canonicalize equal under both consumers),
    *                so the only duplicated work per round is one SMJ
    *                merge+project pass — measured CHEAPER than eagerly
    *                materializing 10M rows per round (probe: 74.9 s
    *                plain vs 107.8 s with localCheckpoint). rounds is
    *                log2(maxHops) <= 6 for any sane cap, so lineage
    *                depth is bounded without cuts; pass
    *                `_.localCheckpoint()` if driving this past ~8 rounds.
    * @return one row per src: (url, final_url, hops, looped)
    */
  def resolve(edges: DataFrame, maxHops: Int,
      checkpoint: DataFrame => DataFrame = identity): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val rounds = 32 - Integer.numberOfLeadingZeros(
      math.max(1, maxHops - 1)) // ceil(log2(maxHops))

    // m: u -> (cur, hops) == "following `hops` edges from u lands at
    // cur", where cur is terminal OR hops == 2^k after k rounds.
    var m = edges.select(col("src").as("u"), col("dst").as("cur"),
      lit(1L).as("hops"))
    for (_ <- 0 until rounds) {
      val mk = checkpoint(m)
      val b = mk.select(col("u").as("_bu"), col("cur").as("_bcur"),
        col("hops").as("_bhops"))
      m = mk.join(b, mk("cur") === b("_bu"), "left")
        .select(col("u"),
          coalesce(col("_bcur"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("_bhops"), lit(0L))).as("hops"))
    }

    // Terminal test (see resolveLocal for the driver-side twin): cur has
    // no outgoing edge. Chains of length in
    // (maxHops, 2^rounds] DID resolve exactly but exceed the client cap
    // -> looped, same as true cycles (which never compose to a terminal
    // and sit at hops == 2^rounds).
    // src is unique under the one-outgoing-edge contract — no distinct
    // (it would add a full aggregate+exchange over 10^10 keys for a
    // logical no-op; a violated contract has already corrupted the
    // doubling join above, so dedup here could not rescue anything).
    val srcs = edges.select(col("src").as("_t"))
    m.join(srcs, m("cur") === srcs("_t"), "left")
      .withColumn("_resolved", col("_t").isNull && col("hops") <= maxHops)
      .select(col("u").as("url"),
        when(col("_resolved"), col("cur")).as("final_url"),
        when(col("_resolved"), col("hops")).as("hops"),
        (!col("_resolved")).as("looped"))
  }

  /** Driver-side twin of [[resolve]] for SMALL edge maps (the engine's
    * redirect ledger below `CrawlConfig.redirectDriverMax` — same
    * driver/distributed threshold pattern as the crawl-delay ledger):
    * the distributed doubling costs ~5 shuffle stages per rebuild, which
    * dominated redirect-heavy crawls whose ledgers hold a handful of
    * edges. Bit-identical semantics (RedirectsSpec differential): follow
    * hops to a terminal; resolved iff reached within `maxHops`, else
    * looped (true cycles and over-cap chains alike).
    *
    * @return (src, finalUrl | null, hops | -1, looped) per edge key
    */
  def resolveLocal(edges: collection.Map[String, String],
      maxHops: Int): Seq[(String, String, Long, Boolean)] = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    edges.iterator.map { case (src, first) =>
      var cur = first
      var hops = 1L
      while (edges.contains(cur) && hops <= maxHops) {
        cur = edges(cur); hops += 1
      }
      val resolved = !edges.contains(cur) && hops <= maxHops
      (src, if (resolved) cur else null,
        if (resolved) hops else -1L, !resolved)
    }.toSeq
  }
}
