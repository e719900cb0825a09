package graft.oracle

import scala.collection.mutable
import graft.model.{RobotsRule, Seed, Span}

/** Sequential in-memory reference scheduler — the auditable ~150-LoC spec
  * the Spark engine's golden traces are checked against (SURVEY §3.4, §5).
  *
  * [[Oracle.crawlReference]] models the reference runner EXACTLY
  * (spire-rs/spire crates/spire-core/src/process/runner.rs:103-177):
  *  - requests complete strictly one at a time (runner.rs:146-155 — the
  *    `.then` before `buffer_unordered` makes processing sequential);
  *  - seeds drain from the END of the registration Vec
  *    (runner.rs:110-121), so FIFO queues see them reversed while LIFO
  *    stacks (examples/basic_usage/main.rs:82) see them in order;
  *  - NO dedup (the reference queue is a plain VecDeque,
  *    memory_dataset.rs:137-173) — termination comes from maxDepth;
  *  - children inherit the parent tag when untagged and take depth+1 on
  *    branch (request_queue.rs:134-215).
  *
  * [[Oracle.crawlEngineMode]] is the spec of OUR engine's round semantics
  * (dedup + robots + per-host budget), used to pin the Spark
  * implementation: same eligibility rules, same ordering keys, evaluated
  * sequentially round by round.
  */
object Oracle {

  case class TraceRow(
      seq: Long,
      url: String,
      tag: String,
      depth: Int,
      parentSeq: Long,
      path: Seq[Long])

  /** kind='link' spans carry the child URL in media_ref. */
  private def links(spans: Seq[Span]): Seq[String] =
    spans.filter(_.kind == "link").map(_.media_ref)

  private def hostOf(url: String): String =
    "^[a-z]+://([^/:]*)".r.findFirstMatchIn(url).map(_.group(1)).getOrElse("")

  private def pathOf(url: String): String = {
    val p = "^[a-z]+://[^/]*([^?#]*)".r
      .findFirstMatchIn(url).map(_.group(1)).getOrElse("")
    if (p.isEmpty) "/" else p
  }

  /** Reference-exact sequential crawl. FIFO (queue, registry default) or
    * LIFO (stack, as in the HTTP examples). Returns the dequeue-order
    * trace.
    */
  def crawlReference(
      docs: Map[String, Seq[Span]],
      seeds: Seq[Seed],
      lifo: Boolean,
      maxDepth: Int,
      maxSteps: Long = 1000000L
  ): Seq[TraceRow] = {
    case class Item(url: String, tag: String, depth: Int, parentSeq: Long,
        path: Seq[Long])
    val q = mutable.ArrayDeque.empty[Item]
    // seeds drain from the Vec end -> pushed reversed (runner.rs:110-121)
    seeds.reverse.foreach(s =>
      q.append(Item(s.url, s.tag, 1, -1L, Seq(s.registrationIdx.toLong))))
    val out = mutable.ArrayBuffer.empty[TraceRow]
    var seq = 0L
    while (q.nonEmpty && seq < maxSteps) {
      val it = if (lifo) q.removeLast() else q.removeHead()
      out += TraceRow(seq, it.url, it.tag, it.depth, it.parentSeq, it.path)
      if (it.depth < maxDepth) {
        val children = links(docs.getOrElse(it.url, Seq.empty)).zipWithIndex
        children.foreach { case (u, e) =>
          // branch: +1 depth, inherit tag (request_queue.rs:134-215);
          // LIFO sibling order key = -e (stack pops last-emitted first)
          q.append(Item(u, it.tag, it.depth + 1, seq,
            it.path :+ (if (lifo) -e.toLong else e.toLong)))
        }
      }
      seq += 1
    }
    out.toSeq
  }

  /** Engine-mode spec: BFS rounds with exact dedup, robots prefix rules,
    * and per-host budgets — sequential mirror of CrawlEngine's round
    * pipeline. Seed emission order is reversed registration (FIFO intake).
    */
  def crawlEngineMode(
      docs: Map[String, Seq[Span]],
      seeds: Seq[Seed],
      robots: Seq[RobotsRule],
      maxDepth: Int,
      maxRounds: Int,
      defaultBudget: Int,
      dedup: Boolean = true,
      msPerRound: Long = 1000L
  ): Seq[TraceRow] = {
    case class Cand(url: String, tag: String, depth: Int, priority: Int,
        discoveryRound: Int, parentSeq: Long, emissionIdx: Int,
        path: Seq[Long])
    val rulesByHost = robots.map(r => r.host -> r).toMap
    // per-host crawl-delay ledger (apply_defer semantics in round units:
    // notBefore[h] = max(existing, now) + d — runner.rs:289-306)
    val delayRounds = robots.filter(_.crawlDelayMs > 0)
      .map(r => r.host -> math.max(1,
        math.ceil(r.crawlDelayMs.toDouble / msPerRound).toInt)).toMap
    val hostNotBefore = mutable.Map.empty[String, Int]
    val maxIdx = seeds.size - 1
    var frontier: Seq[Cand] = seeds.map(s =>
      Cand(s.url, s.tag, 1, 0, 0, -1L, maxIdx - s.registrationIdx,
        Seq(s.registrationIdx.toLong)))
    val seen = mutable.Set.empty[String]
    val out = mutable.ArrayBuffer.empty[TraceRow]
    var nextSeq = 0L
    var round = 0
    while (frontier.nonEmpty && round < maxRounds) {
      // dedup: drop already-seen; in-batch keep first by (parentSeq, emissionIdx)
      val afterSeen =
        if (!dedup) frontier
        else {
          val batchFirst = frontier
            .groupBy(_.url).values
            .map(_.minBy(c => (c.parentSeq, c.emissionIdx))).toSeq
          batchFirst.filterNot(c => seen.contains(c.url))
        }
      // robots
      val allowed = afterSeen.filter { c =>
        rulesByHost.get(hostOf(c.url)) match {
          case Some(r) => !r.disallow.exists(p => pathOf(c.url).startsWith(p))
          case None => true
        }
      }
      // crawl-delay block: hosts inside their delay window carry over
      val (delayed, pass) = allowed.partition(c =>
        hostNotBefore.getOrElse(hostOf(c.url), 0) > round)
      // per-host budget, ranked by (priority, discoveryRound, parentSeq, emissionIdx)
      val (under, over) = pass
        .groupBy(c => hostOf(c.url)).toSeq
        .flatMap { case (h, cs) =>
          val budget = rulesByHost.get(h).map(_.hostBudget)
            .getOrElse(defaultBudget)
          cs.sortBy(c => (c.priority, c.discoveryRound, c.parentSeq,
            c.emissionIdx)).zipWithIndex.map { case (c, i) =>
            (c, i < budget)
          }
        }
        .partition(_._2)
      val scheduled0 = under.map(_._1).filter(_.depth <= maxDepth)
      // seq assignment: global FIFO order = (parentSeq, emissionIdx)
      val scheduled = scheduled0.sortBy(c => (c.parentSeq, c.emissionIdx))
        .zipWithIndex.map { case (c, i) => (c, nextSeq + i) }
      scheduled.foreach { case (c, s) =>
        out += TraceRow(s, c.url, c.tag, c.depth, c.parentSeq, c.path)
        if (dedup) seen += c.url
      }
      // children
      val children = scheduled.flatMap { case (c, s) =>
        if (!docs.contains(c.url)) Seq.empty
        else links(docs(c.url)).zipWithIndex.collect {
          case (u, e) if c.depth + 1 <= maxDepth =>
            Cand(u, c.tag, c.depth + 1, 0, round + 1, s, e,
              c.path :+ (-e.toLong))
        }
      }
      scheduled.iterator.map(s => hostOf(s._1.url)).distinct
        .filter(delayRounds.contains).foreach { h =>
          val base = math.max(hostNotBefore.getOrElse(h, round), round)
          hostNotBefore(h) = base + delayRounds(h)
        }
      frontier = children ++ over.map(_._1) ++ delayed
      nextSeq += scheduled.size
      round += 1
    }
    out.toSeq
  }
}
