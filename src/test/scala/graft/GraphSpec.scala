package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Link-graph analytics: degrees, fixed-point PageRank,
  * label-propagation components.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def nodesDf(n: Int): DataFrame =
    (0L until n.toLong).toDF("id")

  test("degrees counts both directions, 0 for absent") {
    // 0 -> 1, 0 -> 2, 1 -> 2; node 3 isolated (appears via nodes only
    // when joined downstream — degrees itself only sees edge endpoints)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val d = GraphOps.degrees(edges).orderBy("node")
      .as[(Long, Long, Long)].collect()
    assert(d.toSeq == Seq((0L, 2L, 0L), (1L, 1L, 1L), (2L, 0L, 2L)))
  }

  test("pageRank: sink decays to teleport base; exact hand-computed chain") {
    // 0 -> 1 -> 2, 2 is a sink (dangling mass dropped by design)
    val nodes = nodesDf(3)
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val S = GraphOps.RankScale
    val base = (S * 3) / 20
    // iter1: r(0)=base; r(1)=base + 17*(S div 1) div 20; r(2) same from 1
    val r1 = GraphOps.pageRank(nodes, edges, 1)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(r1(0L) == base)
    assert(r1(1L) == base + (17L * S) / 20)
    assert(r1(2L) == base + (17L * S) / 20)
    // iter2: node 1 now receives from node 0's base rank
    val r2 = GraphOps.pageRank(nodes, edges, 2)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(r2(0L) == base)
    assert(r2(1L) == base + (17L * base) / 20)
    assert(r2(2L) == base + (17L * r1(1L)) / 20)
  }

  test("pageRank is bit-identical at different parallelism (integer arith)") {
    val n = 500
    val nodes = nodesDf(n)
    val edges = nodes.select(col("id").as("src"),
      ((col("id") * 7 + 3) % n).as("dst"))
      .unionByName(nodes.select(col("id").as("src"),
        ((col("id") * 13 + 5) % n).as("dst")))
    // driverMaxRows = 0 forces the DISTRIBUTED loop on both sides (the
    // driver tier would trivially satisfy the parallelism contract)
    val a = GraphOps.pageRank(nodes.repartition(1), edges.repartition(1), 3,
      driverMaxRows = 0)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = GraphOps.pageRank(nodes.repartition(7), edges.repartition(11), 3,
      driverMaxRows = 0)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b)
    // and the driver tier (default bound) is bit-identical to both
    val c = GraphOps.pageRank(nodes, edges, 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(c == a)
    // total mass stays positive and bounded by the start mass (sink-free
    // graph: every node has out-degree 2, so only division floors leak)
    assert(a.map(_._2).sum <= n.toLong * GraphOps.RankScale)
    assert(a.forall(_._2 > 0))
  }

  test("reprioritize: rank feedback drives the budget window's selection") {
    // one host, 4 URLs, all priority 0; budget 2. Ranks make u2/u3 the
    // high-rank pages => after reprioritize the budget rank must pick
    // them first (and unranked u0 keeps its original priority).
    val frontier = Seq(
      ("http://h.test/u0", "h.test", 0, 0, 10L, 0),
      ("http://h.test/u1", "h.test", 0, 0, 11L, 1),
      ("http://h.test/u2", "h.test", 0, 0, 12L, 2),
      ("http://h.test/u3", "h.test", 0, 0, 13L, 3))
      .toDF("canonical", "host", "priority", "discoveryRound",
        "parentSeq", "emissionIdx")
    val S = GraphOps.RankScale
    val ranks = Seq(
      ("http://h.test/u1", S),        // avg rank -> priority -1000
      ("http://h.test/u2", 3 * S),    // -> -3000
      ("http://h.test/u3", 2 * S))    // -> -2000
      .toDF("node", "rank")
    val rep = GraphOps.reprioritize(frontier, ranks)
    val prio = rep.select(col("canonical"), col("priority"))
      .as[(String, Int)].collect().toMap
    assert(prio == Map(
      "http://h.test/u0" -> 0, "http://h.test/u1" -> -1000,
      "http://h.test/u2" -> -3000, "http://h.test/u3" -> -2000))
    val (under, over) = graft.politeness.Politeness.budgetRank(rep, 2)
    val scheduled = under.select(col("canonical")).as[String].collect().toSet
    assert(scheduled == Set("http://h.test/u2", "http://h.test/u3"))
    assert(over.count() == 2)
  }

  test("connectedComponents: fixpoint labels on a chain deeper than any fixed k") {
    // chain 0-1-...-24 (diameter 24) + isolated 100: fixed-k propagation
    // cannot converge for small k; the fixpoint loop must
    val nodes = ((0L to 24L) :+ 100L).toDF("id")
    val edges = (0L until 24L).map(i => (i, i + 1)).toDF("src", "dst")
    // driverMaxEdges = 0 forces the DISTRIBUTED fixpoint loop (the
    // driver union-find tier would otherwise absorb a 24-edge graph)
    val labels = GraphOps.connectedComponents(nodes, edges, driverMaxEdges = 0)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert((0L to 24L).forall(labels(_) == 0L))
    assert(labels(100L) == 100L)
  }

  test("connectedComponents: driver union-find tier == distributed fixpoint") {
    // pseudorandom sparse graph (deterministic LCG): many components of
    // varied shape incl. isolated nodes; the driver fast path
    // (driverMaxEdges default) must produce bit-identical labels to the
    // forced distributed loop (driverMaxEdges = 0)
    var s = 12345L
    def nxt(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val n = 400L
    val nodes = (0L until n).toDF("id")
    val edges = (1 to 300).map { _ =>
      (math.floorMod(nxt(), n), math.floorMod(nxt(), n))
    }.toDF("src", "dst")
    val fast = GraphOps.connectedComponents(nodes, edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val dist = GraphOps.connectedComponents(nodes, edges, driverMaxEdges = 0)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(fast == dist)
    // and the chain contract holds on the fast path too
    assert(fast.size == n)
  }

  test("labelPropagation: k iterations = min over k-hop neighborhood") {
    // two components: chain 0-1-2-3-4 and pair 10-11
    val nodes = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 20L)).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val l1 = GraphOps.labelPropagation(nodes, edges, 1)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(l1 == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    val l4 = GraphOps.labelPropagation(nodes, edges, 4)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(l4 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // and the forced DISTRIBUTED loop is bit-identical to the driver
    // tier at both depths
    val d1 = GraphOps.labelPropagation(nodes, edges, 1, driverMaxRows = 0)
      .orderBy("node").as[(Long, Long)].collect().toMap
    val d4 = GraphOps.labelPropagation(nodes, edges, 4, driverMaxRows = 0)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(d1 == l1 && d4 == l4)
  }
}
