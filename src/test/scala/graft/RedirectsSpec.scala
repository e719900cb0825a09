package graft

import graft.engine.Redirects

/** Redirect-chain resolution: pointer-doubling semantics vs a naive
  * driver-side walker, loop detection, the maxHops cap.
  */
class RedirectsSpec extends SparkTestBase {
  import spark.implicits._

  private def resolve(edges: Seq[(String, String)], maxHops: Int) =
    Redirects.resolve(edges.toDF("src", "dst"), maxHops)
      .as[(String, Option[String], Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq

  test("chain resolves to the terminal with exact hop counts") {
    val got = resolve(Seq("a" -> "b", "b" -> "c"), maxHops = 4)
    assert(got == Seq(
      ("a", Some("c"), Some(2L), false),
      ("b", Some("c"), Some(1L), false)))
  }

  test("two-cycle and self-loop are looped, not resolved") {
    val got = resolve(Seq("x" -> "y", "y" -> "x", "s" -> "s"), maxHops = 8)
    assert(got == Seq(
      ("s", None, None, true),
      ("x", None, None, true),
      ("y", None, None, true)))
  }

  test("maxHops caps: a 9-node chain at maxHops=4 resolves only the last 4 srcs") {
    val edges = (1 to 9).map(i => i.toString -> (i + 1).toString)
    val got = resolve(edges, maxHops = 4)
    got.foreach { case (u, fin, hops, looped) =>
      val dist = 10 - u.toInt
      if (dist <= 4) {
        assert(fin.contains("10") && hops.contains(dist.toLong) && !looped, u)
      } else {
        assert(fin.isEmpty && hops.isEmpty && looped, u)
      }
    }
  }

  /** Reference walker: follow the (unique-out-edge) map up to maxHops. */
  private def naive(m: Map[String, String], u: String, maxHops: Int)
      : (Option[String], Option[Long], Boolean) = {
    var cur = u
    var hops = 0L
    while (hops < maxHops && m.contains(cur)) { cur = m(cur); hops += 1 }
    if (m.contains(cur)) (None, None, true) else (Some(cur), Some(hops), false)
  }

  test("differential vs the naive walker on a pseudorandom functional graph") {
    // i -> (i*17+31) % 211 for i not divisible by 7 over nodes 0..210:
    // mixes long chains, cycles and terminals (multiples of 7).
    val edges = (0 until 211).filter(_ % 7 != 0)
      .map(i => i.toString -> ((i * 17 + 31) % 211).toString)
    val m = edges.toMap
    for (maxHops <- Seq(1, 3, 4, 7, 8)) {
      val got = resolve(edges, maxHops)
      val want = edges.map(_._1).sorted.map { u =>
        val (f, h, l) = naive(m, u, maxHops)
        (u, f, h, l)
      }
      assert(got == want, s"maxHops=$maxHops")
    }
  }

  test("resolveLocal (driver twin) == resolve on the functional graph") {
    // the engine's small-ledger fast path must be bit-identical to the
    // distributed doubling on every (final, looped) answer
    val edges = (0 until 211).filter(_ % 7 != 0)
      .map(i => i.toString -> ((i * 17 + 31) % 211).toString)
    val m = edges.toMap
    for (maxHops <- Seq(1, 3, 4, 7, 8)) {
      val dist = resolve(edges, maxHops)
      val local = Redirects.resolveLocal(m, maxHops)
        .map { case (u, fin, hops, looped) =>
          (u, Option(fin), if (hops >= 0) Some(hops) else None, looped) }
        .sortBy(_._1)
      assert(local == dist, s"maxHops=$maxHops")
    }
  }
}
