package graft

import org.apache.spark.sql.functions._
import graft.canon.UrlTraps

/** Structural crawler-trap heuristics over canonical URLs. */
class UrlTrapsSpec extends SparkTestBase {
  import spark.implicits._

  private def feats(url: String): (Int, Int, Int, Boolean) =
    Seq(url).toDF("u").select(
      UrlTraps.pathDepth(col("u")),
      UrlTraps.maxSegmentRun(col("u")),
      UrlTraps.queryParamCount(col("u")),
      UrlTraps.isTrap(col("u")))
      .as[(Int, Int, Int, Boolean)].head()

  test("depth / run / params on plain URLs") {
    assert(feats("http://h.test/a/b/c") == ((3, 1, 0, false)))
    assert(feats("http://h.test/") == ((0, 0, 0, false)))
    assert(feats("http://h.test") == ((0, 0, 0, false)))
    assert(feats("http://h.test/a?x=1&y=2") == ((1, 1, 2, false)))
  }

  test("consecutive repeated segments count as a run; non-consecutive do not") {
    assert(feats("http://h.test/x/x/x/end")._2 == 3)
    assert(feats("http://h.test/x/a/x/a")._2 == 1)
    assert(feats("http://h.test/java/java.util")._2 == 1)
    // double slashes produce empty segments which are dropped, not runs
    assert(feats("http://h.test//a//a//")._2 == 2)
  }

  test("trap verdicts at the default thresholds") {
    // run >= 3
    assert(feats("http://h.test/cal/cal/cal/2026")._4)
    // depth >= 12 (distinct segments so only depth can trigger)
    val deep = "http://h.test" + (1 to 12).map("/s" + _).mkString
    val deep11 = "http://h.test" + (1 to 11).map("/s" + _).mkString
    assert(feats(deep) == ((12, 1, 0, true)))
    assert(feats(deep11) == ((11, 1, 0, false)))
    // params >= 8
    val q8 = "http://h.test/p?" + (1 to 8).map(i => s"k$i=1").mkString("&")
    val q7 = "http://h.test/p?" + (1 to 7).map(i => s"k$i=1").mkString("&")
    assert(feats(q8)._4 && !feats(q7)._4)
  }

  test("query and fragment never leak into path features") {
    assert(feats("http://h.test/a/b?p=/x/x/x/x")._1 == 2)
    assert(feats("http://h.test/a/b?p=/x/x/x/x")._2 == 1)
    assert(feats("http://h.test/a#frag/x/x/x")._1 == 1)
  }

  test("a '?' inside the fragment is not a query; uppercase scheme still screened") {
    // fragment-only '?': zero params, so no param-trap verdict
    assert(feats("http://h.test/a#f?k1=1&k2=1&k3=1&k4=1&k5=1&k6=1&k7=1&k8=1")
      == ((1, 1, 0, false)))
    // raw (pre-canonicalization) uppercase scheme must not evade the screen
    assert(feats("HTTP://h.test/x/x/x/cal") == ((4, 3, 0, true)))
  }
}
