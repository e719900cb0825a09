package graft

import org.apache.spark.sql.functions._
import graft.router.FlowControl

/** The FlowControl conversion matrix must mirror the reference exactly
  * (spire-rs/spire crates/spire-core/src/context/flow_control.rs:117-191,
  * error.rs:295-310), including the Err-branch FLIP
  * (Continue<->Skip, Wait<->Hold). Column impl == Scala impl == spec.
  */
class FlowControlSpec extends SparkTestBase {
  import spark.implicits._

  private val cases = Seq(
    // (kind, isErr, deferMs, queryTag) -> (outcome, deferQuery, deferMs)
    ("unit", false, 0L, null) -> ("continue", null, 0L),
    ("unit", true, 0L, null) -> ("skip", null, 0L),
    ("duration", false, 500L, null) -> ("wait", "owner", 500L),
    ("duration", true, 500L, null) -> ("hold", "owner", 500L),
    ("error", false, 0L, null) -> ("hold", "owner", 0L),
    ("error", true, 0L, null) -> ("hold", "owner", 0L),
    ("error_query", false, 0L, "single:t1") -> ("fail", "single:t1", 0L),
    ("error_query", true, 0L, "every") -> ("fail", "every", 0L),
    // TagQuery::List (flow_control.rs:49-50): query carried verbatim
    ("error_query", false, 0L, "list:t1,t2") -> ("fail", "list:t1,t2", 0L),
    ("error_query", true, 0L, "list:a,b,c") -> ("fail", "list:a,b,c", 0L)
  )

  test("TagQuery::List constructors encode and validate (F10)") {
    val df = Seq(1).toDF("x").select(
      FlowControl.waitTags(Seq("a", "b"), lit(1500L)).as("w"),
      FlowControl.holdTags(Seq("c"), lit(0L)).as("h"))
    val (w, h) = df.select($"w.deferQuery", $"h.deferQuery")
      .as[(String, String)].head()
    assert(w == "list:a,b" && h == "list:c")
    intercept[IllegalArgumentException](FlowControl.listQuery(Seq.empty))
    intercept[IllegalArgumentException](FlowControl.listQuery(Seq("a,b")))
  }

  test("Scala conversion matches the reference matrix") {
    cases.foreach { case ((k, e, d, q), want) =>
      assert(FlowControl.convertLocal(k, e, d, q) == want, s"($k, err=$e)")
    }
  }

  test("Column conversion == Scala conversion") {
    val df = cases.map(_._1).toDF("kind", "isErr", "deferMs", "queryTag")
    val got = df.select(FlowControl.convert(
        $"kind", $"isErr", $"deferMs", $"queryTag").as("o"))
      .select($"o.outcome", $"o.deferQuery", $"o.deferMs")
      .as[(String, String, Long)].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("router: duplicate route and merge-conflict fail fast (R1/R4)") {
    import graft.router.{Handler, Router}
    val r1 = Router(Map.empty).route("a", Handler.continue)
    intercept[IllegalArgumentException](r1.route("a", Handler.continue))
    val r2 = Router(Map("a" -> Handler.continue))
    intercept[IllegalArgumentException](r1.merge(r2))
    val merged = r1.merge(Router(Map("b" -> Handler.continue)))
    assert(merged.routes.keySet == Set("a", "b"))
  }

  test("router with_state analogue: handlers close over injected config (R6)") {
    import graft.router.{Handler, Router}
    case class AppState(priority: Int)
    def makeHandler(st: AppState): Handler =
      Handler.linkFollower(priority = lit(st.priority))
    val router = Router(Map("page" -> makeHandler(AppState(7))))
    val fetched = Seq(("http://a.test/x", "page", 1)).toDF("canonical", "tag", "depth")
      .withColumn("spans", typedlit(Seq(("link", "t", "http://a.test/y", 0)))
        .cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
      .withColumn("status", lit(200))
    val out = router(fetched)
      .select(explode($"children").as("c")).select($"c.priority")
      .as[Int].collect()
    assert(out.toSeq == Seq(7))
  }

  test("Tag::Rehash(u64) convention: \"#<u64>\" string tags route, defer " +
      "and ledger-roundtrip (SURVEY §1.1, request_extend.rs:39-84)") {
    import graft.router.{Handler, Router}
    val router = Router(Map("#42" -> Handler.linkFollower(priority = lit(9))))
    val fetched = Seq(("http://a.test/x", "#42"), ("http://a.test/y", "zzz"))
      .toDF("canonical", "tag")
      .withColumn("spans", typedlit(Seq(("link", "t", "http://a.test/c", 0)))
        .cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
      .withColumn("status", lit(200))
    val out = router(fetched)
      .select($"tag", size($"children").as("n"))
      .as[(String, Int)].collect().toMap
    assert(out("#42") == 1) // rehash tag dispatches to its route
    assert(out("zzz") == 0) // miss -> fallback (continue, no children)
    // rehash tags survive the manifest ledger roundtrip
    val dir = SparkTestBase.tmpDir("rehash-ledger")
    val m = graft.model.RoundMetrics(0, 1, 1, 0, 1, 1, 0, 1L)
    graft.engine.TableIO.writeManifest(dir, 0,
      graft.engine.TableIO.manifestJson(0, Seq.empty, m, completed = true,
        deferLedger = Map("#42" -> 2)))
    assert(graft.engine.TableIO.readLedgers(dir, 0)._1 == Map("#42" -> 2))
  }

  test("success accounting: success = continue|wait (metric.rs:126-155)") {
    val got = Seq("continue", "wait", "skip", "hold", "fail").toDF("o")
      .select(FlowControl.isSuccess($"o")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false, false, false))
  }
}
