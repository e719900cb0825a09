package graft

import org.apache.spark.sql.functions._
import graft.dedup.Seen

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def cands(hashes: (Long, Long, Int)*) =
    hashes.toDF("urlHash", "parentSeq", "emissionIdx")

  test("sharded blooms: no false negatives, any shard count") {
    val seen = (0L until 5000L).map(i => i * 7919L).toDF("urlHash")
    for (shards <- Seq(1, 4, 16)) {
      val blooms = Seen.buildShardedBlooms(seen, shards, 10000L, 0.03)
      assert(blooms.size <= shards)
      val (defNew, maybe) = Seen.bloomPrefilter(seen, blooms, shards)
      // every seen hash must hit its bloom (zero false negatives)
      assert(defNew.count() == 0, s"false negatives with $shards shards")
      assert(maybe.count() == 5000)
    }
  }

  test("bloom prefilter + exact anti-join == plain anti-join (exactness)") {
    val seen = (0L until 2000L).map(i => i * 13L).toDF("urlHash")
    val cand = (0L until 4000L).map(i => i * 7L).toDF("urlHash")
    val blooms = Seen.buildShardedBlooms(seen, 4, 5000L, 0.05)
    val (defNew, maybe) = Seen.bloomPrefilter(cand, blooms, 4)
    val viaBloom = defNew.unionByName(Seen.exactAntiJoin(maybe, seen))
      .as[Long].collect().sorted.toSeq
    val plain = Seen.exactAntiJoin(cand, seen).as[Long].collect().sorted.toSeq
    assert(viaBloom == plain)
  }

  test("in-batch first occurrence keeps lowest (parentSeq, emissionIdx)") {
    val df = cands((10L, 5L, 2), (10L, 3L, 7), (10L, 3L, 1), (11L, 9L, 0))
    val kept = Seen.firstOccurrence(df, struct($"parentSeq", $"emissionIdx"))
      .as[(Long, Long, Int)].collect().toSet
    assert(kept == Set((10L, 3L, 1), (11L, 9L, 0)))
  }

  test("bucketed seen mirror: one candidate-side exchange only, " +
      "equal to plain anti-join") {
    import graft.dedup.BucketedSeenStore
    val store = new BucketedSeenStore(spark, "graft_seen_plan_spec", 4)
    val seen = (0L until 10000L).map(i => i * 13L).toDF("urlHash")
    store.bulkLoad(seen)
    try {
      val cand = (0L until 4000L).map(i => i * 7L).toDF("urlHash")
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val (got, plan) = try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = store.antiJoin(cand)
        (df.as[Long].collect().sorted.toSeq,
          df.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      // the 10^10 side (seen) is scanned pre-partitioned: the only
      // Exchange in the plan is the small candidate side
      val exchanges = "(?<!Reuse)Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected one candidate-side exchange:\n$plan")
      val want = Seen.exactAntiJoin(cand, seen).as[Long].collect().sorted.toSeq
      assert(got == want)
      // append then probe again: appended hashes now filter out
      store.append((0L until 4000L).map(i => i * 7L).toDF("urlHash"))
      assert(store.antiJoin(cand).count() == 0)
    } finally store.drop()
  }

  test("dedup idempotence: dedup ∘ dedup == dedup") {
    val df = (0L until 1000L).map(i => (i % 100, i, (i % 13).toInt))
      .toDF("urlHash", "parentSeq", "emissionIdx")
    val once = Seen.firstOccurrence(df, struct($"parentSeq", $"emissionIdx"))
    val twice = Seen.firstOccurrence(once, struct($"parentSeq", $"emissionIdx"))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.count() == 100)
  }
}
