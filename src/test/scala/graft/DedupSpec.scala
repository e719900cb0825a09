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

  test("dedup idempotence: dedup ∘ dedup == dedup") {
    val df = (0L until 1000L).map(i => (i % 100, i, (i % 13).toInt))
      .toDF("urlHash", "parentSeq", "emissionIdx")
    val once = Seen.firstOccurrence(df, struct($"parentSeq", $"emissionIdx"))
    val twice = Seen.firstOccurrence(once, struct($"parentSeq", $"emissionIdx"))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.count() == 100)
  }
}
