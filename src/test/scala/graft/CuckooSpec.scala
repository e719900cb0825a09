package graft

import org.apache.spark.sql.functions._
import graft.dedup.{CuckooFilter, Filters, Seen}

/** The cuckoo seen-filter tier (north rule: "partitioned bloom/cuckoo
  * URL-seen filter"). Same prefilter contract as the bloom tier — NO false
  * negatives, soundness independent of load — plus the cuckoo-only
  * capability (delete) and the fail-safe saturation path.
  */
class CuckooSpec extends SparkTestBase {
  import spark.implicits._

  private def keys(n: Int, seed: Long = 7919L): Seq[Long] =
    (0 until n).map(i => i * seed + 17L)

  test("no false negatives at design load; useful fpp on non-members") {
    val f = CuckooFilter.create(50000L)
    val in = keys(50000)
    in.foreach(f.put)
    assert(!f.isSaturated, "saturated at design load")
    assert(in.forall(f.mightContain), "false negative")
    val others = (0 until 50000).map(i => -1L - i * 104729L)
    val fp = others.count(f.mightContain).toDouble / others.size
    assert(fp < 0.02, s"fpp $fp too high for 16-bit fingerprints")
  }

  test("serialization roundtrip + Filters byte-dispatch") {
    val f = CuckooFilter.create(1000L)
    keys(1000).foreach(f.put)
    val bytes = f.serialize()
    assert(bytes(0) == 'C'.toByte)
    val back = CuckooFilter.deserialize(bytes)
    assert(keys(1000).forall(back.mightContain))
    assert(back.itemCount == f.itemCount)
    // the shared probe cache must route 'C' streams to the cuckoo decoder
    val probe = Filters.deserialize(bytes)
    assert(keys(1000).forall(probe.mightContain))
  }

  test("delete: the bloom-impossible op removes membership") {
    val f = CuckooFilter.create(1000L)
    val in = keys(1000)
    in.foreach(f.put)
    in.foreach(k => assert(f.remove(k), s"remove missed $k"))
    assert(f.itemCount == 0)
    assert(in.forall(k => !f.mightContain(k)), "stale membership after delete")
  }

  test("overload saturates SOUNDLY: every inserted key still answers true") {
    val f = CuckooFilter.create(16L)
    val in = keys(10000, seed = 104729L)
    in.foreach(f.put)
    assert(f.isSaturated, "expected saturation at 625x design load")
    // the prefilter contract survives overload: no false negatives —
    // the filter degrades to pass-through, never to unsound
    assert(in.forall(f.mightContain))
    assert(f.itemCount == in.size)
  }

  test("merge without original keys: union membership, count additivity") {
    val a = CuckooFilter.create(4000L)
    val b = CuckooFilter.create(4000L)
    val inA = keys(2000, seed = 7919L)
    val inB = keys(2000, seed = 15485863L)
    inA.foreach(a.put)
    inB.foreach(b.put)
    a.mergeInPlace(b)
    assert((inA ++ inB).forall(a.mightContain))
    assert(a.itemCount == 4000)
  }

  test("sharded cuckoo prefilter + exact anti-join == plain anti-join") {
    val seen = (0L until 2000L).map(i => i * 13L).toDF("urlHash")
    val cand = (0L until 4000L).map(i => i * 7L).toDF("urlHash")
    val cuckoos = CuckooFilter.buildSharded(seen, 4, 5000L)
    // same probe machinery as the blooms — bytes self-describe
    val (defNew, maybe) = Seen.bloomPrefilter(cand, cuckoos, 4)
    val viaCuckoo = defNew.unionByName(Seen.exactAntiJoin(maybe, seen))
      .as[Long].collect().sorted.toSeq
    val plain = Seen.exactAntiJoin(cand, seen).as[Long].collect().sorted.toSeq
    assert(viaCuckoo == plain)
    // and zero false negatives on the seen set itself
    val (fn, _) = Seen.bloomPrefilter(seen, cuckoos, 4)
    assert(fn.count() == 0)
  }
}
