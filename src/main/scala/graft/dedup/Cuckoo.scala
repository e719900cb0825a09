package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Cuckoo filter over long keys — the second approximate-membership tier
  * the north rule names ("partitioned bloom/cuckoo URL-seen filter").
  * Partial-key cuckoo hashing per Fan, Andersen, Kaminsky, Mitzenmacher,
  * "Cuckoo Filter: Practically Better than Bloom" (CoNEXT 2014), which is
  * public knowledge: buckets of 4 × 16-bit fingerprints; a key's two
  * candidate buckets are `i1 = h(x)` and `i2 = i1 XOR h'(fp(x))`, an
  * involution, so any stored (bucket, fp) pair can recover its alternate —
  * that is what makes displacement (and filter merge) possible without the
  * original keys.
  *
  * vs the bloom tier: same ~no-false-negative prefilter contract, but adds
  * O(1) DELETE (a bloom cannot unset bits) and typically fewer bits/key at
  * equal fpp (~7 bits/key at 3% with 16-bit fps vs ~10.5 for bloom). The
  * engine's exactness NEVER depends on either filter — the anti-join is
  * the exact tier (Seen.scala) — but a prefilter false negative would skip
  * that join, so this implementation is deliberately fail-safe: when an
  * insert cannot complete within the displacement bound the filter flips
  * to `saturated` and [[mightContain]] answers true for everything, i.e.
  * it degrades to a no-op prefilter rather than an unsound one.
  *
  * Not thread-safe (same contract as Spark's BloomFilter buffer use: one
  * buffer per aggregation partition).
  */
final class CuckooFilter private (
    val nBuckets: Int, // power of two
    private val table: Array[Short], // nBuckets * 4 slots; 0 = empty
    private var count: Long,
    private var saturated: Boolean
) extends Serializable {

  import CuckooFilter._

  def itemCount: Long = count
  def isSaturated: Boolean = saturated

  private def mask: Int = nBuckets - 1

  @inline private def slot(b: Int, s: Int): Int = (b << 2) + s

  @inline private def bucketOf(hash: Long): Int =
    (mix64(hash) & mask.toLong).toInt

  /** 16-bit fingerprint, never 0 (0 marks an empty slot). */
  @inline private def fpOf(hash: Long): Short = {
    val f = (mix64(hash * 0x9e3779b97f4a7c15L) & 0xffffL).toInt
    (if (f == 0) 1 else f).toShort
  }

  /** The i1<->i2 involution: alt(alt(b, fp), fp) == b. */
  @inline private def altBucket(b: Int, fp: Short): Int =
    (b ^ (mix64(fp.toLong & 0xffffL) & mask.toLong).toInt) & mask

  private def bucketHas(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(slot(b, s)) == fp) return true
      s += 1
    }
    false
  }

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(slot(b, s)) == 0) { table(slot(b, s)) = fp; return true }
      s += 1
    }
    false
  }

  def put(hash: Long): Unit = {
    val fp = fpOf(hash)
    insertFp(bucketOf(hash), fp)
  }

  /** Insert a fingerprint given either of its candidate buckets (used by
    * both [[put]] and [[mergeInPlace]]). Duplicate inserts are stored
    * again (multiset semantics, like bloom's idempotent set bits — bounded
    * by the per-shard insert count, and irrelevant to membership).
    */
  private def insertFp(b0: Int, fp: Short): Unit = {
    if (saturated) { count += 1; return }
    if (tryInsertAt(b0, fp) || tryInsertAt(altBucket(b0, fp), fp)) {
      count += 1; return
    }
    // displacement loop (deterministic victim rotation — no RNG needed for
    // the prefilter contract, and determinism keeps runs reproducible)
    var b = b0
    var f = fp
    var kick = 0
    while (kick < MaxKicks) {
      val s = slot(b, kick % SlotsPerBucket)
      val victim = table(s)
      table(s) = f
      f = victim
      b = altBucket(b, f)
      if (tryInsertAt(b, f)) { count += 1; return }
      kick += 1
    }
    // could not place the last victim: park it logically by saturating —
    // the filter stays SOUND (no false negatives), it just stops filtering
    saturated = true
    count += 1
  }

  def mightContain(hash: Long): Boolean = {
    if (saturated) return true
    val fp = fpOf(hash)
    val b1 = bucketOf(hash)
    bucketHas(b1, fp) || bucketHas(altBucket(b1, fp), fp)
  }

  /** Delete one copy of the key's fingerprint — the operation blooms
    * cannot support. Only meaningful for keys that were inserted (deleting
    * a never-inserted key can evict a colliding fingerprint, the standard
    * cuckoo-filter caveat). Returns true if a slot was cleared.
    */
  def remove(hash: Long): Boolean = {
    if (saturated) return false // slots no longer account for all members
    val fp = fpOf(hash)
    var b = bucketOf(hash)
    var tries = 0
    while (tries < 2) {
      var s = 0
      while (s < SlotsPerBucket) {
        if (table(slot(b, s)) == fp) {
          table(slot(b, s)) = 0
          count -= 1
          return true
        }
        s += 1
      }
      b = altBucket(b, fp)
      tries += 1
    }
    false
  }

  /** Merge by re-inserting every stored fingerprint of `other` (same
    * nBuckets required — the sharded-family convention already sizes all
    * partition buffers of one shard identically). Works without original
    * keys because a stored (bucket, fp) determines its candidate pair.
    */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.nBuckets == nBuckets,
      s"cuckoo merge: $nBuckets vs ${other.nBuckets} buckets")
    if (other.saturated) {
      // other's table no longer accounts for all its members — adopt
      // saturation (sound: mightContain answers true for everything)
      saturated = true
      count += other.count
      return this
    }
    var b = 0
    while (b < other.nBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.table(slot(b, s))
        if (fp != 0) insertFp(b, fp) // increments count once per member
        s += 1
      }
      b += 1
    }
    this
  }

  /** Header byte 'C' (0x43) — distinguishable from Spark BloomFilter
    * streams, which begin with the big-endian version int 1 (first byte
    * 0x00), so [[Filters.deserialize]] can dispatch on the first byte.
    */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 + 1 + table.length * 2)
    bb.put('C'.toByte)
    bb.putInt(nBuckets)
    bb.putLong(count)
    bb.put(if (saturated) 1.toByte else 0.toByte)
    bb.asShortBuffer().put(table)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** splitmix64 finalizer — the standard public-domain 64-bit avalanche. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sized for ~0.95 max load (the paper's 4-slot bucket bound, §5). */
  def create(expectedItems: Long): CuckooFilter = {
    val slotsNeeded = math.max(SlotsPerBucket.toLong,
      (expectedItems / 0.95).toLong + 1)
    var nBuckets = 1
    while (nBuckets.toLong * SlotsPerBucket < slotsNeeded &&
        nBuckets < (1 << 29)) nBuckets <<= 1
    new CuckooFilter(nBuckets, new Array[Short](nBuckets * SlotsPerBucket),
      0L, false)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.get() == 'C'.toByte, "not a cuckoo filter stream")
    val nBuckets = bb.getInt
    val count = bb.getLong
    val saturated = bb.get() == 1.toByte
    val table = new Array[Short](nBuckets * SlotsPerBucket)
    bb.asShortBuffer().get(table)
    new CuckooFilter(nBuckets, table, count, saturated)
  }

  /** Typed aggregator building one CuckooFilter per shard — the cuckoo
    * twin of [[Seen.BloomAgg]], same buffer discipline (one buffer per
    * shard per partition, java-serialization encoder).
    */
  class CuckooAgg(expectedItems: Long)
      extends Aggregator[Long, CuckooFilter, Array[Byte]] {
    def zero: CuckooFilter = create(expectedItems)
    def reduce(b: CuckooFilter, a: Long): CuckooFilter = { b.put(a); b }
    def merge(b1: CuckooFilter, b2: CuckooFilter): CuckooFilter =
      b1.mergeInPlace(b2)
    def finish(b: CuckooFilter): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[CuckooFilter] =
      Encoders.javaSerialization[CuckooFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Sharded build, mirroring [[Seen.buildShardedBlooms]] — the engine
    * swaps builders on `CrawlConfig.seenFilterKind` and everything else
    * (broadcast family, fused probe, compaction) is shared.
    */
  def buildSharded(
      seen: DataFrame,
      nShards: Int,
      expectedItemsPerShard: Long
  ): Map[Int, Array[Byte]] = {
    val spark = seen.sparkSession
    import spark.implicits._
    val agg = new CuckooAgg(expectedItemsPerShard).toColumn
    seen
      .select(pmod(col("urlHash"), lit(nShards.toLong)).cast("int").as("shard"),
        col("urlHash"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("cuckoo"))
      .collect()
      .toMap
  }
}
