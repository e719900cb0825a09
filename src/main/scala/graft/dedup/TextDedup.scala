package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Near-duplicate detection for document corpora — the dedup family a
  * training-data pipeline needs at 100TB:
  *
  *  - exact: hash-groupBy on a normalized fingerprint (one shuffle on the
  *    16-byte hash, never on the text)
  *  - MinHash + LSH banding: signatures are computed per-row with pure
  *    array expressions (NO explode/shuffle for the signature step; the
  *    only shuffle is the band-bucket self-join, which is exactly the
  *    candidate-generation step LSH exists to shrink)
  *  - SimHash: 32-bit sign-aggregated token hashes, hamming-distance pairs
  *  - n-gram Jaccard: exact set overlap on blocked candidate pairs,
  *    integer numerator/denominator (portable + exact)
  *
  * All hashing goes through TextOps.strHash (md5-derived) so every
  * operator has a bit-exact DuckDB oracle.
  */
object TextDedup {

  import TextOps.P

  /** MinHash permutation params: a_j odd-ish nonzero, b_j arbitrary. */
  def aCoef(j: Int): Long = (j.toLong * 2654435761L) % P + 1
  def bCoef(j: Int): Long = (j.toLong * 13L + 7L) % P

  /** h_j(s) = (a_j * (H(s) mod P) + b_j) mod P, H = md5-based strHash.
    * All intermediates < 2^62.
    */
  def minhashOf(shingle: Column, j: Int): Column =
    (lit(aCoef(j)) * (TextOps.strHash(shingle) % P) + lit(bCoef(j))) % P

  /** k-element MinHash signature as one array column (no shuffle).
    * FUSED (TextDedupExpr.MinHashSig -> TextHash.minhashSig): md5 once
    * per shingle, one loop, zero intermediate arrays — the per-doc CPU
    * hot loop of a 100TB dedup pass. [[signatureCol]] is the Column twin
    * kept as the executable spec.
    */
  def signature(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(TextDedupExpr.MinHashSig(
      GraftExpr.expression(shingles),
      (0 until k).map(aCoef), (0 until k).map(bCoef)))
  }

  /** Whole-pipeline fused signature: text -> tokens (declarative split,
    * codegen'd) -> sliding n-gram + hash + permutation-min in ONE kernel
    * (TextDedupExpr.MinHashTokens) — no shingle strings or per-shingle
    * arrays ever materialize. Bit-identical to
    * `signature(TextOps.shingles(text, n), k)` (TextDedupSpec pins it).
    */
  def signatureText(text: Column, shingleN: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftExpr
    // null text == empty doc (the twin's concat_ws(" ", null) = "" path):
    // coalesce to an empty token array so both sides sign the "" shingle
    GraftExpr.column(TextDedupExpr.MinHashTokens(
      GraftExpr.expression(
        coalesce(TextOps.tokens(text), typedlit(Seq.empty[String]))),
      shingleN, (0 until k).map(aCoef), (0 until k).map(bCoef)))
  }

  /** Declarative twin of [[signature]] (TextDedupSpec differential).
    *
    * Single-pass shape chosen from profiling: hash each shingle ONCE
    * (inner transform), expand to its k permuted hashes against
    * constant-literal coefficient arrays (`typedlit` — a single Literal,
    * not a per-row CreateArray), then fold an elementwise-min. Naive
    * per-j recomputation was ~10x slower (md5 re-evaluated k times and
    * two 16-element arrays allocated per shingle per j).
    */
  def signatureCol(shingles: Column, k: Int): Column = {
    val aArr = typedlit((0 until k).map(aCoef))
    val bArr = typedlit((0 until k).map(bCoef))
    val hs = transform(shingles, s => TextOps.strHash(s) % P)
    val perShingle = transform(hs, h =>
      transform(sequence(lit(0), lit(k - 1)),
        j => (element_at(aArr, j + 1) * h + element_at(bArr, j + 1)) % P))
    aggregate(perShingle, typedlit(Seq.fill(k)(P)),
      (acc, v) => zip_with(acc, v, (x, y) => least(x, y)))
  }

  /** LSH band keys: bands of `rowsPerBand` signature slots; key =
    * "<band>:<v1>_<v2>_..." — docs sharing any band key are candidates.
    */
  def bandKeys(sig: Column, k: Int, rowsPerBand: Int): Column = {
    val nBands = k / rowsPerBand
    transform(sequence(lit(0), lit(nBands - 1)),
      b => concat(b.cast("string"), lit(":"),
        concat_ws("_", transform(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")))))
  }

  /** Candidate near-dup pairs via MinHash LSH: explode band keys, self-join
    * on the bucket, emit (a, b) with a < b, distinct. The band-bucket
    * shuffle is hash-partitioned on the key; hot buckets (boilerplate
    * docs) are the skew case AQE skew-join handles.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, rowsPerBand: Int): DataFrame = {
    // materialize signatures ONCE: the self-join would otherwise evaluate
    // the whole shingle->hash->min pipeline on both sides (and bandKeys
    // references the signature once per band) — profiled ~4x. Repartition
    // first: signature computation is CPU-bound, and a small parquet input
    // arrives as a single partition (one task) otherwise.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val withSig = docs.repartition(par).select(
      col(idCol).as("id"),
      signatureText(col(textCol), shingleN, k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withBands = withSig.select(col("id"),
      explode(bandKeys(col("sig"), k, rowsPerBand)).as("band"))
    val l = withBands.as("l")
    val r = withBands.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
  }

  /** Near-duplicate CLUSTERS — the full corpus-dedup decision, composed
    * from gated parts: banded MinHash candidate pairs
    * ([[minhashPairs]]) -> exact connected components
    * (graph.GraphOps.connectedComponents, min-label to fixpoint) ->
    * per-doc (canonical id = component minimum, cluster size). Keeping
    * `doc_id == canonical_id` rows is the standard "keep one per
    * cluster" dedup policy; singletons are their own canonical.
    */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, rowsPerBand: Int): DataFrame = {
    val pairs = minhashPairs(docs, idCol, textCol, shingleN, k, rowsPerBand)
    val labels = graft.graph.GraphOps.connectedComponents(
      docs.select(col(idCol).cast("long").as("id")),
      pairs.select(col("a").cast("long").as("src"),
        col("b").cast("long").as("dst")))
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("canonical_id"),
        col("cluster_size"))
  }

  /** 32-bit SimHash: bit i of the result is 1 iff the sum over distinct
    * tokens of (+1 / -1 by token-hash bit i) is >= 0. FUSED
    * (TextDedupExpr.SimHash32): tokenization stays declarative (split /
    * lower are native codegen'd), the per-token 32-bit vote loop is one
    * static call. [[simhashCol]] is the Column twin.
    */
  def simhash(text: Column): Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(TextDedupExpr.SimHash32(
      GraftExpr.expression(array_distinct(TextOps.tokens(text)))))
  }

  /** Declarative twin of [[simhash]] (TextDedupSpec differential). */
  def simhashCol(text: Column): Column = {
    val masks = typedlit((0 until 32).map(i => 1L << i))
    val toks = array_distinct(TextOps.tokens(text))
    val hashes = transform(toks, t => TextOps.strHash(t))
    // one pass: per token expand its +-1 bit vector, fold elementwise sums
    val perTok = transform(hashes, h =>
      transform(sequence(lit(0), lit(31)),
        i => when(h.bitwiseAND(element_at(masks, i + 1)) =!= 0, 1L)
          .otherwise(-1L)))
    val sums = aggregate(perTok, typedlit(Seq.fill(32)(0L)),
      (acc, v) => zip_with(acc, v, (x, y) => x + y))
    aggregate(
      zip_with(sums, masks, (s, m) => when(s >= 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-duplicate pairs via hamming banding: the 32-bit hash
    * splits into 4 disjoint bytes; by pigeonhole, hamming distance <= 3
    * implies AT LEAST one byte is equal, so the band-bucket self-join
    * (4 keys per doc) finds every such pair without an all-pairs scan —
    * same candidate-then-verify architecture as MinHash banding. The
    * verify stage is exact: bit_count(xor) <= maxHamming.
    * (maxHamming > 3 trades recall; the 4-byte split guarantees full
    * recall only up to 3.)
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val s = docs.repartition(par)
      .select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        (shiftright(col("sh"), 8 * b) % 256).as("key"))): _*)
    val keyed = s.select(col("id"), col("sh"), explode(bands).as("bb"))
      .select(col("id"), col("sh"),
        col("bb.band").as("band"), col("bb.key").as("key"))
    val l = keyed.as("l")
    val r = keyed.as("r")
    // dedupe candidates across bands BEFORE the hamming verify (round-2
    // verdict #7): (a, b) determines both simhashes, so the dropped rows
    // are exact duplicates and the verify runs once per candidate pair
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
        && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        col("l.sh").as("sha"), col("r.sh").as("shb"))
      .dropDuplicates("a", "b")
      .filter(bit_count(col("sha").bitwiseXOR(col("shb"))) <= maxHamming)
      .select(col("a"), col("b"))
  }

  /** Exact-duplicate groups by normalized fingerprint: keep the lowest id
    * as canonical, report group size.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("group_size"))

  /** Exact n-gram Jaccard for pairs blocked by `blockCol` (same block
    * only): returns integer |∩| and |∪| so thresholds compare exactly.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleN: Int): DataFrame = {
    val s = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      TextOps.shingles(col(textCol), shingleN).as("sh"))
    val l = s.as("l")
    val r = s.as("r")
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("a"), col("r.id").as("b"),
        size(array_intersect(col("l.sh"), col("r.sh"))).as("inter_n"),
        size(array_union(col("l.sh"), col("r.sh"))).as("union_n"))
  }
}
