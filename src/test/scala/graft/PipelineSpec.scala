package graft

import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.multimodal.Media
import graft.sim.Ann
import graft.text.TextOps

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embeds = spark.read.parquet(s"$dir/embeddings.parquet")

  test("tokens/fingerprint: whitespace- and case-insensitive") {
    val df = Seq(("A  Fast\tFox ", 1), ("a fast fox", 2)).toDF("text", "id")
    val fps = df.select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    val counts = df.select(TextOps.tokenCount($"text")).as[Int].collect()
    assert(counts.toSeq == Seq(3, 3))
  }

  test("langId picks the marker-dominant language") {
    val cases = Seq(
      "x the cat and the dog of y" -> "en",
      "y el gato la casa de z" -> "es",
      "der hund und die katze" -> "de",
      "le chat et les chiens" -> "fr")
    val got = cases.map(_._1).toDF("text")
      .select(TextOps.langId($"text")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("exact dedup groups planted duplicates") {
    val planted = docs.limit(10).select($"doc_id", $"text")
      .unionByName(docs.limit(3).select(
        ($"doc_id" + 1000).as("doc_id"), upper($"text").as("text")))
    val groups = TextDedup.exactDupGroups(planted, "doc_id", "text")
    assert(groups.count() == 10) // 3 dups fold into their originals
    assert(groups.filter($"group_size" === 2).count() == 3)
  }

  test("minhash LSH pairs planted exact duplicates (identical signatures)") {
    val planted = docs.limit(20).select($"doc_id", $"text")
      .unionByName(docs.limit(5).select(
        ($"doc_id" + 1000).as("doc_id"), $"text"))
    val pairs = TextDedup.minhashPairs(planted, "doc_id", "text", 3, 16, 4)
      .as[(Long, Long)].collect().toSet
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 1000L)), s"missing dup pair $i")
    }
  }

  test("jaccard: identical docs have inter == union; distinct-shingle sanity") {
    val planted = Seq((1L, "a", "w1 w2 w3 w4 w5"), (2L, "a", "w1 w2 w3 w4 w5"),
      (3L, "a", "z1 z2 z3 z4 z5")).toDF("doc_id", "source", "text")
    val rows = TextDedup.jaccardPairs(planted, "doc_id", "text", "source", 3)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(rows.contains((1L, 2L, 3, 3)))
    assert(rows.exists { case (a, b, i, _) => a == 1 && b == 3 && i == 0 })
  }

  test("simhash: identical text -> identical hash; hamming via bit_count") {
    val df = Seq(("the quick brown fox", 1), ("the quick brown fox", 2),
      ("utterly different words entirely", 3)).toDF("text", "id")
    val hs = df.select(TextDedup.simhash($"text")).as[Long].collect()
    assert(hs(0) == hs(1))
    val dist = df.limit(1)
      .select(bit_count(lit(hs(0)).bitwiseXOR(lit(hs(2))))).as[Int].head()
    assert(dist > 0)
  }

  test("winnowing: identical docs identical sets; shared substring shares fp") {
    import graft.text.TextOps
    val doc = "the quick brown fox jumps over the lazy dog near the river bank"
    val partialCopy = "PREFIX words here " + doc + " and a different suffix"
    val other = "completely unrelated content about astrophysics and quarks"
    val df = Seq((1L, doc), (2L, doc), (3L, partialCopy), (4L, other))
      .toDF("id", "text")
    val fps = df.select($"id", TextOps.winnowSet($"text"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1) == fps(2)) // deterministic set
    // winnowing guarantee: a shared substring >= k+w-1 chars yields at
    // least one common fingerprint — here the whole of `doc` is shared
    val overlap = fps(1).toSet.intersect(fps(3).toSet)
    assert(overlap.nonEmpty, "no shared fingerprint for embedded copy")
    assert(overlap.size * 2 > fps(1).size,
      s"weak overlap ${overlap.size}/${fps(1).size} for a full embedding")
    // unrelated docs share (essentially) nothing
    assert(fps(1).toSet.intersect(fps(4).toSet).size < overlap.size)
  }

  test("simhash pairs: planted copies found, every pair verifies <= maxHamming") {
    val base = docs.limit(40).select($"doc_id", $"text")
    val planted = base.unionByName(docs.limit(10).select(
      ($"doc_id" + 5000).as("doc_id"), $"text"))
    val pairs = TextDedup.simhashPairs(planted, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toSet
    (0 until 10).foreach(i =>
      assert(pairs.contains((i.toLong, i + 5000L)), s"missing planted pair $i"))
    val sh = planted.select($"doc_id",
      TextDedup.simhash($"text")).as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3, s"($a,$b) too far")
    }
  }

  test("subword count: BPE-ish run segmentation, ceil(len/4) per run") {
    val cases = Seq(
      ("hello world", 4L),      // 2 runs of 5 chars -> 2+2
      ("a b2c!", 5L),           // a | b | 2 | c | ! -> 5 single-char runs
      ("Internationalization", 5L), // one 20-char run -> ceil(20/4)
      ("", 0L))
    val got = cases.map(_._1).toDF("text")
      .select(graft.text.TextOps.subwordCount($"text")).as[Long].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("brute-force ANN: query's own vector is rank-1 with cosine 1.0") {
    val q = embeds.filter($"vec_id" === 7)
      .select(Ann.quantize($"embedding").as("qvec"))
    val top = Ann.bruteForceTopK(embeds, "vec_id", "embedding", q, 3)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 7L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
  }

  test("LSH top-k is a subset of the brute-force ranking prefix semantics") {
    val q = embeds.filter($"vec_id" === 7)
      .select(Ann.quantize($"embedding").as("qvec"))
    val brute = Ann.bruteForceTopK(embeds, "vec_id", "embedding", q, 500)
      .as[(Long, Double)].collect().toMap
    val lsh = Ann.lshTopK(embeds, "vec_id", "embedding", q, 64, 10)
      .drop("bucket").as[(Long, Double)].collect()
    assert(lsh.nonEmpty && lsh.head._1 == 7L) // own bucket contains self
    lsh.foreach { case (id, cos) =>
      assert(math.abs(brute(id) - cos) < 1e-12) // same exact scores
    }
  }

  test("IVF: centroid vectors assign to themselves") {
    val assign = Ann.ivfAssign(embeds, "vec_id", "embedding", stride = 50)
      .as[(Long, Long)].collect().toMap
    assign.keys.filter(_ % 50 == 0).foreach { cid =>
      assert(assign(cid) == cid, s"centroid $cid not self-assigned")
    }
    assert(assign.size == embeds.count())
  }

  test("IVF fold-argmax == local argmax over collected vectors (differential)") {
    // the r02 rewrite replaced the NxC crossJoin+window with a per-row fold
    // over the centroid literal; pin it against a plain-Scala mirror
    val all = embeds.select($"vec_id".cast("long"),
        Ann.quantize($"embedding")).as[(Long, Seq[Long])].collect()
    val cents = all.filter(_._1 % 50 == 0).sortBy(_._1)
      .map { case (cid, cv) =>
        (cid, cv, math.sqrt(cv.map(x => x * x).sum.toDouble)) }
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map(p => p._1 * p._2).sum
    val want = all.map { case (id, v) =>
      val vn = math.sqrt(dot(v, v).toDouble)
      var bestCid = -1L
      var bestCos = Double.NegativeInfinity
      cents.foreach { case (cid, cv, cn) =>
        val cos = dot(v, cv).toDouble / (vn * cn)
        if (cos > bestCos) { bestCos = cos; bestCid = cid }
      }
      id -> bestCid
    }.toMap
    val got = Ann.ivfAssign(embeds, "vec_id", "embedding", 50)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("persisted IVF index: build once, search reads only probed lists; " +
      "probing every list == brute force") {
    val path = SparkTestBase.tmpDir("ivf-index")
    val index = Ann.ivfBuild(embeds, "vec_id", "embedding", stride = 50, path)
    val nLists = index.centroids.size
    assert(nLists == (embeds.count() / 50 + (if (embeds.count() % 50 == 0) 0 else 1)).toInt
      || nLists > 0) // deterministic stride sampling
    val q = embeds.filter($"vec_id" === 7)
      .select(Ann.quantize($"embedding").as("qvec"))
    // search plan reads the PERSISTED assignment (no corpus recompute) and
    // prunes to the probed lists' partitions
    val one = Ann.ivfSearchIndexed(index, q, k = 5, nprobe = 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("ivf-index"), s"search not on the index:\n$plan")
    // directory-level pruning: the cid predicate is a PARTITION filter on
    // the index scan (only the probed list's files are read)
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*?PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cid"),
      s"probe is not partition-pruned:\n$plan")
    // a vector is its own nearest neighbour inside its list
    val (topId, topCos) = one.as[(Long, Double)].collect().head
    assert(topId == 7L && topCos > 0.999999)
    // probing ALL lists recovers the exact brute-force top-k
    val all = Ann.ivfSearchIndexed(index, q, k = 10, nprobe = nLists)
      .as[(Long, Double)].collect().toSeq
    val brute = Ann.bruteForceTopK(embeds, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(all == brute)
    // two searches reuse one build — no second assignment job needed
    val three = Ann.ivfSearchIndexed(index, q, k = 5, nprobe = 3)
    assert(three.count() == 5)
  }

  test("banded near-dup: wider recall than one narrow band, exact verify holds") {
    val single = Ann.nearDupPairs(embeds, "vec_id", "embedding", 64,
      1, 5, nBits = 18).as[(Long, Long)].collect().toSet
    val banded = Ann.nearDupPairsBanded(embeds, "vec_id", "embedding", 64,
      1, 5, bands = 3, bitsPerBand = 6).as[(Long, Long)].collect().toSet
    // every emitted pair truly clears the exact threshold (verify stage)
    val vecs = embeds.select($"vec_id".cast("long"),
      Ann.quantize($"embedding")).as[(Long, Seq[Long])].collect().toMap
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map(p => p._1 * p._2).sum
    banded.foreach { case (a, b) =>
      val (va, vb) = (vecs(a), vecs(b))
      val d = dot(va, vb)
      assert(d > 0 && d * d * 25L >= dot(va, va) * dot(vb, vb),
        s"pair ($a,$b) below threshold")
    }
    // 3 bands recover recall a single over-sharp signature loses
    assert(banded.size >= single.size)
  }

  test("LSH bucket count scales with N (chooseBits + width shrinks)") {
    assert(Ann.chooseBits(500, 100) == 8) // floor
    assert(Ann.chooseBits(1L << 30, 1000) == 21) // ceil(log2(2^30/1000))
    assert(Ann.chooseBits(1L << 60, 1) == 24) // cap
    // deterministic skewed corpus: 25% clustered + spread remainder
    val n = 2000
    val skew = (0 until n).map { i =>
      val base = if (i % 4 == 0) Array.fill(16)(0.9f)
      else Array.tabulate(16)(d => (((i * 31 + d * 17) % 13) - 6) / 6.0f)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    def maxBucket(bits: Int): Long = skew
      .select(Ann.lshBucket(Ann.quantize($"embedding"), 16, bits).as("b"))
      .groupBy("b").count().agg(max("count")).as[Long].head()
    val w8 = maxBucket(8)
    val w12 = maxBucket(12)
    assert(w12 <= w8, s"12-bit max bucket $w12 > 8-bit $w8")
    // identical vectors always collide — banding, not bits, bounds that
    // (the clustered 25% is one bucket at any width); the SPREAD mass
    // must shard: exclude the planted cluster and require real shrink
    assert(w12 <= math.max(n / 4, w8 / 2),
      s"spread mass did not shard: w8=$w8 w12=$w12")
  }

  test("IVF nprobe: monotone recall; nprobe=all == brute force") {
    val q = embeds.filter($"vec_id" === 7)
      .select(Ann.quantize($"embedding").as("qvec"))
    val brute = Ann.bruteForceTopK(embeds, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val nCents = (embeds.count() / 50 + 1).toInt
    val all = Ann.ivfSearchN(embeds, "vec_id", "embedding", q, 50, 10, nCents)
      .as[(Long, Double)].collect().toSeq
    assert(all == brute) // probing every list IS brute force
    val one = Ann.ivfSearchN(embeds, "vec_id", "embedding", q, 50, 10, 1)
      .as[(Long, Double)].collect().toSeq
    val three = Ann.ivfSearchN(embeds, "vec_id", "embedding", q, 50, 10, 3)
      .as[(Long, Double)].collect().toSeq
    // recall is monotone in nprobe: results found at nprobe=1 with a
    // cosine above three's floor must persist
    assert(one.toSet.subsetOf(three.toSet ++ one.filter(_._2 < three.last._2)))
    assert(one.head._1 == 7L) // own list contains self
  }

  test("media decode plumbing: row-preserving, deterministic, dim-correct") {
    val media = Media.mediaTable(docs, "doc_id", "text")
    val f1 = Media.extractFeatures(media, new Media.StubDecoder(8))
    val f2 = Media.extractFeatures(media, new Media.StubDecoder(8))
    assert(f1.count() == docs.count())
    val a = f1.orderBy("media_id").as[Media.MediaFeatures].collect()
    val b = f2.orderBy("media_id").as[Media.MediaFeatures].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.feature.size == 8))
    // meta expression path agrees with the decoder's stub geometry
    val meta = Media.mediaMeta(media).orderBy("media_id")
      .as[(Long, String, Long, Int, Int)].collect()
    a.zip(meta).foreach { case (f, (_, _, len, w, h)) =>
      assert(f.byte_len == len && f.width == w && f.height == h)
    }
  }
}
