package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sim.Ann

/** Differential spec for the fused ANN expressions (AnnExpr): the fused
  * codegen'd forms must equal their Column twins — including the
  * null/shape contracts — on a deterministic pseudo-random corpus. Same
  * pattern as CanonSpec's fused == Column differential.
  */
class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** Deterministic float vectors with negatives, exact halves (floor
    * boundary cases), and a couple of null elements / null rows.
    */
  private def corpus: DataFrame = {
    val rows: Seq[(Long, Seq[Option[Float]])] = (0L until 300L).map { i =>
      val v = (0 until dim).map { j =>
        val h = (i * 31 + j * 17 + 7) % 997
        if (i == 42 && j == 3) None // null element
        else Some(((h - 498).toFloat / 133.0f))
      }
      (i, v)
    } :+ (300L, Seq.empty[Option[Float]]) // empty vector
    val withNullVec = rows :+
      (301L, null.asInstanceOf[Seq[Option[Float]]]) // NULL vector row
    withNullVec.toDF("id", "vec")
  }

  test("quantize fused == Column twin (incl. null element, empty array)") {
    val d = corpus.select(
      Ann.quantize(col("vec")).as("f"),
      Ann.quantizeCol(col("vec")).as("c"))
    assert(d.filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("dotQ / cosineQ fused == Column twins (pairs, null, mismatch)") {
    val q = corpus.select(col("id"), Ann.quantize(col("vec")).as("v"))
    val pairs = q.as("l").join(q.as("r"),
      col("l.id") + 1 === col("r.id")) // consecutive pairs incl. the empty
      .select(col("l.v").as("a"), col("r.v").as("b"))
    val d = pairs.select(
      Ann.dotQ(col("a"), col("b")).as("df"),
      Ann.dotQCol(col("a"), col("b")).as("dc"),
      Ann.cosineQ(col("a"), col("b")).as("cf"),
      Ann.cosineQCol(col("a"), col("b")).as("cc"))
    assert(d.filter(not(col("df") <=> col("dc"))).count() == 0)
    // cosine: NaN == NaN under <=> is false; compare via string form which
    // canonicalizes NaN, and exactly otherwise
    assert(d.filter(not(col("cf").cast("string") <=> col("cc").cast("string")))
      .count() == 0)
  }

  test("lshBucket fused == Column twin at several widths/offsets") {
    val q = corpus.filter(col("id") < 300).select(Ann.quantize(col("vec")).as("v"))
    for ((bits, off) <- Seq((8, 0), (12, 8), (16, 32))) {
      val d = q.select(
        Ann.lshBucket(col("v"), dim, bits, off).as("f"),
        Ann.lshBucketCol(col("v"), dim, bits, off).as("c"))
      assert(d.filter(not(col("f") <=> col("c"))).count() == 0,
        s"bits=$bits offset=$off")
    }
  }

  test("lshBucket null contract: null element => bucket 0 (twin-equal)") {
    val q = corpus.filter(col("id") === 42).select(Ann.quantize(col("vec")).as("v"))
    val (f, c) = q.select(
      Ann.lshBucket(col("v"), dim, 8).as("f"),
      Ann.lshBucketCol(col("v"), dim, 8).as("c"))
      .as[(Long, Long)].head()
    assert(f == 0L && c == 0L)
  }

  test("lshBucket null contract: NULL VECTOR => bucket 0 (twin-equal)") {
    // the fused expression alone is null-intolerant (-> NULL); the
    // coalesce in lshBucket must pin it to the twin's bucket-0 behavior
    val q = corpus.filter(col("id") === 301)
      .select(Ann.quantize(col("vec")).as("v"))
    val (f, c) = q.select(
      Ann.lshBucket(col("v"), dim, 8).as("f"),
      Ann.lshBucketCol(col("v"), dim, 8).as("c"))
      .as[(Long, Long)].head()
    assert(f == 0L && c == 0L)
  }

  test("IVF argmax fused == Column twin; ivfAssign unchanged") {
    val q = corpus.filter(col("id") < 300 && col("id") =!= 42)
      .select(col("id"), Ann.quantize(col("vec")).as("v"))
    // centroids: every 50th vector (same shape collectCentroids builds)
    val cents = q.filter(col("id") % 50 === 0).orderBy("id").collect().map { r =>
      val cv = r.getSeq[Long](1).toSeq
      (r.getLong(0), cv, math.sqrt(cv.map(x => x * x).sum.toDouble))
    }.toSeq
    val d = q
      .withColumn("vn", sqrt(Ann.norm2QCol(col("v")).cast("double")))
      .select(col("id"),
        org.apache.spark.sql.GraftExpr.column(
          graft.sim.AnnExpr.IvfArgmax(
            org.apache.spark.sql.GraftExpr.expression(col("v")), cents)).as("f"),
        Ann.argmaxCidCol(cents, col("v"), col("vn")).as("c"))
    assert(d.filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("LSH recall vs brute-force ground truth; coarser buckets recall more") {
    // Deterministic corpus + deterministic hyperplanes => recall is a
    // FIXED number, so this pins the accuracy/cost trade-off the LSH
    // tier sells: the single-bucket search trades recall for scanning
    // only ~N/2^bits rows, and widening buckets (fewer bits) buys
    // recall back monotonically (on average over queries).
    val vecs = corpus.filter(col("id") < 300 && col("id") =!= 42)
    val qids = Seq(7L, 31L, 101L, 157L, 263L)
    def recallAt(bits: Int): Seq[Double] = qids.map { qid =>
      val query = corpus.filter(col("id") === qid)
        .select(Ann.quantize(col("vec")).as("qvec"))
      val truth = Ann.bruteForceTopK(vecs, "id", "vec", query, 10)
        .select("id").as[Long].collect().toSet
      val got = Ann.lshTopK(vecs, "id", "vec", query, dim, 10, nBits = bits)
        .select("id").as[Long].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val r4 = recallAt(4)
    val r8 = recallAt(8)
    val mean4 = r4.sum / r4.size
    val mean8 = r8.sum / r8.size
    // every query at 4 bits finds at least the query vector itself
    assert(r4.forall(_ > 0.0), s"r4=$r4")
    assert(mean4 >= 0.2, s"mean4=$mean4 r4=$r4")
    assert(mean4 >= mean8, s"mean4=$mean4 < mean8=$mean8 (r4=$r4 r8=$r8)")
  }

  test("fused expressions stay codegen'd (no fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val q = corpus.filter(col("id") < 100)
        .select(col("id"), Ann.quantize(col("vec")).as("v"))
      val n = q.select(
        Ann.cosineQ(col("v"), col("v")).as("cos"),
        Ann.lshBucket(col("v"), dim, 12).as("b")).count()
      assert(n == 100)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
