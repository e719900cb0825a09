package graft

import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.text.TextOps

/** Differential spec for the fused MinHash/SimHash kernels: fused ==
  * Column twin on a corpus with every edge the twins define semantics
  * for — empty text, whitespace-only, single token, shorter-than-n
  * shingles, unicode, null text.
  */
class TextDedupExprSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (Seq(
    (0L, Some("the quick brown fox jumps over the lazy dog")),
    (1L, Some("the quick brown fox jumps over the lazy cat")),
    (2L, Some("")),
    (3L, Some("   ")),
    (4L, Some("single")),
    (5L, Some("two tokens")),
    (6L, Some("ünïcode tökens with ümlauts")),
    (7L, None),
    (8L, Some("a b a b a b repeated bigram stream a b"))) ++
    (9L until 200L).map(i => (i,
      Some(s"doc $i body ${(i * 7) % 13} ${(i * 11) % 17} shared tail"))))
    .toDF("id", "text")

  test("minhash signature fused == Column twin") {
    val k = 16
    val d = corpus.select(
      TextDedup.signature(TextOps.shingles(col("text"), 3), k).as("f"),
      TextDedup.signatureCol(TextOps.shingles(col("text"), 3), k).as("c"))
    assert(d.filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("whole-pipeline signatureText == shingle-array signature == twin") {
    val k = 16
    for (n <- Seq(2, 3, 5)) {
      val d = corpus.select(
        TextDedup.signatureText(col("text"), n, k).as("p"),
        TextDedup.signature(TextOps.shingles(col("text"), n), k).as("f"),
        TextDedup.signatureCol(TextOps.shingles(col("text"), n), k).as("c"))
      assert(d.filter(not(col("p") <=> col("f"))).count() == 0, s"n=$n p!=f")
      assert(d.filter(not(col("p") <=> col("c"))).count() == 0, s"n=$n p!=c")
    }
  }

  test("simhash fused == Column twin") {
    val d = corpus.select(
      TextDedup.simhash(col("text")).as("f"),
      TextDedup.simhashCol(col("text")).as("c"))
    assert(d.filter(not(col("f") <=> col("c"))).count() == 0)
  }

  test("strHash60 static == declarative conv(md5) hash") {
    val rows = corpus.filter(col("text").isNotNull)
      .select(col("text"), TextOps.strHash(col("text")).as("h"))
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, h) =>
      val f = graft.dedup.TextHash.strHash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(f == h, s"mismatch on '$t': $f != $h")
    }
  }

  test("winnowSet fused == staged Column twin") {
    for ((k, w) <- Seq((5, 4), (3, 2), (8, 5))) {
      val d = corpus.select(
        TextOps.winnowSet(col("text"), k, w).as("f"),
        TextOps.winnowSetCol(col("text"), k, w).as("c"))
      assert(d.filter(not(col("f") <=> col("c"))).count() == 0, s"k=$k w=$w")
    }
  }

  test("SQL surface: fused kernels callable via GraftExtensions functions") {
    graft.canon.GraftExtensions.functions.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    corpus.filter(col("text").isNotNull).limit(50)
      .createOrReplaceTempView("tdx_docs")
    val viaSql = spark.sql(
      """SELECT id,
           minhash_tokens(filter(split(lower(trim(text)), '\\s+'),
                                 t -> t <> ''), 3, 8) AS sig,
           simhash32(array_distinct(filter(split(lower(trim(text)), '\\s+'),
                                           t -> t <> ''))) AS sh,
           winnow_set(regexp_replace(lower(text), '[^a-z0-9]', ''), 5, 4)
             AS wfp
         FROM tdx_docs""")
    val viaApi = corpus.filter(col("text").isNotNull).limit(50).select(
      col("id"),
      TextDedup.signatureText(col("text"), 3, 8).as("sig"),
      TextDedup.simhash(col("text")).as("sh"),
      TextOps.winnowSet(col("text"), 5, 4).as("wfp"))
    assert(viaSql.exceptAll(viaApi).count() == 0)
    assert(viaApi.exceptAll(viaSql).count() == 0)
    // vector kernels
    val v = spark.sql(
      "SELECT dot_q(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
        "cosine_q(array(3L,4L), array(3L,4L)) AS c, " +
        "quantize_vec(array(CAST(1.5 AS FLOAT), CAST(-0.25 AS FLOAT))) AS q")
      .head()
    assert(v.getLong(0) == 32L)
    assert(math.abs(v.getDouble(1) - 1.0) < 1e-12)
    assert(v.getSeq[Long](2) == Seq(1500L, -250L))
  }

  test("fused minhash/simhash stay codegen'd (no fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = corpus.select(
        TextDedup.signature(TextOps.shingles(col("text"), 3), 8).as("sig"),
        TextDedup.simhash(col("text")).as("sh")).count()
      assert(n == 200)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
