package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Embeddings are QUANTIZED to integers (floor(x*1000)) before any
  * arithmetic: dot products and norms become exact 64-bit integers, so
  * scores are bit-identical across engines (the only flops are the final
  * IEEE-deterministic sqrt/divide) and results are reproducible across
  * cluster sizes — which also makes the DuckDB oracle exact.
  *
  *  - brute-force top-k: one narrow projection + one global top-k
  *    (rank-limit); the baseline and the recall reference
  *  - random-hyperplane LSH: 8 sign bits from deterministic integer
  *    hyperplanes -> 256 buckets; search touches only the query's bucket
  *  - IVF: deterministic coarse centroids (every (N/C)-th vector),
  *    assignment by max cosine, search probes the query's list
  */
object Ann {

  /** floor(x*1000) per component, as long. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def norm2Q(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from integer parts: IEEE-deterministic double. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(norm2Q(a).cast("double")) * sqrt(norm2Q(b).cast("double")))

  /** Brute-force top-k neighbours of `query` (a quantized array column of
    * one row, cross-joined — i.e. broadcast) among `vecs`.
    * Deterministic order: (cosine desc, id asc).
    */
  def bruteForceTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame = {
    val q = broadcast(query.select(col("qvec")))
    val scored = vecs
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
      .crossJoin(q)
      .select(col("id"), cosineQ(col("v"), col("qvec")).as("cosine"))
    scored
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Deterministic integer hyperplane component: w_j[i] in [-3, 3]. */
  def hyper(j: Int, dim: Int): Seq[Long] =
    (0 until dim).map(i => ((i.toLong * 31 + j.toLong * 17) % 7) - 3)

  /** 8-bit LSH bucket id from sign bits of 8 hyperplane dots.
    * Hyperplanes are `typedlit` constants (one Literal each, no per-row
    * array construction).
    */
  def lshBucket(vQ: Column, dim: Int, nBits: Int = 8): Column = {
    val bits = (0 until nBits).map { j =>
      val w = typedlit(hyper(j, dim))
      when(dotQ(vQ, w) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: only the query's bucket is scanned. Returns the
    * in-bucket top-k by exact cosine (approximate global recall).
    */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, dim: Int, k: Int): DataFrame = {
    val qq = broadcast(query.select(col("qvec"),
      lshBucket(col("qvec"), dim).as("qbucket")))
    vecs.select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim))
      .join(qq, col("bucket") === col("qbucket"))
      .select(col("id"), cosineQ(col("v"), col("qvec")).as("cosine"),
        col("bucket"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** IVF assignment: centroid set = every strideth vector (deterministic);
    * each vector joins its argmax-cosine centroid. Returns
    * (id, centroid_id). At scale the centroid side is tiny -> broadcast;
    * the argmax is a window over (id), partition-parallel.
    */
  def ivfAssign(vecs: DataFrame, idCol: String, vecCol: String,
      stride: Int): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
    val cents = broadcast(v.filter(col("id") % stride === 0)
      .select(col("id").as("cid"), col("v").as("cv")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("cid").asc)
    v.crossJoin(cents)
      .select(col("id"), col("cid"), cosineQ(col("v"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("cid"))
  }

  /** Embedding near-duplicate pairs: exact integer-cosine >= num/den
    * within LSH blocks (same bucket), id-ordered. Threshold compares via
    * cross-multiplied SQUARED integers — zero float boundary risk:
    * cos >= t  <=>  dot >= 0 && den^2 * dot^2 >= num^2 * |a|^2 * |b|^2.
    */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, thrNum: Long, thrDen: Long): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim))
    val l = v.as("l")
    val r = v.as("r")
    val dot = dotQ(col("l.v"), col("r.v"))
    val n2 = norm2Q(col("l.v")) * norm2Q(col("r.v"))
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        dot.as("dot"), n2.as("n2"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * (thrDen * thrDen) >=
          col("n2") * (thrNum * thrNum))
      .select(col("a"), col("b"))
  }
}
