package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the in-batch first-occurrence dedup forms at
  * heavy-round scale (dev tool): row_number window vs min_by aggregate
  * over the same synthesized children table, alternated A/B/A/B in one
  * JVM so hypervisor steal hits both forms equally.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "3000000").toLong
    val dupFactor = 4 // children per distinct urlHash, the bench regime
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // synthesized children: n rows, n/dupFactor distinct hashes, a
    // realistic payload width (the candCols the engine carries)
    val base = spark.range(n).select(
      (col("id") % (n / dupFactor)).as("urlHash"),
      col("id").as("parentSeq"),
      (col("id") % 7).cast("int").as("emissionIdx"),
      concat(lit("http://h"), col("id") % 1000, lit(".test/p/"), col("id"))
        .as("canonical"),
      (col("id") % 1000).cast("string").as("host"),
      lit(null).cast("string").as("tag"),
      (col("id") % 5).cast("int").as("depth"),
      lit(0).as("priority"),
      lit(0).as("discoveryRound"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()

    def windowForm(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("urlHash"))
        .orderBy(struct(col("parentSeq"), col("emissionIdx")))
      df.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") === 1).drop("_rk")
    }
    def aggForm(df: DataFrame): DataFrame =
      graft.dedup.Seen.firstOccurrence(df,
        struct(col("parentSeq"), col("emissionIdx")))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      require(c == n / dupFactor, s"rows $c")
      (System.nanoTime() - t0) / 1e9
    }
    def ab(label: String, df: DataFrame): Unit = {
      // warm both
      time(windowForm(df).count()); time(aggForm(df).count())
      val (ws, as) = (scala.collection.mutable.ArrayBuffer.empty[Double],
        scala.collection.mutable.ArrayBuffer.empty[Double])
      for (_ <- 1 to 5) {
        ws += time(windowForm(df).count())
        as += time(aggForm(df).count())
      }
      def f(xs: Seq[Double]) =
        f"min=${xs.min}%.2f med=${xs.sorted.apply(xs.size / 2)}%.2f"
      println(s"""{"probe":"dedup_ab","input":"$label","rows":$n,""" +
        s""""dup":$dupFactor,"window":"${f(ws.toSeq)}",""" +
        s""""min_by":"${f(as.toSeq)}"}""")
    }
    // standalone regime: the exchange is paid by both forms
    ab("unclustered", base)
    // ENGINE regime: input already hash-clustered by urlHash (the seen
    // anti-join's layout) — the window's exchange is elided, min_by
    // plans a partial+final SortAggregate pair with no exchange between
    val clustered = base.repartition(32, col("urlHash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clustered.count()
    ab("preclustered", clustered)
    spark.stop()
  }
}
