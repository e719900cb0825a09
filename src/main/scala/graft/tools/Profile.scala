package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.text.TextOps

/** Ad-hoc stage profiler for expensive operators (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    time("tokens+shingles only") {
      docs.select(TextOps.shingles(col("text"), 3).as("sh"))
        .selectExpr("sum(size(sh))").collect()
    }
    time("strHash per shingle") {
      docs.select(transform(TextOps.shingles(col("text"), 3),
        s => TextOps.strHash(s) % TextOps.P).as("hs"))
        .selectExpr("sum(size(hs))").collect()
    }
    time("full signature k=16") {
      docs.select(TextDedup.signature(
        TextOps.shingles(col("text"), 3), 16).as("sig"))
        .selectExpr("sum(size(sig))").collect()
    }
    time("signature again (codegen cached?)") {
      docs.select(TextDedup.signature(
        TextOps.shingles(col("text"), 3), 16).as("sig"))
        .selectExpr("sum(size(sig))").collect()
    }
    time("bands") {
      docs.select(explode(TextDedup.bandKeys(TextDedup.signature(
        TextOps.shingles(col("text"), 3), 16), 16, 4)).as("b"))
        .groupBy("b").count().count()
    }
    time("full minhashPairs") {
      TextDedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4).count()
    }
    spark.stop()
  }
}
