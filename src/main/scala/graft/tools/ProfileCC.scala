package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.graph.GraphOps

/** Ad-hoc stage profiler for the dup-cluster path (dev tool). */
object ProfileCC {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.limit(10).count() // warm

    val pairs = time("minhashPairs count") {
      val p = TextDedup.minhashPairs(docs, "doc_id", "text", 3, 16, 4)
      println(s"  pairs=${p.count()}")
      p
    }
    time("minhashPairs again") { pairs.count() }
    var iters = 0
    val labels = time("connectedComponents") {
      GraphOps.connectedComponents(
        docs.select(col("doc_id").cast("long").as("id")),
        pairs.select(col("a").cast("long").as("src"),
          col("b").cast("long").as("dst")))
    }
    time("labels count") { println(s"  labels=${labels.count()}") }
    time("full dupClusters") {
      TextDedup.dupClusters(docs, "doc_id", "text", 3, 16, 4).count()
    }
    time("full dupClusters again") {
      TextDedup.dupClusters(docs, "doc_id", "text", 3, 16, 4).count()
    }
    spark.stop()
  }
}
