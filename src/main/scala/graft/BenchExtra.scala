package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds (guide §1.4):
  * times an arbitrary SUBSET of the declared queries with the same session
  * config + methodology as [[Bench]] (count() action, best-of-N trials),
  * or — with SPARK_GRAFT_EXTRA_NOOP=1 — through the noop sink so the
  * computation is timed without the count's column pruning.
  *
  * Usage: sbt "runMain graft.BenchExtra q_crawl_delay,q_seed_order"
  * (no args = all queries). Emits one JSON line; never used by the driver
  * ([[Bench]] stays the artifact of record).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt)
    val noop = sys.env.get("SPARK_GRAFT_EXTRA_NOOP").contains("1")
    val which: Set[String] =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSet
      else Set.empty
    val base = s"/tmp/graft-extra-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "zstd"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench: session/codegen/parquet spin-up stays out of
    // the first query's timing
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet").limit(100).count()
    catch { case _: Throwable => () }

    val ctrl = graft.tools.JvmControl.rate(cpus.toInt, 3000000L)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => which.isEmpty || which.contains(n) }
      .map { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        val secs = (1 to trials).map { t =>
          if (t > 1) spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        spark.sparkContext.setJobDescription(null)
        name -> secs
      }
    val ctrlPost = graft.tools.JvmControl.rate(cpus.toInt, 3000000L)
    def f3(d: Double) = f"$d%.3f"
    val qs = results.map { case (k, v) => s""""$k":${f3(v)}""" }
      .mkString("{", ",", "}")
    println(
      s"""{"extra_queries":$qs,"total_sec":${f3(results.map(_._2).sum)},""" +
        s""""noop":$noop,"trials":$trials,"cpus":$cpus,"sf":"$sfDir",""" +
        s""""control_pre":${f3(ctrl)},"control_post":${f3(ctrlPost)}}""")
    spark.stop()
  }
}
