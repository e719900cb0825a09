package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.politeness.Politeness

/** Hot-host budget-rank skew probe (VERDICT r01 item 8): a frontier where
  * one host owns `hotPct`% of all candidates, finite per-host budget.
  * Compares the plain window rank (hot host sorts in ONE task) against
  * the salted two-phase rank (`Politeness.budgetRankSalted`) at the same
  * parallelism, verifying identical selected rows and reporting walls.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hotPct = 30
    val budget = sys.env.getOrElse("SPARK_GRAFT_PROBE_BUDGET", "200000").toInt
    val salts = sys.env.getOrElse("SPARK_GRAFT_PROBE_SALTS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val id = col("id")
    val frontier = spark.range(n).select(
      when(id % 100 < hotPct, lit("hot.test"))
        .otherwise(concat(lit("h"), id % 5000, lit(".test"))).as("host"),
      lit(0).as("priority"), lit(0).as("discoveryRound"),
      id.as("parentSeq"), lit(0).as("emissionIdx"),
      xxhash64(id).as("urlHash"))
    def time(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val c = f
      (label, (System.nanoTime() - t0) / 1e9, c)
    }
    val plain = time("plain") {
      Politeness.budgetRank(frontier, budget)._1.count()
    }
    val salted = time("salted") {
      Politeness.budgetRankSalted(frontier, budget, salts)._1.count()
    }
    assert(plain._3 == salted._3,
      s"selection mismatch: ${plain._3} vs ${salted._3}")
    println(
      s"""{"probe":"hot_host_budget","rows":$n,"hot_pct":$hotPct,""" +
        s""""budget":$budget,"salts":$salts,"selected":${plain._3},""" +
        f""""plain_sec":${plain._2}%.1f,"salted_sec":${salted._2}%.1f,""" +
        s""""cpus":$cpus}""")
    spark.stop()
  }
}
