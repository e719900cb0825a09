package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps formatted physical plans for the operator queries to stdout
  * (redirect to PLANS.md). Review checklist per plan:
  *  - parquet scans show pruned ReadSchema (only needed columns)
  *  - filters appear in PushedFilters where applicable
  *  - small sides broadcast (BroadcastHashJoin), big sides never shuffle
  *    on the build path
  *  - expression-only operators stay inside one WholeStageCodegen span
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (which.isEmpty || which.contains(name)) {
        // iterative engine runs: per-round plans, skip dump
        if (!Set("q_crawl_bfs", "q_redirect_crawl", "q_recrawl_e2e")
            .contains(name)) {
          println(s"\n## $name\n")
          println("```")
          try println(fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString(sys.env.getOrElse("GRAFT_EXPLAIN_MODE", "formatted"))))
          catch { case e: Throwable => println(s"explain failed: $e") }
          println("```")
        }
      }
    }
    spark.stop()
  }
}
