package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-gate check for VERDICT r01 item 1: run the flagship crawl + the
  * e2e BFS query with codegen-failure logging visible; exit non-zero if
  * any stage fell back to interpreted execution ("Code grows beyond 64 KB"
  * or any other CodeGenerator error).
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fail loud instead of falling back, so regressions can't hide
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n1 = graft.SparkEntry.entry(spark).count()
    val n2 = graft.SparkEntry.queries("q_crawl_bfs")(spark, "/root/testdata/sf0.001").count()
    println(s"CODEGEN_CHECK_OK entry=$n1 bfs=$n2")
    spark.stop()
  }
}
