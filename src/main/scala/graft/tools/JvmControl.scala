package graft.tools

import java.util.concurrent.Executors
import graft.canon.CanonCore

/** JVM hardware-ceiling control for STRING work: the exact per-row
  * function the engine's hot path runs (CanonCore.canonicalize), executed
  * on P plain threads with NO Spark — measures what this VM + JVM can
  * give our workload class (regex + allocation + GC share the memory
  * subsystem across threads, so the ceiling is lower than an
  * integer-arithmetic control). If Spark's ScaleProbe matches this
  * control's scaling, the ENGINE adds no scaling overhead.
  *
  * SPARK_GRAFT_CTRL_THREADS=2,8,32 SPARK_GRAFT_CTRL_ROWS=30000000
  */
object JvmControl {

  private def url(i: Long): String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append("HTTP://Host").append(i % 100000).append(".Test")
    if (i % 3 == 0) sb.append(":80")
    sb.append("/p/").append(i % 20000000)
    if (i % 2 == 0) sb.append("?b=2&a=1")
    if (i % 5 == 0) sb.append("#f")
    sb.toString
  }

  /** canonicalize-rows-per-second on `p` plain threads — callable so
    * Bench can embed the hardware control in its own JSON record (the
    * round-3 record was poisoned by a throttled VM with no in-record
    * evidence; now every bench carries its own ceiling measurement). */
  def rate(p: Int, total: Long): Double = {
    val pool = Executors.newFixedThreadPool(p)
    try {
      val per = total / p
      val t0 = System.nanoTime()
      val futs = (0 until p).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var i = t * per
            val end = i + per
            var acc = 0L
            while (i < end) {
              val c = CanonCore.canonicalize(url(i))
              if (c != null) acc += c.length
              i += 1
            }
            acc
          }
        })
      }
      futs.foreach(_.get())
      total / ((System.nanoTime() - t0) / 1e9)
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val total = sys.env.getOrElse("SPARK_GRAFT_CTRL_ROWS", "30000000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_CTRL_THREADS", "2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    levels.foreach { p =>
      val t0 = System.nanoTime()
      val r = rate(p, total)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"control":"jvm_canon","threads":$p,"rows":$total,"sec":$secs%.1f,"rows_per_sec":$r%.0f}""")
    }
  }
}
