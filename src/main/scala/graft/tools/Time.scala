package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time named queries (noop sink), N repetitions.
  * Usage: runMain graft.tools.Time <sfDir> <reps> <names...>
  */
object Time {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val spark = GraftSession.build("graft-time")
    args.drop(2).foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[time] $n rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
