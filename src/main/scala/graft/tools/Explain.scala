package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit dev tool: prints `explain("formatted")` for the named
  * queries (or all). Usage: runMain graft.tools.Explain [sfDir] [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
