package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit dev tool: prints `explain("formatted")` for the named
  * queries (or all). With `--final`, additionally EXECUTES each query
  * and prints the post-run adaptive plan — the only place AQE
  * decisions (stage/exchange reuse, skew splits, runtime join
  * strategy) are visible. Usage:
  * runMain graft.tools.Explain [--final] [sfDir] [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    val runFinal = flags.contains("--final")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      df.explain("formatted")
      if (runFinal) {
        df.collect()
        println(s"---------- $n: executed (AQE-final) plan ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
