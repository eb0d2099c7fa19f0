package graft.tools

import graft.GraftSession
import graft.operators.DedupOps

/** Dev tool: A/B the c4 arms (positional candidate join vs exhaustive
  * in-array expansion) on a data dir. Usage:
  * `runMain graft.tools.C4Probe <dir> [tau] [reps]`.
  * Prints min50 so the exactness-guard precondition (50th-best ≥ τ)
  * is visible next to each timing. Not part of the library surface.
  */
object C4Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.build("c4-probe")
    def t[A](tag: String)(f: => A): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime(); val x = f
      println(f"[c4probe] $tag rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($x)")
    }
    t("positional") {
      val r = DedupOps.ngramJaccardPrefix(spark, dir, 100, tau).collect()
      f"min50=${r.last.getDouble(2)}"
    }
    t("exhaustive") {
      DedupOps.ngramJaccardExhaustive(spark, dir, 100).collect(); ""
    }
    spark.stop()
  }
}
