package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.{GraftSession, SparkEntry}

/** Dev tool: execute named queries (noop sink) and print the
  * AQE-final plan's per-operator SQL metrics, hottest first — the
  * programmatic stand-in for the (disabled) UI's SQL tab. Time-like
  * metrics are in ns/ms per Spark's internal convention; this prints
  * raw values with the metric name, so compare within a metric only.
  * Usage: runMain graft.tools.Hot <sfDir> <topN> <names...>
  */
object Hot {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val topN = args(1).toInt
    val spark = GraftSession.build("graft-hot")
    args.drop(2).foreach { n =>
      // warm pass (index builds, codegen)
      try SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[hot] $n warm FAILED: ${e.getMessage}") }
      val df = SparkEntry.queries(n)(spark, dir)
      // The noop write runs through its OWN QueryExecution (a command),
      // so capture the executed plan via a QueryExecutionListener — the
      // df's queryExecution object is never executed by the write.
      @volatile var captured: Option[org.apache.spark.sql.execution.QueryExecution] = None
      val ql = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               d: Long): Unit = { captured = Some(qe) }
        override def onFailure(fn: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               e: Exception): Unit = ()
      }
      spark.listenerManager.register(ql)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener fires asynchronously on a separate bus
      var waited = 0
      while (captured.isEmpty && waited < 5000) { Thread.sleep(100); waited += 100 }
      spark.listenerManager.unregister(ql)
      println(f"========== $n ($sec%.2f s) ==========")
      val rows = Seq.newBuilder[(Long, String)]
      def walk(p: SparkPlan, depth: Int): Unit = {
        val id = p.id
        p.metrics.foreach { case (k, m) =>
          if (m.value > 0 &&
              (k.contains("time") || k.contains("Time") ||
               k == "numOutputRows" || k.contains("dataSize") ||
               k.contains("spill")))
            rows += ((m.value, f"${p.nodeName}#$id [$k] ${m.value} " +
              s"<- ${p.children.map(c => c.nodeName + "#" + c.id).mkString(",")}" +
              s" :: ${p.simpleString(60).take(140)}"))
        }
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
          case q: QueryStageExec        => walk(q.plan, depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
        p.subqueries.foreach(walk(_, depth + 1))
      }
      captured.foreach(qe => walk(qe.executedPlan, 0))
      rows.result().sortBy(-_._1).take(topN).foreach(r => println("  " + r._2))
    }
    spark.stop()
  }
}
