package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Dev tool: deterministic structural cost of named queries — Spark
  * jobs, stages, tasks, shuffle bytes read/written, records
  * read/shuffled — via a SparkListener around one noop-sink run.
  * Wall-clock on this host swings ±40% with ambient contention;
  * these counters do not, so they are the primary evidence that a
  * structural change (fewer passes / shuffles / stages) landed.
  * Usage: runMain graft.tools.Jobs <sfDir> <names...>
  */
object Jobs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.build("graft-jobs")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val inRec = new AtomicLong
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inRec.addAndGet(m.inputMetrics.recordsRead)
          ()
        }
      }
    }
    args.drop(1).foreach { n =>
      // warm pass: index builds / ensure* gates / codegen amortize
      // exactly as in the bench's min-of-3, so counters reflect the
      // steady-state probe
      try SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[jobs] $n warm FAILED: ${e.getMessage}")
      }
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); inRec.set(0)
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(600)
        println(f"[jobs] $n jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} shufR=${shufR.get} shufW=${shufW.get} " +
          f"inRecords=${inRec.get} sec=$sec%.2f")
      } catch { case e: Throwable =>
        System.err.println(s"[jobs] $n FAILED: ${e.getMessage}")
      } finally spark.sparkContext.removeSparkListener(l)
    }
    spark.stop()
  }
}
