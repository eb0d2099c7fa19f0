package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import graft.sources.Warehouse
import graft.operators.RetrievalOps

/** Per-task time distribution of the Zipf posting probe (round 15,
  * verdict item 6): on the Zipf corpus the stopword terms' df tracks N
  * (w1 hits ~89% of docs), so their tb partitions are hot — at ×1000
  * the four stopword queries carry most of the posting rows, and the
  * question is whether one straggler task serializes the probe or the
  * splittable-parquet scan keeps the hot partition parallel. This tool
  * runs the exact ZipfBench e16b workload under a task listener and
  * reports, per stage, task count / p50 / max / sum — straggler ratio
  * = max/p50 of the dominant stage.
  *
  * Run: `sbt "runMain graft.tools.SkewAudit <dir> [repeats=1]"` after
  * GenZipf (+ ZipfBench/ensurePostings, which it re-ensures untimed).
  * Not part of the library surface.
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_zipf1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.build("graft-skew-audit")

    val workload: Seq[(Int, String)] = Seq(
      1 -> "w1 w3", 2 -> "w8 w21", 3 -> "w55 w144", 4 -> "w377 w610",
      5 -> "w987 w1597", 6 -> "w1800 w1999", 7 -> "w2 w233 w1400",
      8 -> "w13 w89 w1900")
    def qterms: DataFrame = {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      workload.toDF("query_id", "qtext")
        .select(col("query_id").cast("long").as("query_id"),
                explode(split(col("qtext"), " ")).as("term"))
    }

    Warehouse.ensurePostings(spark, dir) // untimed prep + warmup scan
    RetrievalOps.bm25RankIndexed(spark, dir, qterms, k = 10,
        exclSelf = false, maxTerms = 3)
      .write.format("noop").mode("overwrite").save()

    val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.add((t.stageId, t.taskInfo.duration)); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to repeats).foreach { _ =>
      RetrievalOps.bm25RankIndexed(spark, dir, qterms, k = 10,
          exclSelf = false, maxTerms = 3)
        .write.format("noop").mode("overwrite").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val byStage = tasks.asScala.toSeq.groupBy(_._1)
      .map { case (sid, ts) =>
        val ds = ts.map(_._2).sorted
        (sid, ds.length, ds(ds.length / 2), ds.last, ds.sum)
      }.toSeq.sortBy(-_._5)
    val stages = byStage.map { case (sid, n, p50, mx, sum) =>
      s"""{"stage":$sid,"tasks":$n,"p50_ms":$p50,"max_ms":$mx,"sum_ms":$sum}"""
    }.mkString("[", ",", "]")
    val (_, _, dp50, dmax, dsum) = byStage.head
    println(s"""{"metric":"skew_audit","dir":"$dir","repeats":$repeats,"probe_wall_sec":${f"$wall%.3f"},"dominant_stage":{"p50_ms":$dp50,"max_ms":$dmax,"sum_ms":$dsum,"straggler_ratio":${f"${dmax.toDouble / math.max(1L, dp50)}%.2f"}},"stages":$stages}""")
    spark.stop()
  }
}
