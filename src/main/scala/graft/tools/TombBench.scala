package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}
import graft.operators.RetrievalOps

/** Large-tombstone-set posture (round 15, verdict item 3): every
  * landed probe anti-joins the live tombstone set, and below the
  * broadcast threshold that is one deletion-sized broadcast. This tool
  * measures the probe as the set GROWS — 0 / 1% / 10% of a ×100
  * corpus — and then forces the over-threshold regime
  * (spark.graft.tombstoneBroadcastBytes=0) to measure the shuffle
  * fallback the threshold crossing buys, reporting alongside each
  * point the live set's actual on-disk bytes and the anti-join's plan
  * mode (Broadcast vs SortMerge). The default crossing sits at
  * Spark's autoBroadcastJoinThreshold (10 MiB ≈ 2.5M tombstone rows at
  * the measured ~4 B/row parquet footprint), so a ×100 corpus can only
  * reach it synthetically — the forced arm IS that measurement.
  *
  * Run: `sbt "runMain graft.tools.TombBench <zipfDir> [repeats=2]"`
  * after GenZipf. Not part of the library surface.
  */
object TombBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_zipf100")
    val repeats = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.build("graft-tomb-bench")

    val workload: Seq[(Int, String)] = Seq(
      1 -> "w1 w3", 2 -> "w8 w21", 3 -> "w55 w144", 4 -> "w377 w610",
      5 -> "w987 w1597", 6 -> "w1800 w1999", 7 -> "w2 w233 w1400",
      8 -> "w13 w89 w1900")
    def qterms: DataFrame = {
      import spark.implicits._
      workload.toDF("query_id", "qtext")
        .select(col("query_id").cast("long").as("query_id"),
                explode(split(col("qtext"), " ")).as("term"))
    }
    def probeDf: DataFrame =
      RetrievalOps.bm25RankIndexed(spark, dir, qterms, k = 10,
                                   exclSelf = false, maxTerms = 3)
    def time(df: => DataFrame): Double = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    def antiMode: String = {
      val lines = probeDf.queryExecution.sparkPlan.toString.linesIterator
        .filter(_.contains("LeftAnti")).toSeq
      if (lines.isEmpty) "none"
      else if (lines.exists(_.contains("Broadcast"))) "broadcast"
      else "shuffle"
    }
    def tombBytes: Long = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(
        new java.io.File(wh,
          Warehouse.currentTable(spark, dir, "graft_tombstones")),
        s"scope=${Warehouse.LiveScope}")
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(loc)
    }

    Warehouse.ensurePostings(spark, dir)
    // idempotent re-runs: restore any previous run's tombstones (the
    // compensating deltas net the old deletes out exactly), so the
    // 0pct point really is tombstone-free
    Warehouse.undeleteDocs(spark, dir,
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(97L)) === 0 ||
                pmod(col("doc_id"), lit(10L)) === 0)
        .select(col("doc_id")))
    time(probeDf) // warmup: scan + page cache (memory: first probe lies)

    val points = scala.collection.mutable.ArrayBuffer[String]()
    def point(tag: String, delSec: Double, rows: Long): Unit =
      points += (s"""{"tag":"$tag","probe_sec":${f"${time(probeDf)}%.3f"},""" +
        s""""anti_join":"$antiMode","tomb_rows":$rows,""" +
        s""""tomb_bytes":$tombBytes,"delete_sec":${f"$delSec%.3f"}}""")

    point("0pct", 0.0, 0L)
    def delSlice(mod: Long, batch: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      Warehouse.deleteDocs(spark, dir,
        Tables.documents(spark, dir)
          .filter(pmod(col("doc_id"), lit(mod)) === 0)
          .select(col("doc_id")), batchKey = batch)
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(
          Warehouse.currentTable(spark, dir, "graft_tombstones"))
        .filter(col("scope") === Warehouse.LiveScope).count()
      (dt, rows)
    }
    val (d1, r1) = delSlice(97L, 1L)
    point("1pct", d1, r1)
    val (d10, r10) = delSlice(10L, 2L)
    point("10pct", d10, r10)
    // the over-threshold regime, forced: what the plan degrades TO
    // when the live set outgrows the broadcast bound. Both knobs drop —
    // past a REAL 10 MiB crossing Spark's own size-based threshold
    // would not broadcast either (explicit hints on the query side
    // survive -1, so only the unhinted tombstone side changes mode)
    spark.conf.set(Warehouse.TombBroadcastKey, "0")
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val autoPrior = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "-1")
    point("10pct_shuffle_fallback", 0.0, r10)
    spark.conf.set(autoKey, autoPrior)
    spark.conf.unset(Warehouse.TombBroadcastKey)

    println(s"""{"metric":"tomb_bench","dir":"$dir","repeats":$repeats,"points":${points.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
