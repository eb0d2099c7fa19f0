package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables
import graft.streaming.EventStream

/** Checkpoint-and-resume: the property the reference builds around its
  * block-height cursor (tasks.service.ts re-reads from the last
  * checkpointed height). Spark's file source + checkpointLocation gives
  * the same thing: a stopped query restarted over a grown directory
  * processes ONLY the new files, and the file sink output contains each
  * window exactly once.
  */
class StreamResumeSpec extends SparkSpec {

  private def copyOnly(srcGlob: Path, dest: Path): Unit = {
    val ls = Files.list(srcGlob)
    val f = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
            finally ls.close()
    Files.copy(f, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  test("restarted stream resumes from checkpoint without reprocessing") {
    val base = Files.createTempDirectory("graft-resume")
    val streamDir = Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    // split events at the time midpoint into two files
    val ev = Tables.eventsMs(spark, sf)
    val Array(lo, hi) = ev.selectExpr("min(ms)", "max(ms)").collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = lo + (hi - lo) / 2
    val t1 = Files.createTempDirectory("graft-part1")
    val t2 = Files.createTempDirectory("graft-part2")
    ev.filter(col("ms") <= mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t1.toString)
    ev.filter(col("ms") > mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t2.toString)

    def runOnce(): Unit = {
      val events = spark.readStream
        .schema(EventStream.eventSchema)
        .parquet(streamDir.toString)
        .withColumn("ms", Tables.epochMs(EventStream.eventSchema("ts").dataType))
        .withColumn("event_time", Tables.eventTime(EventStream.eventSchema("ts").dataType))
      val q = EventStream.hourlyRollup(events)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: only part1 visible
    copyOnly(t1, streamDir.resolve("p1.parquet"))
    runOnce()
    val rows1 = spark.read.parquet(outDir).count()

    // run 2: part2 lands, resume from checkpoint
    copyOnly(t2, streamDir.resolve("p2.parquet"))
    runOnce()
    val out = spark.read.parquet(outDir)

    // each window appears exactly once (no reprocessing of part1)
    assert(out.groupBy("hour_ms").count().filter(col("count") > 1).count() == 0)
    assert(out.count() > rows1, "resume must process the new file")

    // and the union equals append-mode semantics over the full data:
    // every emitted window matches the batch rollup for that hour
    val batch = graft.operators.EventOps.hourlyRollup(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out.collect().foreach { r =>
      val (n, v) = batch(r.getAs[Long]("hour_ms"))
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("total_value") - v) < 1e-6)
    }
  }

  test("buffered as-of resumes from checkpoint: exactly-once, equals batch a12") {
    // The append-mode property the buffered variant buys: rows are
    // final when emitted, so file sink + checkpoint gives exactly-once
    // across a restart — held state (views + not-yet-finalized
    // purchases at the split boundary) must survive into run 2.
    val base = Files.createTempDirectory("graft-asof-resume")
    val streamDir = Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val ev = Tables.eventsMs(spark, sf)
    val Array(lo, hi) = ev.selectExpr("min(ms)", "max(ms)").collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = lo + (hi - lo) / 2
    val t1 = Files.createTempDirectory("graft-asof-p1")
    val t2 = Files.createTempDirectory("graft-asof-p2")
    ev.filter(col("ms") <= mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t1.toString)
    ev.filter(col("ms") > mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t2.toString)

    def runOnce(): Unit = {
      val events = spark.readStream
        .schema(EventStream.eventSchema)
        .parquet(streamDir.toString)
        .withColumn("ms", Tables.epochMs(EventStream.eventSchema("ts").dataType))
        .withColumn("event_time", Tables.eventTime(EventStream.eventSchema("ts").dataType))
      val q = EventStream.asofStreamBuffered(spark, events).toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    copyOnly(t1, streamDir.resolve("p1.parquet"))
    runOnce()
    val rows1 = spark.read.parquet(outDir).count()
    copyOnly(t2, streamDir.resolve("p2.parquet"))
    runOnce()
    val out = spark.read.parquet(outDir).collect()

    assert(out.length > rows1, "resume must emit part-2 purchases")
    // exactly-once: each purchase appears exactly once across both runs
    val ids = out.map(_.getAs[Long]("purchase_id"))
    assert(ids.distinct.length == ids.length)
    // and the union equals the batch as-of over the full data — i.e.
    // the restart lost no held state and re-emitted nothing
    val got = out.map(r => r.getAs[Long]("purchase_id") ->
      (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
       Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble))).toMap
    val batch = graft.operators.EventOps.asofAttribution(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble))).toMap
    assert(got == batch)
  }

  test("maintained stats serving table tracks the stream across restarts") {
    val base = Files.createTempDirectory("graft-maintain")
    val streamDir = Files.createDirectory(base.resolve("in"))
    val serve = base.resolve("serve").toString
    val ckpt = base.resolve("ckpt").toString

    val ev = Tables.eventsMs(spark, sf)
    val Array(lo, hi) = ev.selectExpr("min(ms)", "max(ms)").collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val mid = lo + (hi - lo) / 2
    val t1 = Files.createTempDirectory("graft-m1")
    val t2 = Files.createTempDirectory("graft-m2")
    ev.filter(col("ms") <= mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t1.toString)
    ev.filter(col("ms") > mid).drop("ms").coalesce(1).write.mode("overwrite").parquet(t2.toString)

    def runOnce(): Unit = {
      val events = spark.readStream
        .schema(EventStream.eventSchema)
        .parquet(streamDir.toString)
        .withColumn("ms", Tables.epochMs(EventStream.eventSchema("ts").dataType))
      val q = EventStream.maintainTypeStats(spark, events, serve, ckpt)
      q.awaitTermination()
    }
    def serving(): Map[String, (Long, Long)] =
      EventStream.readTypeStats(spark, serve).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("last_ms"))).toMap
    def expect(upToTs: Long): Map[String, (Long, Long)] =
      ev.filter(col("ms") <= upToTs)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("ms")).as("m"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // run 1: snapshot reflects exactly the first half
    copyOnly(t1, streamDir.resolve("p1.parquet"))
    runOnce()
    assert(serving() == expect(mid))
    // run 2 (restart from checkpoint): snapshot reflects the whole
    // stream — the complete-mode aggregate resumed, not recomputed
    // from an empty state over only the new file
    copyOnly(t2, streamDir.resolve("p2.parquet"))
    runOnce()
    assert(serving() == expect(Long.MaxValue))
    // snapshot publication is a pointer swap: the pointer exists and at
    // most current+previous snapshot generations survive pruning
    assert(Files.exists(java.nio.file.Paths.get(serve, "_latest")))
    val snaps = Files.list(java.nio.file.Paths.get(serve)).iterator()
    val n = Iterator.continually(snaps).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("snap_")).size
    assert(n >= 1 && n <= 2, s"expected 1-2 retained snapshots, got $n")
  }
}
