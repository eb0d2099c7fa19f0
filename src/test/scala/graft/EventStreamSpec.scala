package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.streaming.EventStream

/** Streaming specs: the streaming paths must converge to their batch
  * twins over the same data (AvailableNow = catch-up ingest).
  */
class EventStreamSpec extends SparkSpec {

  test("runToBatch streams under the stream-sized partitions, then restores") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    assert(before != EventStream.streamShufflePartitions.toString,
      "fixture must differ from the stream setting for this test to bite")
    val got = EventStream.runToBatch(spark,
      EventStream.hourlyRollup(EventStream.readEvents(spark, sf)))
    assert(got.count() > 0)
    // the batch setting must be back even though the stream planned its
    // shuffles at streamShufflePartitions (restore ordering is
    // await-then-restore — an early restore races batch-0 planning)
    assert(spark.conf.get(key) == before)
  }

  test("a9 streamed hourly rollup equals the batch rollup (complete mode)") {
    val streamed = EventStream.streamHourly(spark, sf)
      .select("hour_ms", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val batch = EventOps.hourlyRollup(spark, sf)
      .select("hour_ms", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("a19 streamed anomaly equals batch a18 row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("hour_ms"),
       r.getAs[Long]("n_events"), r.getAs[Any]("trail_mean"),
       r.getAs[Any]("trail_std"), r.getAs[Any]("zscore"),
       r.getAs[Boolean]("is_anomaly"))
    }.sortBy(t => (t._1, t._2)).toSeq
    val streamed = rows(EventStream.streamAnomaly(spark, sf))
    val batch = rows(EventOps.hourlyAnomaly(spark, sf))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("append-mode rollup emits exactly the watermark-closed windows") {
    val appended = EventStream.runToBatch(
      spark, EventStream.hourlyRollup(EventStream.readEvents(spark, sf)),
      mode = "append")
      .select("hour_ms").collect().map(_.getLong(0)).toSet
    val batch = EventOps.hourlyRollup(spark, sf)
      .select("hour_ms").collect().map(_.getLong(0)).toSet
    // Append emits only windows the final watermark closed: a subset
    // missing at most the trailing watermark-delay's worth (1h delay +
    // 1h window = at most 2 trailing buckets with this data).
    assert(appended.subsetOf(batch))
    assert((batch -- appended).size <= 2)
    assert((batch -- appended).forall(h => h >= batch.max - 2 * 3600000L))
  }

  test("stateful user fold converges to the batch state fold") {
    val events = EventStream.readEvents(spark, sf)
    val states = EventStream.runToBatch(
        spark, EventStream.userStateStream(spark, events).toDF(), mode = "update")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("*")), col("n_folded")).as("s"))
      .select(col("s.*"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_signup"), r.getAs[Long]("n_purchase"),
         r.getAs[String]("current_state"), r.getAs[Long]("state_ms"),
         BigDecimal(r.getAs[Double]("total_value"))
           .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    val batch = EventOps.stateFold(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_signup"), r.getAs[Long]("n_purchase"),
         r.getAs[String]("current_state"), r.getAs[Long]("state_ms"),
         BigDecimal(r.getAs[Double]("total_value"))
           .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .toMap
    assert(states == batch)
  }

  test("streaming session_window sessions match the batch lag/gap sessionization") {
    // session_window closes at gap >= 30min vs batch's > 30min — an
    // exact-boundary event (ms precision) could differ; none exist in
    // the data, so sessions must match one-for-one on (user, start).
    val streamed = EventStream.runToBatch(
        spark,
        EventStream.sessionizeStream(EventStream.readEvents(spark, sf)),
        mode = "complete")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms")) ->
        (r.getAs[Long]("session_end_ms"), r.getAs[Long]("n_events")))
      .toMap
    val batch = EventOps.sessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms")) ->
        (r.getAs[Long]("session_end_ms"), r.getAs[Long]("n_events")))
      .toMap
    assert(streamed == batch)
  }

  test("streaming dedup keeps one event per ingest key") {
    val out = EventStream.runToBatch(
      spark, EventStream.dedupStream(EventStream.readEvents(spark, sf)),
      mode = "append")
    // no duplicates in the synthetic data → cardinality preserved,
    // and a second occurrence of any key would have been dropped
    val n = out.count()
    val distinctKeys = out.select("user_id", "event_type", "ms").distinct().count()
    assert(n == distinctKeys)
    assert(n > 0)
  }

  test("a13 stream-stream interval join matches the batch join pair-for-pair") {
    val streamed = EventStream.streamJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
                 r.getAs[Long]("user_id"))).toSet
    // batch equivalent over the same ms-precision boundaries
    val e = graft.sources.Tables.eventsMs(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ms").as("pms"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ms").as("vms"))
    val batch = p.join(v, Seq("user_id"))
      .filter(col("vms") <= col("pms") && col("vms") >= col("pms") - 1800000L)
      .collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
                 r.getAs[Long]("user_id"))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("left-outer stream join null-pads only truly unmatched purchases") {
    val outer = EventStream.runToBatch(
        spark,
        EventStream.attributionJoin(EventStream.readEvents(spark, sf),
                                    EventStream.readEvents(spark, sf),
                                    "leftOuter"),
        mode = "append")
      .collect()
    // batch ground truth: which purchases have >=1 view in-window
    val e = graft.sources.Tables.eventsMs(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ms").as("pms"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ms").as("vms"))
    val matchedPairs = p.join(v, Seq("user_id"))
      .filter(col("vms") <= col("pms") && col("vms") >= col("pms") - 1800000L)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val matchedIds = matchedPairs.map(_._1)
    // every in-window pair is emitted (inner results don't wait on the
    // watermark)
    val gotPairs = outer.filter(!_.isNullAt(1))
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"))).toSet
    assert(gotPairs == matchedPairs)
    // null-padded rows exist (watermark closed some windows) and appear
    // ONLY for purchases with no in-window view at all
    val padded = outer.filter(_.isNullAt(1)).map(_.getAs[Long]("purchase_id"))
    assert(padded.nonEmpty)
    assert(padded.toSet.intersect(matchedIds).isEmpty)
    assert(padded.distinct.length == padded.length)  // once each
  }

  test("streaming as-of fold equals batch a12 purchase-for-purchase") {
    val streamed = EventStream.runToBatch(
        spark,
        EventStream.asofStream(spark, EventStream.readEvents(spark, sf)).toDF(),
        mode = "update")
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble)))
      .toMap
    val batch = EventOps.asofAttribution(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble)))
      .toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("a15 buffered as-of equals batch a12 purchase-for-purchase") {
    val streamed = EventStream.streamAsofOoo(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble)))
      .toMap
    val batch = EventOps.asofAttribution(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong),
         Option(r.getAs[java.lang.Double]("view_value")).map(_.toDouble)))
      .toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("a15 absorbs a view delivered AFTER its purchase (cross-batch OOO)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventStream.Ev]
    val events = in.toDF()
      .withColumn("event_time", timestamp_millis(col("ms")))
    val q = EventStream.asofStreamBuffered(spark, events, "30 minutes").toDF()
      .writeStream.format("memory").queryName("a15_ooo")
      .outputMode("append").start()
    try {
      // batch 1: an early view and the purchase
      in.addData(EventStream.Ev(1, 1, "view", 1000000L, 1.0),
                 EventStream.Ev(2, 1, "purchase", 5000000L, 0.0))
      q.processAllAvailable()
      // batch 2: the view BETWEEN them arrives late — after the
      // purchase was already seen, but within the 30-minute watermark.
      // asofStream (a14) would have emitted the purchase with the
      // early view; the buffered fold must still be holding it.
      in.addData(EventStream.Ev(3, 1, "view", 4000000L, 4.0))
      q.processAllAvailable()
      assert(spark.table("a15_ooo").count() == 0)  // purchase still held
      // batch 3: sentinel far ahead pushes the watermark past the
      // purchase → the event-time timeout drains it.
      in.addData(EventStream.Ev(99, 999, "view", 5000000L + 7200000L, 9.0))
      q.processAllAvailable()
      q.processAllAvailable()  // let the no-data timeout batch run
      val out = spark.table("a15_ooo").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(out.length == 1)
      assert(out.head.getAs[Long]("purchase_id") == 2L)
      assert(out.head.getAs[java.lang.Long]("view_ms") == 4000000L)
      assert(out.head.getAs[java.lang.Double]("view_value") == 4.0)
    } finally q.stop()
  }

  test("a15 drains a purchase that is the globally-latest event (final-wm edge)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventStream.Ev]
    val events = in.toDF()
      .withColumn("event_time", timestamp_millis(col("ms")))
    // 0-second delay: the final watermark lands EXACTLY on the last
    // purchase's ms. Timeouts fire only when ts < wm (strict), so a
    // deadline of ms itself would never fire — the ms-1 deadline must.
    val q = EventStream.asofStreamBuffered(spark, events, "0 seconds").toDF()
      .writeStream.format("memory").queryName("a15_lastpurchase")
      .outputMode("append").start()
    try {
      in.addData(EventStream.Ev(1, 1, "view", 1000000L, 1.0),
                 EventStream.Ev(3, 2, "view", 2999999L, 3.0))
      q.processAllAvailable()  // wm -> 2999999
      // u2's purchase at ms == wm+1 (deadline clamps to wm itself);
      // u1's purchase at ms == final watermark (the advisor's case).
      in.addData(EventStream.Ev(4, 2, "purchase", 3000000L, 0.0),
                 EventStream.Ev(2, 1, "purchase", 4000000L, 0.0))
      q.processAllAvailable()
      q.processAllAvailable()  // no-data timeout batch drains both
      val out = spark.table("a15_lastpurchase").collect()
        .map(r => r.getAs[Long]("purchase_id") ->
          Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong)).toMap
      assert(out == Map(2L -> Some(1000000L), 4L -> Some(2999999L)),
        s"both watermark-edge purchases must drain, got $out")
    } finally q.stop()
  }

  test("a15 idle TTL reclaims state; post-TTL purchase gets null attribution") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600000L
    // Identical event sequence through both variants: only the TTL'd
    // one forgets the view, proving removal (not late-row filtering or
    // ordering) causes the null.
    def run(ttl: Long, qname: String): Option[Long] = {
      val in = MemoryStream[EventStream.Ev]
      val events = in.toDF()
        .withColumn("event_time", timestamp_millis(col("ms")))
      val q = EventStream.asofStreamBuffered(spark, events, "0 seconds", ttl)
        .toDF()
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      try {
        in.addData(EventStream.Ev(1, 1, "view", 1000000L, 1.0))
        q.processAllAvailable()
        // sentinel 2h later: watermark sweeps past view + 1h TTL →
        // the no-data timeout batch reclaims user 1 (TTL variant only)
        in.addData(EventStream.Ev(90, 999, "view", 1000000L + 2 * H, 9.0))
        q.processAllAvailable(); q.processAllAvailable()
        // purchase above the watermark; then a sentinel to drain it
        in.addData(EventStream.Ev(2, 1, "purchase", 1000000L + 3 * H, 0.0))
        q.processAllAvailable()
        in.addData(EventStream.Ev(91, 999, "view", 1000000L + 6 * H, 9.0))
        q.processAllAvailable(); q.processAllAvailable()
        val rows = spark.table(qname).collect()
          .filter(r => r.getAs[Long]("user_id") == 1L &&
                       r.getAs[Long]("purchase_id") == 2L)
        assert(rows.length == 1, s"$qname: expected the purchase drained")
        Option(rows.head.getAs[java.lang.Long]("view_ms")).map(_.toLong)
      } finally q.stop()
    }
    assert(run(H, "a15_ttl") == None,
      "TTL'd state must forget the pre-TTL view")
    assert(run(Long.MaxValue, "a15_nottl") == Some(1000000L),
      "without TTL the same sequence attributes the old view")
  }

  test("user-state TTL: cold key is reclaimed, reappearing user folds fresh") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600000L
    def run(ttl: Long, qname: String): Long = {
      val in = MemoryStream[EventStream.Ev]
      val events = in.toDF()
        .withColumn("event_time", timestamp_millis(col("ms")))
      val q = EventStream.userStateStreamTtl(spark, events, "0 seconds", ttl)
        .toDF()
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      try {
        in.addData(EventStream.Ev(1, 1, "view", 1000000L, 1.0),
                   EventStream.Ev(2, 1, "click", 1100000L, 2.0))
        q.processAllAvailable()
        // sentinel 3h later: watermark passes user 1's last event + 1h
        // TTL → the timeout reclaims the state (TTL variant only)
        in.addData(EventStream.Ev(90, 999, "view", 1000000L + 3 * H, 9.0))
        q.processAllAvailable(); q.processAllAvailable()
        // user 1 reappears
        in.addData(EventStream.Ev(3, 1, "view", 1000000L + 4 * H, 5.0))
        q.processAllAvailable()
        // the newest update for user 1 (max state_ms = the
        // post-reappearance fold; n_folded resets on reclaim, so it
        // cannot order updates here)
        val latest = spark.table(qname).collect()
          .filter(_.getAs[Long]("user_id") == 1L)
          .maxBy(_.getAs[Long]("state_ms"))
        latest.getAs[Long]("n_view") + latest.getAs[Long]("n_click")
      } finally q.stop()
    }
    // TTL'd: fresh fold after reclaim → 1 view, 0 clicks
    assert(run(H, "ttl_state") == 1L)
    // no TTL: counts accumulate across the idle gap → 2 views + 1 click
    assert(run(Long.MaxValue, "nottl_state") == 3L)
  }

  test("state fold is replay-idempotent for last-event-wins fields") {
    // Feed the same data twice through fold state: counts double but
    // current_state/state_ms/state_eid stay fixed (the reference gets
    // this from Mongo upserts; we get it from the (ms, event_id)
    // lexicographic ordinal guard).
    val events = EventStream.readEvents(spark, sf)
    def finalStates() = EventStream.runToBatch(
        spark, EventStream.userStateStream(spark, events).toDF(), mode = "update")
      .groupBy(col("user_id"))
      .agg(max_by(col("current_state"), col("n_folded")).as("cs"),
           max(col("state_ms")).as("sms"), max(col("state_eid")).as("seid"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(finalStates() == finalStates())
  }
}
