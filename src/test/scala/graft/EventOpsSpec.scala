package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.sources.Tables

/** Module A specs — operators checked against naive collect-side
  * recomputations of the same semantics at sf0.001.
  */
class EventOpsSpec extends SparkSpec {

  /** (user_id, event_id, type, ms, value) collected once per suite. */
  private lazy val raw: Seq[(Long, Long, String, Long, Double)] =
    Tables.eventsMs(spark, sf)
      .select("user_id", "event_id", "event_type", "ms", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSeq

  test("a1 latest-per-user matches naive argmax over (ms, event_id)") {
    val got = EventOps.latestEventPerUser(spark, sf)
      .select("user_id", "last_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = raw.groupBy(_._1).map { case (u, es) =>
      u -> es.maxBy(e => (e._4, e._2))._2
    }
    assert(got == naive)
  }

  test("a5 sessionize: sessions split exactly at >30min gaps") {
    val got = EventOps.sessionize(spark, sf).collect()
    // naive per-user session assembly
    val naive = raw.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000L) sid += 1
        prev = e._4
        (u, sid, e._4)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((u, s), ts) =>
      (u, s) -> (ts.map(_._3).min, ts.map(_._3).max, ts.size.toLong)
    }
    assert(got.length == naive.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"))
      val (start, end, n) = naive(key)
      assert(r.getAs[Long]("session_start_ms") == start, s"start $key")
      assert(r.getAs[Long]("session_end_ms") == end, s"end $key")
      assert(r.getAs[Long]("n_events") == n, s"n $key")
    }
  }

  test("a7 funnel: stages respect event ordering per user") {
    val got = EventOps.funnel(spark, sf).collect()
    val byUser = raw.groupBy(_._1)
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val es = byUser(u)
      val signup = es.filter(_._3 == "signup").map(_._4).min
      assert(r.getAs[Long]("signup_ms") == signup)
      val viewOpt = es.filter(e => e._3 == "view" && e._4 > signup)
        .map(_._4).minOption
      assert(Option(r.getAs[java.lang.Long]("view_ms")).map(_.toLong) == viewOpt)
      val purchOpt = viewOpt.flatMap(v =>
        es.filter(e => e._3 == "purchase" && e._4 > v).map(_._4).minOption)
      assert(Option(r.getAs[java.lang.Long]("purchase_ms")).map(_.toLong) == purchOpt)
      val stage = 1 + viewOpt.size + purchOpt.size
      assert(r.getAs[Int]("stage") == stage)
    }
  }

  test("a6 state fold: pivoted counts sum to per-user totals; state is last event") {
    val got = EventOps.stateFold(spark, sf).collect()
    val byUser = raw.groupBy(_._1)
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val es = byUser(u)
      val total = Seq("signup", "view", "click", "purchase", "error")
        .map(t => r.getAs[Long](s"n_$t")).sum
      assert(total == es.size)
      assert(r.getAs[String]("current_state") == es.maxBy(e => (e._4, e._2))._3)
    }
  }

  test("a12 as-of join: each purchase gets the user's latest view at-or-before it") {
    val got = EventOps.asofAttribution(spark, sf).collect()
    assert(got.length == raw.count(_._3 == "purchase"))
    val byUser = raw.groupBy(_._1)
    var matched = 0
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val pms = r.getAs[Long]("purchase_ms")
      val views = byUser(u).filter(e => e._3 == "view" && e._4 <= pms)
      if (views.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("view_ms")), s"user $u at $pms")
      } else {
        val best = views.maxBy(e => (e._4, e._2))
        assert(r.getAs[Long]("view_ms") == best._4, s"user $u at $pms")
        assert(r.getAs[Double]("view_value") == best._5, s"user $u at $pms")
        matched += 1
      }
    }
    assert(matched > 0)  // non-vacuous: some purchases have a prior view
  }

  test("a8 dedup preserves all rows when no duplicates exist") {
    val got = EventOps.dedupEvents(spark, sf)
    assert(got.count() == raw.size)  // synthetic data has unique (u,t,ms)
    assert(got.filter(col("dup_count") > 1).count() == 0)
  }

  test("a18 hourly anomaly: stats equal a naive trailing-window recompute") {
    val buckets = raw.groupBy(e => (e._3, e._4 / 3600000L * 3600000L))
      .view.mapValues(_.size.toLong).toMap
    val byType = buckets.toSeq.map { case ((t, h), n) => (t, h, n) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = byType.toSeq.flatMap { case (_, rows) =>
      rows.zipWithIndex.map { case ((t, h, n), i) =>
        val wnd = rows.slice(math.max(0, i - 24), i).map(_._3.toDouble)
        val mu = if (wnd.nonEmpty) Some(wnd.sum / wnd.size) else None
        val sd = if (wnd.size >= 2) {
          val m = wnd.sum / wnd.size
          Some(math.sqrt(wnd.map(x => (x - m) * (x - m)).sum / (wnd.size - 1)))
        } else None
        val z = sd.filter(_ > 0).map(s => (n - mu.get) / s)
        (t, h) -> ((n, mu, sd, z, z.exists(v => math.abs(v) >= 3.0)))
      }
    }.toMap
    val got = EventOps.hourlyAnomaly(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("hour_ms"))
      val (n, mu, sd, z, flag) = expected(key)
      assert(r.getAs[Long]("n_events") == n, s"$key n")
      def close(col: String, e: Option[Double]): Unit = (e, r.isNullAt(r.fieldIndex(col))) match {
        case (None, isNull) => assert(isNull, s"$key $col should be null")
        case (Some(v), isNull) =>
          assert(!isNull && math.abs(r.getAs[Double](col) - v) < 1e-5, s"$key $col")
      }
      close("trail_mean", mu); close("trail_std", sd); close("zscore", z)
      assert(r.getAs[Boolean]("is_anomaly") == flag, s"$key flag")
    }
  }

  test("a18 planted spike: 10x burst over a jittered steady state is flagged") {
    val spark2 = spark; import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_anom_").toString
    // 24 steady hours alternating 9/11 events, then a 100-event hour
    val rows = (0 until 25).flatMap { h =>
      val k = if (h == 24) 100 else 9 + (h % 2) * 2
      (0 until k).map(j =>
        (h.toLong * 100 + j, h.toLong * 3600000L + j * 1000L, 1L, "x", 1.0,
         """{"k":1}"""))
    }
    rows.toDF("event_id", "ms", "user_id", "event_type", "value", "props")
      .withColumn("ts", (col("ms") / 1000.0).cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.hourlyAnomaly(spark, tmp).collect()
      .map(r => r.getAs[Long]("hour_ms") / 3600000L ->
        ((r.getAs[Boolean]("is_anomaly"), r.getAs[Any]("zscore")))).toMap
    assert(got.size == 25)
    assert(got(24L)._1, s"spike hour must flag: ${got(24L)}")
    (0L until 24L).foreach(h => assert(!got(h)._1, s"steady hour $h flagged"))
  }

  test("a17 salted join: identical to the plain join, salt in the join key") {
    val df = EventOps.saltedTypeJoin(spark, sf)
    val salted = df.collect().map(_.toString)
    val dim = Tables.eventsMs(spark, sf)
      .groupBy(col("event_type"))
      .agg(max_by(col("value"), struct(col("ms"), col("event_id")))
             .as("rate"))
    val plain = Tables.eventsMs(spark, sf)
      .join(dim, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value") * col("rate")), 2).as("weighted"))
      .orderBy(col("event_type"))
      .collect().map(_.toString)
    assert(salted.nonEmpty && salted.sameElements(plain))
    // the physical join must really run on (event_type, _salt) — the
    // hot key split is the point, not a decoration
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
  }
}
