package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Structured Streaming re-expression of the reference's event listener
  * (src/modules/tasks/tasks.service.ts): the contract-event subscription
  * becomes a file-source stream, the per-entity update callbacks become
  * a `flatMapGroupsWithState` fold, and the periodic rollups become
  * watermarked window aggregates.
  *
  * Scale notes: the state store is keyed by user_id (entity id at the
  * reference) so state is bounded by entity count, not event count; the
  * watermark bounds window state for the rollup; `Trigger.AvailableNow`
  * gives incremental batch ingest — the same query runs continuous or
  * catch-up without code changes, mirroring the reference's
  * checkpoint-and-resume loop (tasks.service.ts block-height cursor).
  */
object EventStream {

  /** events.parquet schema as currently generated: `ts` ships as
    * parquet µs timestamps (TIMESTAMP_NTZ under Spark's NTZ
    * inference). `ts` is the one field the generator has changed type
    * on historically (raw ns longs ↔ timestamps), so the streaming
    * readers do NOT trust this constant for it — see
    * [[eventSchemaFor]], which patches `ts` from the actual landing
    * data's footer (a once-per-JVM cached read). The constant remains
    * the documented shape and the fallback when no footer exists yet.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** [[eventSchema]] with the `ts` field's type taken from the landing
    * data's parquet footer (StreamFiles caches that read per JVM), so
    * the stream stays schema-adaptive exactly like the batch path
    * (Tables.eventsMs): if the generator reverts `ts` to raw ns longs
    * the epochMs/eventTime arms switch automatically instead of
    * failing at analysis. Non-`ts` fields keep the declared types —
    * a readStream needs them pinned up front, and they have never
    * varied.
    */
  def eventSchemaFor(spark: SparkSession, dir: String): StructType = {
    // the footer read throws when no file has landed yet — THAT is the
    // case the declared-constant fallback exists for (a stream booting
    // against an empty landing dir). Spark surfaces both "path does not
    // exist" and "unable to infer schema from an empty dir" as
    // AnalysisException, so catch exactly that; genuine footer
    // corruption / IO errors (SparkException, IOException) propagate
    val tsType = (try Some(
        StreamFiles.dirAndSchema(spark, dir, "events.parquet")._2)
      catch { case _: org.apache.spark.sql.AnalysisException => None })
      .flatMap(_.fields.find(_.name == "ts").map(_.dataType))
      .getOrElse(eventSchema("ts").dataType)
    StructType(eventSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f                   => f
    })
  }

  /** File-source stream over the events table with a proper event-time
    * column (µs precision — the most a Spark TimestampType holds).
    *
    * The file stream source requires a DIRECTORY (at production scale
    * the event feed is one — files land and the source picks them up
    * incrementally); the test data ships a single file, so it is
    * exposed through StreamFiles' per-JVM symlink dir. The schema is
    * [[eventSchemaFor]] — the declared constant with `ts` patched from
    * the landing data's footer, so the ms/event-time derivations below
    * adapt to the actual on-disk type like the batch path does.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = eventSchemaFor(spark, dir)
    val d = StreamFiles.dir(dir, "events.parquet")
    spark.readStream
      .schema(schema)
      .parquet(d.toString)
      .withColumn("ms", Tables.epochMs(schema("ts").dataType))
      .withColumn("event_time", Tables.eventTime(schema("ts").dataType))
  }

  /** Watermarked hourly rollup — the streaming twin of
    * EventOps.hourlyRollup. Append-mode-capable: with a watermark the
    * state store evicts closed windows, so state is bounded by the
    * watermark delay regardless of stream length.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
              col("n_events"), col("total_value"))

  // ---- stateful entity fold (order state machine, Spark-native) ----

  case class Ev(event_id: Long, user_id: Long, event_type: String,
                ms: Long, value: Double)

  /** Per-entity folded state — the Spark analog of the reference's
    * order/token documents updated by updateOrder/updateToken
    * (db.service.ts:87-200): pivoted event counts + last-event-wins
    * current state. (state_ms, state_eid) is the lexicographic ordinal
    * of the state-defining event — compared as a tuple, never packed
    * into one long (packing breaks once event_id crosses the base).
    * n_folded counts every folded event: it is strictly monotone across
    * state updates, so downstream consumers can pick the LATEST update
    * per key unambiguously even when an update changed only counts
    * (out-of-order older events) and left the ordinal untouched.
    */
  case class UserState(user_id: Long, n_signup: Long, n_view: Long,
                       n_click: Long, n_purchase: Long, n_error: Long,
                       total_value: Double, current_state: String,
                       state_ms: Long, state_eid: Long, n_folded: Long)

  private def fold(st: UserState, e: Ev): UserState = {
    val newer = e.ms > st.state_ms ||
      (e.ms == st.state_ms && e.event_id > st.state_eid)
    st.copy(
      n_signup = st.n_signup + (if (e.event_type == "signup") 1 else 0),
      n_view = st.n_view + (if (e.event_type == "view") 1 else 0),
      n_click = st.n_click + (if (e.event_type == "click") 1 else 0),
      n_purchase = st.n_purchase + (if (e.event_type == "purchase") 1 else 0),
      n_error = st.n_error + (if (e.event_type == "error") 1 else 0),
      total_value = st.total_value + e.value,
      current_state = if (newer) e.event_type else st.current_state,
      state_ms = if (newer) e.ms else st.state_ms,
      state_eid = if (newer) e.event_id else st.state_eid,
      n_folded = st.n_folded + 1)
  }

  /** flatMapGroupsWithState fold of the event stream into per-user
    * state. Events inside a micro-batch arrive unordered — they are
    * sorted by (ms, event_id) before folding, mirroring the reference's
    * block-height ordering; across batches the fold is
    * order-insensitive for counts/sums and uses the packed sort key for
    * last-event-wins fields, so replays/out-of-order batches converge
    * to the same state (idempotent-by-construction, the property the
    * reference gets from its Mongo upserts).
    */
  def userStateStream(spark: SparkSession, events: DataFrame): Dataset[UserState] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ms"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserState]) =>
          val init = state.getOption.getOrElse(
            UserState(uid, 0, 0, 0, 0, 0, 0.0, "", Long.MinValue, Long.MinValue, 0L))
          val next = evs.toSeq.sortBy(e => (e.ms, e.event_id)).foldLeft(init)(fold)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** userStateStream with an idle-state TTL — the streaming analog of
    * the reference's Mongo TTL indexes (its operational "forget cold
    * entities" plumbing, here with query semantics): a user whose last
    * event sits more than the TTL below the watermark has their state
    * row removed, so total state is bounded by ACTIVE keys. The
    * explicit trade: a reappearing user folds from scratch (counts
    * reset), exactly what TTL-expiring the reference's entity row
    * does. Default path (userStateStream) keeps NoTimeout + unbounded
    * keys — the a10 oracle semantics.
    */
  def userStateStreamTtl(spark: SparkSession, events: DataFrame,
                         delay: String = "0 seconds",
                         idleTtlMs: Long = Long.MaxValue): Dataset[UserState] = {
    import spark.implicits._
    events
      .withWatermark("event_time", delay)
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ms"), col("value"), col("event_time"))
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserState](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[EvW], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val init = state.getOption.getOrElse(
              UserState(uid, 0, 0, 0, 0, 0, 0.0, "", Long.MinValue,
                        Long.MinValue, 0L))
            val next = evs
              .map(e => Ev(e.event_id, e.user_id, e.event_type, e.ms, e.value))
              .toSeq.sortBy(e => (e.ms, e.event_id)).foldLeft(init)(fold)
            state.update(next)
            if (idleTtlMs != Long.MaxValue) {
              // state_ms is the max event-time folded (last activity);
              // saturate the add and keep the deadline future-of-watermark
              val d = next.state_ms + idleTtlMs
              val deadline = if (d < next.state_ms) Long.MaxValue else d
              state.setTimeoutTimestamp(
                math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.single(next)
          }
      }
  }

  /** Incrementally-maintained statistics serving table — the
    * reference's periodic stats-refresh job (tasks.service.ts:
    * 1938-1963 recomputes items/transactions/owners/volume on a
    * schedule) re-expressed as streaming incremental view
    * maintenance: the event stream folds into per-type stats in
    * COMPLETE mode (Spark keeps the running aggregate state — each
    * micro-batch costs the new data, not a rescan). Checkpointed: a
    * restarted maintainer resumes the aggregate instead of
    * recomputing history.
    *
    * Each snapshot lands in its own `snap_<batchId>` directory and is
    * published by an ATOMIC pointer swap (`_latest` file, written to a
    * temp name then renamed with ATOMIC_MOVE): a concurrent dashboard
    * reader resolving the pointer always sees one complete, immutable
    * snapshot — never a missing or half-written table, which a
    * `mode("overwrite")` on a single directory (delete-then-rewrite)
    * cannot guarantee. The previous snapshot is retained for one
    * generation so a reader that resolved the pointer just before a
    * swap can still finish its scan; older generations are pruned. On
    * an object store (S3/HDFS) the same pattern holds — the pointer
    * PUT/rename is the commit point; only the tiny pointer needs
    * atomicity, never the multi-file table.
    */
  def maintainTypeStats(spark: SparkSession, events: DataFrame,
                        servePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"),
           max(col("ms")).as("last_ms"))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val snap = s"snap_$batchId"
        batch.write.mode("overwrite").parquet(s"$servePath/$snap")
        publishSnapshot(servePath, snap)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Atomically repoints `servePath/_latest` at `snap` and prunes all
    * snapshot directories except the new current and its predecessor.
    */
  private def publishSnapshot(servePath: String, snap: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Paths.get(servePath)
    val prev =
      if (Files.exists(base.resolve("_latest")))
        Some(new String(Files.readAllBytes(base.resolve("_latest")),
                        java.nio.charset.StandardCharsets.UTF_8).trim)
      else None
    val tmp = base.resolve("_latest.tmp")
    Files.write(tmp, snap.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, base.resolve("_latest"),
               StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
    val keep = Set(snap) ++ prev
    val stale = Files.list(base).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("snap_") &&
                   !keep(p.getFileName.toString))
      .toList
    stale.foreach { dir =>
      Files.walk(dir).iterator().asScala.toList.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  /** Reader side of [[maintainTypeStats]]: resolves the `_latest`
    * pointer and reads that immutable snapshot.
    */
  def readTypeStats(spark: SparkSession, servePath: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val snap = new String(
      Files.readAllBytes(Paths.get(servePath).resolve("_latest")),
      java.nio.charset.StandardCharsets.UTF_8).trim
    spark.read.parquet(s"$servePath/$snap")
  }

  /** Streaming sessionization — a5's streaming twin via the native
    * session_window (gap-merged windows; state per open session,
    * closed and emitted once the watermark passes the gap).
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("session_value"),
           min(col("ms")).as("session_start_ms"),
           max(col("ms")).as("session_end_ms"))
      .select(col("user_id"), col("session_start_ms"),
              col("session_end_ms"), col("n_events"), col("session_value"))

  /** Streaming idempotent ingest — a8's streaming twin:
    * dropDuplicatesWithinWatermark on the ingest key, so replayed
    * events inside the watermark horizon are dropped with bounded
    * state (the reference's overlap-tolerant block re-read).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ms")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ms"))

  /** Output row of the streaming as-of fold (a12's streaming twin). */
  case class AsofOut(purchase_id: Long, user_id: Long, purchase_ms: Long,
                     view_ms: java.lang.Long, view_value: java.lang.Double)

  /** Per-user as-of state: the latest view seen so far. */
  case class ViewState(ms: Long, event_id: Long, value: Double)

  /** Streaming as-of join — EventOps.asofAttribution as a
    * flatMapGroupsWithState fold: state per user is just the latest
    * view (O(1) per key — no buffering of the stream), each purchase
    * emits immediately with the view state at that moment. Within a
    * batch events are sorted (ms, views-before-purchases, event_id) —
    * the same <=-semantics tiebreak the batch operator encodes with
    * its `side` ordinal; across batches the state only moves forward
    * (ordinal guard), so replays cannot regress it. Assumes cross-
    * batch event-time order (the reference's block-height cursor
    * guarantees this for contract events); a true out-of-order stream
    * would need watermarked buffering instead.
    */
  def asofStream(spark: SparkSession, events: DataFrame): Dataset[AsofOut] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ms"), col("value"))
      .as[Ev]
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ViewState, AsofOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[ViewState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AsofOut]
          val ordered = evs.toSeq.sortBy(e =>
            (e.ms, if (e.event_type == "view") 0 else 1, e.event_id))
          ordered.foreach { e =>
            if (e.event_type == "view") {
              if (st == null || e.ms > st.ms ||
                  (e.ms == st.ms && e.event_id > st.event_id))
                st = ViewState(e.ms, e.event_id, e.value)
            } else {
              out += AsofOut(e.event_id, uid, e.ms,
                if (st == null) null else Long.box(st.ms),
                if (st == null) null else Double.box(st.value))
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** A buffered event awaiting the watermark (as-of OOO variant). */
  case class PendEv(event_id: Long, ms: Long, value: Double, isView: Boolean)

  /** Ev plus its event-time column: the watermarked column must stay in
    * the Dataset all the way to the stateful operator, or the analyzer
    * rejects the event-time timeout.
    */
  case class EvW(event_id: Long, user_id: Long, event_type: String,
                 ms: Long, value: Double, event_time: java.sql.Timestamp)

  /** State of the watermark-buffered as-of fold: the latest FINALIZED
    * view (everything at-or-below the watermark collapses to one row —
    * older views can never win an as-of match for a future purchase)
    * plus the still-mutable buffer above the watermark.
    */
  case class AsofBuf(hasBest: Boolean, bestMs: Long, bestEid: Long,
                     bestVal: Double, pend: List[PendEv], lastMs: Long)

  /** Streaming as-of join, OUT-OF-ORDER tolerant — asofStream assumes
    * cross-batch event-time order and silently skips a view delivered
    * after a later purchase was already emitted. This variant holds
    * events until the watermark passes them: a purchase is finalized
    * only once no view at-or-before it can still arrive, so late views
    * (within the watermark bound) attribute correctly no matter which
    * micro-batch delivers them.
    *
    * State per user is O(1) below the watermark (one finalized view —
    * older ones are dominated for every future purchase) + the
    * above-watermark buffer, i.e. bounded by the watermark delay, not
    * the stream. Emission at `ms <= watermark` mirrors Spark's own
    * windowed-aggregate finalization contract. An event-time timeout at
    * the earliest held purchase guarantees the buffer drains once the
    * watermark moves past it.
    *
    * `idleTtlMs` bounds TOTAL state: a key whose last event is more
    * than the TTL below the watermark has its state removed (after any
    * still-held work drains), so long-idle keys stop costing a state
    * row. The semantic trade is explicit: a purchase arriving after
    * the key was reclaimed cannot attribute to a pre-TTL view — i.e.
    * the attribution lookback window IS the TTL. Default = no TTL
    * (state O(active keys), the a12-equivalent semantics the oracle
    * checks).
    */
  def asofStreamBuffered(spark: SparkSession, events: DataFrame,
                         delay: String = "0 seconds",
                         idleTtlMs: Long = Long.MaxValue): Dataset[AsofOut] = {
    import spark.implicits._
    events
      .withWatermark("event_time", delay)
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ms"), col("value"), col("event_time"))
      .as[EvW]
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      // Append operator mode: every emitted row is FINAL (a purchase
      // emits exactly once, when the watermark finalizes it) — so the
      // query can run in append mode against exactly-once file sinks,
      // which the ordered variant (update-mode, emits immediately)
      // cannot.
      .flatMapGroupsWithState[AsofBuf, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[EvW], state: GroupState[AsofBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(
            AsofBuf(hasBest = false, Long.MinValue, Long.MinValue, 0.0, Nil,
                    Long.MinValue))
          val pend = prev.pend ++ evs.map(e =>
            PendEv(e.event_id, e.ms, e.value, e.event_type == "view"))
          val lastMs = (prev.lastMs :: pend.map(_.ms)).max
          val (ripe, hold) = pend.partition(_.ms <= wm)
          var has = prev.hasBest
          var bMs = prev.bestMs; var bEid = prev.bestEid; var bVal = prev.bestVal
          val out = List.newBuilder[AsofOut]
          // Same (ms, views-first, event_id) tiebreak as the batch
          // operator's `side` ordinal — <= semantics at equal ms. Every
          // ripe view is <= wm < any held purchase's ms, so folding all
          // of them into `best` can never overshoot a held purchase.
          ripe.sortBy(p => (p.ms, if (p.isView) 0 else 1, p.event_id)).foreach { p =>
            if (p.isView) {
              if (!has || p.ms > bMs || (p.ms == bMs && p.event_id > bEid)) {
                has = true; bMs = p.ms; bEid = p.event_id; bVal = p.value
              }
            } else {
              out += AsofOut(p.event_id, uid, p.ms,
                if (has) Long.box(bMs) else null,
                if (has) Double.box(bVal) else null)
            }
          }
          // Saturating TTL deadline (lastMs + ttl can overflow).
          val ttlAt =
            if (idleTtlMs == Long.MaxValue) Long.MaxValue
            else { val s = lastMs + idleTtlMs
                   if (s < lastMs) Long.MaxValue else s }
          if (hold.isEmpty && wm >= ttlAt) {
            // Idle past the TTL and nothing held — reclaim the key.
            state.remove()
          } else {
            state.update(AsofBuf(has, bMs, bEid, bVal, hold, lastMs))
            val heldPurchases = hold.filter(!_.isView)
            val deadlines = heldPurchases.map(_.ms) ++
              (if (ttlAt != Long.MaxValue) Seq(ttlAt) else Nil)
            if (deadlines.nonEmpty)
              // Deadline is set one ms EARLY: Spark fires event-time
              // timeouts only when timeoutTimestamp < watermark
              // (STRICT), while ripeness above is ms <= wm. A deadline
              // of exactly `ms` would need wm > ms to fire — so a key
              // whose earliest held purchase is the globally-latest
              // event (timeout ts == final watermark) would never
              // drain in a bounded AvailableNow run. `ms - 1` fires at
              // wm >= ms, agreeing with the ripeness predicate. The
              // clamp floor is wm itself (allowed: setTimeoutTimestamp
              // rejects only ts < wm), so a purchase held at
              // ms == wm + 1 still gets ts = ms - 1 rather than being
              // bumped to ms and re-stranded.
              state.setTimeoutTimestamp(math.max(deadlines.min - 1, wm))
          }
          out.result().iterator
      }
  }

  /** Stream-stream interval join — attribution pairs: each purchase
    * matched to the same user's views in the preceding 30 minutes (the
    * reference correlates OrderFilled events with their originating
    * listing events across collections; here both sides are live
    * streams). Both sides carry watermarks and the range condition
    * bounds the join state store — views older than watermark + range
    * are evicted, so state is O(events in the window), not O(stream).
    * Join keys/times compared on ms-derived timestamps so the batch
    * oracle (epoch-ms arithmetic) sees identical boundaries.
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame): DataFrame =
    attributionJoin(purchases, views, "inner")

  /** As above with a join type: "leftOuter" null-pads purchases whose
    * 30-minute window closed with no view — the row is emitted once the
    * watermark proves no matching view can still arrive, which is how a
    * streaming pipeline surfaces "organic" (unattributed) purchases
    * without a second pass.
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
                      joinType: String): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
              col("ms").as("purchase_ms"),
              timestamp_millis(col("ms")).as("p_time"))
      .withWatermark("p_time", "1 hour")
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
              col("ms").as("view_ms"),
              timestamp_millis(col("ms")).as("v_time"))
      .withWatermark("v_time", "1 hour")
    p.join(v, expr(
        """p_user = v_user AND
           v_time >= p_time - interval 30 minutes AND
           v_time <= p_time"""), joinType)
      .select(col("purchase_id"), col("view_id"),
              col("p_user").as("user_id"), col("purchase_ms"), col("view_ms"))
  }

  private val runId = new AtomicInteger(0)

  /** Shuffle partitions for STATEFUL streams — deliberately smaller
    * than the batch setting. Every stateful operator keeps one state
    * store per shuffle partition, and that per-partition machinery
    * (store open/commit/snapshot per micro-batch) dominates when state
    * per key is small: a13 measures ~2x slower at 32 partitions than at
    * 4 on the test data (SURVEY §4). Stream partitions should track key
    * cardinality / state volume, not batch data volume — 8 here; a real
    * deployment sizes it per stream and CANNOT change it after the
    * first checkpoint (Spark pins it in checkpoint metadata).
    */
  def streamShufflePartitions: Int = sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE")
    .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1).getOrElse(8)

  /** Runs a streaming DataFrame to completion over the currently
    * available data (AvailableNow) into a memory sink and returns the
    * materialized result — the verification entry point for streaming
    * queries (a9). `complete` mode so the result equals the batch twin.
    *
    * The stream runs under [[streamShufflePartitions]] (a fresh
    * checkpoint per call binds it), restored to the session's batch
    * setting afterward — safe because each call runs its stream to
    * completion before returning.
    *
    * `requireSingleBatch` asserts all input arrived in ONE micro-batch
    * after the run — for callers (p5) whose deterministic-winner
    * contract is only batch-independent because the whole corpus lands
    * in one AvailableNow batch; a future maxFilesPerTrigger/option
    * change fails loudly here instead of silently changing winners.
    */
  def runToBatch(spark: SparkSession, streamed: DataFrame,
                 mode: String = "complete",
                 requireSingleBatch: Boolean = false): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val key = "spark.sql.shuffle.partitions"
    val batchSetting = spark.conf.get(key)
    // restore only AFTER termination: start() returns before batch 0 is
    // planned, so an early restore races the stream's conf capture
    val q =
      try {
        spark.conf.set(key, streamShufflePartitions.toString)
        val q0 = streamed.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
        q0.awaitTermination()
        q0
      } finally spark.conf.set(key, batchSetting)
    if (requireSingleBatch) {
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      if (dataBatches > 1) throw new IllegalStateException(
        s"$name consumed input across $dataBatches micro-batches; " +
        "this caller's deterministic-winner semantics require a single " +
        "AvailableNow batch (did a trigger/maxFilesPerTrigger option change?)")
    }
    lastMicroBatchPlan =
      org.apache.spark.sql.graftbridge.lastStreamPlan(q).getOrElse("")
    spark.table(name)
  }

  /** Executed plan of the final micro-batch of the most recent
    * [[runToBatch]] stream — the streaming analog of
    * `queryExecution.executedPlan`, captured so PlanAuditSpec can
    * audit the streaming family (state-store operator placement, no
    * cartesians) exactly like the batch sweep.
    */
  @volatile var lastMicroBatchPlan: String = ""

  /** a9: the hourly rollup computed through the streaming path. */
  def streamHourly(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, hourlyRollup(readEvents(spark, dir)))
      .orderBy(col("hour_ms"))

  /** Watermarked per-(type, hour) rollup — the bucket stream a19's
    * anomaly stats consume. Same append-capable shape as
    * [[hourlyRollup]]: with the watermark the state store holds only
    * open windows, so state ≈ types × watermark-delay hours at any
    * stream length.
    */
  def hourlyTypeRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "1 hour")
      .groupBy(col("event_type"), window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"),
              unix_millis(col("window.start")).as("hour_ms"),
              col("n_events"))

  /** a19: streaming anomaly detection — the event scan runs through
    * the watermarked streaming rollup (bounded state, incremental
    * catch-up under AvailableNow); the trailing z-score stage then
    * runs as a BATCH window over the landed bucket table, which is
    * ≈ hours × types rows at any corpus size. That split is the
    * production shape (and the reason there is no chained stateful
    * z-score operator: Spark disallows arbitrary stateful chaining
    * after a windowed agg, and the bucket table is tiny anyway).
    * Equals a18 row-for-row by construction — it shares a18's oracle.
    */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EventOps.anomalyFromBuckets(
      runToBatch(spark, hourlyTypeRollup(readEvents(spark, dir))))

  /** a13: the attribution interval join computed through the streaming
    * path — two independent file-source streams joined stream-to-stream.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark,
        attributionJoin(readEvents(spark, dir), readEvents(spark, dir)),
        "append")
      .orderBy(col("purchase_id"), col("view_id"))

  /** a14: the as-of attribution computed through the streaming path —
    * projected to a12's shape so the SAME oracle verifies both.
    */
  def streamAsof(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, asofStream(spark, readEvents(spark, dir)).toDF(), "update")
      .select(col("purchase_id").as("event_id"), col("user_id"),
              col("purchase_ms"), col("view_ms"), col("view_value"))
      .orderBy(col("event_id"))

  /** a15: a12's as-of computed through the watermark-buffered OOO-
    * tolerant path, projected to the same shape so the SAME oracle
    * verifies all three as-of forms. Delay 0 here: the file batch
    * delivers everything before the watermark first moves, and the
    * trailing no-data micro-batch advances it to max event time, which
    * drains every held purchase.
    */
  def streamAsofOoo(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark,
        asofStreamBuffered(spark, readEvents(spark, dir)).toDF(), "append")
      .select(col("purchase_id").as("event_id"), col("user_id"),
              col("purchase_ms"), col("view_ms"), col("view_value"))
      .orderBy(col("event_id"))

  /** a10: the per-user state fold computed through the streaming path —
    * final state per user, projected to the a6 batch shape so the SAME
    * oracle verifies both paths. Latest update wins via n_folded, which
    * strictly increases with every folded event — unlike the event-time
    * ordinal, it disambiguates an update that only absorbed out-of-order
    * OLDER events (counts moved, ordinal didn't).
    */
  def streamState(spark: SparkSession, dir: String): DataFrame = {
    val updates = runToBatch(
      spark, userStateStream(spark, readEvents(spark, dir)).toDF(), "update")
    updates
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("*")), col("n_folded")).as("s"))
      .select(col("user_id"),
              col("s.n_signup").as("n_signup"),
              col("s.n_view").as("n_view"),
              col("s.n_click").as("n_click"),
              col("s.n_purchase").as("n_purchase"),
              col("s.n_error").as("n_error"),
              round(col("s.total_value"), 2).as("total_value"),
              col("s.current_state").as("current_state"),
              col("s.state_ms").as("state_ms"))
      .orderBy(col("user_id"))
  }
}
