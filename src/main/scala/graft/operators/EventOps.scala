package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event ingestion & organization — the Spark re-expression of the
  * reference's layer 1 (SURVEY.md §2.A): contract-event checkpointing,
  * latest-state-per-key, event→entity state folds, sessionization,
  * funnels and idempotent ingest dedup.
  *
  * Reference analogs: checkpoint heights
  * (src/modules/database/db.service.ts:27-85), latest-per-key
  * `$sort`+`$group{$first}` (src/modules/app/app.service.ts:162-179),
  * order state machine fold
  * (src/modules/tasks/tasks.service.ts:599-796), time-series rollups
  * (app.service.ts:345, 1220).
  *
  * Precision rule: every time comparison/grouping happens on epoch
  * MILLISECOND longs (`ms` below), computed identically here and in the
  * DuckDB oracle (`epoch_ms(ts)`). The raw parquet timestamps are ns;
  * Spark truncates to µs, DuckDB keeps ns — comparing at ms in BOTH
  * engines removes the precision mismatch from every code path.
  *
  * Scale notes: a1/a2/a6 are max_by/agg partial-aggregable folds (map-
  * side combine, one shuffle on the key — no window over the raw fact);
  * a5's window shuffles once on user_id with per-user bounded state;
  * a7 joins per-user aggregates (key-partitioned, no broadcast of
  * scale-growing sides); a8 is a single groupBy over the dedup key.
  */
object EventOps {

  /** Events with a canonical epoch-ms column — `Tables.eventsMs`
    * (schema-adaptive: the generator has shipped `ts` both as raw
    * nanosecond longs and as parquet µs timestamps; the ms derivation
    * lives in ONE place, `Tables.epochMs`).
    */
  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsMs(spark, dir)

  /** Unique, order-preserving sort key: lexicographic (ms, event_id).
    * A struct compares field-by-field, so the ordering is exact at ANY
    * event_id magnitude — an arithmetic packing like ms*1e6+event_id
    * silently corrupts the order once event_id (a global row index)
    * crosses the packing base, which a 100 TB event log certainly does.
    * The oracle mirrors it with a zero-padded fixed-width string key
    * (`printf('%019d|%019d', ms, event_id)`), lexicographically
    * identical for non-negative longs.
    */
  private val ordKey = struct(col("ms"), col("event_id"))

  /** a1: latest event per user — `$sort`+`$group{$first:$$ROOT}`
    * (app.service.ts:162-179) as a max_by partial aggregate: the map
    * side combines to one row per user before the single shuffle.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame =
    latestEventPerUserFrom(ev(spark, dir))

  /** a1 over a caller-supplied events-with-ms frame — shared with the
    * bucketed-warehouse form, whose user_id-bucketed layout satisfies
    * the aggregation's ClusteredDistribution and drops the Exchange.
    */
  private[graft] def latestEventPerUserFrom(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(
        max_by(col("event_id"), ordKey).as("last_event_id"),
        max_by(col("event_type"), ordKey).as("last_event_type"),
        max_by(col("value"), ordKey).as("last_value"),
        max(col("ms")).as("last_ms"))
      .orderBy(col("user_id"))

  /** a2: ingestion checkpoint — last processed height (event_id) and
    * timestamp per event type (db.service.ts:27-85's
    * getXxxEventLastHeight family, one row per event collection).
    */
  def lastHeightPerType(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        max(col("event_id")).as("last_height"),
        max(col("ms")).as("last_ms"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** a3: event volume stats per type (listTransactions counts,
    * app.service.ts:802-965).
    */
  def eventCountsByType(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"))

  /** a4: hourly rollup — time-bucketed counts/volume (price-history
    * series, app.service.ts:345). Bucket = floor(ms / 3600000), one
    * partial-aggregable groupBy.
    */
  /** a18: per-type hourly anomaly flags — each (event_type, hour)
    * bucket's count z-scored against its trailing 24 OBSERVED hourly
    * buckets (ROWS frame, not wall-clock — gaps compress, which is
    * the usual monitoring choice), |z| ≥ zCut flags. The rollup is
    * one partial-aggregable shuffle; the window sorts within
    * event_type partitions whose size is bounded by the time range,
    * not the event count — at 100 TB the state per type is still
    * ~hours, so no skew concern.
    *
    * Engine-parity guards: the z column exists only when the trailing
    * window has ≥ 2 rows AND positive spread (Spark's stddev_samp of
    * one row is NaN where DuckDB's is NULL; a zero sd would divide to
    * ±Infinity in both) — the guard makes null the common value.
    */
  def hourlyAnomaly(spark: SparkSession, dir: String,
                    trail: Int = 24, zCut: Double = 3.0): DataFrame =
    anomalyFromBuckets(
      ev(spark, dir)
        .groupBy(col("event_type"),
                 (floor(col("ms") / 3600000L) * 3600000L).as("hour_ms"))
        .agg(count(lit(1)).as("n_events")),
      trail, zCut)

  /** a18's trailing-stats stage over an already-aggregated
    * (event_type, hour_ms, n_events) bucket frame — shared with the
    * streaming twin (a19), whose watermarked rollup lands exactly this
    * shape. The window runs over BUCKETS (≈ hours·types rows), so at
    * any corpus size this stage is tiny; the event scan is the scale
    * cost and it lives in whichever rollup feeds this.
    */
  private[graft] def anomalyFromBuckets(hourly: DataFrame,
                                        trail: Int = 24,
                                        zCut: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ms"))
      .rowsBetween(-trail, -1)
    hourly
      // all three trailing aggregates in ONE select so they land in a
      // single WindowExec pass (the when(trail_n >= 2) guard used to
      // reference the first window column inline, splitting the plan
      // into two Window nodes over the same sort); the guard itself
      // moves to the next projection — it only turns stddev_samp's
      // n=1 NaN into null, so values are unchanged
      .select(col("*"),
              count(col("n_events")).over(w).as("trail_n"),
              avg(col("n_events")).over(w).as("mu"),
              stddev_samp(col("n_events")).over(w).as("sd_raw"))
      .withColumn("sd", when(col("trail_n") >= 2, col("sd_raw")))
      .withColumn("z",
        when(col("sd") > 0, (col("n_events") - col("mu")) / col("sd")))
      .select(col("event_type"), col("hour_ms"), col("n_events"),
              round(col("mu"), 6).as("trail_mean"),
              round(col("sd"), 6).as("trail_std"),
              round(col("z"), 6).as("zscore"),
              (col("z").isNotNull && abs(col("z")) >= zCut).as("is_anomaly"))
      .orderBy(col("event_type"), col("hour_ms"))
  }

  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy((floor(col("ms") / 3600000L) * 3600000L).as("hour_ms"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour_ms"))

  /** a5: sessionize — 30-minute-gap sessions per user: lag to detect
    * boundaries, running sum to number sessions, then per-session agg.
    * One shuffle on user_id; window state is bounded per user.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeFrom(ev(spark, dir))

  /** a5 over a caller-supplied events-with-ms frame — shared with the
    * bucketed-warehouse form (window partitioned on the bucket key →
    * sort only, no Exchange).
    */
  private[graft] def sessionizeFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val gap = col("ms") - lag(col("ms"), 1).over(w)
    ev
      .withColumn("new_session",
        when(gap.isNull || gap > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** a6: event→entity state fold — the order state machine
    * (tasks.service.ts:599-796) generalized: per-user pivoted event
    * counts + latest-event-wins state, as ONE partial-aggregable pass
    * (conditional counts + max_by; no window, no join).
    */
  def stateFold(spark: SparkSession, dir: String): DataFrame = {
    stateFoldFrom(ev(spark, dir))
  }

  /** a6 over a caller-supplied events-with-ms frame — shared with the
    * bucketed-warehouse form.
    */
  private[graft] def stateFoldFrom(ev: DataFrame): DataFrame = {
    def n(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    ev.groupBy(col("user_id"))
      .agg(
        n("signup"), n("view"), n("click"), n("purchase"), n("error"),
        round(sum(col("value")), 2).as("total_value"),
        max_by(col("event_type"), ordKey).as("current_state"),
        max(col("ms")).as("state_ms"))
      .orderBy(col("user_id"))
  }

  /** a7: ordered funnel signup→view→purchase: first signup, first view
    * AFTER that signup, first purchase AFTER that view.
    *
    * Single-pass shape: ONE scan of events, ONE shuffle on user_id.
    * Three stacked whole-partition windows (no ORDER BY → no running
    * frame) resolve the sequential dependency — each stage's `min` can
    * reference the previous stage's window result because Spark chains
    * Window nodes over the same partitioning without re-exchanging.
    * The final groupBy collapses to one row per user and reuses the
    * window's hash partitioning, so no second shuffle. (The previous
    * form scanned events 4× through three filtered aggregate+join
    * rounds — 4 passes over a 100 TB fact vs 1 here.)
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    ev(spark, dir)
      .select(col("user_id"), col("event_type"), col("ms"))
      .withColumn("signup_ms",
        min(when(col("event_type") === "signup", col("ms"))).over(w))
      .withColumn("view_ms",
        min(when(col("event_type") === "view" && col("ms") > col("signup_ms"),
                 col("ms"))).over(w))
      .withColumn("purchase_ms",
        min(when(col("event_type") === "purchase" && col("ms") > col("view_ms"),
                 col("ms"))).over(w))
      .filter(col("signup_ms").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("signup_ms")).as("signup_ms"),
           min(col("view_ms")).as("view_ms"),
           min(col("purchase_ms")).as("purchase_ms"))
      .select(
        col("user_id"), col("signup_ms"), col("view_ms"), col("purchase_ms"),
        (lit(1) + when(col("view_ms").isNotNull, 1).otherwise(0)
                + when(col("purchase_ms").isNotNull, 1).otherwise(0))
          .cast("int").as("stage"))
      .orderBy(col("user_id"))
  }

  /** a11: event-payload parsing — the reference decodes each contract
    * event's JSON args before folding them into entity state
    * (tasks.service.ts handleOrderEventData; the `props` column plays
    * the args payload). Extract the typed field per event, aggregate
    * per (type, payload-decile). get_json_object evaluates inside
    * codegen; the JSON never leaves the executor.
    */
  def propsStats(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"), (floor(col("k") / 10) * 10).as("k_decile"))
      .agg(count(lit(1)).as("n_events"),
           round(avg(col("k")), 4).as("avg_k"),
           round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"), col("k_decile"))

  /** a12: as-of join — last-touch attribution: each purchase event
    * joined to the same user's most recent view at-or-before it (the
    * reference folds each OrderFilled into the order's latest prior
    * state one document at a time — tasks.service.ts:599-796; this is
    * the set-oriented equivalent). Spark has no ASOF JOIN operator and
    * a range join (v.ms <= p.ms) explodes to O(views × purchases) per
    * user — instead both sides are unioned and ONE window pass per
    * user carries the latest view forward (`last(..., ignoreNulls)`
    * over a running frame): one shuffle on user_id, linear per-user
    * state, no range explosion, scale-independent of the view:purchase
    * ratio. Views sort before purchases at equal ms (`side` ordinal)
    * to give <= semantics; the view side is pre-deduped to one row per
    * (user, ms) — max event_id wins — so ties are deterministic in
    * both engines. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ms"))
      .agg(max_by(col("value"), col("event_id")).as("v_value"))
      .select(col("user_id"), col("ms"), lit(0).as("side"),
              lit(null).cast("long").as("event_id"), col("v_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), lit(1).as("side"), col("event_id"),
              lit(null).cast("double").as("v_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      // one select → one WindowExec pass (chained withColumn would
      // leave two Window nodes over the same (user_id, ms, side) sort)
      .select(col("*"),
              last(col("v_value"), ignoreNulls = true).over(w)
                .as("view_value"),
              last(when(col("side") === 0, col("ms")), ignoreNulls = true)
                .over(w).as("view_ms"))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ms").as("purchase_ms"),
              col("view_ms"), col("view_value"))
      .orderBy(col("event_id"))
  }

  /** a8: idempotent ingest — dedup by (user_id, event_type, ms) keeping
    * the lowest event_id (the reference re-reads overlapping block
    * ranges; ingest must be idempotent — tasks.service.ts checkpoint
    * overlap). Emits every surviving event + its duplicate count.
    */
  def dedupEvents(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("user_id"), col("event_type"), col("ms"))
      .agg(
        min(col("event_id")).as("event_id"),
        count(lit(1)).as("dup_count"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("ms"), col("dup_count"))
      .orderBy(col("event_id"))

  /** a16: cohort retention — the canonical event-organization matrix:
    * users cohorted by their FIRST event's week, each cohort's active
    * user count at every week offset (offset 0 = the cohort's size by
    * construction — every member is active in their first week). The
    * reference serves per-entity activity series (getStatisticsByWalletAddr
    * app.service.ts:1629 and the daily stats jobs); this is the
    * standard analytics fold over the same event log.
    *
    * 100 TB shape: ONE pass derives both sides — per-(user, week)
    * distinct activity via aggregation, the per-user first week as a
    * min over that SAME aggregate (no second scan of the log), then a
    * broadcast-free equi-join back on user_id and one final
    * partial-aggregable (cohort, offset) count. Two shuffles on
    * user_id (which the bucketed event log would absorb) + one on the
    * tiny output key.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val week = 604800000L
    val userWeeks = ev(spark, dir)
      // integer `div`, not floor(/): a double division loses exactness
      // past 2^53 and changes the column type the oracle compares
      .groupBy(col("user_id"), expr(s"ms div $week").as("wk"))
      .agg(count(lit(1)).as("n_events"))
    val cohorts = userWeeks
      .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    userWeeks.join(cohorts, "user_id")
      .groupBy((col("cohort_wk") * week).as("cohort_week_ms"),
               (col("wk") - col("cohort_wk")).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active_users"),
           sum(col("n_events")).as("n_events"))
      .orderBy(col("cohort_week_ms"), col("week_offset"))
  }

  /** a17: rate-weighted per-type event rollup through the SALTED join
    * path — JoinFns.saltedJoin exercised end-to-end on a genuinely
    * skewed key. `event_type` has five values over the whole log, so
    * a plain shuffle join on it degenerates to five reducers owning
    * everything (the hottest key alone ~20% of a 100 TB log on ONE
    * task). Broadcast is the first choice for a tiny dim (b48 takes
    * it); the salted form is the standing fallback for when the
    * replicated side is too big to broadcast — each hot key's rows
    * split across `salts` reducers via a deterministic row-hash salt,
    * the dim replicates once per salt, and the result set is
    * provably identical to the plain join (EventOpsSpec asserts it;
    * the oracle replays the PLAIN join — salting must be invisible
    * in the answer). The follow-up per-type aggregate is map-side
    * combinable, so the 5-key skew never concentrates again.
    */
  def saltedTypeJoin(spark: SparkSession, dir: String,
                     salts: Int = 8): DataFrame = {
    // ONE scan feeds both passes: the projected log is persisted and
    // the rate dim aggregates the cached projection instead of
    // re-reading the log. (At 100 TB the same shape holds with the
    // cache swapped for the standing latest-tick state a2/a10
    // maintain incrementally, or a checkpointed projection — the
    // design point is that fact pass and dim derivation share one
    // scan, not that a full log fits in storage memory.) Spark keys
    // the cache on the logical plan, so repeated runs reuse one entry.
    val base = ev(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("ms"))
      .persist()
    val events = base.select(col("event_id"), col("event_type"), col("value"))
    val dim = base
      .groupBy(col("event_type"))
      .agg(max_by(col("value"), struct(col("ms"), col("event_id")))
             .as("rate"))
    graft.functions.JoinFns.saltedJoin(events, dim, "event_type", salts)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value") * col("rate")), 2).as("weighted"))
      .orderBy(col("event_type"))
  }
}
