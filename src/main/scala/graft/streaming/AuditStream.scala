package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.Tables

/** b56's consistency audit as a SELF-MAINTAINING streaming job with an
  * alert stream (round 14 — verdict item 6): the reference CRONs its
  * OrderAndTokenCountCheck reconciliation and mails on mismatch
  * (data-check.service.ts:24); the Spark-native posture is a standing
  * Structured Streaming maintainer over the arriving fact rows instead
  * of a periodic full rescan.
  *
  * Shape: the four audited foreign-key streams union into one
  * (check_name, key) stream; streaming dropDuplicates keeps exactly
  * the audit's distinct-key semantics (state = the distinct FK sets —
  * the same cardinality the batch audit's distinct shuffles
  * materialize per run, bounded by key cardinality, never stream
  * length); each micro-batch then carries only NEVER-SEEN keys, which
  * anti-join the (static) dimension keys. Per batch the job lands
  *  - one summable delta row per check (n_new, n_covered) and
  *  - the dangling keys themselves as ALERT rows (the "mail"),
  * each under the micro-batch's own batch_id partition directory —
  * exactly-once under foreachBatch replay by the
  * upsertIvfFrom/writePartitioned overwrite contract. The served audit
  * ([[readAudit]]) is a sum over delta rows and equals batch b56 over
  * everything drained so far (AuditStreamSpec pins the identity, the
  * planted-dangling alert, and replay idempotence).
  *
  * 100 TB: per-batch cost is the batch's keys against the broadcast
  * dim keys; the audit read is O(checks × batches) delta rows. The
  * periodic full b56 stays registered as the oracled reconciliation
  * foil, exactly as d17 backs d17b.
  */
object AuditStream {

  /** The audited references — must stay in lockstep with b56
    * (MarketOps.consistencyAudit); the spec's identity assertion
    * enforces it.
    */
  private val checks: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem_order_refs",    "lineitem", "l_orderkey", "orders",   "o_orderkey"),
    ("orders_customer_refs",   "orders",   "o_custkey",  "customer", "c_custkey"),
    ("lineitem_part_refs",     "lineitem", "l_partkey",  "part",     "p_partkey"),
    ("lineitem_supplier_refs", "lineitem", "l_suppkey",  "supplier", "s_suppkey"))

  private def keyed(df: DataFrame, name: String, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      // non-integral keys fail loudly, like the batch twin's raise_error
      // (a silent NULL cast would under-count the fact side)
      .select(lit(name).as("check_name"),
              when(col(key).cast("long").isNull,
                   raise_error(concat(
                     lit(s"auditStream: non-integral key $key="),
                     col(key).cast("string"))))
                .otherwise(col(key).cast("long")).as("key"))

  /** The unioned (check_name, key) stream over the corpus dir's fact
    * tables (lineitem carries three audited keys, orders one).
    */
  private def factKeyStream(spark: SparkSession, dir: String): DataFrame = {
    def read(table: String): DataFrame = {
      val (d, schema) = StreamFiles.dirAndSchema(spark, dir, s"$table.parquet")
      spark.readStream.schema(schema).parquet(d.toString)
    }
    val byTable = checks.groupBy(_._2)
    byTable.map { case (table, cs) =>
      val src = read(table)
      cs.map { case (name, _, key, _, _) => keyed(src, name, key) }
        .reduce(_.unionAll(_))
    }.reduce(_.unionAll(_))
  }

  /** The static dimension-key side, one (check_name, key) row per dim
    * key — what a new fact key must hit to be covered.
    */
  private def dimKeys(spark: SparkSession, dir: String): DataFrame =
    checks.map { case (name, _, _, dim, dimKey) =>
      keyed(Tables.table(spark, dir, dim), name, dimKey)
    }.reduce(_.unionAll(_))

  /** Start (and with AvailableNow: drain) the audit maintainer.
    * `servePath` receives `deltas/` and `alerts/` batch-partitioned
    * parquet; `checkpoint` makes the dedup state and source progress
    * resumable.
    */
  def maintainAudit(spark: SparkSession, dir: String, servePath: String,
                    checkpoint: String): StreamingQuery =
    factKeyStream(spark, dir)
      .dropDuplicates("check_name", "key")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark2 = batch.sparkSession
        import spark2.implicits._
        val b = batch.localCheckpoint(false)
        // broadcast the SMALL side both times: the batch's new keys
        // semi-probe the dim scan (dim keys are primary keys, the
        // batch is deduped, so the semi's survivors ARE the covered
        // batch keys), and the anti-join runs against the ≤|batch|
        // covered set — the fact-scale orders dim never broadcasts
        val dims = dimKeys(spark2, dir)
        val covered = dims
          .join(broadcast(b), Seq("check_name", "key"), "left_semi")
          .localCheckpoint(false)
        val dangling = b.join(broadcast(covered),
                              Seq("check_name", "key"), "left_anti")
        // summable per-check delta; checks with no new keys this batch
        // contribute an explicit zero row so the delta table always
        // carries all four checks per batch (the read side never
        // guesses which checks were silent)
        val names = checks.map(_._1).toDF("check_name")
        val deltas = names
          .join(b.groupBy(col("check_name")).agg(count(lit(1)).as("n_new")),
                Seq("check_name"), "left")
          .join(covered.groupBy(col("check_name"))
                  .agg(count(lit(1)).as("n_covered")),
                Seq("check_name"), "left")
          .select(col("check_name"),
                  coalesce(col("n_new"), lit(0L)).as("n_new"),
                  coalesce(col("n_covered"), lit(0L)).as("n_covered"))
        // exactly-once: each replayed micro-batch overwrites ITS OWN
        // batch_id directory (the writePartitioned contract on paths)
        deltas.coalesce(1).write.mode("overwrite")
          .parquet(s"$servePath/deltas/batch_id=$batchId")
        dangling.write.mode("overwrite")
          .parquet(s"$servePath/alerts/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The served audit: Σ deltas per check — b56's exact output shape
    * (check_name, lhs_n, rhs_n, consistent) over everything drained.
    */
  def readAudit(spark: SparkSession, servePath: String): DataFrame =
    spark.read.parquet(s"$servePath/deltas")
      .groupBy(col("check_name"))
      .agg(sum(col("n_new")).as("lhs_n"),
           sum(col("n_covered")).as("rhs_n"))
      .withColumn("consistent", col("lhs_n") === col("rhs_n"))
      .orderBy(col("check_name"))

  /** The alert stream: every dangling (check_name, key) ever seen,
    * with the micro-batch that caught it — the reference's alert mail
    * as data.
    */
  def readAlerts(spark: SparkSession, servePath: String): DataFrame =
    spark.read.parquet(s"$servePath/alerts")
      .select(col("check_name"), col("key"), col("batch_id"))
      .orderBy(col("check_name"), col("key"))
}
