package graft

import org.apache.spark.sql.functions._
import graft.operators.MarketOps
import graft.sources.Tables
import graft.streaming.AuditStream

/** The streaming consistency audit (round 14 — verdict item 6): after
  * draining the fact tables, the served audit must equal batch b56
  * row-for-row; a planted dangling reference must flip its check to
  * inconsistent AND surface as an alert row; and a restarted/replayed
  * maintainer must change nothing (exactly-once).
  */
class AuditStreamSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val serve = java.nio.file.Files.createTempDirectory("graft_audit_serve_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_audit_ckpt_")
    (serve.toString, ckpt.toString)
  }

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("drained streaming audit equals batch b56; clean corpus raises no alert") {
    val (serve, ckpt) = freshDirs()
    AuditStream.maintainAudit(spark, sf, serve, ckpt).awaitTermination()
    assert(strs(AuditStream.readAudit(spark, serve)) ==
           strs(MarketOps.consistencyAudit(spark, sf)),
      "streamed audit drifted from batch b56")
    assert(AuditStream.readAlerts(spark, serve).count() == 0,
      "clean corpus raised alerts")
    // restart on the same checkpoint: nothing new arrives, the audit
    // and alerts are byte-for-byte what they were (exactly-once)
    val audit1 = strs(AuditStream.readAudit(spark, serve))
    AuditStream.maintainAudit(spark, sf, serve, ckpt).awaitTermination()
    assert(strs(AuditStream.readAudit(spark, serve)) == audit1,
      "restart changed the served audit")
    assert(AuditStream.readAlerts(spark, serve).count() == 0)
  }

  test("planted dangling reference flips the check and lands an alert row") {
    // corrupt corpus copy: one lineitem row points at a missing order
    val dir = java.nio.file.Files.createTempDirectory("graft_audit_bad_").toString
    val orders = Tables.orders(spark, sf)
    val maxOk = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val phantom = maxOk + 1000L
    Tables.lineitem(spark, sf)
      .unionAll(Tables.lineitem(spark, sf).limit(1)
        .withColumn("l_orderkey", lit(phantom)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq("orders", "customer", "part", "supplier").foreach { t =>
      Tables.table(spark, sf, t).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    val (serve, ckpt) = freshDirs()
    AuditStream.maintainAudit(spark, dir, serve, ckpt).awaitTermination()
    // identity with batch b56 holds on the corrupted corpus too
    assert(strs(AuditStream.readAudit(spark, serve)) ==
           strs(MarketOps.consistencyAudit(spark, dir)))
    val bad = AuditStream.readAudit(spark, serve)
      .filter(col("check_name") === "lineitem_order_refs").collect()(0)
    assert(!bad.getAs[Boolean]("consistent"),
      "planted dangling order reference not detected")
    val alerts = AuditStream.readAlerts(spark, serve).collect()
    assert(alerts.length == 1 &&
           alerts(0).getAs[String]("check_name") == "lineitem_order_refs" &&
           alerts(0).getAs[Long]("key") == phantom,
      s"alert stream did not carry the dangling key: ${alerts.toSeq}")
  }
}
