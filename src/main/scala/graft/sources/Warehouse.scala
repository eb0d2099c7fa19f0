package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-warehouse path — the co-located-join strategy for 100 TB.
  *
  * The raw parquet tables force a shuffle on every fact⋈fact join
  * (orders⋈lineitem appears in b6/b16/b17 and most marketplace
  * queries). At cluster scale the standing fix is to land both facts
  * bucketed by the join key: every bucket pair is co-located, the
  * sort-merge join reads buckets directly, and the per-query Exchange
  * disappears. This module materializes that layout and exposes the
  * bucket-aware loaders; WarehouseSpec proves the exchange-free plan.
  *
  * (The reference gets the same effect from MongoDB's _id/index
  * locality; Spark's equivalent is bucketBy + saveAsTable.)
  */
object Warehouse {

  val Buckets = 32

  /** One-time landing job: write orders + lineitem bucketed by the
    * join key into the session catalog (managed tables under
    * spark.sql.warehouse.dir). Idempotent via overwrite.
    */
  // idempotent across JVMs: drop catalog entries AND any orphaned
  // location a previous session left behind (a managed-table location
  // that exists without a catalog entry fails CREATE TABLE AS SELECT)
  private def dropManaged(spark: SparkSession, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(wh, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }

  def build(spark: SparkSession, dir: String): Unit = {
    dropManaged(spark, Seq("graft_orders_b", "graft_lineitem_b"))
    Tables.orders(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet")
      .saveAsTable("graft_orders_b")
    Tables.lineitem(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet")
      .saveAsTable("graft_lineitem_b")
  }

  def ordersB(spark: SparkSession): DataFrame = spark.table("graft_orders_b")
  def lineitemB(spark: SparkSession): DataFrame = spark.table("graft_lineitem_b")

  /** The b6-shaped revenue join over the bucketed layout: orders ⋈
    * lineitem with NO shuffle on either side (bucket-local sort-merge).
    */
  def revenueJoinBucketed(spark: SparkSession): DataFrame =
    lineitemB(spark)
      .join(ordersB(spark), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))

  /** Land documents/embeddings bucketed on their shared id space —
    * the layout d7's metadata-filtered ANN wants: the embeddings ⋈
    * filtered-documents semi join becomes bucket-local (no Exchange on
    * either side; WarehouseSpec proves it).
    */
  def buildAnn(spark: SparkSession, dir: String): Unit = {
    dropManaged(spark, Seq("graft_documents_b", "graft_embeddings_b"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id").sortBy("doc_id")
      .format("parquet")
      .saveAsTable("graft_documents_b")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "vec_id").sortBy("vec_id")
      .format("parquet")
      .saveAsTable("graft_embeddings_b")
  }

  def documentsB(spark: SparkSession): DataFrame = spark.table("graft_documents_b")
  def embeddingsB(spark: SparkSession): DataFrame = spark.table("graft_embeddings_b")

  /** d7 over the bucketed layout: identical semantics/output to
    * `SimOps.annFiltered` (same shared plan body), but the candidate
    * semi join reads co-located buckets instead of shuffling both
    * fact-scale sides.
    */
  def annFilteredBucketed(spark: SparkSession, k: Int = 10, qmod: Int = 50,
                          lang: String = "en"): DataFrame = {
    val emb = embeddingsB(spark)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val meta = documentsB(spark).filter(col("lang") === lang)
      .select(col("doc_id"))
    graft.operators.SimOps.annFilteredFrom(emb, meta, k, qmod)
  }
}
