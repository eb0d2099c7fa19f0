package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pipeline compositions (SURVEY §2.P): the end-to-end corpus-prep
  * flows a training-data pipeline actually ships — individual
  * operators (quality scoring, cluster dedup) chained into one
  * declarative plan, so Catalyst sees the WHOLE flow: filters push
  * through the composition and every stage stays partial-aggregable.
  * The branches scan `documents` separately but each scan is pruned
  * to its 2–3 needed columns (columnar reads make repeated pruned
  * scans cheap; a deployment that prefers one pass materializes the
  * token array once, trading memory for IO).
  */
object PipelineOps {

  /** p1: pretraining corpus preparation — the canonical chain
    *   quality gate → duplicate-cluster dedup → corpus stats.
    *
    * Semantics (order matters and is deliberate): the quality filter
    * runs FIRST, then each duplicate cluster keeps its min-doc_id
    * representative AMONG the quality-passing members — so a cluster
    * whose canonical copy is junk still contributes its best-id clean
    * copy, and a cluster with no clean member contributes nothing.
    * The representative pick is a single min_by partial aggregate per
    * cluster (one shuffle on cluster_id, no join-back), then the
    * per-lang rollup is an ordinary map-side-combined aggregate.
    *
    * 100 TB shape: clusters ≈ docs, so nothing here is broadcast; the
    * only shuffles are the CC labeling (see dedupClusters), one
    * cluster_id aggregate, and one lang aggregate.
    */
  def corpusPrep(spark: SparkSession, dir: String,
                 minQuality: Double = 0.72): DataFrame =
    corpusDocs(spark, dir, minQuality)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           round(avg(col("quality")), 6).as("avg_quality"))
      .orderBy(col("lang"))

  /** The prepared corpus itself (p1's pre-rollup form): one row per
    * surviving representative document.
    */
  def corpusDocs(spark: SparkSession, dir: String,
                 minQuality: Double = 0.72): DataFrame = {
    val q = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val clusters = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val kept = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(q, "doc_id")
      .filter(col("quality") >= minQuality)
      .join(clusters, "doc_id")
    kept
      .groupBy(col("cluster_id"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
                         col("quality")), col("doc_id")).as("r"))
      .select(col("r.*"))
  }

  /** Materialize the prepared corpus as lang-partitioned parquet — the
    * sink every corpus-prep run ends in. `repartition(lang)` BEFORE
    * `partitionBy(lang)` is the small-file guard: without it every
    * write task opens a file per lang it happens to hold (tasks ×
    * langs files at 100 TB); with it each lang's rows land in the
    * task(s) owning that hash bucket, so files-per-lang is O(1) and
    * downstream lang-filtered reads prune whole directories.
    */
  def writeCorpus(spark: SparkSession, dir: String, outPath: String,
                  minQuality: Double = 0.72): Unit =
    corpusDocs(spark, dir, minQuality)
      .repartition(col("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(outPath)
}
