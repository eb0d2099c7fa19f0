package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Streaming corpus ingestion — the LLM-pipeline front door as a
  * Structured Streaming flow (the reference's continuous event-listener
  * ingest, applied to the training-corpus side): a crawler drops
  * parquet into the corpus directory, the stream enriches each new
  * document and exact-dedups on the content fingerprint so a
  * re-crawled or replayed document reaches downstream consumers
  * exactly once.
  *
  * The enrichment uses the SAME Column expressions as the batch
  * operators (TextOps.Quality, md5 fingerprint) — readStream changes
  * the source, not the plan, which is the point: the text kernels
  * compose with streaming unchanged, and the batch oracle verifies the
  * streamed values.
  */
object CorpusStream {

  /** File-source stream over the documents landing path (single test
    * file exposed via StreamFiles' symlink dir; schema pinned once from
    * the batch footer). At deployment this watches the crawler's
    * output directory; AvailableNow runs it as incremental batch
    * ingest.
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val (d, schema) = StreamFiles.dirAndSchema(spark, dir, "documents.parquet")
    spark.readStream.schema(schema).parquet(d.toString)
  }

  /** Stateless per-row enrichment (content fingerprint + e2's quality
    * score + token count) + stateful exact-dedup keyed on the
    * fingerprint (first occurrence wins, replays dropped by state).
    *
    * State is one fingerprint per distinct content — unbounded over
    * the stream's life BY DESIGN: exact dedup is a global set. A
    * deployment whose re-crawl window is bounded swaps in
    * dropDuplicatesWithinWatermark on an ingest-time column, exactly
    * as EventStream.dedupStream does for events.
    */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"), col("lang"),
        md5(col("text")).as("fp"),
        size(TextOps.Quality.toks).cast("long").as("n_tokens"),
        round(TextOps.Quality.score, 4).as("quality"))
      .dropDuplicates("fp")

  /** p5: the ingest run over the current corpus directory
    * (AvailableNow → memory sink). The corpus plants no exact
    * duplicates, so the dedup arm is an identity here and the batch
    * oracle checks the enrichment hash-exactly; the dup-DROPPING arm
    * is MemoryStream-tested in CorpusStreamSpec (replayed content
    * across micro-batches).
    */
  def streamIngest(spark: SparkSession, dir: String): DataFrame =
    EventStream.runToBatch(spark, ingest(readDocuments(spark, dir)), "append")
      .orderBy(col("doc_id"))
}
