package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming maintenance of the landed IVF-PQ index — the flow a
  * production vector store runs between retrains: an embedding
  * pipeline drops parquet batches into a landing directory; each
  * micro-batch routes its vectors through the index's PERSISTED frozen
  * centroids, PQ-encodes them against the PERSISTED codebook, and
  * appends the posting rows (`Warehouse.upsertIvfFrom` — the standing
  * postings are never read or re-sharded, cost is O(|batch|·nlist)
  * routing + an append). The streaming twin of the reference's
  * continuous event-listener ingest (tasks.service.ts), applied to
  * the vector side; composes with d11's semantics: after the stream
  * drains, probes answer exactly what the one-shot
  * `SimOps.annIvfIncremental` computes (VectorStreamSpec proves it on
  * a two-batch landing).
  *
  * Delivery contract: the file-source checkpoint guarantees a file
  * that UPSERTED SUCCESSFULLY is never reprocessed (restart over the
  * same checkpoint appends nothing — spec-pinned). foreachBatch
  * itself is only at-least-once (a crash between the append and the
  * checkpoint commit replays the micro-batch), so the upsert keys its
  * rows on the Spark-assigned batchId and DYNAMIC-overwrites exactly
  * its own `batch_id=<id>` partitions (`Warehouse.upsertIvfFrom`):
  * a replay replaces what the interrupted attempt wrote instead of
  * double-appending — exactly-once in content (VectorStreamSpec pins
  * the double-apply case).
  */
object VectorStream {

  /** embeddings.parquet schema (readStream requires an explicit one). */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over an embedding landing directory.
    * `maxFilesPerTrigger` caps each micro-batch's file count (the
    * spec uses 1 to force multi-batch upserts from one drain).
    */
  def readEmbeddings(spark: SparkSession, landingDir: String,
                     maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(embeddingSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(landingDir)
  }

  /** Drain the landing stream into the index: one upsert per
    * micro-batch, AvailableNow (incremental-batch semantics — run,
    * catch up, stop; a deployment swaps the trigger for continuous
    * maintenance without touching the body).
    */
  def maintainIvf(spark: SparkSession, batches: DataFrame,
                  checkpoint: String, dir: String): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        graft.sources.Warehouse.upsertIvfFrom(
          b.select(org.apache.spark.sql.functions.col("vec_id"),
                   org.apache.spark.sql.functions.col("embedding")),
          dir, batchKey = batchId)
      }
      .start()
}
