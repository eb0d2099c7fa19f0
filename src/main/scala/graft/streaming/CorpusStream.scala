package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.TextOps

/** One enriched corpus row (p5's output shape). */
case class IngestRow(doc_id: Long, lang: String, fp: String,
                     n_tokens: Long, quality: Double)

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

  /** The same landing stream over newline-delimited JSON — what
    * crawlers actually drop. Schema is pinned explicitly (readStream
    * never infers), typed to match the parquet table so every
    * downstream stage — enrichment Columns, dedup state, sinks — is
    * IDENTICAL: the source format is a one-line swap, which is the
    * point of keeping ingest declarative. CorpusStreamSpec proves the
    * JSONL path emits row-for-row what the parquet path emits.
    */
  def readDocumentsJsonl(spark: SparkSession, landingDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.readStream.schema(schema).json(landingDir)
  }

  /** Stateless per-row enrichment (content fingerprint + e2's quality
    * score + token count) + stateful exact-dedup keyed on the
    * fingerprint. The winner per distinct content is DETERMINISTIC:
    * the min-doc_id row of the first micro-batch that carries the
    * content (a dropDuplicates would keep an arbitrary row within the
    * batch — nondeterministic under duplicate content, which the sf0.1
    * corpus actually has). Replays in later batches are dropped by
    * state. NULL text is excluded explicitly (md5(NULL) would collapse
    * every null doc onto one NULL fingerprint).
    *
    * State is one fingerprint per distinct content — unbounded over
    * the stream's life BY DESIGN: exact dedup is a global set. A
    * deployment whose re-crawl window is bounded swaps in a
    * watermarked timeout on an ingest-time column, exactly as
    * EventStream.dedupStream does for events.
    */
  def ingest(docs: DataFrame): Dataset[IngestRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"), col("lang"),
        md5(col("text")).as("fp"),
        size(TextOps.Quality.toks).cast("long").as("n_tokens"),
        round(TextOps.Quality.score, 4).as("quality"))
      .as[IngestRow]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[IngestRow], seen: GroupState[Boolean]) =>
          if (seen.exists) Iterator.empty
          else {
            seen.update(true)
            Iterator.single(rows.minBy(_.doc_id))
          })
  }

  /** p5: the ingest run over the current corpus directory
    * (AvailableNow → memory sink, one micro-batch) — so the kept row
    * per distinct content is exactly the global min-doc_id one, which
    * is what the duplicate-robust oracle computes (row_number over fp
    * ordered by doc_id). Replay-dropping across batches and across a
    * checkpoint restart is MemoryStream/file-source-tested in
    * CorpusStreamSpec.
    */
  def streamIngest(spark: SparkSession, dir: String): DataFrame =
    // requireSingleBatch: the global-min-doc_id winner (what the
    // blessed row_number oracle computes) is only batch-independent
    // because the whole corpus lands in one AvailableNow micro-batch —
    // split delivery would make the kept row first-batch-dependent.
    EventStream.runToBatch(spark, ingest(readDocuments(spark, dir)).toDF(),
        "append", requireSingleBatch = true)
      .orderBy(col("doc_id"))

  /** c12's landed membership gate as a STREAMING stage — the crawler's
    * streaming front door: arriving documents fingerprint their word
    * set per micro-batch, the broadcast shard blooms
    * (graft_bloom_shards, Warehouse.buildBloom) gate each row, and
    * only the SURVIVORS reach the stream-STATIC left join against the
    * PERSISTED fingerprint store (graft_bloom_fps); bloom misses are
    * routed AROUND the join and unioned back as novel — a miss is
    * definitively novel (no false negatives, the KernelPropertySpec
    * contract), so skipping its probe cannot change the result and
    * the gate stays semantics-invisible exactly as in batch c12.
    * The verdict is a projected column, never a join predicate: a
    * left-side-only predicate inside a left-outer condition cannot
    * push below the join, so it would gate nothing (round-12 advice
    * fix — this is the batch bloomLabels shape).
    *
    * STATELESS by construction — the standing set lives in the landed
    * index, not in stream state (contrast `ingest`, whose exact-dedup
    * state grows with distinct content seen on the stream itself):
    * the spec asserts the micro-batch plan carries no stateful
    * operator, so there is no state store to size, checkpoint or
    * expire. At warehouse scale the fp store is bucket-landed and the
    * gate prunes the probe stream to ≈ true-dups + fpp·batch before
    * the join, so the per-micro-batch cost tracks the batch, not the
    * catalog.
    */
  def bloomGate(docs: DataFrame, dir: String): DataFrame = {
    import graft.sources.Warehouse.tbl
    val spark = docs.sparkSession
    import graft.operators.DedupOps
    // bounded: exactly BloomShards rows at ANY catalog size
    val shardMap = spark.table(tbl(dir, "graft_bloom_shards")).collect()
      .map(r => r.getInt(0) ->
        graft.functions.BloomAgg.deserialize(r.getAs[Array[Byte]](1))).toMap
    val bcast = spark.sparkContext.broadcast(shardMap)
    val mightContain = udf((shard: Int, fp: Long) =>
      bcast.value.get(shard).exists(_.mightContainLong(fp)))
    val withFp = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), DedupOps.wordSetFp(col("text")).as("fp"))
      .withColumn("might",
        mightContain(pmod(col("fp"), lit(DedupOps.BloomShards.toLong))
                       .cast("int"), col("fp")))
    // deletion layer: a tombstoned owner drops from the static store
    // side (the bloomDedupIndexed contract; the bloom itself only
    // prunes, so a stale positive just misses here and reports novel)
    val fps = graft.sources.Warehouse.exceptTombstoned(
        spark.table(tbl(dir, "graft_bloom_fps")), dir, "ex_id")
      .select(col("fp").as("sfp"), col("ex_id").as("dup_of"))
    // survivors (≈ true dups + fpp·batch) probe the store; misses skip
    // it entirely — the per-micro-batch join input tracks the dup rate,
    // not the batch size
    val probed = withFp.filter(col("might"))
      .join(fps, col("fp") === col("sfp"), "left")
      .select(col("doc_id"), col("dup_of"))
    val novel = withFp.filter(!col("might"))
      .select(col("doc_id"), lit(null).cast("long").as("dup_of"))
    probed.unionAll(novel)
      .select(col("doc_id"), col("dup_of"),
              col("dup_of").isNotNull.as("is_dup"))
  }

  /** The gate run over the arriving batch slice (c12's doc_id % 10
    * == 0 split) of the corpus directory — AvailableNow to a memory
    * sink, the G-family harness.
    */
  def streamBloomGate(spark: SparkSession, dir: String,
                      newMod: Int = graft.operators.DedupOps.IncrementalNewMod): DataFrame =
    EventStream.runToBatch(spark,
        bloomGate(readDocuments(spark, dir)
          .filter(pmod(col("doc_id"), lit(newMod)) === 0), dir),
        "append")
      .orderBy(col("doc_id"))

  /** p11's landed fuzzy gate as a STREAMING stage — the fuzzy twin of
    * [[bloomGate]], completing the gate family's streaming front doors
    * (c12 exact text / p11 fuzzy text / f7 image). MinHash signatures
    * need a per-doc aggregation, which as a raw stream transform would
    * plan a STATEFUL operator — so the stage runs through foreachBatch
    * (the VectorStream.maintainIvf pattern): each micro-batch is a
    * bounded BATCH frame that computes its own signatures (per-doc
    * computation, so batch-local ≡ union-corpus — the p11 exactness
    * property that also makes verdicts micro-batch-split-invariant)
    * and probes the PERSISTED band index (graft_minhash_bands/_sigs,
    * Warehouse.buildMinhash) via a broadcast of the batch side.
    * Statelessness is structural: the stream plan is source →
    * foreachBatch sink — no state store exists to size, checkpoint or
    * expire (the spec asserts zero stateOperators in the progress).
    */
  def minhashGate(docs: DataFrame, dir: String, checkpoint: String,
                  tau: Double = 0.5)
                 (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(graft.operators.DedupOps.minhashProbeFrom(b, dir, tau), id)
      }
      .start()

  /** f7's landed image gate as a STREAMING stage — same foreachBatch
    * shape as [[minhashGate]]: each arriving micro-batch hashes only
    * its own images (real-aHash/stub seam unchanged) and probes the
    * persisted band index + signature store (graft_phash_bands/_sigs,
    * Warehouse.buildPhash); the standing catalog is never re-read.
    */
  def phashGate(media: DataFrame, dir: String, checkpoint: String,
                maxHamming: Int = 3)
               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(graft.operators.MultimodalOps.phashProbeFrom(b, dir, maxHamming),
             id)
      }
      .start()

  /** f8b's landed audio gate as a STREAMING stage — same foreachBatch
    * shape as [[phashGate]]: each arriving micro-batch fingerprints
    * only its own recordings (real-PCM16/stub seam unchanged) and
    * probes the persisted band index + signature store
    * (graft_audio_bands/_sigs, Warehouse.buildAudio); the standing
    * catalog is never re-read.
    */
  def audioGate(media: DataFrame, dir: String, checkpoint: String,
                maxHamming: Int = 3)
               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(graft.operators.MultimodalOps.audioProbeFrom(b, dir, maxHamming),
             id)
      }
      .start()

  /** e17b's landed quality model as a STREAMING stage — the learned
    * front door that completes the gate family (exact bloomGate /
    * fuzzy minhashGate / image phashGate / audio audioGate / THIS):
    * each arriving micro-batch scores ITSELF against the PERSISTED
    * NB weight table + priors (graft_nb_weights/_priors,
    * Warehouse.buildNbModel) — scoring is per-doc against a fixed
    * model, so verdicts are micro-batch-split-invariant and identical
    * to the batch probe (spec-proven). Same foreachBatch shape as
    * [[minhashGate]]: stateless by construction — the model lives in
    * the landed tables, not in stream state; zero stateOperators
    * asserted.
    */
  def nbGate(docs: DataFrame, dir: String, checkpoint: String,
             refSource: String = "src0")
            (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(graft.operators.TextOps.nbScoreProbeFrom(b, dir, refSource), id)
      }
      .start()

  /** Streaming maintenance of the landed posting index — the text
    * twin of VectorStream.maintainIvf: a crawler drops document
    * batches into a landing directory; each micro-batch tokenizes
    * ITSELF and appends its posting rows + one stats row under its own
    * batch_id partitions (`Warehouse.upsertPostingsFrom`) — the
    * standing postings are never read or re-sharded, and probe-side
    * (N, avgdl) stays exact because stats are summable counts.
    * Exactly-once in content under foreachBatch's at-least-once
    * replay: the upsert DYNAMIC-overwrites its own batch_id
    * partitions, so a replayed micro-batch replaces what the
    * interrupted attempt wrote (the upsertIvfFrom contract;
    * CorpusStreamSpec pins drain-equivalence and restart-no-op).
    */
  def maintainPostings(docs: DataFrame, dir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        graft.sources.Warehouse.upsertPostingsFrom(
          b.select(col("doc_id"), col("text")), dir, batchKey = batchId)
      }
      .start()

  /** Streaming DELETION maintenance — the drain for the reference's
    * cancel/burn-shaped events applied to the corpus indexes (round
    * 14; the retraction twin of [[maintainPostings]]): each arriving
    * micro-batch of doc ids lands through `Warehouse.deleteDocs` with
    * its Spark batchId as the tombstone batch key, so the ids stop
    * serving from EVERY landed probe at the next read and the BM25
    * stats delta stays exact per batch. Exactly-once under replay by
    * the deleteDocs dynamic-overwrite contract (a replayed micro-batch
    * rewrites its own (scope, batch_id) partitions; DeletionSpec pins
    * the restart no-op). The batchId key space belongs to this
    * checkpoint — mix manual deleteDocs calls only with disjoint
    * batchKeys (the upsertPostings/maintainPostings convention).
    */
  def maintainTombstones(deletes: DataFrame, dir: String, checkpoint: String,
                         scope: String = graft.sources.Warehouse.LiveScope)
      : org.apache.spark.sql.streaming.StreamingQuery =
    deletes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        graft.sources.Warehouse.deleteDocs(
          b.sparkSession, dir, b.select(col("doc_id")), scope,
          batchKey = batchId)
      }
      .start()

  /** Max state-operator count observed across the most recent
    * [[runGate]] stream's progress — the statelessness evidence the
    * gate specs assert (0 = no state store ever placed).
    */
  @volatile var lastGateStateOps: Int = -1

  /** Drive a foreachBatch gate over an AvailableNow source, collecting
    * every micro-batch's verdicts. Harness only — the driver-side
    * collect is this test/verify harness's sink, NOT the deployment
    * shape (a deployment points the sink at its accept/reject flow and
    * never funnels verdicts through the driver). An arriving slice
    * that produces NO micro-batch yields an EMPTY verdict frame with
    * the probe's schema (`emptySchema` — each gate derives it from its
    * probe applied to an empty batch), matching the batch probes'
    * empty-input behavior instead of throwing.
    */
  private def runGate(spark: SparkSession,
                      emptySchema: => org.apache.spark.sql.types.StructType,
                      start: (String, (DataFrame, Long) => Unit) =>
                        org.apache.spark.sql.streaming.StreamingQuery)
      : DataFrame = {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_gate_ckpt").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    @volatile var schema: org.apache.spark.sql.types.StructType = null
    val q = start(ckpt, (out, _) => {
      val rows = out.collect()
      buf.synchronized { buf ++= rows; schema = out.schema }
    })
    q.awaitTermination()
    lastGateStateOps = q.recentProgress
      .map(p => Option(p.stateOperators).map(_.length).getOrElse(0))
      .foldLeft(0)(math.max)
    val sch = if (schema != null) schema else emptySchema
    spark.createDataFrame(spark.sparkContext.parallelize(buf.toSeq), sch)
      .orderBy(col("doc_id"))
  }

  /** An empty batch frame with the documents-table schema — the input
    * the gates feed their probes to derive a no-micro-batch verdict
    * schema without touching the stream.
    */
  private def emptyDocs(spark: SparkSession, dir: String): DataFrame = {
    val (_, schema) = StreamFiles.dirAndSchema(spark, dir, "documents.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                          schema)
  }

  /** [[minhashGate]] over the corpus directory's arriving slice. */
  def streamMinhashGate(spark: SparkSession, dir: String, tau: Double = 0.5,
                        newMod: Int = graft.operators.DedupOps.IncrementalNewMod)
      : DataFrame =
    runGate(spark,
      graft.operators.DedupOps.minhashProbeFrom(emptyDocs(spark, dir), dir,
                                                tau).schema,
      (ckpt, sink) =>
        minhashGate(readDocuments(spark, dir)
          .filter(pmod(col("doc_id"), lit(newMod)) === 0), dir, ckpt,
          tau)(sink))

  /** [[audioGate]] over the corpus directory's arriving audio slice. */
  def streamAudioGate(spark: SparkSession, dir: String, maxHamming: Int = 3,
                      newMod: Int =
                        graft.operators.MultimodalOps.NearDupBatchMod)
      : DataFrame =
    runGate(spark,
      graft.operators.MultimodalOps.audioProbeFrom(
        graft.operators.MultimodalOps.mediaFrom(emptyDocs(spark, dir)), dir,
        maxHamming).schema,
      (ckpt, sink) =>
        audioGate(graft.operators.MultimodalOps
            .mediaFrom(readDocuments(spark, dir))
            .filter(col("media_type") === "audio" &&
                    pmod(col("doc_id"), lit(newMod)) === 0),
          dir, ckpt, maxHamming)(sink))

  /** [[nbGate]] over the corpus directory's arriving slice. */
  def streamNbGate(spark: SparkSession, dir: String,
                   refSource: String = "src0",
                   newMod: Int = graft.operators.DedupOps.IncrementalNewMod)
      : DataFrame =
    runGate(spark,
      graft.operators.TextOps.nbScoreProbeFrom(emptyDocs(spark, dir), dir,
                                               refSource).schema,
      (ckpt, sink) =>
        nbGate(readDocuments(spark, dir)
          .filter(pmod(col("doc_id"), lit(newMod)) === 0), dir, ckpt,
          refSource)(sink))

  /** [[phashGate]] over the corpus directory's arriving image slice. */
  def streamPhashGate(spark: SparkSession, dir: String, maxHamming: Int = 3,
                      newMod: Int =
                        graft.operators.MultimodalOps.NearDupBatchMod)
      : DataFrame =
    runGate(spark,
      graft.operators.MultimodalOps.phashProbeFrom(
        graft.operators.MultimodalOps.mediaFrom(emptyDocs(spark, dir)), dir,
        maxHamming).schema,
      (ckpt, sink) =>
        phashGate(graft.operators.MultimodalOps
            .mediaFrom(readDocuments(spark, dir))
            .filter(col("media_type") === "image" &&
                    pmod(col("doc_id"), lit(newMod)) === 0),
          dir, ckpt, maxHamming)(sink))
}
