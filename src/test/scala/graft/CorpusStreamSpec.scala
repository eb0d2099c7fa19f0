package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.{CorpusStream, EventStream}

/** The streaming corpus front door: enrichment must equal the batch
  * formulas, and replayed content must be dropped by dedup state
  * across micro-batches (the arm the dup-free corpus oracle cannot
  * exercise).
  */
case class IngestDoc(doc_id: Long, text: String, lang: String)

class CorpusStreamSpec extends SparkSpec {
  import graft.{IngestDoc => Doc}

  test("replayed content across micro-batches is dropped; enrichment matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CorpusStream.ingest(in.toDF())
      .writeStream.format("memory").queryName("corpus_ingest")
      .outputMode("append").start()
    try {
      // doc 9 and doc 7 carry IDENTICAL content in the SAME batch:
      // the deterministic winner must be the min doc_id (7), not an
      // arbitrary row
      in.addData(
        Doc(0L, "the quick spark table scans the fast row", "en"),
        Doc(1L, "join group merge sort batch window", "en"),
        Doc(9L, "twin content lands twice in one batch", "en"),
        Doc(7L, "twin content lands twice in one batch", "en"),
        Doc(2L, "data table row filter agg column", "de"))
      q.processAllAvailable()
      // batch 2: doc 3 replays doc 0's exact content (re-crawl), doc 4
      // is new — the replay must be dropped by fingerprint state even
      // though it arrives in a DIFFERENT micro-batch.
      in.addData(
        Doc(3L, "the quick spark table scans the fast row", "en"),
        Doc(4L, "stream state fold key value dup", "fr"))
      q.processAllAvailable()
      val out = spark.table("corpus_ingest").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(out.keySet == Set(0L, 1L, 2L, 4L, 7L), s"got ${out.keySet}")

      // enrichment equals the batch operators on the same docs
      val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
      Seq(Doc(0L, "the quick spark table scans the fast row", "en"),
          Doc(1L, "join group merge sort batch window", "en"),
          Doc(2L, "data table row filter agg column", "de"),
          Doc(7L, "twin content lands twice in one batch", "en"),
          Doc(4L, "stream state fold key value dup", "fr"))
        .toDF().withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val batchQ = graft.operators.TextOps.qualityScore(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Double]("quality"))).toMap
      val batchFp = graft.operators.TextOps.fingerprint(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
      out.foreach { case (id, r) =>
        assert(r.getAs[Long]("n_tokens") == batchQ(id)._1, s"doc $id tokens")
        assert(r.getAs[Double]("quality") == batchQ(id)._2, s"doc $id quality")
        assert(r.getAs[String]("fp") == batchFp(id), s"doc $id fp")
      }
    } finally q.stop()
  }

  test("ingest resumes from checkpoint: a replay arriving AFTER restart is still dropped") {
    import java.nio.file.{Files, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = Files.createTempDirectory("graft-ingest-resume")
    val streamDir = Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def writeDocs(docs: Seq[(Long, String, String)], name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ingest-part")
      docs.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val f = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
              finally ls.close()
      Files.copy(f, streamDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }

    def runOnce(): Unit = {
      val schema = spark.read.parquet(streamDir.toString).schema
      val q = graft.streaming.CorpusStream.ingest(
          spark.readStream.schema(schema).parquet(streamDir.toString))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: two distinct docs
    writeDocs(Seq((0L, "alpha beta gamma delta", "en"),
                  (1L, "epsilon zeta eta theta", "en")), "p1.parquet")
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2)

    // run 2 (fresh query, SAME checkpoint): doc 2 replays doc 0's
    // exact content, doc 3 is new — the fingerprint state must have
    // survived the restart for the replay to be dropped.
    writeDocs(Seq((2L, "alpha beta gamma delta", "en"),
                  (3L, "iota kappa lambda mu", "de")), "p2.parquet")
    runOnce()
    val out = spark.read.parquet(outDir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(0L, 1L, 3L),
      "cross-restart replay must be dropped; new content kept")
    val fps = out.map(_.getAs[String]("fp"))
    assert(fps.distinct.length == fps.length, "one row per distinct content")
  }

  test("p5 over the corpus directory equals the batch enrichment (identity dedup)") {
    val streamed = CorpusStream.streamIngest(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(streamed.length == docs.size, "dedup must be identity on the dup-free corpus")
    val q = graft.operators.TextOps.qualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    streamed.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("lang") == docs(id))
      assert(r.getAs[Double]("quality") == q(id), s"doc $id quality")
    }
  }

  test("streaming bloom gate equals the landed batch probe and plans stateless") {
    graft.sources.Warehouse.buildBloom(spark, sf)
    val streamed = CorpusStream.streamBloomGate(spark, sf)
      .collect().toSeq.map(_.toString)
    val batch = graft.sources.Warehouse.bloomDedupIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch && streamed.nonEmpty,
      "streaming gate verdicts differ from the landed batch probe")
    // stateless by construction: the standing set is the landed index,
    // not stream state — the micro-batch plan must carry no stateful op
    val plan = EventStream.lastMicroBatchPlan
    assert(plan.nonEmpty, "no micro-batch plan captured")
    Seq("StateStoreSave", "FlatMapGroupsWithState",
        "StreamingSymmetricHashJoin").foreach(op =>
      assert(!plan.contains(op), s"bloom gate planned stateful $op"))
  }

  test("streaming minhash gate equals the landed batch probe and runs stateless") {
    graft.sources.Warehouse.buildMinhash(spark, sf)
    val streamed = CorpusStream.streamMinhashGate(spark, sf)
      .collect().toSeq.map(_.toString)
    val batch = graft.sources.Warehouse.incrementalMinhashIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch && streamed.nonEmpty,
      "streaming minhash gate verdicts differ from the landed batch probe")
    assert(CorpusStream.lastGateStateOps == 0,
      "minhash gate stream placed a state store")
  }

  test("streaming phash gate equals the landed batch probe and runs stateless") {
    graft.sources.Warehouse.buildPhash(spark, sf)
    val streamed = CorpusStream.streamPhashGate(spark, sf)
      .collect().toSeq.map(_.toString)
    val batch = graft.sources.Warehouse.imageNearDupIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch && streamed.nonEmpty,
      "streaming phash gate verdicts differ from the landed batch probe")
    assert(CorpusStream.lastGateStateOps == 0,
      "phash gate stream placed a state store")
  }

  test("streaming audio gate equals the landed batch probe and runs stateless") {
    graft.sources.Warehouse.buildAudio(spark, sf)
    val streamed = CorpusStream.streamAudioGate(spark, sf)
      .collect().toSeq.map(_.toString)
    val batch = graft.sources.Warehouse.audioNearDupIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch && streamed.nonEmpty,
      "streaming audio gate verdicts differ from the landed batch probe")
    assert(CorpusStream.lastGateStateOps == 0,
      "audio gate stream placed a state store")
  }

  test("streaming nb quality gate equals the landed batch probe and runs stateless") {
    graft.sources.Warehouse.buildNbModel(spark, sf)
    val streamed = CorpusStream.streamNbGate(spark, sf)
      .collect().toSeq.map(_.toString)
    // batch probe over the SAME arriving slice against the landed model
    val batch = graft.operators.TextOps.nbScoreProbeFrom(
        Tables.documents(spark, sf)
          .filter(pmod(col("doc_id"),
                       lit(graft.operators.DedupOps.IncrementalNewMod)) === 0),
        sf)
      .collect().toSeq.map(_.toString)
    assert(streamed == batch && streamed.nonEmpty,
      "streaming nb gate verdicts differ from the landed batch probe")
    assert(CorpusStream.lastGateStateOps == 0,
      "nb gate stream placed a state store")
    // and the gate's verdict for a doc equals the full e17b row for it
    // (per-doc scoring against a fixed model — split-invariant)
    val full = graft.operators.TextOps.qualityClassifierIndexed(spark, sf)
      .filter(pmod(col("doc_id"),
                   lit(graft.operators.DedupOps.IncrementalNewMod)) === 0)
      .collect().toSeq.map(_.toString)
    assert(streamed == full)
  }

  test("streamed posting upserts equal the full one-shot e16; restart appends nothing") {
    import graft.sources.Warehouse
    // standing index: everything but the arriving slice (doc_id % 10)
    Warehouse.buildPostings(spark, sf, excludeMod = 10)

    // land the batch as TWO parquet files (doc_id parity split);
    // maxFilesPerTrigger is the file stream's own option — use two
    // files in one landing dir so AvailableNow drains two micro-batch
    // upserts (the VectorStreamSpec shape)
    val landing = java.nio.file.Files.createTempDirectory("graft-post-landing")
    val batch = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    assert(batch.count() > 0)
    Seq(0, 1).foreach { par =>
      val part = java.nio.file.Files.createTempDirectory(s"graft-post-p$par")
      batch.filter(pmod(col("doc_id"), lit(2)) === par)
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
      val f = try src.filter(_.toString.endsWith(".parquet")).findFirst().get()
              finally src.close()
      java.nio.file.Files.copy(f, landing.resolve(s"b$par.parquet"))
    }

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-post-ckpt").toString
    def drain(): Unit = {
      val src = spark.readStream
        .schema(Tables.documents(spark, sf).schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      CorpusStream.maintainPostings(src, sf, ckpt).awaitTermination()
    }
    drain()
    spark.catalog.refreshTable(
      graft.sources.Warehouse.tbl(sf, "graft_post_lists"))
    spark.catalog.refreshTable(
      graft.sources.Warehouse.tbl(sf, "graft_post_stats"))
    val rowsAfter = spark.table(graft.sources.Warehouse.tbl(sf, "graft_post_lists")).count()
    // two micro-batches → two new stats rows beside the base build's
    assert(spark.table(graft.sources.Warehouse.tbl(sf, "graft_post_stats")).count() == 3L)

    // probes over the maintained index answer exactly the one-shot e16
    // over the FULL corpus (union of standing + both micro-batches)
    val fromIndex = graft.operators.RetrievalOps
      .bm25SearchIndexedUnchecked(spark, sf).collect().toSeq.map(_.toString)
    val oneShot = graft.operators.RetrievalOps.bm25Search(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(fromIndex == oneShot && fromIndex.nonEmpty)

    // restart over the same checkpoint: both files committed — the
    // drain processes nothing and the index is unchanged
    drain()
    spark.catalog.refreshTable(
      graft.sources.Warehouse.tbl(sf, "graft_post_lists"))
    assert(spark.table(graft.sources.Warehouse.tbl(sf, "graft_post_lists")).count() == rowsAfter)

    // leave a full default index for any test that runs after
    Warehouse.buildPostings(spark, sf)
  }

  test("JSONL landing path emits row-for-row what the parquet path emits") {
    // crawlers drop newline-delimited JSON; the ingest flow must be
    // source-format-agnostic. Export the corpus as JSONL, stream it
    // through the SAME enrichment+dedup, compare against the parquet
    // stream's output.
    val landing = java.nio.file.Files.createTempDirectory("graft_jsonl_")
    Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").json(landing.toString + "/data")
    def rowsOf(src: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Double)] =
      EventStream.runToBatch(spark, CorpusStream.ingest(src).toDF(), "append")
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"),
                   r.getAs[Long]("n_tokens"), r.getAs[Double]("quality"))).toSeq
    val viaJsonl = rowsOf(
      CorpusStream.readDocumentsJsonl(spark, landing.toString + "/data"))
    val viaParquet = rowsOf(CorpusStream.readDocuments(spark, sf))
    assert(viaJsonl.nonEmpty && viaJsonl == viaParquet)
  }
}
