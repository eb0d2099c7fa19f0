package graft

import org.apache.spark.sql.functions._
import graft.streaming.CorpusStream

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
      in.addData(
        Doc(0L, "the quick spark table scans the fast row", "en"),
        Doc(1L, "join group merge sort batch window", "en"),
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
      assert(out.keySet == Set(0L, 1L, 2L, 4L), s"got ${out.keySet}")

      // enrichment equals the batch operators on the same docs
      val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
      Seq(Doc(0L, "the quick spark table scans the fast row", "en"),
          Doc(1L, "join group merge sort batch window", "en"),
          Doc(2L, "data table row filter agg column", "de"),
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
}
