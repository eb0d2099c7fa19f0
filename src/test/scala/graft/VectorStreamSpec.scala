package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}
import graft.streaming.VectorStream

/** Streaming IVF maintenance: batches landing in a directory are
  * upserted into the standing index exactly as d11's one-shot states,
  * and a checkpoint restart over the same landing appends nothing.
  */
class VectorStreamSpec extends SparkSpec {

  test("streamed upserts equal one-shot d11; restart appends nothing") {
    // standing index: everything but the arriving batch, frozen
    // routing (kmeansIters=0 = the one-shot's oracle-replayable form)
    Warehouse.buildIvf(spark, sf, kmeansIters = 0, excludeMod = 17)

    // land the batch as TWO parquet files (split by vec_id parity);
    // maxFilesPerTrigger=1 forces two separate micro-batch upserts
    val landing = Files.createTempDirectory("graft-vec-landing")
    val batch = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(17)) === 0)
    val nBatch = batch.count()
    assert(nBatch > 0)
    Seq(0, 1).foreach { par =>
      val part = Files.createTempDirectory(s"graft-vec-p$par")
      batch.filter(pmod(col("vec_id"), lit(2)) === par)
        .coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = Files.list(part)
      val f = try src.filter(_.toString.endsWith(".parquet")).findFirst().get()
              finally src.close()
      Files.copy(f, landing.resolve(s"b$par.parquet"))
    }

    val ckpt = Files.createTempDirectory("graft-vec-ckpt").toString
    def drain(): Unit = {
      val q = VectorStream.maintainIvf(spark,
        VectorStream.readEmbeddings(spark, landing.toString,
          maxFilesPerTrigger = Some(1)), ckpt, sf)
      q.awaitTermination()
    }
    drain()
    spark.catalog.refreshTable(Warehouse.tbl(sf, "graft_ivf_lists"))
    val rowsAfter = Warehouse.ivfLists(spark, sf).count()

    // probes over the maintained index answer exactly the one-shot d11
    val fromIndex = Warehouse.annIvfFlatIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    val oneShot = graft.operators.SimOps.annIvfIncremental(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(fromIndex == oneShot && fromIndex.nonEmpty)

    // restart over the same checkpoint: both files already committed —
    // the drain processes nothing and the index is unchanged
    drain()
    spark.catalog.refreshTable(Warehouse.tbl(sf, "graft_ivf_lists"))
    assert(Warehouse.ivfLists(spark, sf).count() == rowsAfter)

    // leave a full default index for any test that runs after
    Warehouse.buildIvf(spark, sf)
  }

  test("replayed upsert is exactly-once in content (same batchKey twice)") {
    // the crash-between-append-and-commit window: foreachBatch replays
    // the micro-batch with the SAME batchId — the dynamic partition
    // overwrite must replace the first attempt's rows, not double them
    Warehouse.buildIvf(spark, sf, kmeansIters = 0, excludeMod = 17)
    Warehouse.upsertIvf(spark, sf, batchMod = 17, batchKey = 7L)
    spark.catalog.refreshTable(Warehouse.tbl(sf, "graft_ivf_lists"))
    val afterOnce = Warehouse.ivfLists(spark, sf).count()
    val probeOnce = Warehouse.annIvfFlatIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    Warehouse.upsertIvf(spark, sf, batchMod = 17, batchKey = 7L)  // replay
    spark.catalog.refreshTable(Warehouse.tbl(sf, "graft_ivf_lists"))
    assert(Warehouse.ivfLists(spark, sf).count() == afterOnce,
      "replayed batch double-appended posting rows")
    val probeTwice = Warehouse.annIvfFlatIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(probeTwice == probeOnce && probeOnce.nonEmpty)
    // a DIFFERENT batch key must still append (it's a new batch)
    Warehouse.upsertIvf(spark, sf, batchMod = 17, batchKey = 8L)
    spark.catalog.refreshTable(Warehouse.tbl(sf, "graft_ivf_lists"))
    assert(Warehouse.ivfLists(spark, sf).count() > afterOnce)
    Warehouse.buildIvf(spark, sf)
  }
}
