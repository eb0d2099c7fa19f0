package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimOps
import graft.sources.Warehouse

/** Scratch experiment: recall + probe time of the BUILD-ONCE landed
  * IVF(-PQ) index (Lloyd-refined routing/codebooks) vs rerank margin.
  * Not part of the library surface — run with
  * `sbt "runMain graft.tools.IndexedGrid /root/testdata/sf0.1"`.
  */
object IndexedGrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("indexed-grid").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = SimOps.annBruteforce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    def recallOf(got: Array[org.apache.spark.sql.Row]): Double = {
      val byQ = got.groupBy(_.getAs[Long]("query_id"))
      val rs = exact.map { case (q, ex) =>
        val f = byQ.getOrElse(q, Array.empty)
          .map(_.getAs[Long]("cand_id")).toSet
        f.intersect(ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }

    val tb = System.nanoTime()
    Warehouse.buildIvf(spark, dir)
    println(f"build(kmeans2) t=${(System.nanoTime() - tb) / 1e9}%.1fs")

    val t5 = System.nanoTime()
    val d5 = Warehouse.annIvfFlatIndexed(spark, dir).collect()
    println(f"d5_indexed   rec=${recallOf(d5)}%.4f t=${(System.nanoTime() - t5) / 1e9}%.1fs")

    for (rerank <- Seq(8, 16, 24)) {
      val t0 = System.nanoTime()
      val got = Warehouse.annIvfPqIndexed(spark, dir, rerank = rerank).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"d10_indexed rerank=$rerank%2d rec=${recallOf(got)}%.4f t=$sec%.1fs")
    }
    spark.stop()
  }
}
