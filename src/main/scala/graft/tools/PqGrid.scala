package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimOps

/** Scratch experiment: d10 IVF-PQ recall vs rerank margin / codebook
  * density at one SF. Not part of the library surface — run with
  * `sbt "runMain graft.tools.PqGrid /root/testdata/sf0.1"`.
  */
object PqGrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("pq-grid").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = SimOps.annBruteforce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }

    for (rerank <- Seq(2, 4, 8, 16);
         ks <- Seq(256, 64)) {
      val t0 = System.nanoTime()
      val got = SimOps.annIvfPq(spark, dir, rerank = rerank, ks = ks)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val byQ = got.groupBy(_.getAs[Long]("query_id"))
      val recalls = exact.map { case (q, ex) =>
        val f = byQ.getOrElse(q, Array.empty).map(_.getAs[Long]("cand_id")).toSet
        f.intersect(ex).size.toDouble / ex.size
      }
      val rec = recalls.sum / recalls.size
      println(f"rerank=$rerank%2d ks=$ks%3d rec=$rec%.3f t=$sec%.1fs")
    }
    spark.stop()
  }
}
