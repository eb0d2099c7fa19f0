package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimOps

/** Scratch experiment: IVF recall/scan-fraction grid at one SF.
  * Not part of the library surface — run with
  * `sbt "runMain graft.tools.IvfGrid /root/testdata/sf0.1"`.
  */
object IvfGrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("ivf-grid").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = SimOps.annBruteforce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }

    for (cells <- Seq(16, 32, 64, 128);
         np <- Seq(2, 4, 8);
         na <- Seq(2, 4);
         km <- Seq(0, 2)) {
      val t0 = System.nanoTime()
      val got = SimOps.annIvf(spark, dir, nlist = cells, nProbe = np,
                              kmeansIters = km, nAssign = na).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val byQ = got.groupBy(_.getAs[Long]("query_id"))
      val recalls = exact.map { case (q, ex) =>
        val iv = byQ.getOrElse(q, Array.empty).map(_.getAs[Long]("cand_id")).toSet
        iv.intersect(ex).size.toDouble / ex.size
      }
      val rec = recalls.sum / recalls.size
      val frac = np.toDouble * na / cells
      println(f"nlist=$cells%4d np=$np%2d na=$na km=$km rec=$rec%.3f scan~${frac * 100}%5.1f%% t=$sec%.1fs")
    }
    spark.stop()
  }
}
