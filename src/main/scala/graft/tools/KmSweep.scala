package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.SimOps

/** Scratch sweep: Lloyd-iteration count vs recall at the registered
  * routing point (nlist=64/nProbe=8/nAssign=4). Dev tool only.
  */
object KmSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("km-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = SimOps.annBruteforce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    for (km <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      val got = SimOps.annIvf(spark, dir, kmeansIters = km).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val byQ = got.groupBy(_.getAs[Long]("query_id"))
      val rec = exact.map { case (q, ex) =>
        byQ.getOrElse(q, Array.empty).map(_.getAs[Long]("cand_id")).toSet
          .intersect(ex).size.toDouble / ex.size }.sum / exact.size
      println(f"km=$km rec=$rec%.4f t=$sec%.1fs")
    }
    spark.stop()
  }
}
