package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Warehouse
import graft.operators.{RetrievalOps, TextOps}

/** Measure the landed text probes on a Zipf-vocabulary corpus pair
  * (GenZipf output at two scales) — the decade evidence for "df is
  * vocabulary-bounded under Zipf" (round 14): per dir, land the
  * posting index / NB model UNTIMED (the ScaleBench prep convention),
  * then time
  *  - e16b-shaped BM25 probes over a rank-spanning query workload
  *    drawn FROM the Zipf vocabulary (stopword, mid, tail ranks —
  *    the fixed literal e16 workload would miss this vocabulary),
  *  - d17b (hybrid MLT probe — its idf-weighted term selection is
  *    exactly what a Zipf corpus exists to exercise: top-tf terms are
  *    stopwords, selection must dodge them), and
  *  - e17b (landed NB scoring — corpus-linear by definition, the
  *    control row),
  * and report per-query-term df so the curve's WHY is in the artifact:
  * stopword df tracks N while mid/tail df is vocabulary-bounded.
  *
  * Run: `sbt "runMain graft.tools.ZipfBench <baseDir> <scaledDir>
  * [repeats=2]"` after GenScale+GenZipf into both dirs.
  * Not part of the library surface.
  */
object ZipfBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/repo/testdata_zipf1")
    val scaled = args.lift(1).getOrElse("/root/repo/testdata_zipf10")
    val repeats = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.build("graft-zipf-bench")

    // rank-spanning workload: stopwords (1-8), mid ranks, tail ranks —
    // tail picks are clamped into the BASE vocabulary so both dirs run
    // the same terms and the comparison is apples-to-apples
    val workload: Seq[(Int, String)] = Seq(
      1 -> "w1 w3", 2 -> "w8 w21", 3 -> "w55 w144", 4 -> "w377 w610",
      5 -> "w987 w1597", 6 -> "w1800 w1999", 7 -> "w2 w233 w1400",
      8 -> "w13 w89 w1900")

    def qterms(s: SparkSession): DataFrame = {
      import s.implicits._
      workload.toDF("query_id", "qtext")
        .select(col("query_id").cast("long").as("query_id"),
                explode(split(col("qtext"), " ")).as("term"))
    }

    def time(df: => DataFrame): Double = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

    def measure(dir: String): Map[String, Double] = {
      Warehouse.ensurePostings(spark, dir)
      Warehouse.ensureIvf(spark, dir, kmeansIters = 0)
      Warehouse.ensureNbModel(spark, dir)
      Map(
        "e16b_zipf" -> time(RetrievalOps.bm25RankIndexed(
          spark, dir, qterms(spark), k = 10, exclSelf = false,
          maxTerms = 8)),
        "d17b_zipf" -> time(RetrievalOps.hybridRetrievalIndexed(spark, dir)),
        "e17b_zipf" -> time(TextOps.qualityClassifierIndexed(spark, dir)))
    }

    def dfStats(dir: String): String = {
      val terms = qterms(spark).select(col("term")).distinct()
        .withColumn("tb", RetrievalOps.termBucket(col("term")))
      val dfs = Warehouse.postLists(spark, dir)
        .join(broadcast(terms), Seq("tb", "term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .orderBy(col("term")).collect()
      val n = Warehouse.postStats(spark, dir)
        .agg(sum(col("n_docs"))).collect()(0).getLong(0)
      val m = dfs.map(r => s""""${r.getString(0)}":${r.getLong(1)}""")
        .mkString("{", ",", "}")
      s"""{"n_docs":$n,"df":$m}"""
    }

    val b = measure(base)
    val s2 = measure(scaled)
    def obj(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
        .mkString("{", ",", "}")
    val ratios = b.keys.toSeq.sorted.map { k =>
      s""""$k":${f"${s2(k) / b(k)}%.2f"}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"zipf_bench","base":"$base","scaled":"$scaled","repeats":$repeats,"base_sec":${obj(b)},"scaled_sec":${obj(s2)},"ratio":$ratios,"base_df":${dfStats(base)},"scaled_df":${dfStats(scaled)}}""")
    spark.stop()
  }
}
