package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate a Zipf-vocabulary documents table (round 14 — verdict item
  * 4/"what's missing"): the GenScale text decades use a 31·SF-word
  * synthetic vocabulary whose per-term df is CORPUS-PROPORTIONAL —
  * degenerate for retrieval curves, since real text has a Zipf rank-
  * frequency law and a vocabulary that grows ~√N (Heaps' law), which
  * is exactly what bounds posting-list df for non-stopword terms. This
  * tool materializes that shape so the e16b/d17b/e17b "df is
  * vocabulary-bounded under Zipf" claim becomes a measured curve
  * instead of a disclosure (ZipfBench runs the probes; the old
  * degenerate-vocab decade rows stay in BASELINE.md as the foil).
  *
  * Construction (deterministic, hash-driven, no RNG state):
  *  - N = 5000·reps docs, ids base + r·10^7 (the GenScale id scheme,
  *    so a GenScale embeddings table for the same reps aligns
  *    doc_id == vec_id for d17b).
  *  - vocabulary V = 2000·√reps ("w1".."wV"), global across replicas.
  *  - token at (doc, pos): u = h(doc,pos)/2^20 ∈ [0,1), rank =
  *    ⌊V^u⌋ — the inverse CDF of Zipf s=1 (P(rank ≤ k) = ln k/ln V),
  *    so rank-1 terms are corpus stopwords (df ≈ N) and df decays
  *    1/(k·ln V) down a tail that WIDENS as the corpus grows.
  *  - dl = 24 + h(doc) mod 16 (mean ≈ 31.5, the synth corpus's shape).
  *
  * Writes ONLY documents.parquet; run GenScale first into the same out
  * dir when the vector side is needed (it also writes documents —
  * run THIS second so the Zipf table wins).
  *
  * Run: `sbt "runMain graft.tools.GenZipf <outDir> <reps>"`.
  * Not part of the library surface.
  */
object GenZipf {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/testdata_zipf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val nBase = 5000L
    val vocab = math.max(64L, math.round(2000.0 * math.sqrt(reps.toDouble)))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("gen-zipf").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Off = 10000000L
    val nOut = math.min(256, math.max(32, reps * 4))

    val ids = spark.range(0, nBase, 1, 32)
      .crossJoin(spark.range(0, reps, 1, 1).select(col("id").as("r")))
      .select((col("id") + col("r") * lit(Off)).as("doc_id"))
    val dl = (pmod(xxhash64(col("doc_id"), lit("dl")), lit(16L)) + lit(24L))
      .cast("int")
    val docs = ids.select(
      col("doc_id"),
      array_join(
        transform(sequence(lit(0), dl - lit(1)), i => {
          val ui = pmod(xxhash64(col("doc_id"), i), lit(1048576L))
            .cast("double") / lit(1048576.0d)
          concat(lit("w"), greatest(lit(1L),
            floor(pow(lit(vocab.toDouble), ui)).cast("long")))
        }), " ").as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("doc_id"), lit(20L))).as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(nOut).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    println(s"[gen-zipf] wrote ${nBase * reps} docs, vocab=$vocab -> $out")
    spark.stop()
  }
}
