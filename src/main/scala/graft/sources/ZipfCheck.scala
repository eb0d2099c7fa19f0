package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The driver-checked Zipf-vocabulary corpus (round 15, verdict item
  * 5): GenZipf's corpora made the retrieval DECADES non-degenerate,
  * but they are bench-only — correctness on a Zipf vocabulary was
  * never hash-proven through the DuckDB gate. This corpus is that
  * proof's substrate: the same inverse-CDF Zipf(s=1) construction
  * (token rank = ⌊V^u⌋, so rank-1 terms are corpus stopwords with
  * df ≈ N and the tail decays 1/(k·ln V)), but driven by PURE 64-bit
  * arithmetic instead of xxhash64 — so the DuckDB oracle re-derives
  * the corpus itself in SQL (a `documents` CTE over generate_series)
  * and the replay stays fully self-contained: no interpolated data
  * blobs, no external reads, no circularity (only the corpus
  * CONSTRUCTION is shared; BM25 re-derives independently on both
  * sides).
  *
  * Determinism across engines: every token is
  * `w⌊V^(h/2^20)⌋` with h = (doc·2654435761 + pos·40503) mod 2^20 —
  * integer ops are exact in both engines, and pow/floor sit far from
  * integer boundaries for all 2^20 grid points at V = 96 (verified by
  * the spec's cross-engine hash and the driver gate itself).
  */
object ZipfCheck {

  val NDocs = 500L
  val Vocab = 96L

  /** Rank-spanning literal workload (the e16 Bm25Queries convention):
    * stopword-heavy, mid-rank, and tail queries — w95 still occurs
    * ~1/(95·ln 96) per token ≈ 36 times in the corpus.
    */
  val Queries: Seq[(Int, String)] = Seq(
    1 -> "w1 w2 w3",
    2 -> "w5 w11 w24",
    3 -> "w30 w45",
    4 -> "w60 w77 w90",
    5 -> "w8 w50 w95",
    6 -> "w2 w19 w64")

  /** The corpus as a DataFrame — the construction the oracle SQL
    * mirrors token-for-token. dl = 24 + (id·48271 mod 16), mean ≈ 31.5
    * (the GenZipf shape).
    */
  def docsDf(spark: SparkSession): DataFrame = {
    val dl = (lit(24L) + pmod(col("id") * lit(48271L), lit(16L))).cast("int")
    spark.range(0L, NDocs, 1L, 4)
      .select(
        col("id").as("doc_id"),
        array_join(
          transform(sequence(lit(0), dl - lit(1)), p =>
            concat(lit("w"), greatest(lit(1L),
              floor(pow(lit(Vocab.toDouble),
                pmod(col("id") * lit(2654435761L) +
                       p.cast("long") * lit(40503L),
                     lit(1048576L)).cast("double") / lit(1048576.0d)))
                .cast("long")))), " ").as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20L))).as("source"))
  }

  /** Materialize the corpus under the session warehouse (idempotent —
    * the content is deterministic, so an existing committed write is
    * reused and the posting index amortizes across runs through the
    * ordinary corpus-fingerprint gate) and return its corpus dir.
    */
  def corpusDir(spark: SparkSession): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, "graft_zipf_check")
    val docs = new java.io.File(dir, "documents.parquet")
    if (!new java.io.File(docs, "_SUCCESS").exists()) {
      docsDf(spark).coalesce(2).write.mode("overwrite")
        .parquet(docs.getAbsolutePath)
    }
    dir.getAbsolutePath
  }
}
