package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate a ×N scale-up slice of the synthetic corpus tables for
  * scaling-curve evidence (SURVEY §6): the sf0.1 suite is fixed-cost-
  * bound, so the curve needs a data-bound point. Deterministic replica
  * construction, chosen so each workload's STRUCTURE scales linearly
  * instead of degenerating:
  *
  *  - documents: ids offset per replica; every token of replica r>0
  *    gets an `xr` suffix — within-replica shingle/dup structure is
  *    preserved exactly (all token relations unchanged) while
  *    cross-replica texts share no 3-gram, so the planted near-dup
  *    rate stays per-replica and candidate pairs grow linearly (a
  *    plain copy would make every doc a 10-way cross-replica near-dup
  *    and square the pair count).
  *  - embeddings: ids offset; vectors cyclically shifted by r — norms
  *    and within-replica pairwise dots are preserved (shift is a
  *    permutation), cross-replica similarity decorrelates.
  *  - events: event/user ids offset per replica — per-user event
  *    density (session/state size) stays constant; the corpus just
  *    has 10× the users.
  *
  * Run: `sbt "runMain graft.tools.GenScale /root/testdata/sf0.1
  * /root/repo/testdata_sf1 10"`. Not part of the library surface.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    // the embedding decorrelation below has exactly two arms (cyclic
    // shift cycle of 64 × one sign flip): at reps > 128 replica r and
    // r-128 would get identical vectors under distinct vec_ids —
    // silent exact duplicates breaking the structure-preservation
    // contract — so enforce the bound instead of leaving it latent
    require(reps >= 1 && reps <= 128,
      s"reps must be in [1, 128] (got $reps): embedding decorrelation covers two shift cycles only")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("gen-scale").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Off = 10000000L

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(r => f(df, r)).reduce(_.unionAll(_))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    replicas(docs) { (d, r) =>
      val text = if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1x$r")
      d.select((col("doc_id") + lit(r * Off)).as("doc_id"),
               text.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    replicas(emb) { (e, r) =>
      // cyclic shift by r mod dim; past one full cycle (reps > 64) the
      // shift repeats, so replicas 64.. additionally flip sign —
      // negation preserves norms and every within-replica pairwise dot
      // (the structure-preservation contract) while the (r, r+64)
      // cross-replica cosine lands at −1, far from any near-dup τ
      val s = r % 64
      val rolled = if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, 64 - s),
                    slice(col("embedding"), 1, s))
      val shifted = if (r < 64) rolled else transform(rolled, x => -x)
      e.select((col("vec_id") + lit(r * Off)).as("vec_id"),
               shifted.as("embedding"), col("label"))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    replicas(ev) { (e, r) =>
      e.select((col("event_id") + lit(r * Off)).as("event_id"), col("ts"),
               (col("user_id") + lit(r * Off)).as("user_id"),
               col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    println(s"[gen-scale] wrote ${reps}x $src -> $out")
    spark.stop()
  }
}
