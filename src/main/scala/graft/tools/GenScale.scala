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
  *  - embeddings: ids offset; per-replica SIGNED PERMUTATION — a
  *    cyclic shift by r mod 64, a global sign flip on the second
  *    shift cycle, and (round 11, the third arm that lifts the old
  *    reps ≤ 128 bound) a Walsh–Hadamard component-sign pattern
  *    s_i = (−1)^popcount(i & q) keyed on q = r / 128. Every arm is a
  *    signed permutation applied uniformly to the replica, so norms
  *    and ALL within-replica pairwise dots are preserved exactly (the
  *    structure contract); the 64 Hadamard patterns are mutually
  *    orthogonal rows of H64, so same-shift cross-replica pairs
  *    decorrelate. 64 shifts × 2 global flips × 64 patterns = 8192
  *    distinct transforms; q = 0 is the identity pattern, so slices
  *    generated at reps ≤ 128 are value-identical to the pre-round-11
  *    two-arm construction.
  *  - events: event/user ids offset per replica — per-user event
  *    density (session/state size) stays constant; the corpus just
  *    has 10× the users.
  *
  * Replicas materialize through ONE crossJoin with a replica-index
  * range (round 11 — was a reps-way union, whose 1000-arm plan the
  * analyzer cannot reasonably hold), so reps = 1000 plans exactly like
  * reps = 10.
  *
  * Run: `sbt "runMain graft.tools.GenScale /root/testdata/sf0.1
  * /root/repo/testdata_sf1 10"`. Not part of the library surface.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    require(reps >= 1 && reps <= 8192,
      s"reps must be in [1, 8192] (got $reps): 64 shifts x 2 flips x " +
        "64 Hadamard patterns = 8192 distinct signed permutations")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("gen-scale").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Off = 10000000L
    val nOut = math.min(256, math.max(32, reps / 4))

    // one row per replica index, crossJoined into each source table
    def withReps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(0, reps, 1, 1).select(col("id").as("r")))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    withReps(docs)
      .select((col("doc_id") + col("r") * lit(Off)).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
                                    concat(lit("$1x"), col("r"))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(nOut).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // shift s = r mod 64; global flip on odd (r / 64); Hadamard
    // pattern q = r / 128 flips component i iff popcount(i & q) is odd
    val s = (col("r") % 64).cast("int")
    val rolled = when(s === 0, col("embedding"))
      .otherwise(concat(slice(col("embedding"), s + lit(1), lit(64) - s),
                        slice(col("embedding"), lit(1), s)))
    val globalFlip = ((col("r") / 64).cast("long") % 2) === 1
    val q = (col("r") / 128).cast("long")
    val signed = transform(rolled, (x, i) => {
      val hadamardFlip = bit_count(i.cast("long").bitwiseAND(q)) % 2 === 1
      when(globalFlip =!= hadamardFlip, -x).otherwise(x)
    })
    withReps(emb)
      .select((col("vec_id") + col("r") * lit(Off)).as("vec_id"),
              signed.as("embedding"), col("label"))
      .repartition(nOut).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    withReps(ev)
      .select((col("event_id") + col("r") * lit(Off)).as("event_id"),
              col("ts"),
              (col("user_id") + col("r") * lit(Off)).as("user_id"),
              col("event_type"), col("value"), col("props"))
      .repartition(nOut).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    println(s"[gen-scale] wrote ${reps}x $src -> $out")
    spark.stop()
  }
}
