package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew — the manual salting fallback for when AQE's
  * skew-join splitting can't help (e.g. a single hot key inside one
  * aggregation, or a build side that must replicate).
  */
object JoinFns {

  /** Salted equi-join: the skewed (large) side gets a deterministic
    * salt derived from its whole row hash; the small side is replicated
    * once per salt. The join key becomes (key, salt), splitting each
    * hot key's rows across `salts` reducers. Result set is identical to
    * the plain join (inner semantics).
    *
    * Deterministic on purpose: the salt comes from xxhash64 of the
    * row's columns, not rand(), so retried/recomputed tasks salt
    * identically (rand() in a shuffle input is a correctness bug on
    * task retry).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedLarge = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLarge.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key split aggregate: two-phase sum/count for a skewed groupBy —
    * phase 1 pre-aggregates on (key, salt), phase 2 merges per key. For
    * algebraic aggregates this is what map-side combine already does;
    * the explicit form exists for custom accumulators that need it.
    */
  def twoPhaseCount(df: DataFrame, key: String, salts: Int = 8): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
  }
}
