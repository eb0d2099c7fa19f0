package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.functions.TextFns

/** Where does c3's ×1000 candidate volume come from? The round-16
  * Zipf decade measured the scale-true C(6,3) default at 18.7× for
  * the third decade (327 s at 5M docs) — this probe decomposes that
  * cost into its two possible sources so the remedy is chosen by
  * measurement, not guess:
  *  - IDENTICAL-signature clusters (docs whose simhash is bit-equal):
  *    every cluster of n docs puts n rows into the SAME bucket in all
  *    20 bands → 20·C(n,2) generated pairs for hamming-0 pairs whose
  *    answer is trivially known. If `h0_pairs` dominates
  *    `gen_pairs`, collapsing clusters before banding removes the
  *    quadratic.
  *  - DIFFUSE near-collisions (distinct sigs sharing a 31–33-bit band
  *    key): the true near-dup candidate population — irreducible work
  *    for exact hamming ranking.
  * Run: runMain graft.tools.C3Probe <dir> [dir2 ...]
  */
object C3Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("graft-c3-probe")
    args.foreach { dir =>
      val sigs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), TextFns.simhash64Kernel(col("text")).as("sig"))
        .localCheckpoint(false)
      val nDocs = sigs.count()
      val clusters = sigs.groupBy(col("sig")).agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val nSigs = clusters.count()
      val h0 = clusters.filter(col("n") > 1)
        .agg(coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)).as("p"),
             coalesce(max(col("n")), lit(0L)).as("mx"),
             count(lit(1)).as("nc"))
        .collect()(0)
      // generated pair volume through the default banding (pre-cap
      // buckets, pair expansion bounded to sub-cap buckets like the op)
      val buckets = sigs
        .select(col("doc_id"),
                explode(array(DedupOps.simhashBandCols(col("sig"), 0, 0): _*))
                  .as("bk"))
        .groupBy(col("bk.band"), col("bk.bkey")).agg(count(lit(1)).as("n"))
      val gen = buckets.filter(col("n") > 1 && col("n") <= 64)
        .agg(coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)).as("p"))
        .collect()(0).getLong(0)
      // the same volume if identical-sig clusters were collapsed first
      val distinctBuckets = clusters
        .select(col("sig"),
                explode(array(DedupOps.simhashBandCols(col("sig"), 0, 0): _*))
                  .as("bk"))
        .groupBy(col("bk.band"), col("bk.bkey")).agg(count(lit(1)).as("n"))
      val genDistinct = distinctBuckets.filter(col("n") > 1 && col("n") <= 64)
        .agg(coalesce(sum((col("n") * (col("n") - 1) / 2).cast("long")), lit(0L)).as("p"))
        .collect()(0).getLong(0)
      // hamming histogram of the DISTINCT candidate pairs the default
      // banding emits: near-dups (≤ 3, the guaranteed radius) vs
      // accidental block collisions (> 3) — decides whether candidate
      // volume is output-driven (irreducible) or layout-prunable
      val bucketIds = sigs
        .select(col("doc_id"),
                explode(array(DedupOps.simhashBandCols(col("sig"), 0, 0): _*))
                  .as("bk"))
        .groupBy(col("bk.band"), col("bk.bkey"))
        .agg(graft.functions.CappedDistinctAgg.fn(64)(col("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, 64))
      val pairHam = bucketIds
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
                    y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select(col("p.a"), col("p.b")).distinct()
        .join(sigs.select(col("doc_id").as("a"), col("sig").as("sa")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("sig").as("sb")), "b")
        .select(TextFns.hamming64(col("sa"), col("sb")).as("h"))
        .agg(count(lit(1)).as("pairs"),
             sum(when(col("h") <= 3, 1L).otherwise(0L)).as("le3"),
             sum(when(col("h") <= 8, 1L).otherwise(0L)).as("le8"),
             expr("percentile_approx(h, 0.5)").as("p50h"))
        .collect()(0)
      println(s"""{"metric":"c3_probe","dir":"$dir","docs":$nDocs,""" +
        s""""distinct_sigs":$nSigs,"h0_pairs":${h0.getLong(0)},""" +
        s""""max_cluster":${h0.getLong(1)},"clusters_gt1":${h0.getLong(2)},""" +
        s""""gen_pairs_subcap":$gen,"gen_pairs_if_collapsed":$genDistinct,""" +
        s""""distinct_cand_pairs":${pairHam.getLong(0)},""" +
        s""""cand_hamming_le3":${pairHam.getLong(1)},""" +
        s""""cand_hamming_le8":${pairHam.getLong(2)},""" +
        s""""cand_hamming_p50":${pairHam.get(3)}}""")
    }
    spark.stop()
  }
}
