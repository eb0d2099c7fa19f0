package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pipeline compositions (SURVEY §2.P): the end-to-end corpus-prep
  * flows a training-data pipeline actually ships — individual
  * operators (quality scoring, cluster dedup) chained into one
  * declarative plan, so Catalyst sees the WHOLE flow: filters push
  * through the composition and every stage stays partial-aggregable.
  * The branches scan `documents` separately but each scan is pruned
  * to its 2–3 needed columns (columnar reads make repeated pruned
  * scans cheap; a deployment that prefers one pass materializes the
  * token array once, trading memory for IO).
  */
object PipelineOps {

  /** p1: pretraining corpus preparation — the canonical chain
    *   quality gate → duplicate-cluster dedup → corpus stats.
    *
    * Semantics (order matters and is deliberate): the quality filter
    * runs FIRST, then each duplicate cluster keeps its min-doc_id
    * representative AMONG the quality-passing members — so a cluster
    * whose canonical copy is junk still contributes its best-id clean
    * copy, and a cluster with no clean member contributes nothing.
    * The representative pick is a single min_by partial aggregate per
    * cluster (one shuffle on cluster_id, no join-back), then the
    * per-lang rollup is an ordinary map-side-combined aggregate.
    *
    * 100 TB shape: clusters ≈ docs, so nothing here is broadcast; the
    * only shuffles are the CC labeling (see dedupClusters), one
    * cluster_id aggregate, and one lang aggregate.
    */
  def corpusPrep(spark: SparkSession, dir: String,
                 minQuality: Double = 0.72): DataFrame =
    corpusDocs(spark, dir, minQuality)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("total_tokens"),
           round(avg(col("quality")), 6).as("avg_quality"))
      .orderBy(col("lang"))

  /** The prepared corpus itself (p1's pre-rollup form): one row per
    * surviving representative document.
    */
  def corpusDocs(spark: SparkSession, dir: String,
                 minQuality: Double = 0.72): DataFrame = {
    val q = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val clusters = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val kept = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(q, "doc_id")
      .filter(col("quality") >= minQuality)
      .join(clusters, "doc_id")
    kept
      .groupBy(col("cluster_id"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
                         col("quality")), col("doc_id")).as("r"))
      .select(col("r.*"))
  }

  /** p2: benchmark decontamination — flag every training document that
    * shares an 8-gram with the held-out eval set (here: doc_id ≡ 0 mod
    * `evalMod`, standing in for the benchmark suite). This is the
    * standard n-gram decontamination pass every pretraining pipeline
    * runs before training: exact window overlap, not similarity.
    *
    * 100 TB shape: the eval set is tiny relative to the corpus (a few
    * benchmark suites vs the crawl), so its DISTINCT n-gram set is
    * built once and BROADCAST; the corpus side explodes each doc's
    * distinct n-grams and probes the broadcast set map-side — the
    * corpus is never shuffled by n-gram. The only shuffle is the final
    * per-doc count, which partial-aggregates. A doc too short to have
    * any window survives via explode_outer with n_shared = 0.
    */
  def decontaminate(spark: SparkSession, dir: String,
                    n: Int = 8, evalMod: Int = 97): DataFrame = {
    // tokens materialized before the 8-gram transform on BOTH branches
    // (split inlined into the window lambda re-splits per window —
    // O(tokens²) chars per doc; see TextOps.dupNgramRatio).
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
              graft.functions.TextFns.tokens(col("text")).as("toks"))
    // Both sides probe on xxhash64 of the window, not the string:
    // array_distinct on BIGINT runs the primitive fast path (the string
    // form is O(n²) comparisons per doc), the broadcast set is 8 bytes
    // per n-gram instead of ~50, and the shared-count is unchanged
    // (64-bit collisions are negligible; the DuckDB oracle's
    // string-side counts agree).
    val grams = graft.functions.TextFns.shingles(col("toks"), n)
    val evalNg = d.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
      .select(explode(grams).as("ev"))
      .select(xxhash64(col("ev")).as("ev"))
      .distinct()
    d.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .select(col("doc_id"),
              explode_outer(array_distinct(transform(grams, g => xxhash64(g))))
                .as("ng"))
      .join(broadcast(evalNg), col("ng") === col("ev"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("ev")).as("n_shared"))
      .select(col("doc_id"), col("n_shared"),
              (col("n_shared") > 0).cast("int").as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** p3: the fuzzy-dedup flagship — see DedupOps.fuzzyDedup. Surfaced
    * here because it is the pipeline composition (candidates → verify
    * → clusters → representatives), not another pair ranker.
    */
  def fuzzyDedup(spark: SparkSession, dir: String,
                 tau: Double = 0.8): DataFrame =
    DedupOps.fuzzyDedup(spark, dir, tau)

  /** p4: deterministic stratified sampling / data mixing — per-lang
    * document budgets, the mixture-weighting stage every pretraining
    * pipeline runs after cleaning. Selection key is md5(doc_id) — a
    * content-independent pseudo-random but fully deterministic,
    * partition-stable, reshard-stable order (no rand(): re-running on
    * different partitioning or cluster size picks the SAME sample;
    * `xxhash64` would do the same but md5 keeps the key reproducible
    * in the SQL oracle). Each lang keeps exactly min(quota, n_lang)
    * docs: rank-based selection meets the budget EXACTLY, where
    * hash-threshold sampling (`hash % N < q`) only meets it in
    * expectation. The row_number filter compiles to WindowGroupLimit
    * — a partial per-partition top-k, so at 100 TB only quota rows
    * per lang per partition enter the shuffle.
    */
  /** The deterministic sampling key p4 and p6 share: md5 of the doc id
    * — content-independent, partition-stable, and reproducible in the
    * SQL oracles as md5(doc_id::VARCHAR). p6's bucket = substring(key,
    * 1, 2) relies on the key being THIS hex string (prefix order ==
    * key order); change both sites and both oracles together or not at
    * all.
    */
  private def sampleKey: org.apache.spark.sql.Column =
    md5(col("doc_id").cast("string"))

  def stratifiedSample(spark: SparkSession, dir: String,
                       quota: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(sampleKey, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** p6: token-budget data mixing — the OTHER mixing unit: p4 budgets
    * documents per lang, this budgets TOKENS per lang (what mixture
    * weights actually meter). Greedy exact cut: docs taken in
    * md5(doc_id) order (deterministic pseudo-random, partition-stable)
    * until the lang's cumulative token count would exceed the budget.
    *
    * 100 TB shape — the naive form is a single window PER LANG
    * (cumulative sum over every doc of a language through one
    * partition: the classic scale-killer). This runs the block
    * prefix-sum instead: bucket = first 2 hex chars of the key (the
    * bucket order IS the key order, it's a prefix), per-(lang, bucket)
    * token sums make a ≤ langs×256-row offsets table (tiny window),
    * each bucket's rows get offset + within-bucket running sum — the
    * big windows are partitioned by (lang, bucket), 256× finer, and
    * buckets entirely past the boundary are pruned before any window
    * work. Exact global cumsum, no single-partition stage.
    */
  def tokenBudgetMix(spark: SparkSession, dir: String,
                     budget: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL text is excluded EXPLICITLY (here and in the oracle): the
    // bucket prune below is only correct when every row has n_tokens
    // >= 1 (true for any non-null text — split("") = [""]), and
    // size(split(NULL)) would inject -1 and break cum monotonicity.
    val d = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"), col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_tokens"),
        sampleKey.as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wB = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("offset", coalesce(sum(col("btok")).over(wB), lit(0L)))
      .select(col("lang"), col("bucket"), col("offset"))
    val wIn = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    d.join(broadcast(offsets), Seq("lang", "bucket"))
      // a bucket whose offset alone reaches the budget cannot
      // contribute (every doc has ≥1 token) — prune it pre-window
      .filter(col("offset") < budget)
      .withColumn("cum_tokens", col("offset") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"))
  }

  /** p7: temperature-resampled domain mix — the third mixing unit
    * after p4 (fixed doc quotas) and p6 (token budgets): quotas are
    * COMPUTED from the corpus at temperature α = 0.5, the standard
    * multilingual rebalance (weight ∝ share^α: high-resource langs
    * are downsampled, low-resource langs upsampled, with upsampling
    * materialized as per-doc repetition factors — full epochs for
    * every doc plus one extra epoch for the first `target mod n`
    * docs in sampling-key order, the fractional-epoch scheme LLM
    * data mixes actually train on). α is fixed at 0.5 so both
    * engines compute the weight with `sqrt` (IEEE-exact in Spark
    * and DuckDB where a general `pow` need not agree bit-for-bit);
    * the quota rounds to 6 decimals before floor so the 5-value
    * denominator sum's addition-order ulp can't flip the integer
    * (boundary distances measured ≥ 0.01 at every test SF).
    *
    * 100 TB shape: the per-lang counts are one map-side-combinable
    * aggregate; the quota arithmetic runs in a window over that
    * ≤ |langs|-row table (tiny by construction, same as b14's
    * share-of-total); the per-lang rank that decides who gets the
    * extra epoch uses p6's block prefix-sum (per-(lang, key-prefix)
    * row counts + tiny offsets window + 256×-finer ranked windows) —
    * no single-partition-per-lang sort anywhere. Docs are never
    * physically duplicated here: `n_copies` is the materialization
    * contract for the training reader (explode(sequence(1, n_copies))
    * at the sink if physical rows are wanted).
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = counts.withColumn(
      "target_docs",
      floor(round(sum(col("n_docs")).over(wAll) * sqrt(col("n_docs")) /
                  sum(sqrt(col("n_docs"))).over(wAll), 6)).cast("long"))
    // per-lang md5-order rank via the p6 block prefix-sum (the bucket
    // is a 2-hex key prefix, so bucket order == key order)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), sampleKey.as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wB = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("offset", coalesce(sum(col("bn")).over(wB), lit(0L)))
      .select(col("lang"), col("bucket"), col("offset"))
    val wIn = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("key"), col("doc_id"))
    d.join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("rnk", col("offset") + row_number().over(wIn))
      .join(broadcast(quotas), Seq("lang"))
      // `div` = exact integral division on longs (the DuckDB oracle's
      // `//`); double-divide + cast can flip the truncated integer for
      // very large token counts
      .withColumn("n_copies",
        expr("target_docs div n_docs") +
        when(col("rnk") <= col("target_docs") % col("n_docs"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("lang"), col("doc_id"), col("target_docs"),
              col("n_copies"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** p8: sequence packing — the step every pretraining pipeline ends
    * with: concatenate the corpus in a deterministic order and chunk
    * it into fixed `seqLen`-token training sequences (GPT-style
    * concat-then-split; a doc crossing a boundary continues in the
    * next bin — `extra_bins` counts the spill). Each doc gets its
    * (bin_id, bin_offset) coordinates; every bin except the last is
    * exactly full by construction, so the packing has zero padding
    * waste.
    *
    * 100 TB shape: the only global state is the exclusive prefix sum
    * of token counts in md5(doc_id) order, computed with p6's block
    * prefix-sum — per-bucket sums, a ≤256-row offsets window (tiny by
    * construction, same class as p6's), then 256×-finer per-bucket
    * windows. No single-partition global sort/window anywhere; bin
    * assignment is pure arithmetic on the prefix.
    */
  def sequencePack(spark: SparkSession, dir: String,
                   seqLen: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
              size(graft.functions.TextFns.tokens(col("text"))).cast("long")
                .as("n_tokens"),
              sampleKey.as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("offset", coalesce(sum(col("btok")).over(wB), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val strt = col("offset") + sum(col("n_tokens")).over(wIn) - col("n_tokens")
    d.join(broadcast(offsets), "bucket")
      .withColumn("strt", strt)
      // `div` = exact long division, bit-identical to the oracle's `//`
      // at any token count / non-power-of-two seqLen
      .select(col("doc_id"), col("n_tokens"),
              expr(s"strt div ${seqLen}L").as("bin_id"),
              (col("strt") % seqLen).as("bin_offset"),
              (expr(s"(strt + n_tokens - 1) div ${seqLen}L") -
               expr(s"strt div ${seqLen}L")).as("extra_bins"))
      .orderBy(col("bin_id"), col("bin_offset"))
  }

  /** Materialize the prepared corpus as lang-partitioned parquet — the
    * sink every corpus-prep run ends in. `repartition(lang)` BEFORE
    * `partitionBy(lang)` is the small-file guard: without it every
    * write task opens a file per lang it happens to hold (tasks ×
    * langs files at 100 TB); with it each lang's rows land in the
    * task(s) owning that hash bucket, so files-per-lang is O(1) and
    * downstream lang-filtered reads prune whole directories.
    */
  def writeCorpus(spark: SparkSession, dir: String, outPath: String,
                  minQuality: Double = 0.72): Unit =
    corpusDocs(spark, dir, minQuality)
      .repartition(col("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(outPath)

  /** p10: deterministic held-out split — every pretraining pipeline
    * carves train/val/test by a HASH of a stable document key, never
    * by position or random(): the assignment must be reproducible
    * across runs, engines and partitionings, and a doc must keep its
    * split when the corpus around it grows (positional or sampled
    * splits silently leak val into train on every re-shard).
    * Buckets: md5-derived 31-bit hash of the doc id, mod 1000 —
    * <10 test (1 %), <60 val (5 %), else train; same mask-and-mod
    * contract c2's MinHash shingle hash established, so DuckDB
    * replays the assignment bit-for-bit.
    *
    * 100 TB shape: pure per-row expression work, zero shuffles (the
    * orderBy is the driver contract). Downstream joins on `split`
    * prune with a pushed filter.
    */
  def holdoutSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      pmod(graft.functions.TextFns.md5hash64(col("doc_id").cast("string"))
             .bitwiseAND(lit(2147483647L)), lit(1000L))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
              size(graft.functions.TextFns.tokens(col("text")))
                .cast("long").as("n_tokens"),
              when(bucket < 10, "test")
                .when(bucket < 60, "val")
                .otherwise("train").as("split"))
      .orderBy(col("doc_id"))
  }

  /** p9: the filter-funnel attrition report — how many documents and
    * tokens survive each stage of the p1 pipeline (raw → quality cut →
    * dedup representative). Every production pretraining pipeline
    * ships this table next to the corpus: it is how a data run is
    * reviewed ("the quality cut removed 31%, dedup another 12%") and
    * how a filter regression is caught before a training job burns on
    * it.
    *
    * 100 TB shape: the raw and quality stages come out of ONE
    * conditional-aggregate pass over one scan (not one branch per
    * stage — a union of per-stage aggregates re-scans and re-scores
    * the corpus once per stage); the dedup stage reuses corpusDocs'
    * CC + min_by winner. Nothing here adds a shuffle the pipeline
    * doesn't already have.
    */
  def filterFunnel(spark: SparkSession, dir: String,
                   minQuality: Double = 0.72): DataFrame = {
    val pass = col("quality") >= minQuality
    val s01 = TextOps.qualityScore(spark, dir)
      .select(col("n_tokens"), col("quality"))
      .agg(count(lit(1)).as("d0"), sum(col("n_tokens")).as("t0"),
           sum(when(pass, 1L).otherwise(0L)).as("d1"),
           sum(when(pass, col("n_tokens")).otherwise(0L)).as("t1"))
      .select(inline(array(
        struct(lit(0).as("stage_id"), lit("raw").as("stage"),
               col("d0").as("n_docs"), col("t0").as("n_tokens")),
        struct(lit(1).as("stage_id"), lit("quality").as("stage"),
               col("d1").as("n_docs"), col("t1").as("n_tokens")))))
    val s2 = corpusDocs(spark, dir, minQuality)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(lit(2).as("stage_id"), lit("dedup").as("stage"),
              col("n_docs"), col("n_tokens"))
    s01.unionByName(s2).orderBy(col("stage_id"))
  }

  /** p12: source-level (domain) filtering — the corpus-prep stage that
    * acts at SOURCE granularity rather than per document (C4's
    * blocklist, Gopher's domain filters): aggregate each source's
    * volume, exact-duplicate rate, and mean quality, then keep the
    * sources whose mean quality clears the cut. The cut is
    * SELF-CALIBRATING — the median of the per-source means — so the
    * filter provably splits the corpus at any SF instead of hinging
    * on a magic constant the synthetic corpus might never cross (the
    * c5 lesson). A deployment swaps the median for its own floor; the
    * plan shape is unchanged.
    *
    * 100 TB shape: one pruned scan → one partial-aggregable groupBy
    * (sources ≪ docs), a 1-row median broadcast (documented BNLJ
    * pattern), zero per-doc joins. The verdict table is tiny — it is
    * the artifact a crawler review reads, and the kept list then
    * prunes the corpus AT THE SCAN via a partition filter when the
    * corpus lands partitioned by source.
    */
  def sourceFilter(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), md5(col("text")).as("fp"),
              TextOps.Quality.score.as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_distinct"),
           round(avg(col("q")), 6).as("mean_quality"))
      .withColumn("dup_rate",
        round((col("n_docs") - col("n_distinct")).cast("double") /
              col("n_docs"), 6))
    val cut = perSource.agg(
      expr("percentile(mean_quality, 0.5)").as("median_quality"))
    perSource.crossJoin(broadcast(cut))
      .select(col("source"), col("n_docs"), col("n_distinct"),
              col("dup_rate"), col("mean_quality"),
              (col("mean_quality") >= col("median_quality")).as("kept"))
      .orderBy(col("source"))
  }
}
