package graft

import org.apache.spark.sql.execution.ExplainMode

/** The release plan sweep (SURVEY §6) as a regression test: no query
  * may plan a cartesian product, and BroadcastNestedLoopJoin may
  * appear ONLY where it is the documented broadcast-small-side design
  * (1-row totals, scalar-subquery dashboards, broadcast query batches
  * / centroid probes). A new query that accidentally plans an
  * unconstrained join fails here instead of surviving until a manual
  * Explain audit.
  */
class PlanAuditSpec extends SparkSpec {

  // streaming-backed queries EXECUTE their catch-up run at plan-build
  // time (memory-sink materialization) — audited via their own specs
  private val streamingBacked = Set(
    "a9_stream_hourly", "a10_stream_state", "a13_stream_join",
    "a14_stream_asof", "a15_stream_asof_ooo", "a19_stream_anomaly",
    "p5_stream_ingest")

  // every BNLJ here is a documented broadcast-small-side pattern
  private val bnljByDesign = Set(
    "b23_platform_counts",     // scalar-subquery count dashboard
    "b34_marketplace_page",    // 1-row total broadcast
    "b39_nft_directory",       // 1-row total broadcast
    "b41_feeds_channels",      // 1-row total broadcast
    "d1_ann_bruteforce", "d4_ann_topk_agg", "d6_ann_range",
    "d7_ann_filtered",         // broadcast query batch (exact baseline)
    "d5_ann_ivf",              // broadcast centroid probe
    "d10_ann_ivfpq",           // broadcast centroid probe + query subs
    "d11_ann_incremental",     // broadcast frozen-centroid routing
    "d12_ann_indexed",         // broadcast PERSISTED-centroid probe (d10's landed twin)
    "d13_ann_ivf_fixedq",      // d5's probe with the fixed-|Q| batch
    "d14_ann_ivfpq_fixedq",    // d10's probe with the fixed-|Q| batch
    "d15_ann_indexed_fixedq",  // d12's probe with the fixed-|Q| batch
    "c9_semdedup",             // broadcast centroid routing (d5's sample)
    "c11_semdedup_hier",       // broadcast coarse+fine centroid routing
    "e3_lang_id",              // broadcast nLang-row profile cross
    "e11_unigram_logprob",     // 1-row total-tokens + n_docs broadcasts
    "e13_bigram_logprob",      // 1-row (T, V) broadcast
    "p12_source_filter")       // 1-row median-quality broadcast

  test("no cartesian products; BNLJ only in the documented broadcast patterns") {
    SparkEntry.queries.keys.filterNot(streamingBacked).toSeq.sorted.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!bnljByDesign(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the documented set")
    }
  }

  test("the native kernels stay in the hot plans (no interpreted fold regression)") {
    // the round-7 kernel rewrites are easy to silently undo with a
    // well-meaning refactor back to transform/aggregate lambdas; the
    // optimized plan must carry the codegen'd expressions
    def planOf(name: String) =
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.toString
    assert(planOf("e10_top_ngram_share").contains("max_run"),
      "e10 lost MaxRun")
    // (c2's signatures cross a typed-Aggregator LogicalRDD boundary,
    // so its shingle stage isn't visible in the final plan — its
    // kernel use is covered by the shared shingleSets helper c4 audits)
    Seq("e7_dup_ngram_ratio", "e6_ngram_freq", "c8_dup_spans",
        "p2_decontaminate")
      .foreach { q =>
        assert(planOf(q).contains("shingle_windows"),
          s"$q lost ShingleWindows")
      }
    // c4 picks its arm at call time (positional fast path vs
    // exhaustive fallback), so audit BOTH builders directly instead of
    // the registered query. The exhaustive arm must keep the
    // ShingleWindows kernel visible; the positional arm checkpoints
    // its ranked postings (LogicalRDD boundary — kernel use is the
    // same shared ngramJaccardIndex, covered by the exhaustive row,
    // the c2-signature precedent), and must stay cartesian/BNLJ-free:
    // its self-join is equi on the shingle key with residual bounds,
    // its semi-filter an equi broadcast hash join.
    assert(operators.DedupOps.ngramJaccardExhaustive(spark, sf)
      .queryExecution.optimizedPlan.toString.contains("shingle_windows"),
      "c4/exhaustive lost ShingleWindows")
    Seq(
      "c4/exhaustive" -> operators.DedupOps.ngramJaccardExhaustive(spark, sf),
      "c4/positional" -> operators.DedupOps.ngramJaccardPrefix(spark, sf))
      .foreach { case (tag, df) =>
        val phys = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(!phys.contains("CartesianProduct"), s"$tag plans a CartesianProduct")
        assert(!phys.contains("BroadcastNestedLoopJoin"),
          s"$tag plans a BroadcastNestedLoopJoin")
      }
    assert(planOf("p10_holdout_split").contains("md5_hash64"),
      "p10 lost Md5Hash64")
  }

  test("streaming micro-batch plans: state stores placed, no cartesians") {
    // the expected STATEFUL operator per stream — the placement that
    // makes each one a true incremental computation (state store keyed
    // by the shuffle partitioning) rather than a re-aggregation
    val statefulOp = Map(
      "a9_stream_hourly"   -> "StateStoreSave",            // windowed agg
      "a10_stream_state"   -> "FlatMapGroupsWithState",    // per-user fold
      "a13_stream_join"    -> "StreamingSymmetricHashJoin",// stream⋈stream
      "a14_stream_asof"    -> "FlatMapGroupsWithState",    // as-of state
      "a15_stream_asof_ooo" -> "FlatMapGroupsWithState",   // OOO buffer
      "a19_stream_anomaly" -> "StateStoreSave",            // windowed agg feed
      "p5_stream_ingest"   -> "FlatMapGroupsWithState")    // dedup winner
    statefulOp.keys.toSeq.sorted.foreach { name =>
      SparkEntry.queries(name)(spark, sf).collect()
      val plan = graft.streaming.EventStream.lastMicroBatchPlan
      assert(plan.nonEmpty, s"$name: no micro-batch plan captured")
      assert(plan.contains(statefulOp(name)),
        s"$name micro-batch plan lost its ${statefulOp(name)} operator")
      assert(!plan.contains("CartesianProduct"),
        s"$name micro-batch plans a CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name micro-batch plans a BroadcastNestedLoopJoin")
    }
  }
}
