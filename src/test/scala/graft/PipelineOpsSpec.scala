package graft

import graft.operators.{DedupOps, PipelineOps, TextOps}
import graft.sources.Tables

/** Module P spec — the composition must equal composing the (already
  * independently verified) pieces by hand.
  */
class PipelineOpsSpec extends SparkSpec {

  test("p1 equals the hand-composed quality→cluster-rep→stats chain") {
    val quality = TextOps.qualityScore(spark, sf)
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("quality"))).toMap
    val cluster = DedupOps.dedupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val lang = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap

    val kept = quality.keys.filter(id => quality(id)._2 >= 0.72).toSeq
    val reps = kept.groupBy(cluster).map { case (_, ids) => ids.min }.toSet
    val expected = reps.toSeq.groupBy(lang).map { case (l, ids) =>
      val qs = ids.map(quality(_)._2)
      l -> (ids.size.toLong, ids.map(quality(_)._1).sum,
            BigDecimal(qs.sum / qs.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }

    val got = PipelineOps.corpusPrep(spark, sf).collect().map { r =>
      r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
         BigDecimal(r.getAs[Double]("avg_quality"))
           .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.toMap

    assert(got == expected)
    assert(got.nonEmpty)
    // the gate has bite: fewer docs survive than exist
    assert(got.values.map(_._1).sum < lang.size)
  }

  test("p4 stratified sample meets every lang quota exactly and is order-deterministic") {
    val langCounts = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val got = PipelineOps.stratifiedSample(spark, sf, quota = 50).collect()
    val perLang = got.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    langCounts.foreach { case (l, n) =>
      assert(perLang.getOrElse(l, 0L) == math.min(50L, n),
        s"lang $l: ${perLang.getOrElse(l, 0L)} != min(50, $n)")
    }
    // selection is the md5 order, not doc order: ranks are 1..quota and
    // the picked set matches a JVM recompute of the same key
    val all = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val expected = all.groupBy(_._2).toSeq.flatMap { case (l, ds) =>
      ds.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(50)
        .zipWithIndex.map { case (id, i) => (id, l, i + 1) }
    }.toSet
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
                         r.getAs[Int]("sample_rank"))).toSet == expected)
    // identical sample under perturbed partitioning (partition-stable)
    val reparted = PipelineOps.stratifiedSample(spark, sf, quota = 50)
    assert(reparted.collect().toSeq == got.toSeq)
  }

  test("p6 token budget equals the naive greedy cut and sits exactly at the boundary") {
    val budget = 2000L
    val all = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
                 r.getAs[String]("text").split(" ", -1).length.toLong))
    // naive prefix cut: per lang, the running sum over ALL docs in
    // (md5(id), id) order; keep exactly the prefix with cum <= budget
    // (sums are monotone — once over budget, everything after is out)
    val expected = all.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy { case (id, _, _) => (md5hex(id.toString), id) }.flatMap {
        case (id, _, n) =>
          cum += n
          if (cum <= budget) Some((id, lang, n, cum)) else None
      }
    }.toSet
    val got = PipelineOps.tokenBudgetMix(spark, sf, budget).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
                 r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // boundary bite: every lang is actually cut (some doc excluded),
    // and the cut is maximal (next doc in key order would overshoot)
    val langs = all.map(_._2).distinct
    langs.foreach { lang =>
      val kept = got.filter(_._2 == lang)
      assert(kept.size < all.count(_._2 == lang), s"$lang: nothing cut — raise data or lower budget")
      val keptIds = kept.map(_._1)
      val next = all.filter(_._2 == lang).filterNot(d => keptIds(d._1))
        .minByOption(d => (md5hex(d._1.toString), d._1))
      // toSeq first: mapping the Set directly would collapse docs with
      // EQUAL token counts and undercount the budget use
      val used = kept.toSeq.map(_._3).sum
      next.foreach { case (_, _, n) =>
        assert(used + n > budget, s"$lang: greedy cut not maximal")
      }
    }
  }

  test("p7 temperature mix: quotas met exactly, up/down-sampling both exercised") {
    val all = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val nBy = all.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = all.length.toLong
    val denom = nBy.values.toSeq.sorted.map(math.sqrt(_)).sum
    val target = nBy.map { case (l, n) =>
      l -> math.floor(BigDecimal(total * math.sqrt(n.toDouble) / denom)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    }
    val got = PipelineOps.temperatureMix(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
                 r.getAs[Long]("target_docs"), r.getAs[Long]("n_copies")))
    nBy.keys.foreach { lang =>
      val rows = got.filter(_._1 == lang)
      assert(rows.forall(_._3 == target(lang)), s"$lang target")
      // the materialized copies meet the computed quota EXACTLY
      assert(rows.map(_._4).sum == target(lang), s"$lang quota")
      // who gets the extra epoch: the first (target mod n) docs in
      // md5 order — recompute the selection naively
      val full = target(lang) / nBy(lang)
      val rem = (target(lang) % nBy(lang)).toInt
      val extra = all.filter(_._2 == lang).map(_._1)
        .sortBy(id => (md5hex(id.toString), id)).take(rem).toSet
      rows.foreach { case (_, id, _, copies) =>
        assert(copies == full + (if (extra(id)) 1L else 0L), s"$lang doc $id")
      }
    }
    // the rebalance must be visible in both directions at this SF
    val maxLang = nBy.maxBy(_._2)._1
    val minLang = nBy.minBy(_._2)._1
    assert(target(maxLang) < nBy(maxLang), "largest lang not downsampled")
    assert(target(minLang) > nBy(minLang), "smallest lang not upsampled")
  }

  test("p8 sequence packing matches a naive global cumsum; bins are gapless") {
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).length.toLong)
    // naive: exclusive prefix sum in (md5(id), id) order, then bin math
    var cum = 0L
    val expected = docs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .map { case (id, n) =>
        val strt = cum; cum += n
        id -> (n, strt / 2048, strt % 2048, (strt + n - 1) / 2048 - strt / 2048)
      }.toMap
    val got = PipelineOps.sequencePack(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, bin, off, extra) = expected(id)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n_tokens")
      assert(r.getAs[Long]("bin_id") == bin, s"doc $id bin_id")
      assert(r.getAs[Long]("bin_offset") == off, s"doc $id bin_offset")
      assert(r.getAs[Long]("extra_bins") == extra, s"doc $id extra_bins")
    }
    // zero padding waste: docs tile the token stream with no gaps, so
    // consecutive rows in (bin, offset) order chain exactly
    val ordered = got.sortBy(r =>
      (r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset")))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        val aEnd = a.getAs[Long]("bin_id") * 2048 +
          a.getAs[Long]("bin_offset") + a.getAs[Long]("n_tokens")
        val bStart = b.getAs[Long]("bin_id") * 2048 +
          b.getAs[Long]("bin_offset")
        assert(aEnd == bStart, s"gap before doc ${b.getAs[Long]("doc_id")}")
      case _ =>
    }
    // and the corpus must actually exercise boundary spill at this SF
    assert(got.exists(_.getAs[Long]("extra_bins") > 0),
      "no doc crosses a bin boundary — spill path untested")
  }

  test("writeCorpus lands lang-partitioned parquet, one file per lang, round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    PipelineOps.writeCorpus(spark, sf, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.nonEmpty)
    // the repartition(lang) small-file guard: one data file per lang dir
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }
    // partition-pruned read returns exactly that lang's docs
    val expected = PipelineOps.corpusDocs(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val back = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(back == expected)
    val oneLang = dirs.head.stripPrefix("lang=")
    val pruned = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("lang") === oneLang)
    assert(pruned.count() == expected.count(_._2 == oneLang))
  }

  test("p9 funnel: stages shrink monotonically and tie out to their sources") {
    val got = PipelineOps.filterFunnel(spark, sf).collect()
    assert(got.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "quality", "dedup"))
    val docs = got.map(_.getAs[Long]("n_docs"))
    val toks = got.map(_.getAs[Long]("n_tokens"))
    assert(docs(0) >= docs(1) && docs(1) >= docs(2), docs.toSeq.toString)
    assert(toks(0) >= toks(1) && toks(1) >= toks(2), toks.toSeq.toString)
    assert(docs(0) == Tables.documents(spark, sf).count(), "raw = all docs")
    assert(docs(2) == PipelineOps.corpusDocs(spark, sf).count(),
      "dedup stage = the shipped corpus")
    assert(docs(1) > docs(2), "the corpus plants near-dup clusters, " +
      "so dedup must remove at least one quality-passing doc")
  }

  test("p10 holdout split: deterministic, exhaustive, near the 1/5/94 quotas") {
    val got = PipelineOps.holdoutSplit(spark, sf).collect()
    assert(got.length == Tables.documents(spark, sf).count())
    // deterministic: the split is a pure function of doc_id
    val again = PipelineOps.holdoutSplit(spark, sf).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
    val bySplit = got.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    assert(bySplit.keys.toSet.subsetOf(Set("train", "val", "test")))
    val n = got.length.toDouble
    // hash buckets at 500 docs: generous tolerance, but all three
    // splits must be present and train must dominate
    assert(bySplit.getOrElse("train", 0) / n > 0.85, bySplit.toMap.toString)
    assert(bySplit.getOrElse("val", 0) > 0, "no val docs")
    assert(bySplit.getOrElse("test", 0) > 0, "no test docs")
    // a doc keeps its split when the corpus around it changes: the
    // assignment computed on a 1-doc corpus equals the full-corpus one
    val spark2 = spark; import spark2.implicits._
    val one = got.head
    val tmp = java.nio.file.Files.createTempDirectory("graft_split_").toString
    Seq((one.getAs[Long]("doc_id"), "solo text", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val solo = PipelineOps.holdoutSplit(spark, tmp).collect()(0)
    assert(solo.getAs[String]("split") == one.getAs[String]("split"),
      "split must not depend on the surrounding corpus")
  }

  test("p12 source filter: median cut splits sources, dup accounting exact") {
    val rows = PipelineOps.sourceFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    val kept = rows.filter(_.getAs[Boolean]("kept"))
    val dropped = rows.filterNot(_.getAs[Boolean]("kept"))
    // the self-calibrating cut must actually split (no vacuous filter)
    assert(kept.nonEmpty && dropped.nonEmpty)
    // kept == mean_quality >= median, recomputed naively
    val means = rows.map(_.getAs[Double]("mean_quality")).sorted
    val n = means.length
    val med = if (n % 2 == 1) means(n / 2)
              else (means(n / 2 - 1) + means(n / 2)) / 2
    rows.foreach { r =>
      assert(r.getAs[Boolean]("kept") == (r.getAs[Double]("mean_quality") >= med))
      // dup accounting: rate == (n_docs - n_distinct) / n_docs
      val nd = r.getAs[Long]("n_docs"); val dst = r.getAs[Long]("n_distinct")
      assert(nd >= dst && dst > 0)
      assert(math.abs(r.getAs[Double]("dup_rate") - (nd - dst).toDouble / nd) < 1e-6)
    }
    // per-source doc counts tie out to the corpus
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val expected = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    assert(total == expected)
  }
}
