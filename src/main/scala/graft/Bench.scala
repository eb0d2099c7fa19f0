package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Each query materializes through a noop-format sink write rather than
  * `.count()`: count() lets Catalyst prune every column not needed for
  * the count, which would skip most projection/expression work and
  * flatter the numbers. The noop sink evaluates every output row/column
  * and discards it. Failures are reported per-query (time = -1) and
  * echoed to stderr rather than swallowed.
  *
  * Measurement hygiene: every query runs `SPARK_GRAFT_BENCH_REPEATS`
  * times (default 3) and `queries` reports the per-query MIN. A single
  * pass is hostage to noisy-neighbor contention bursts — round 5's
  * driver run had 11 queries >2x baseline in one contiguous
  * sorted-order window while a same-day same-code run reproduced the
  * baseline to the millisecond. Passes are INTERLEAVED round-robin
  * (pass 1 of every query in sorted order, then pass 2, then pass 3)
  * rather than back-to-back: round 6's burst was long enough to
  * swallow all 3 adjacent repeats of one query (d9 40.5/28.9/43.9 s
  * vs 2 s quiet), which min-of-3 cannot dodge; with whole-suite
  * spacing between repeats a burst must span the entire suite to
  * contaminate every pass of any single query. All raw passes are
  * preserved in `queries_runs` so burst shape stays diagnosable.
  *
  * In-run ambient control: two constant-size reference tasks are timed
  * throughout the run and reported under `ambient`, so any bench can be
  * normalized against host contention without trusting session notes:
  *   - cpu:   a 32-partition scan of a fixed in-memory range through a
  *            codegen'd hash+sum — slows in proportion to stolen cores.
  *   - sched: 512 one-row tasks with trivial work — isolates per-task
  *            launch/scheduling overhead, the component that dominates
  *            the sub-second fixed-cost-bound queries.
  * Neither touches disk and both are deterministic in work, so on a
  * quiet host they repeat to within a few percent. A pair runs before
  * each pass, every `SPARK_GRAFT_BENCH_CONTROL_EVERY` (default 15)
  * queries within a pass, and once after the last pass; each sample
  * records its offset (seconds since bench start) so contention-burst
  * shape stays visible. Normalization contract: divide a run's
  * suite-vs-baseline ratio by (this run's control median / the blessed
  * control minimum recorded in BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1).getOrElse(3)
    val spark = GraftSession.build("graft-bench")
    // Warmup OUTSIDE the measured loop: the flagship query pays the
    // one-time JVM/codegen/noop-sink/scan-setup costs that otherwise
    // land on whichever query alphabetically runs first and pollute
    // round-over-round deltas. Runs against the benchmark's own sfDir
    // (NOT SparkEntry.entry, whose sf0.001 path is hardcoded and
    // doesn't exist on other hosts — a silently-caught failure here
    // would leave warmup_sec near zero and the costs re-attributed).
    val tw = System.nanoTime()
    try SparkEntry.queries("b1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup FAILED: ${e.getMessage}")
    }
    val warmup = (System.nanoTime() - tw) / 1e9

    // ---- in-run ambient control (see scaladoc) ----
    val benchStart = System.nanoTime()
    def offset(): Double = (System.nanoTime() - benchStart) / 1e9
    def timeNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def controlCpu(): Double = {
      // bit_xor, not sum: summing 192M hash values overflows Long under
      // ANSI mode; xor keeps the identical per-row hash work.
      import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
      timeNoop(spark.range(0, 768L << 20, 1, 32)
        .select(bit_xor(xxhash64(col("id")))))
    }
    def controlSched(): Double = {
      import org.apache.spark.sql.functions.{col, sum}
      timeNoop(spark.range(0, 512, 1, 512).select(sum(col("id"))))
    }
    val controlEvery = sys.env.get("SPARK_GRAFT_BENCH_CONTROL_EVERY")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1)
      .getOrElse(15)
    val cpuRuns = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    val schedRuns = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    def runControls(): Unit =
      try {
        val o1 = offset(); cpuRuns += ((o1, controlCpu()))
        val o2 = offset(); schedRuns += ((o2, controlSched()))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ambient control FAILED: ${e.getMessage}")
      }
    // Warm the control plans (codegen) outside the measured samples so
    // the first sample isn't a compile-time outlier.
    try { controlCpu(); controlSched() } catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Sorted name order: hash-map iteration order shifts whenever a
    // query is added, which silently re-assigns cold-scan/warmup costs
    // to different queries and breaks round-over-round comparison.
    // SPARK_GRAFT_BENCH_ONLY (comma-separated names) narrows the run
    // for dev iteration; the driver never sets it, so official rounds
    // always run the full suite (and the splits/recall blocks below
    // are skipped when a subset is active — their inputs may be absent).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timesByName = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to repeats) {
      runControls()
      var sinceControl = 0
      for ((name, fn) <- names) {
        val t0 = System.nanoTime()
        val t =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            // Report the FIRST failure only; later passes of a failing
            // query fail identically and would spam stderr.
            if (!errors.contains(name)) {
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              System.err.println(s"[bench] $name FAILED: ${errors(name)}")
            }
            -1.0
          }
        timesByName(name) = timesByName(name) :+ t
        sinceControl += 1
        if (sinceControl >= controlEvery) { runControls(); sinceControl = 0 }
      }
    }
    runControls()
    val results = names.map { case (name, _) => name -> timesByName(name) }
    def fmt(d: Double): String = if (d < 0) "-1" else f"$d%.4f"
    val best = results.map { case (name, ts) =>
      val ok = ts.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val ok = best.map(_._2).filter(_ >= 0)
    val total = ok.sum
    // total minus the first measured query — the residual session
    // warmup (streaming machinery etc.) the flagship warmup can't reach.
    // With repeats the first PASS of the first query carries that cost;
    // its min usually doesn't, but the exclusion stays for continuity
    // with prior rounds' headline metric.
    val totalExclFirst = total - best.find(_._2 >= 0).map(_._2).getOrElse(0.0)
    // Sum of first passes — comparable to pre-round-6 single-pass runs.
    val firstPassTotal = results.flatMap(_._2.headOption).filter(_ >= 0).sum
    val nFail = errors.size

    // ---- multimodal decode-cost split (outside the query totals) ----
    // Per-stage min times for f1-f5: "scan" = modality-pruned source,
    // "decode" = through the mapPartitions boundary, "full" = the main
    // loop's min. (decode - scan) isolates the stub decoder's cost so a
    // real codec swap has a before/after number.
    val bestMap = best.toMap
    val mmJson = if (only.isDefined) "{}" else
      graft.operators.MultimodalOps.benchStages(spark, sfDir)
      .map { case (q, stage, mk) =>
        val ts = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          try { mk().write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $q/$stage FAILED: ${e.getMessage}")
            -1.0
          }
        }.filter(_ >= 0)
        (q, stage, if (ts.nonEmpty) ts.min else -1.0)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (q, xs) =>
        val stages = xs.map { case (_, s, v) => "\"" + s + "\":" + fmt(v) } :+
          ("\"full\":" + fmt(bestMap.getOrElse(q, -1.0)))
        "\"" + q + "\":" + stages.mkString("{", ",", "}")
      }.mkString("{", ",", "}")

    // ---- ANN index build/probe split (outside the query totals) ----
    // The registered d5/d9/d10 queries are honest one-shots: they
    // retrain the (fixed-cardinality) index inside the query, so the
    // per-query number carries a build cost that a production corpus
    // pays ONCE. This split separates the two: "build" = land the IVF
    // posting lists + PQ codes (Warehouse.buildIvf; shared by d5/d10)
    // or train the d9 codebook; "probe" = min-of-repeats of the query
    // path against the pre-built artifact (DPP-pruned landed lists for
    // d5/d10, the trained book for d9) — the number that scales with
    // query traffic rather than corpus size.
    val annSplit: String =
      if (only.isDefined) "{}"
      else try {
        import graft.operators.SimOps
        import graft.sources.{Tables, Warehouse}
        def minOf(f: => Unit): Double = (1 to repeats).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        val tb = System.nanoTime()
        Warehouse.buildIvf(spark, sfDir)
        val ivfBuild = (System.nanoTime() - tb) / 1e9
        val d5Probe = minOf(Warehouse.annIvfFlatIndexed(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
        val d10Probe = minOf(Warehouse.annIvfPqIndexed(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
        val t9 = System.nanoTime()
        val book = SimOps.pqTrainCodebook(
          SimOps.pqSubs(Tables.embeddings(spark, sfDir),
            Seq("label", "vec_id"), 8, 8), ks = 256, m = 8, kmeansIters = 0)
        val d9Build = (System.nanoTime() - t9) / 1e9
        val d9Probe = minOf(SimOps.pqQuantizeWith(spark, sfDir, book)
          .write.format("noop").mode("overwrite").save())
        s"""{"d5_ann_ivf":{"build":${fmt(ivfBuild)},"probe":${fmt(d5Probe)}},""" +
          s""""d9_pq_quantize":{"build":${fmt(d9Build)},"probe":${fmt(d9Probe)}},""" +
          s""""d10_ann_ivfpq":{"build":${fmt(ivfBuild)},"probe":${fmt(d10Probe)}}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ann_split FAILED: ${e.getMessage}")
        "{}"
      }

    // ---- approximate-operator recall on the bench corpus ----
    // d2/d5: fraction of d1's exact top-10 pairs the ANN variant
    // returns. c2/c3: fraction of the corpus' exact-duplicate pairs
    // (md5-equal texts — est_jaccard 1 / hamming 0, so they must rank)
    // present in the ranked output. All distributive joins + 1-row
    // counts — no driver-side loops.
    def recallJson: String = {
      import org.apache.spark.sql.functions._
      def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
      def recallVs(exact: DataFrame, approx: DataFrame,
                   cols: Seq[String]): Double = {
        val e = exact.select(cols.map(col): _*)
        val n = e.count()
        if (n == 0) -1.0
        else approx.select(cols.map(col): _*)
          .join(e, cols, "left_semi").count().toDouble / n
      }
      val exactTop = run("d1_ann_bruteforce")
      val annCols = Seq("query_id", "cand_id")
      // exact-duplicate ground truth: pairs of md5-equal texts
      val fps = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val dupPairs = fps.as("x").join(fps.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      val pairCols = Seq("a_id", "b_id")
      val entries = Seq(
        "d2_ann_lsh" -> recallVs(exactTop, run("d2_ann_lsh"), annCols),
        "d5_ann_ivf" -> recallVs(exactTop, run("d5_ann_ivf"), annCols),
        "d10_ann_ivfpq" -> recallVs(exactTop, run("d10_ann_ivfpq"), annCols),
        // the refined-index variant (not a registered query): shows
        // what 2 Lloyd rounds buy at this SF next to the d5 default
        "d5_ann_ivf_kmeans2" -> recallVs(exactTop,
          graft.operators.SimOps.annIvf(spark, sfDir, kmeansIters = 2),
          annCols),
        // the build-once landed index (Lloyd-refined routing/codebooks,
        // built by ann_split above): the recall the production probe
        // path actually serves; -1 if the index isn't landed
        "d5_ann_ivf_indexed" -> (try recallVs(exactTop,
          graft.sources.Warehouse.annIvfFlatIndexed(spark, sfDir), annCols)
          catch { case _: Throwable => -1.0 }),
        "d10_ann_ivfpq_indexed" -> (try recallVs(exactTop,
          graft.sources.Warehouse.annIvfPqIndexed(spark, sfDir), annCols)
          catch { case _: Throwable => -1.0 }),
        "c2_dedup_minhash" -> recallVs(dupPairs, run("c2_dedup_minhash"), pairCols),
        "c3_dedup_simhash" -> recallVs(dupPairs, run("c3_dedup_simhash"), pairCols),
        // the occupancy-adequate-cap variant (not a registered query):
        // the default-cap number above is a bucket-occupancy
        // measurement on template-heavy corpora (RecallAtScaleSpec),
        // this one shows the banding itself loses nothing once the cap
        // clears the hot buckets
        "c3_dedup_simhash_cap256" -> recallVs(dupPairs,
          graft.operators.DedupOps.dedupSimhash(spark, sfDir,
            bucketCap = 256),
          pairCols))
      entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    }
    val recalls =
      if (only.isDefined) "{}"
      else try recallJson
      catch { case e: Throwable =>
        System.err.println(s"[bench] recall computation FAILED: ${e.getMessage}")
        "{}"
      }

    val ambient = {
      def arr(xs: Seq[Double]) = xs.map(fmt).mkString("[", ",", "]")
      def med(xs: Seq[Double]): Double =
        if (xs.isEmpty) -1.0
        else {
          val s = xs.sorted; val n = s.length
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
        }
      def mn(xs: Seq[Double]): Double = if (xs.isEmpty) -1.0 else xs.min
      val cs = cpuRuns.map(_._2).toSeq
      val ss = schedRuns.map(_._2).toSeq
      s"""{"cpu_runs":${arr(cs)},"cpu_at":${arr(cpuRuns.map(_._1).toSeq)},""" +
        s""""sched_runs":${arr(ss)},"sched_at":${arr(schedRuns.map(_._1).toSeq)},""" +
        s""""cpu_min":${fmt(mn(cs))},"cpu_median":${fmt(med(cs))},""" +
        s""""sched_min":${fmt(mn(ss))},"sched_median":${fmt(med(ss))}}"""
    }
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_runs":$runs,"repeats":$repeats,"sf":"$sfDir","failed":$nFail,"warmup_sec":${fmt(warmup)},"total_excl_first":${fmt(totalExclFirst)},"total_firstpass":${fmt(firstPassTotal)},"ambient":$ambient,"multimodal_split":$mmJson,"ann_split":$annSplit,"recall":$recalls}"""
    println(line)
    // Driver artifacts historically preserve only the tail of the
    // stdout line (BENCH_r11.json kept 2000 chars), which truncates
    // the per-query map past ~130 queries — so ALSO persist the full
    // JSON to a stable file in the repo, committed with the round.
    // Overwritten per run; the committed copy is the last full run.
    // SPARK_GRAFT_BENCH_OUT overrides the path so concurrent or
    // dev-narrowed invocations can't clobber the committed artifact
    // (the known bench/warehouse isolation constraint).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
                                    "BENCH_last_full.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-JSON file write FAILED: ${e.getMessage}")
    }
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
