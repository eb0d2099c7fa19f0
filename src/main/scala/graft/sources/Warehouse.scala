package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Bucketed-warehouse path — the co-located-join strategy for 100 TB.
  *
  * The raw parquet tables force a shuffle on every fact⋈fact join
  * (orders⋈lineitem appears in b6/b16/b17 and most marketplace
  * queries). At cluster scale the standing fix is to land both facts
  * bucketed by the join key: every bucket pair is co-located, the
  * sort-merge join reads buckets directly, and the per-query Exchange
  * disappears. This module materializes that layout and exposes the
  * bucket-aware loaders; WarehouseSpec proves the exchange-free plan.
  *
  * (The reference gets the same effect from MongoDB's _id/index
  * locality; Spark's equivalent is bucketBy + saveAsTable.)
  */
object Warehouse {

  val Buckets = 32

  /** Per-corpus table namespace (round-14): every landed table name
    * carries a stable suffix derived from the corpus directory's
    * canonical path, so two corpus dirs — or two concurrent sessions on
    * different corpora sharing one spark-warehouse — land and probe
    * DISJOINT tables instead of thrashing each other's indexes through
    * the freshness gates (the round-12 bench/warehouse collision).
    * Callers never see the suffix: every build/ensure/probe API takes
    * the corpus dir and resolves names through [[tbl]].
    */
  def ns(dir: String): String = {
    // scheme-qualified corpus dirs (hdfs://…, s3a://…) are already
    // absolute identities; local paths canonicalize so relative paths
    // and symlinks to one corpus share a namespace
    val canon =
      if (dir.contains("://")) new Path(dir).toUri.toString
      else new java.io.File(dir).getCanonicalPath
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
    md.take(4).map(b => f"$b%02x").mkString
  }

  /** The namespaced physical name of a landed table for a corpus dir. */
  def tbl(dir: String, base: String): String = s"${base}_${ns(dir)}"

  // ---------- Hadoop FileSystem seam (round 16 — portability) ---------------
  //
  // Every filesystem touch of the identity / commit / GC layer —
  // corpus fingerprints, the manifest log, tombstone size probes,
  // committed-location walks, generation GC — goes through the Hadoop
  // FileSystem API resolved from the path's own scheme, so the
  // warehouse layer runs wherever Spark itself reads (file://,
  // hdfs://; a path without a scheme resolves against
  // fs.defaultFS). The one filesystem-SPECIFIC primitive is the
  // manifest commit's atomic fail-if-exists claim — see
  // [[writeManifestAttempt]] for the per-scheme strategy and the S3
  // caveat.

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def warehousePath(spark: SparkSession): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"))

  /** List a directory's immediate children, empty when absent. */
  private def listDir(fs: FileSystem, p: Path)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    try fs.listStatus(p).toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** All regular FILES under `p` (recursive), empty when absent. */
  private def listFilesRec(fs: FileSystem, p: Path)
      : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    if (!fs.exists(p)) return Seq.empty
    val out = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(p, true)
    while (it.hasNext) out += it.next()
    out.result()
  }

  /** Content fingerprint of one corpus table's parquet files — the
    * data-version component of every ensure* freshness key (round-14):
    * a gate keyed on (dir, params) alone silently serves a stale index
    * when the corpus at the same path is rewritten. The fingerprint is
    * a manifest hash: per regular file (sorted by relative path) the
    * path, byte length, and an md5 of the first + last 4 KiB of
    * content. Content-sensitive without reading data bodies (a parquet
    * rewrite perturbs the footer metadata in the tail bytes), O(files)
    * driver-side I/O at any corpus size — the snapshot-id idea of a
    * real table format, derived for plain parquet dirs — and STABLE
    * under a byte-identical re-land (mtime is deliberately excluded),
    * so re-copying the same corpus never forces a rebuild.
    */
  def corpusFingerprint(dir: String, table: String): String = {
    // plain-Configuration resolution (no session at hand in the pure
    // build-key helpers): file:// and fully-qualified hdfs:// URIs
    // both resolve without site config
    val p = new Path(dir, s"$table.parquet")
    manifestHash(p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  /** The manifest-hash body of [[corpusFingerprint]], reusable over
    * any file tree (the tombstone-state fingerprint hashes a warehouse
    * table directory with it).
    */
  private def manifestHash(fs: FileSystem, root: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def eat(st: org.apache.hadoop.fs.FileStatus, rel: String): Unit =
      if (st.isDirectory) {
        listDir(fs, st.getPath).sortBy(_.getPath.getName)
          .foreach(c => eat(c, s"$rel/${c.getPath.getName}"))
      } else if (st.isFile) {
        val len = st.getLen
        md.update(rel.getBytes("UTF-8"))
        md.update(java.nio.ByteBuffer.allocate(8).putLong(len).array())
        val in = fs.open(st.getPath)
        try {
          val head = new Array[Byte](math.min(4096L, len).toInt)
          in.readFully(0L, head)
          md.update(head)
          if (len > 4096L) {
            val tail = new Array[Byte](math.min(4096L, len - 4096L).toInt)
            in.readFully(len - tail.length, tail)
            md.update(tail)
          }
        } finally in.close()
      }
    if (fs.exists(root)) eat(fs.getFileStatus(root), root.getName)
    md.digest().map(b => f"$b%02x").mkString
  }

  /** One-time landing job: write orders + lineitem bucketed by the
    * join key into the session catalog (managed tables under
    * spark.sql.warehouse.dir). Idempotent via overwrite.
    */
  // idempotent across JVMs: drop catalog entries AND any orphaned
  // location a previous session left behind (a managed-table location
  // that exists without a catalog entry fails CREATE TABLE AS SELECT)
  private def dropManaged(spark: SparkSession, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new Path(warehousePath(spark), t)
      val fs = fsOf(spark, loc)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }

  // ---------- atomic manifest commit (round 15) -----------------------------
  //
  // The plain-parquet stand-in for a table format's snapshot commit,
  // closing the two crash windows the round-14 stage/drop/rewrite swap
  // disclosed (re-check→drop, stats-swap→gen-bump): maintenance swaps
  // write their output to NEW generation-suffixed tables and commit by
  // creating ONE manifest version file — an atomic hard link, so the
  // current (posting lists, posting stats, generation, tombstone set)
  // tuple changes in a single filesystem metadata operation and a
  // crash at any point leaves probes on either the old or the new
  // generation, never a mix. The same file doubles as an optimistic-
  // concurrency fence (the public Delta/Iceberg commit idea): every
  // MUTATOR (upsert/delete) bumps the manifest version BEFORE writing,
  // and a swap commits only at snapshot-version+1 — so a compaction
  // that raced ANY writer fails its commit and aborts with the
  // standing generation untouched, instead of dropping files a writer
  // just landed. Single-warehouse scope: concurrent PROCESSES sharing
  // one warehouse serialize through the same atomic link (the
  // adoption story); readers resolve names per query, so a reader
  // mid-plan across a commit can still see a dropped superseded
  // generation — the one residue a real format's snapshot retention
  // would close (disclosed; GC runs at maintenance cadence).

  /** The resolved current state of a corpus namespace's landed
    * swap-managed tables: `tabs` maps logical base → physical base
    * (absent = the plain logical name), `postGen` is the posting
    * index's generation when a manifest has recorded one (else the
    * legacy post_meta column governs).
    */
  private[graft] case class Manifest(version: Long,
                                     tabs: Map[String, String],
                                     postGen: Option[Long])

  private def manifestDir(spark: SparkSession, dir: String): Path =
    new Path(warehousePath(spark), s"_graft_manifest_${ns(dir)}")

  private val ManifestV = "v(\\d{10})".r

  private def parseManifest(v: Long, content: String): Manifest = {
    val lines = content.split("\n").filter(_.contains("="))
    val kv = lines.map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }.toMap
    Manifest(v,
      kv.collect { case (k, pv) if k.startsWith("tab.") =>
        (k.stripPrefix("tab."), pv)
      },
      kv.get("post_gen").map(_.toLong))
  }

  /** All surviving manifest versions, parsed, ascending — the
    * snapshot-retention window ([[recoverMaintenance]]'s superseded-
    * generation GC keeps every physical any surviving version still
    * references, so a reader resolved against any version in the log
    * window stays servable).
    */
  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val st = fs.getFileStatus(p)
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  private def readManifestLog(spark: SparkSession, dir: String)
      : Seq[Manifest] = {
    val d = manifestDir(spark, dir)
    val fs = fsOf(spark, d)
    listDir(fs, d)
      .flatMap(f => f.getPath.getName match {
        case ManifestV(n) => Some((n.toLong, f.getPath))
        case _            => None
      })
      .sortBy(_._1)
      .flatMap { case (v, p) =>
        // cross-process tolerance (round-16 advice fix): the
        // truncation arm of a concurrent commit may delete a version
        // file between our listing and our read — a vanished file was
        // by definition below the concurrent writer's max−16, so it
        // is never the version a correct read returns; skip it
        try Some(parseManifest(v, new String(readBytes(fs, p), "UTF-8")))
        catch {
          case _: java.io.FileNotFoundException => None
        }
      }
  }

  private[graft] def readManifest(spark: SparkSession, dir: String): Manifest = {
    val d = manifestDir(spark, dir)
    val fs = fsOf(spark, d)
    // read only the max version; on a cross-process race (a concurrent
    // commit's truncation arm deleted our listed max — possible only
    // when 17+ commits landed since the listing) re-list and retry
    // rather than crash (round-16 advice fix)
    while (true) {
      val versions = listDir(fs, d)
        .flatMap(f => f.getPath.getName match {
          case ManifestV(n) => Some((n.toLong, f.getPath))
          case _            => None
        })
      if (versions.isEmpty) return Manifest(0L, Map.empty, None)
      val (v, p) = versions.maxBy(_._1)
      try return parseManifest(v, new String(readBytes(fs, p), "UTF-8"))
      catch {
        case _: java.io.FileNotFoundException => ()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One atomic publish attempt of `m` AT its version number. The
    * content is fully written to a temp file first, then CLAIMED at
    * the version name with the strongest fail-if-exists primitive the
    * filesystem offers; returns false on a lost race. Per scheme:
    *
    *  - local (file://): hard link — POSIX link(2) is atomic and
    *    fails iff the name exists. Filesystems without hard links
    *    (overlayfs, some network mounts) degrade to exists-check +
    *    atomic rename: POSIX rename overwrites silently, so the claim
    *    becomes check-then-rename — a TOCTOU residue bounded to
    *    link-less LOCAL filesystems, where two same-version racers
    *    can both "win" the claim (content last-writer-wins; the retry
    *    loops re-read before acting, so the damage is one lost
    *    mutate-closure application per same-instant race; disclosed).
    *  - HDFS (and any FileSystem whose rename is atomic
    *    fail-if-exists, which the HDFS contract guarantees): write
    *    temp, `fs.rename(tmp, target)` — the same commit primitive
    *    every HDFS-backed table format uses.
    *  - S3/object stores: "rename" is copy+delete and NOT
    *    fail-if-exists — running the warehouse mutation layer against
    *    s3a:// requires an external claim service (the position
    *    Delta Lake/Iceberg take with their commit services); this
    *    layer does not silently degrade there, it simply inherits
    *    whatever fs.rename provides. Documented in SURVEY §4.
    */
  private def writeManifestAttempt(spark: SparkSession, dir: String,
                                   m: Manifest): Boolean = {
    val d = manifestDir(spark, dir)
    val fs = fsOf(spark, d)
    fs.mkdirs(d)
    val content = (m.tabs.toSeq.sorted.map { case (k, v) => s"tab.$k=$v" } ++
      m.postGen.map(g => s"post_gen=$g").toSeq).mkString("\n") + "\n"
    val target = new Path(d, f"v${m.version}%010d")
    val won =
      if ("file" == fs.getUri.getScheme) {
        val ld = java.nio.file.Paths.get(
          fs.makeQualified(d).toUri.getPath)
        val tgt = ld.resolve(target.getName)
        val tmp = java.nio.file.Files.createTempFile(ld, "commit_", ".tmp")
        try {
          java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
          try { java.nio.file.Files.createLink(tgt, tmp); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: UnsupportedOperationException |
                 _: java.nio.file.FileSystemException
                if !java.nio.file.Files.exists(tgt) =>
              java.nio.file.Files.move(tmp, tgt,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
          }
        } finally { java.nio.file.Files.deleteIfExists(tmp); () }
      } else {
        val tmp = new Path(d, s"commit_${java.util.UUID.randomUUID}.tmp")
        val out = fs.create(tmp, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        val ok =
          try fs.rename(tmp, target)
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          }
        if (!ok) fs.delete(tmp, false)
        ok
      }
    if (won) {
      // log truncation (every streamed micro-batch bumps a version, so
      // the log must not grow with stream length): pruning strictly
      // below max−16 keeps the snapshot-retention window AND any
      // in-flight reader's listed max alive
      listDir(fs, d).foreach { f =>
        f.getPath.getName match {
          case ManifestV(n) if n.toLong < m.version - 16 =>
            fs.delete(f.getPath, false); ()
          case _ => ()
        }
      }
    }
    won
  }

  /** Mutator fence: bump the manifest version (content otherwise
    * unchanged unless `mutate` says so), retrying on collision, and
    * return the COMMITTED manifest — callers must resolve the tables
    * they write from the returned state, so a writer that raced a
    * compaction lands in the new generation, and the compaction that
    * raced this writer fails its own commit (its snapshot version is
    * stale). Write-side cost: one tiny file per mutation batch —
    * curation cadence, never probe cost.
    */
  private def bumpManifest(spark: SparkSession, dir: String,
                           mutate: Manifest => Manifest = identity)
      : Manifest = {
    var committed: Option[Manifest] = None
    while (committed.isEmpty) {
      val cur = readManifest(spark, dir)
      val next = mutate(cur).copy(version = cur.version + 1)
      if (writeManifestAttempt(spark, dir, next)) committed = Some(next)
    }
    committed.get
  }

  /** Mutator re-land fence (round-16 advice fix — the residual
    * lost-batch window): the version bump BEFORE a mutator's data
    * write makes any maintenance swap that snapshotted earlier fail
    * its commit, but a swap that read its snapshot AFTER the bump and
    * committed while the data write was still in flight could fold a
    * generation that never saw the batch — the partition guard
    * catches a batch that lands before the guard's re-check, and this
    * closes the remaining post-guard sliver: after the data write
    * completes, re-read the manifest, and if a swap re-addressed any
    * of the mutator's tables (or moved the posting generation) since
    * our bump, re-land the batch against the new current state. The
    * writes are dynamic overwrites of the batch's own partitions, so
    * a re-land is idempotent. One interleaving needs care: a swap that
    * began entirely AFTER the batch landed ABSORBS it (its snapshot
    * and guard both saw the partitions) and commits fine — a blind
    * re-land would then double the folded rows. So when movement is
    * detected, the caller's `absorbed` probe checks the new current
    * generation for the batch's content first: present → the swap
    * carried it, nothing to do; absent → the swap snapshotted before
    * the write and the batch must re-land. (Mutators whose re-land is
    * inherently idempotent under absorption — deleteDocs, whose
    * tombstone rewrite is content-identical and whose stats delta is
    * recomputed against the CURRENT physical index — leave the
    * default always-re-land.) Bounded retries — a mutator that keeps
    * losing to back-to-back swaps fails loudly rather than ever
    * dropping a batch silently.
    */
  private[graft] def mutatorFenced(spark: SparkSession, dir: String,
                                   logicals: Seq[String],
                                   absorbed: Manifest => Boolean = _ => false)
                                  (write: Manifest => Unit): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val mf = bumpManifest(spark, dir)
      write(mf)
      val now = readManifest(spark, dir)
      val moved = (logicals.exists(l => physBase(now, l) != physBase(mf, l)) ||
        (logicals.contains("graft_post_lists") && now.postGen != mf.postGen)) &&
        !absorbed(now)
      if (!moved) done = true
      else if (attempts >= 3)
        throw new IllegalStateException(
          s"batch on ${logicals.mkString(",")} re-landed $attempts times " +
            "against concurrent maintenance swaps and the state moved " +
            "again — stop the maintenance loop and re-run this batch")
      else attempts += 1
    }
  }

  /** Swap commit: ONE attempt at `expect.version + 1` — the single
    * atomic commit point of compaction/vacuum/undelete. False iff any
    * writer committed since `expect` was read; the caller aborts and
    * drops its staged generation (the standing one was never touched).
    */
  private def tryCommitManifest(spark: SparkSession, dir: String,
                                expect: Manifest, next: Manifest): Boolean =
    writeManifestAttempt(spark, dir,
      next.copy(version = expect.version + 1))

  /** The physical base name currently serving a logical swap-managed
    * table. */
  private def physBase(m: Manifest, logical: String): String =
    m.tabs.getOrElse(logical, logical)

  /** Rebuild preamble for stores whose current generation may live
    * under a versioned physical name: drop that superseded physical
    * and point the manifest back at the plain logical names the build
    * is about to write (plus the new posting generation when given).
    */
  private def resetSwapTabs(spark: SparkSession, dir: String,
                            logicals: Seq[String],
                            postGen: Option[Long] = None): Unit = {
    val m = readManifest(spark, dir)
    // manifest first, THEN drop (round-16 advice fix): dropping the
    // superseded versioned physical before the bump left a crash
    // window where the manifest named a dropped table and every probe
    // failed until the rebuild was re-run; committing the bump first
    // means a crash leaves only an orphaned versioned table the
    // superseded-generation GC collects
    if (logicals.exists(m.tabs.contains) || postGen.isDefined) {
      bumpManifest(spark, dir, cur => cur.copy(
        tabs = cur.tabs -- logicals,
        postGen = postGen.orElse(cur.postGen)))
      ()
    }
    logicals.foreach { l =>
      val p = physBase(m, l)
      if (p != l) dropManaged(spark, Seq(tbl(dir, p)))
    }
  }

  /** Public resolver: the full physical table name currently serving
    * `logical` for this corpus dir — what specs, tools and external
    * readers must use for any table a maintenance swap may have
    * re-addressed (post/ivf lists, post stats, tombstones).
    */
  def currentTable(spark: SparkSession, dir: String, logical: String): String =
    tbl(dir, physBase(readManifest(spark, dir), logical))

  def build(spark: SparkSession, dir: String): Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_orders_b"), tbl(dir, "graft_lineitem_b")))
    Tables.orders(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_orders_b"))
    Tables.lineitem(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_lineitem_b"))
  }

  def ordersB(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_orders_b"))
  def lineitemB(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_lineitem_b"))

  /** The b6-shaped revenue join over the bucketed layout: orders ⋈
    * lineitem with NO shuffle on either side (bucket-local sort-merge).
    */
  def revenueJoinBucketed(spark: SparkSession, dir: String): DataFrame =
    lineitemB(spark, dir)
      .join(ordersB(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))

  /** Land documents/embeddings bucketed on their shared id space —
    * the layout d7's metadata-filtered ANN wants: the embeddings ⋈
    * filtered-documents semi join becomes bucket-local (no Exchange on
    * either side; WarehouseSpec proves it).
    */
  def buildAnn(spark: SparkSession, dir: String): Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_documents_b"), tbl(dir, "graft_embeddings_b")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id").sortBy("doc_id")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_documents_b"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "vec_id").sortBy("vec_id")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_embeddings_b"))
  }

  def documentsB(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_documents_b"))
  def embeddingsB(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_embeddings_b"))

  /** d7 over the bucketed layout: identical semantics/output to
    * `SimOps.annFiltered` (same shared plan body), but the candidate
    * semi join reads co-located buckets instead of shuffling both
    * fact-scale sides.
    */
  def annFilteredBucketed(spark: SparkSession, dir: String, k: Int = 10,
                          qmod: Int = 50, lang: String = "en"): DataFrame = {
    val emb = embeddingsB(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val meta = documentsB(spark, dir).filter(col("lang") === lang)
      .select(col("doc_id"))
    graft.operators.SimOps.annFilteredFrom(emb, meta, k, qmod)
  }

  /** One-time IVF-PQ index landing: every vector routed to its
    * `nAssign` nearest cells and PQ-encoded, posting lists written
    * PARTITIONED BY cent_id — the physical layout where probing a cell
    * is DIRECTORY PRUNING, not a filter. d10 recomputes assignment and
    * codes per run (the honest one-shot form); a production index is
    * built once and re-read per query batch, and THIS is that table.
    * Rows: (vec_id, sub_j, ce, cn) under cent_id=... partitions — a
    * vector in two cells has its codes duplicated in both, exactly
    * like a real IVF posting list.
    */
  /** Resolve a coarse-quantizer sizing rule against the corpus'
    * vector count: "fixed:<k>" pins nlist = k (the registered/oracled
    * configs); "sqrt:<base>@<n0>" grows nlist = max(base,
    * round(base·√(n/n0))) — the measured sustainable curve (c9/c11/
    * d16b scaled arms: nlist ∝ √N keeps both routing and per-cell work
    * O(N^1.5)). Persisting the RULE with the index (graft_ivf_meta)
    * means a deployment's rebuild at 10× the data sizes itself — no
    * hand-carried constant.
    */
  def resolveNlist(rule: String, n: Long): Int = rule.split("[:@]") match {
    case Array("fixed", k) => k.toInt
    case Array("sqrt", base, n0) =>
      math.max(base.toInt,
        math.round(base.toInt * math.sqrt(n.toDouble / n0.toLong)).toInt)
    case _ => throw new IllegalArgumentException(s"bad nlist rule: $rule")
  }

  /** The landed index's sizing rule (graft_ivf_meta.nlist_rule). Read
    * by NAME, not position: a pre-round-13 meta table surviving in a
    * shared warehouse has only build_key, and a positional read there
    * threw an uncontextualized ArrayIndexOutOfBounds (round-13 advice
    * fix) — fail with the actionable message instead.
    */
  def landedNlistRule(spark: SparkSession, dir: String): String = {
    val meta = spark.table(tbl(dir, "graft_ivf_meta"))
    require(meta.columns.contains("nlist_rule"),
      "legacy graft_ivf_meta schema (no nlist_rule column) — rebuild " +
        "the landed IVF index (Warehouse.buildIvf) to refresh it")
    meta.select(col("nlist_rule")).collect()(0).getString(0)
  }

  /** Ruled-ensure vector counts memoized per (dir, excludeMod): a
    * ruled ensureIvf must resolve its rule against the build slice's
    * count, but paying a full embeddings scan on EVERY freshness check
    * (e.g. each timed repeat of a ScaleBench probe) charges index-build
    * cost to the probe label (round-13 advice fix). The corpus dirs are
    * immutable by contract (see ensureIvf); the fingerprint-keyed gate
    * of round 14 invalidates this cache when the data actually changes.
    */
  private val ruledCountCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, String), java.lang.Long]()

  private def ruledCount(spark: SparkSession, dir: String,
                         excludeMod: Int): Long = {
    val key = (dir, excludeMod, corpusFingerprint(dir, "embeddings"))
    Option(ruledCountCache.get(key)).map(_.longValue()).getOrElse {
      val embAll = Tables.embeddings(spark, dir)
      val n = (if (excludeMod <= 0) embAll
               else embAll.filter(pmod(col("vec_id"),
                                       lit(excludeMod)) =!= 0)).count()
      ruledCountCache.put(key, n)
      n
    }
  }

  /** `nlistRule`: "fixed" keeps the passed `nlist` (every registered/
    * oracled path); any other value is a [[resolveNlist]] rule string
    * resolved against the build slice's vector count, overriding
    * `nlist`. The applied rule rides in graft_ivf_meta next to the
    * build key, so freshness gating distinguishes a ruled build from a
    * fixed one even at the same resolved nlist.
    */
  def buildIvf(spark: SparkSession, dir: String, nlist: Int = 64,
               nAssign: Int = 4, ks: Int = 256, m: Int = 8,
               subDim: Int = 8, kmeansIters: Int = 4,
               excludeMod: Int = 0, nlistRule: String = "fixed"): Unit = {
    import graft.operators.SimOps
    dropManaged(spark, Seq(tbl(dir, "graft_ivf_lists"), tbl(dir, "graft_ivf_cents"),
                           tbl(dir, "graft_ivf_book"), tbl(dir, "graft_ivf_meta")))
    resetSwapTabs(spark, dir, Seq("graft_ivf_lists"))
    // excludeMod > 0 builds the STANDING index of the incremental
    // story: vectors with vec_id % excludeMod == 0 are the
    // yet-to-arrive batch and take the upsertIvf path later.
    val embAll = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val emb0 = if (excludeMod <= 0) embAll
      else embAll.filter(pmod(col("vec_id"), lit(excludeMod)) =!= 0)
    val (resolvedNlist, ruleTag) =
      if (nlistRule == "fixed") (nlist, s"fixed:$nlist")
      else (resolveNlist(nlistRule, emb0.count()), nlistRule)
    val nlistR = resolvedNlist
    val emb = emb0
    // The build-once path defaults to Lloyd-REFINED coarse centroids
    // (kmeansIters=4): the refinement is a build-time cost amortized
    // across every probe, and the measured sweeps (IvfGrid/KmSweep,
    // sf0.1) buy recall 0.79 → 0.875 at identical probe cost (km=8
    // adds only +0.0025 more — past the knee). The centroid set is
    // PERSISTED with the index — a real IVF index ships its centroids;
    // probes read the ≤nlist-row table instead of re-deriving routing.
    val cents = SimOps.ivfCentroids(emb, nlistR, kmeansIters)
    cents.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_ivf_cents"))
    val landedCents = spark.table(tbl(dir, "graft_ivf_cents"))
    val lists = SimOps.nearestCells(landedCents)(
        emb, "vec_id", "embedding", "nrm", nAssign)
      .select(col("vec_id"), col("cent_id"))
    // The PQ codebook is PERSISTED too: an upserted batch must encode
    // against the book the standing codes used, or its ADC distances
    // are incomparable with theirs.
    val book = SimOps.pqTrainCodebook(
      SimOps.pqSubs(emb.select(col("vec_id"), col("embedding")),
                    Seq("vec_id"), m, subDim), ks, m, kmeansIters)
    writeBook(spark, dir, book)
    val codes = SimOps.pqEncodeWith(
        SimOps.pqSubs(emb.select(col("vec_id"), col("embedding")),
                      Seq("vec_id"), m, subDim), book)
      .select(col("vec_id"), col("sub_j"), col("ce"), col("cn"))
    // batch_id is the idempotency key (base build = -1): each upsert
    // lands under its own batch_id partitions, so a replayed
    // micro-batch DYNAMIC-overwrites exactly its own files and never
    // double-appends (see upsertIvfFrom). cent_id stays a partition
    // column, so probe-side dynamic partition pruning is unchanged.
    lists.join(codes, "vec_id")
      .select(col("vec_id"), col("sub_j"), col("ce"), col("cn"),
              lit(-1L).as("batch_id"), col("cent_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id", "cent_id")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_ivf_lists"))
    // Build metadata rides with the index (a real index ships its
    // build params): freshness gates like ensureIvf compare against
    // this instead of trusting in-process memos, so a rebuild at
    // different params (specs, grids) can never be mistaken for the
    // standing index.
    import spark.implicits._
    Seq((ivfBuildKey(dir, nlistR, nAssign, ks, m, subDim, kmeansIters,
                     excludeMod, ruleTag), ruleTag))
      .toDF("build_key", "nlist_rule")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_ivf_meta"))
  }

  private def ivfBuildKey(dir: String, nlist: Int, nAssign: Int, ks: Int,
                          m: Int, subDim: Int, kmeansIters: Int,
                          excludeMod: Int, ruleTag: String): String =
    s"$dir|nlist=$nlist|nAssign=$nAssign|ks=$ks|m=$m|subDim=$subDim|" +
      s"km=$kmeansIters|excl=$excludeMod|rule=$ruleTag|" +
      s"fp=${corpusFingerprint(dir, "embeddings")}"

  /** Build the IVF-PQ index only if the landed one (per its own
    * metadata table) doesn't already match these parameters — the
    * query-side freshness gate: first touch in a JVM pays the build,
    * every subsequent probe is probe-cost only, exactly the
    * amortization a production index exists for. A ruled ensure
    * (nlistRule != "fixed") resolves the rule against the build
    * slice's current count, so growing data forces the resize rebuild
    * a √N deployment wants.
    */
  def ensureIvf(spark: SparkSession, dir: String, nlist: Int = 64,
                nAssign: Int = 4, ks: Int = 256, m: Int = 8,
                subDim: Int = 8, kmeansIters: Int = 4,
                excludeMod: Int = 0, nlistRule: String = "fixed"): Unit = {
    recoverMaintenance(spark, dir)
    val ivfListsPhys = physBase(readManifest(spark, dir), "graft_ivf_lists")
    adoptLanded(spark, dir, "graft_ivf_meta")
    adoptLanded(spark, dir, "graft_ivf_cents")
    adoptLanded(spark, dir, "graft_ivf_book")
    adoptLanded(spark, dir, ivfListsPhys, Seq("batch_id", "cent_id"))
    val (resolved, ruleTag) =
      if (nlistRule == "fixed") (nlist, s"fixed:$nlist")
      else (resolveNlist(nlistRule, ruledCount(spark, dir, excludeMod)),
            nlistRule)
    val key = ivfBuildKey(dir, resolved, nAssign, ks, m, subDim,
                          kmeansIters, excludeMod, ruleTag)
    val fresh = spark.catalog.tableExists(tbl(dir, "graft_ivf_meta")) &&
      spark.catalog.tableExists(tbl(dir, ivfListsPhys)) && {
        val r = spark.table(tbl(dir, "graft_ivf_meta")).collect()
        r.length == 1 && r(0).getString(0) == key
      } &&
      // an excl=0 build admits NO legitimate upserts: extra batch_id
      // partitions on top of a full build double-count the overlapping
      // vectors' postings (round-13 advice) — detect and rebuild
      // instead of serving the corrupted index as fresh forever
      (excludeMod != 0 ||
        landedBatchIds(spark, tbl(dir, ivfListsPhys)) == Set(-1L))
    if (!fresh)
      buildIvf(spark, dir, nlist, nAssign, ks, m, subDim, kmeansIters,
               excludeMod, nlistRule)
  }

  /** The distinct batch_id partition values of a landed
    * batch_id-partitioned table — a catalog partition listing, never a
    * data scan (bounded by the number of landed batches).
    */
  private def landedBatchIds(spark: SparkSession, table: String): Set[Long] =
    spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0).split("/")(0).stripPrefix("batch_id=").toLong)
      .toSet

  /** Parse the excludeMod a landed index was built with out of its
    * metadata key — the coverage guard for the dir-based upsert forms:
    * an upsert of the `id % batchMod == 0` slice is overlap-free iff
    * the standing build excluded a slice covering it
    * (`batchMod % excl == 0`); anything else would double-count the
    * overlapping ids' postings (round-13 advice fix).
    */
  private def requireUpsertCoverage(spark: SparkSession, metaTable: String,
                                    batchMod: Int): Unit = {
    require(spark.catalog.tableExists(metaTable),
      s"no landed index metadata ($metaTable) — build the index first")
    val key = spark.table(metaTable).select(col("build_key"))
      .collect()(0).getString(0)
    val excl = "\\|excl=(\\d+)".r.findFirstMatchIn(key)
      .map(_.group(1).toInt).getOrElse(0)
    require(excl > 0 && batchMod % excl == 0,
      s"standing index was built with excludeMod=$excl, which does not " +
        s"cover the arriving id % $batchMod == 0 slice — upserting would " +
        s"double-count the overlapping ids (build with " +
        s"excludeMod=$batchMod first)")
  }

  /** d12: the landed-index ANN probe as a driver-checked query — the
    * production path d10 only rehearses: `ensureIvf` lands (or
    * re-uses) the partitioned posting lists + persisted centroids/
    * codebook, then `annIvfPqIndexed` probes them under dynamic
    * partition pruning. Built at kmeansIters=0 so the routing is the
    * md5-rank sample d10's oracle replays — the output is
    * row-identical to the one-shot d10 (WarehouseSpec proves the
    * identity; the SAME DuckDB SQL hash-gates both), which is exactly
    * the point: same answer, index amortized instead of rebuilt.
    */
  def annIndexed(spark: SparkSession, dir: String, k: Int = 10,
                 qmod: Int = 50, nProbe: Int = 8,
                 nq: Int = 0): DataFrame = {
    ensureIvf(spark, dir, kmeansIters = 0)
    annIvfPqIndexed(spark, dir, k, qmod, nProbe, nq = nq)
  }

  /** d12b: the vector-side deletion demo — d12's landed probe AFTER
    * retracting the `vec_id % delMod == 0` slice through
    * [[deleteDocs]] (the e16c flow on the IVF index): tombstoned
    * vectors drop from the posting hits before ADC, so the result is
    * hash-identical to probing an index whose lists never held them —
    * the derived oracle is d10's replay with the slice filtered out of
    * the CANDIDATE membership only (routing, codebook and the query
    * batch are untouched, exactly like the physical index). Own
    * what-if scope (d12/d15 and every default-scope row unaffected);
    * re-deletes per invocation, so the benched cost is delete + probe.
    */
  def annIndexedDeleted(spark: SparkSession, dir: String, k: Int = 10,
                        qmod: Int = 50, nProbe: Int = 8,
                        delMod: Int = 17): DataFrame = {
    ensureIvf(spark, dir, kmeansIters = 0)
    val scope = s"demo-vec-m$delMod"
    deleteDocs(spark, dir,
      Tables.embeddings(spark, dir)
        .filter(pmod(col("vec_id"), lit(delMod)) === 0)
        .select(col("vec_id")),
      scope)
    annIvfPqIndexed(spark, dir, k, qmod, nProbe, tombScope = scope)
  }

  /** d16b: kNN classification routed through the LANDED IVF-PQ index —
    * the scale fix for d16's one design gap (its exact form scans the
    * full corpus per classify batch; at 100 TB labeling 100 vectors
    * would cost a complete corpus pass). Here the neighbor search IS
    * d15's probe: `ensureIvf` lands (or re-uses) the cent_id-partitioned
    * posting lists, the fixed-|Q| batch routes through the persisted
    * centroids, dynamic partition pruning opens only probed cells, ADC
    * shortlists from byte-codes, and the exact rerank touches
    * rerank·k rows per query — so classification now costs what SEARCH
    * costs (the postings are query-independent; one landed index serves
    * both). The vote tail is shared with d16 verbatim (knnVoteTail), so
    * tie-breaks cannot drift; d16's exact scan stays registered as the
    * recall foil the way d1 backs d2/d5. Built at kmeansIters=0 so the
    * routing is the md5-rank sample the DuckDB oracle replays — the
    * oracle is DERIVED from d14's fixed-|Q| replay composed with d16's
    * vote SQL (one source of truth for the whole IVF-PQ pipeline).
    */
  /** `kmeansIters`: the registered/oracled form builds at 0 (md5-rank
    * sample routing — the d12/d15 convention that keeps the DuckDB
    * replay exact); a production deployment builds refined centroids
    * once (the ensureIvf default km=4 — recall 0.79 → 0.875 at equal
    * probe cost per the IvfGrid sweeps) and RecallAtScaleSpec floors
    * BOTH arms' label agreement against the exact d16.
    */
  /** `nlist` (default 64 — the registered/oracled config): at a fixed
    * nlist the probe's pruning factor is nProbe·nAssign/nlist, so the
    * ×1000 slice reads HALF the posting rows per query and ADC's
    * m 8-dots equal one 64-dot — measured ~even with d16's codegen'd
    * full scan there. The sustainable deployment scales nlist ∝ √N
    * exactly like c9/c11's scaled-nlist arm (the ScaleBench
    * `d16b_knn_scalednlist` label measures it); the registered query
    * keeps nlist=64 because the oracle replays that routing.
    */
  def knnClassifyIndexed(spark: SparkSession, dir: String, k: Int = 10,
                         nq: Int = graft.operators.SimOps.FixedQBatch,
                         kmeansIters: Int = 0, nlist: Int = 64,
                         nlistRule: String = "fixed")
      : DataFrame = {
    import graft.operators.SimOps
    ensureIvf(spark, dir, nlist = nlist, kmeansIters = kmeansIters,
              nlistRule = nlistRule)
    val top = annIvfPqIndexed(spark, dir, k, nq = nq)
      .select(col("query_id"), col("cand_id"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val actual = SimOps.fixedQueryBatch(emb, nq, carry = Seq("label"))
      .select(col("query_id"), col("label").as("actual_label"))
    SimOps.knnVoteTail(spark, dir, top, actual)
  }

  /** Incremental index maintenance — the d11 production path: route
    * the arriving batch (`vec_id % batchMod == 0`) through the
    * PERSISTED frozen centroids, PQ-encode it against the PERSISTED
    * codebook, and APPEND the new posting rows into the partitioned
    * lists table. The standing postings are never read, rewritten, or
    * re-shuffled — the job's cost is O(|batch|·nlist) routing plus an
    * append of |batch|·nAssign rows into the touched cent_id
    * directories (WarehouseSpec asserts the pre-existing data files
    * are bit-identical after the upsert, and that probe-after-upsert
    * is result-identical to the one-shot `SimOps.annIvfIncremental`).
    */
  def upsertIvf(spark: SparkSession, dir: String, batchMod: Int,
                nAssign: Int = 4, m: Int = 8, subDim: Int = 8,
                batchKey: Long = 0L): Unit = {
    requireUpsertCoverage(spark, tbl(dir, "graft_ivf_meta"), batchMod)
    upsertIvfFrom(Tables.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(batchMod)) === 0)
      .select(col("vec_id"), col("embedding")), dir, nAssign, m, subDim,
      batchKey)
  }

  /** The upsert body over a caller-supplied `(vec_id, embedding)`
    * batch frame — shared by the dir-based form above and the
    * streaming maintenance flow (`VectorStream.maintainIvf`, whose
    * foreachBatch hands each arriving micro-batch here with its
    * Spark-assigned batchId as `batchKey`).
    *
    * Exactly-once under replay: the write is a DYNAMIC partition
    * overwrite of this batch's own `batch_id=batchKey` partitions.
    * foreachBatch is at-least-once (a crash between the append and
    * the checkpoint commit replays the micro-batch); with a plain
    * append the replay would double every posting row of the batch.
    * The overwrite replaces exactly the partitions this batchKey
    * previously produced — standing postings (batch_id=-1 and other
    * batches) are never touched, so the append-only invariant
    * WarehouseSpec pins still holds, and a replay is a no-op in
    * content (VectorStreamSpec pins the double-apply).
    */
  def upsertIvfFrom(batchEmb: DataFrame, dir: String, nAssign: Int = 4,
                    m: Int = 8, subDim: Int = 8, batchKey: Long = 0L): Unit = {
    import graft.operators.SimOps
    val spark = batchEmb.sparkSession
    // live-tombstoned vectors stay deleted (the upsertPostingsFrom
    // contract)
    val batch = exceptTombstoned(batchEmb, dir, "vec_id")
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val lists = SimOps.nearestCells(ivfCents(spark, dir))(
        batch, "vec_id", "embedding", "nrm", nAssign)
      .select(col("vec_id"), col("cent_id"))
    val codes = SimOps.pqEncodeWith(
        SimOps.pqSubs(batch.select(col("vec_id"), col("embedding")),
                      Seq("vec_id"), m, subDim), readBook(spark, dir))
      .select(col("vec_id"), col("sub_j"), col("ce"), col("cn"))
    val rows = lists.join(codes, "vec_id")
      .select(col("vec_id"), col("sub_j"), col("ce"), col("cn"),
              lit(batchKey).as("batch_id"), col("cent_id"))
    // manifest fence BEFORE the write + re-land re-check AFTER it
    // (see [[mutatorFenced]]); absorption probe as in
    // upsertPostingsFrom
    val absorbed = (now: Manifest) =>
      rows.select(col("vec_id")).limit(1).collect().headOption.forall { r =>
        !spark.table(tbl(dir, physBase(now, "graft_ivf_lists")))
          .filter(col("vec_id") === r.getLong(0)).isEmpty
      }
    mutatorFenced(spark, dir, Seq("graft_ivf_lists"), absorbed) { mf =>
      val owKey = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.get(owKey)
      spark.conf.set(owKey, "dynamic")
      try rows.write.mode(SaveMode.Overwrite)
        .insertInto(tbl(dir, physBase(mf, "graft_ivf_lists")))
      finally spark.conf.set(owKey, prior)
    }
  }

  private def writeBook(spark: SparkSession, dir: String,
                        book: graft.functions.PqCodebook): Unit = {
    import spark.implicits._
    book.entries.zipWithIndex.flatMap { case (cs, j) =>
      cs.map(c => (j, c.centId, c.ce.toSeq, c.cn))
    }.toSeq.toDF("sub_j", "cent_id", "ce", "cn")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_ivf_book"))
  }

  private def readBook(spark: SparkSession, dir: String): graft.functions.PqCodebook = {
    val rows = spark.table(tbl(dir, "graft_ivf_book"))
      .select(col("sub_j"), col("cent_id"), col("ce"), col("cn")).collect()
    val byJ = rows.groupBy(_.getInt(0))
    new graft.functions.PqCodebook(
      (0 to byJ.keys.max).toArray.map { j =>
        byJ(j).map(r => new graft.functions.PqCent(
            r.getLong(1), r.getSeq[Float](2).toArray, r.getDouble(3)))
          .sortBy(_.centId)
      })
  }

  def ivfLists(spark: SparkSession, dir: String): DataFrame =
    spark.table(currentTable(spark, dir, "graft_ivf_lists"))
  def ivfCents(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_ivf_cents"))

  /** Land the event log bucketed by user_id with the canonical
    * epoch-ms column materialized — the layout the reference's
    * per-entity event machine implies (Mongo's _id locality): every
    * per-user fold (a1 latest-event, a5 sessionize, a6 state fold,
    * a7 funnel, a12 as-of) keys on user_id, so a user_id-bucketed
    * store satisfies their ClusteredDistribution from the SCAN and
    * the per-query Exchange of the full 100 TB event log disappears —
    * aggregations go map-side-only, windows sort within buckets
    * without re-sharding. sortBy(user_id, ms, event_id) additionally
    * lands each bucket in fold order.
    */
  def buildEvents(spark: SparkSession, dir: String): Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_events_b")))
    Tables.eventsMs(spark, dir)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "user_id").sortBy("user_id", "ms", "event_id")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_events_b"))
  }

  def eventsB(spark: SparkSession, dir: String): DataFrame =
    spark.table(tbl(dir, "graft_events_b"))

  /** a1 over the bucketed event log: identical semantics/output to
    * `EventOps.latestEventPerUser` (same shared plan body), with the
    * groupBy(user_id) satisfied by the bucketed scan — zero shuffle
    * exchanges below the final presentation sort (WarehouseSpec
    * proves it).
    */
  def latestEventPerUserBucketed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EventOps.latestEventPerUserFrom(eventsB(spark, dir))

  /** a5 over the bucketed event log — the window's
    * partitionBy(user_id) is satisfied by bucketing: sort-only, no
    * re-shard of the log.
    */
  def sessionizeBucketed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EventOps.sessionizeFrom(eventsB(spark, dir))

  /** a6 over the bucketed event log. */
  def stateFoldBucketed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EventOps.stateFoldFrom(eventsB(spark, dir))

  /** One-time MinHash index landing for p11's incremental dedup: the
    * standing corpus' bucket-capped LSH band keys + signatures. An
    * arriving batch probes these tables via a broadcast of ITS side —
    * no standing row ever re-shards (WarehouseSpec asserts no exchange
    * sits above either index scan in the probe plan). At 100 TB the
    * bands table is the crawler's persistent dedup state, appended as
    * batches are accepted; the cap is a build-time posting-list limit.
    */
  /** Land c12's standing index: the per-shard bloom table (nShards
    * rows) and the fingerprint→min-doc store. Rebuilt per dir; the
    * probe (DedupOps.bloomDedupIndexed) then never reads the history
    * corpus at all.
    */
  /** Generic freshness gate for the band/sketch index family (bloom,
    * minhash, phash, audio): fresh iff the meta table exists, every
    * data table exists, and the landed build key matches — the
    * ensureIvf/ensurePostings convention factored once. The key always
    * folds in the corpus fingerprint, so a rewritten corpus at the
    * same path rebuilds (round-14 data-version contract).
    */
  private def metaFresh(spark: SparkSession, dir: String, metaBase: String,
                        dataBases: Seq[String], key: String): Boolean =
    (metaBase +: dataBases).forall(b =>
      adoptLanded(spark, dir, b)) && {
      val r = spark.table(tbl(dir, metaBase)).collect()
      r.length == 1 && r(0).getString(0) == key
    }

  private def writeMeta(spark: SparkSession, dir: String, metaBase: String,
                        key: String): Unit = {
    import spark.implicits._
    Seq(key).toDF("build_key")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, metaBase))
  }

  def buildBloom(spark: SparkSession, dir: String,
                 fpp: Double = 0.01, newMod: Int = graft.operators.DedupOps.IncrementalNewMod): Unit = {
    // shard count pinned to DedupOps.BloomShards: the landed probe
    // routes by pmod(fp, BloomShards), and a bloom table built at any
    // other sharding would silently mis-route probes (an empty shard
    // also can't be told apart from a missing one at read time, so the
    // count can't be derived from the table safely)
    dropManaged(spark, Seq(tbl(dir, "graft_bloom_shards"), tbl(dir, "graft_bloom_fps"),
                           tbl(dir, "graft_bloom_meta")))
    val (shards, fps) = graft.operators.DedupOps
      .bloomIndexParts(spark, dir, graft.operators.DedupOps.BloomShards,
                       fpp, newMod)
    shards.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_bloom_shards"))
    fps.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_bloom_fps"))
    writeMeta(spark, dir, "graft_bloom_meta",
              bloomBuildKey(spark, dir, fpp, newMod))
  }

  private def bloomBuildKey(spark: SparkSession, dir: String, fpp: Double,
                            newMod: Int): String =
    s"$dir|shards=${graft.operators.DedupOps.BloomShards}|fpp=$fpp|" +
      s"newMod=$newMod|fp=${corpusFingerprint(dir, "documents")}|" +
      // a bloom cannot forget: a live deletion keys a rebuild (the
      // ensureNbModel pattern) — the exact path; the probe-side owner
      // anti-join covers the window until the next gated probe
      s"tfp=${tombstoneFingerprint(spark, dir)}"

  /** Build c12's bloom index only if the landed one doesn't match
    * these parameters (the ensurePostings gate applied to the sketch
    * family): first probe in a JVM pays the build, every subsequent
    * probe is membership-gate cost only.
    */
  def ensureBloom(spark: SparkSession, dir: String, fpp: Double = 0.01,
                  newMod: Int = graft.operators.DedupOps.IncrementalNewMod): Unit =
    if (!metaFresh(spark, dir, "graft_bloom_meta",
                   Seq("graft_bloom_shards", "graft_bloom_fps"),
                   bloomBuildKey(spark, dir, fpp, newMod)))
      buildBloom(spark, dir, fpp, newMod)

  /** See [[buildBloom]]; delegate kept here so the landed arm lives
    * next to the other warehouse probes.
    */
  def bloomDedupIndexed(spark: SparkSession, dir: String,
                        newMod: Int = graft.operators.DedupOps.IncrementalNewMod): DataFrame =
    graft.operators.DedupOps.bloomDedupIndexed(spark, dir, newMod)

  /** Land f7's standing image-catalog index: the bucket-capped band
    * table and the (doc_id, phash) signature store. The probe
    * (MultimodalOps.imageNearDupIndexed) then hashes only the arriving
    * batch — the catalog's images are never re-read. Build and probe
    * share `newMod` through the same default; probing with a batch
    * that overlaps the landed catalog is not wrong (a recrawled image
    * legitimately matches its own cataloged copy) but changes what
    * "novel" means, so pass matching values when overriding.
    */
  def buildPhash(spark: SparkSession, dir: String, bucketCap: Int = 64,
                 newMod: Int = graft.operators.MultimodalOps.NearDupBatchMod)
      : Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_phash_bands"), tbl(dir, "graft_phash_sigs"),
                           tbl(dir, "graft_phash_meta")))
    val (bands, sigs) = graft.operators.MultimodalOps
      .phashIndexParts(spark, dir, bucketCap, newMod)
    bands.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_phash_bands"))
    sigs.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_phash_sigs"))
    writeMeta(spark, dir, "graft_phash_meta",
              bandIndexKey(dir, "phash-c63", bucketCap, newMod))
  }

  /** Shared build-key shape for the band-index family (minhash, phash,
    * audio): dir + cap + split modulus + corpus fingerprint. `kind`
    * carries a band-layout tag ("phash-c63"/"audio-c63" since the
    * round-16 move to C(6,3) block-combination banding) so an index
    * landed under a retired layout reads as stale and rebuilds instead
    * of silently joining new-layout probe keys against old-layout
    * band rows.
    */
  private def bandIndexKey(dir: String, kind: String, bucketCap: Int,
                           newMod: Int): String =
    s"$dir|kind=$kind|cap=$bucketCap|newMod=$newMod|" +
      s"fp=${corpusFingerprint(dir, "documents")}"

  /** Build f7's image index only if the landed one doesn't match these
    * parameters (the ensureBloom gate on pixels).
    */
  def ensurePhash(spark: SparkSession, dir: String, bucketCap: Int = 64,
                  newMod: Int = graft.operators.MultimodalOps.NearDupBatchMod)
      : Unit =
    if (!metaFresh(spark, dir, "graft_phash_meta",
                   Seq("graft_phash_bands", "graft_phash_sigs"),
                   bandIndexKey(dir, "phash-c63", bucketCap, newMod)))
      buildPhash(spark, dir, bucketCap, newMod)

  /** See [[buildPhash]]; delegate kept next to the other landed probes.
    * `newMod` threads through to the batch slice (round-12 advice fix:
    * the delegate previously pinned the default, so an index built at a
    * non-default newMod probed with a mismatched batch/standing split).
    */
  def imageNearDupIndexed(spark: SparkSession, dir: String,
                          maxHamming: Int = 3,
                          newMod: Int =
                            graft.operators.MultimodalOps.NearDupBatchMod)
      : DataFrame =
    graft.operators.MultimodalOps.imageNearDupIndexed(spark, dir, maxHamming,
                                                      newMod)

  /** Land f8b's standing audio-catalog index: the bucket-capped band
    * table and the (doc_id, phash=afp) signature store over the
    * standing ELIGIBLE fingerprints (the buildPhash shape on audio).
    * The probe (MultimodalOps.audioNearDupIndexed / the streaming
    * audioGate) then fingerprints only the arriving batch — the
    * catalog's recordings are never re-read.
    */
  def buildAudio(spark: SparkSession, dir: String, bucketCap: Int = 64,
                 newMod: Int = graft.operators.MultimodalOps.NearDupBatchMod)
      : Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_audio_bands"), tbl(dir, "graft_audio_sigs"),
                           tbl(dir, "graft_audio_meta")))
    val (bands, sigs) = graft.operators.MultimodalOps
      .audioIndexParts(spark, dir, bucketCap, newMod)
    bands.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_audio_bands"))
    sigs.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_audio_sigs"))
    writeMeta(spark, dir, "graft_audio_meta",
              bandIndexKey(dir, "audio-c63", bucketCap, newMod))
  }

  /** Build f8b's audio index only if the landed one doesn't match
    * these parameters (the ensurePhash gate on recordings).
    */
  def ensureAudio(spark: SparkSession, dir: String, bucketCap: Int = 64,
                  newMod: Int = graft.operators.MultimodalOps.NearDupBatchMod)
      : Unit =
    if (!metaFresh(spark, dir, "graft_audio_meta",
                   Seq("graft_audio_bands", "graft_audio_sigs"),
                   bandIndexKey(dir, "audio-c63", bucketCap, newMod)))
      buildAudio(spark, dir, bucketCap, newMod)

  /** See [[buildAudio]]; delegate kept next to the other landed probes.
    * `newMod` threads through to the batch slice (the buildPhash
    * advice-fix convention).
    */
  def audioNearDupIndexed(spark: SparkSession, dir: String,
                          maxHamming: Int = 3,
                          newMod: Int =
                            graft.operators.MultimodalOps.NearDupBatchMod)
      : DataFrame =
    graft.operators.MultimodalOps.audioNearDupIndexed(spark, dir, maxHamming,
                                                      newMod)

  def buildMinhash(spark: SparkSession, dir: String, bucketCap: Int = 64,
                   newMod: Int = graft.operators.DedupOps.IncrementalNewMod): Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_minhash_bands"), tbl(dir, "graft_minhash_sigs"),
                           tbl(dir, "graft_minhash_meta")))
    val (bands, sigs) = graft.operators.DedupOps
      .minhashIndexParts(spark, dir, bucketCap, newMod)
    bands.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_minhash_bands"))
    sigs.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_minhash_sigs"))
    writeMeta(spark, dir, "graft_minhash_meta",
              bandIndexKey(dir, "minhash", bucketCap, newMod))
  }

  /** Build p11's standing MinHash index only if the landed one doesn't
    * match these parameters (the ensureBloom gate on band keys).
    */
  def ensureMinhash(spark: SparkSession, dir: String, bucketCap: Int = 64,
                    newMod: Int = graft.operators.DedupOps.IncrementalNewMod)
      : Unit =
    if (!metaFresh(spark, dir, "graft_minhash_meta",
                   Seq("graft_minhash_bands", "graft_minhash_sigs"),
                   bandIndexKey(dir, "minhash", bucketCap, newMod)))
      buildMinhash(spark, dir, bucketCap, newMod)

  /** p11 over the landed standing index — see
    * DedupOps.incrementalMinhashIndexed.
    */
  def incrementalMinhashIndexed(spark: SparkSession, dir: String,
                                tau: Double = 0.5,
                                newMod: Int =
                                  graft.operators.DedupOps.IncrementalNewMod)
      : DataFrame =
    graft.operators.DedupOps.incrementalMinhashIndexed(spark, dir, tau, newMod)

  /** d5 (IVF-flat) over the landed index: probe-side only — the cell
    * membership comes from graft_ivf_lists' partition directories
    * (DPP-pruned by the broadcast probe join), candidate vectors are
    * re-read from the embeddings table by id, scoring is d5's exact
    * cosine + max-dedup + top-k. Result-identical to `SimOps.annIvf`
    * at matching build parameters (WarehouseSpec proves it); the
    * bench's ann_split times this as the IVF probe cost with the
    * build amortized out.
    */
  def annIvfFlatIndexed(spark: SparkSession, dir: String, k: Int = 10,
                        qmod: Int = 50, nProbe: Int = 8,
                        nq: Int = 0,
                        tombScope: String = LiveScope): DataFrame = {
    import graft.operators.SimOps
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val queries = if (nq > 0) SimOps.fixedQueryBatch(emb, nq)
      else emb.filter(pmod(col("vec_id"), lit(qmod)) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
                col("nrm").as("qnrm"))
    // probe routing against the PERSISTED centroid set — the index's
    // own routing table (≤nlist rows, broadcast), never re-derived
    val probes = SimOps.nearestCells(ivfCents(spark, dir))(
        queries, "query_id", "qe", "qnrm", nProbe)
      .select(col("query_id"), col("cent_id"))
    // landed posting lists: one row per (vec_id, cell) membership.
    // The list table fans m sub_j code rows per membership; collapse
    // to one with a `sub_j = 0` filter that PUSHES INTO THE SCAN
    // (every membership lands codes for sub_j 0..m-1, so exactly one
    // row survives) instead of the old `.distinct()`, which sat
    // between the scan and the broadcast probe join and (a) forced a
    // full-index scan + exchange of every membership row — dynamic
    // partition pruning cannot reach a scan on the far side of an
    // exchange, so the probe read ALL cent_id directories instead of
    // the nProbe it touches (measured 13.4 s of shuffle write inside
    // d17b at sf0.1) — and (b) was redundant for correctness anyway:
    // any duplicate membership collapses in the max-cos dedup below,
    // exactly as annIvfPqIndexed's ADC shape documents. Tombstoned
    // vectors still drop before scoring (deletion layer).
    val members = exceptTombstoned(
        ivfLists(spark, dir).filter(col("sub_j") === 0)
          .select(col("vec_id"), col("cent_id")),
        dir, "vec_id", tombScope)
    val matched = members
      .join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .join(emb, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id").as("cand_id"),
              (graft.functions.FloatVecDot(col("embedding"), col("qe")) /
               (col("nrm") * col("qnrm"))).as("cos"))
    // a vector indexed in two probed cells surfaces twice — collapse
    // exactly like d5's soft-assignment dedup
    val scored = matched.groupBy(col("query_id"), col("cand_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"),
              round(col("cos"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** d10 over the landed index: the probe join hits the cent_id
    * PARTITION column, so dynamic partition pruning turns "probe 8 of
    * nlist cells" into "open 8 of nlist directories" — the scan never
    * reads unprobed lists (WarehouseSpec asserts the dynamicpruning
    * expression in PartitionFilters and result-identity with the
    * self-contained d10). Must be called after `buildIvf` with the
    * same index parameters.
    */
  def annIvfPqIndexed(spark: SparkSession, dir: String, k: Int = 10,
                      qmod: Int = 50, nProbe: Int = 8, m: Int = 8,
                      subDim: Int = 8, rerank: Int = 16,
                      nq: Int = 0,
                      tombScope: String = LiveScope): DataFrame = {
    import graft.operators.SimOps
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val queries = if (nq > 0) SimOps.fixedQueryBatch(emb, nq)
      else emb.filter(pmod(col("vec_id"), lit(qmod)) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
                col("nrm").as("qnrm"))
    // the exact centroid set buildIvf routed with, read back from the
    // landed index — refined routing costs the probe nothing
    val probes = SimOps.nearestCells(ivfCents(spark, dir))(
        queries, "query_id", "qe", "qnrm", nProbe)
      .select(col("query_id"), col("cent_id"))
    val qsubs = SimOps.pqSubs(
        queries.select(col("query_id").as("vec_id"), col("qe").as("embedding")),
        Seq("vec_id"), m, subDim)
      .select(col("vec_id").as("query_id"), col("sub_j"),
              col("sub").as("qsub"))
    // probe ⋈ partition column: DPP prunes unprobed cent_id
    // directories. A vector indexed in two probed cells carries
    // IDENTICAL codes in both, so the ADC must count it once — and the
    // collapse has to stay SLIM and SHUFFLE-CHEAP: the first cut
    // dropDuplicates'd the full code stream (query, vec, sub_j,
    // 8-float ce), a first()-on-arrays SORT-aggregate that spilled
    // ~50 GB at the ×1000 slice; a second cut deduped (query, vec)
    // keys first but paid a candidates×postings sort-merge join to get
    // the codes back (268 s at ×1000). The landed shape is the
    // ivfScoreTopK trick lifted to ADC: score per (query, vec, CELL) —
    // one broadcast-probe scan of the posting lists, partial-aggable
    // sum over the 8 scan-adjacent sub_j rows — then collapse
    // duplicates AFTER scoring with max (per-cell sums are over the
    // same 8 code values, so max ≡ the value). Two slim HashAggregate
    // shuffles, no wide rows, no SMJ.
    // tombstoned vectors drop before ADC (deletion layer; free when no
    // tombstone table exists)
    val hits = exceptTombstoned(ivfLists(spark, dir), dir, "vec_id", tombScope)
      .join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
    val adc = hits
      .join(broadcast(qsubs), Seq("query_id", "sub_j"))
      .groupBy(col("query_id"), col("vec_id"), col("cent_id"))
      .agg(sum(graft.functions.FloatVecDot(col("qsub"), col("ce")))
             .as("adot"),
           sum(col("cn")).as("rn2"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("adot")).as("adot"), max(col("rn2")).as("rn2"))
      .join(broadcast(queries.select(col("query_id"), col("qnrm"))),
            "query_id")
      .filter(col("rn2") > 0)
      .select(col("query_id"), col("vec_id").as("cand_id"),
              (col("adot") / (sqrt(col("rn2")) * col("qnrm"))).as("adc_cos"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("cand_id"))
    val shortlist = adc.withColumn("arnk", row_number().over(wAdc))
      .filter(col("arnk") <= rerank * k)
      .select(col("query_id"), col("cand_id"))
    val exact = shortlist
      .join(emb.select(col("vec_id").as("cand_id"), col("embedding"),
                       col("nrm")), "cand_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("cand_id"),
              (graft.functions.FloatVecDot(col("embedding"), col("qe")) /
               (col("nrm") * col("qnrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"),
              round(col("cos"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---------- landed BM25 posting index (the text twin of the IVF lists) ----

  /** One-time posting-index landing for e16b/d17b: the term-bucketed
    * inverted index (term, doc_id, dl, tf) written PARTITIONED BY
    * (batch_id, tb) — tb = pmod(xxhash64(term), TermBuckets), so a
    * probe's broadcast query-term join prunes to the buckets its terms
    * hash into exactly as d12's cent_id probes prune cells — plus the
    * per-batch corpus-stats table (n_docs, sum_dl; base build =
    * batch_id -1) the probe folds into (N, avgdl), and a metadata
    * table gating freshness (the ensureIvf convention). At 100 TB this
    * is the search-engine posting store: built once, term-pruned per
    * query, appended per crawl batch — the corpus token stream is
    * never re-scanned to serve a query.
    */
  def buildPostings(spark: SparkSession, dir: String,
                    excludeMod: Int = 0): Unit = {
    import graft.operators.RetrievalOps
    // gen is a monotone physical-generation counter across builds AND
    // compactions: stats deltas (deleteDocs) are tagged with the
    // (build_key, gen) they correct, and ANY new generation makes
    // superseded deltas inert — a rebuild at the same params must not
    // re-subtract deltas for docs it already excluded below.
    val nextGen =
      if (spark.catalog.tableExists(tbl(dir, "graft_post_meta")))
        postingsIdentity(spark, dir)._2 + 1L
      else 0L
    dropManaged(spark, Seq(tbl(dir, "graft_post_lists"), tbl(dir, "graft_post_stats"),
                           tbl(dir, "graft_post_meta")))
    // a rebuild supersedes any compacted generation: GC its versioned
    // physicals and move the authoritative generation (manifest-first,
    // see postingsIdentity) to this build's in one commit
    resetSwapTabs(spark, dir, Seq("graft_post_lists", "graft_post_stats"),
                  postGen = Some(nextGen))
    // rebuilds physically exclude live-tombstoned docs (the new
    // generation is born clean — the right-to-be-forgotten contract);
    // what-if scopes stay logical-only
    val baseDocs = Tables.documents(spark, dir)
    val sliced = if (excludeMod <= 0) baseDocs
      else baseDocs.filter(pmod(col("doc_id"), lit(excludeMod)) =!= 0)
    val (lists, stats) =
      RetrievalOps.postingPartsFrom(exceptTombstoned(sliced, dir, "doc_id"))
    // cluster by (bucket, id-slice): whole-tb tasks keep directories at
    // O(1) files (never tasks×64 small ones), and FOUR id-slices per
    // bucket keep the probe's per-bucket parallelism — on a Zipf corpus
    // a stopword's tb bucket holds ~N/lnV rows, and one-file-per-bucket
    // serialized that scan into a straggler (round-15 SkewAudit at
    // ×1000: dominant-stage max/p50 = 5.5× before, see BASELINE; the
    // compactIvf cell layout decision applied to text)
    lists
      .select(col("term"), col("doc_id"), col("dl"), col("tf"),
              lit(-1L).as("batch_id"), col("tb"))
      .repartition(col("tb"), pmod(xxhash64(col("doc_id")), lit(4L)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id", "tb")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_post_lists"))
    stats
      .select(col("n_docs"), col("sum_dl"), lit(-1L).as("batch_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_post_stats"))
    import spark.implicits._
    Seq((postingsBuildKey(dir, excludeMod), nextGen))
      .toDF("build_key", "gen")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_post_meta"))
  }

  private def postingsBuildKey(dir: String, excludeMod: Int): String =
    s"$dir|tb=${graft.operators.RetrievalOps.TermBuckets}|excl=$excludeMod|" +
      s"fp=${corpusFingerprint(dir, "documents")}"

  /** Build the posting index only if the landed one doesn't match
    * these parameters — first touch in a JVM pays the build, every
    * subsequent probe is probe-cost only (the ensureIvf gate).
    */
  def ensurePostings(spark: SparkSession, dir: String,
                     excludeMod: Int = 0): Unit = {
    recoverMaintenance(spark, dir)
    val m0 = readManifest(spark, dir)
    val listsPhys = physBase(m0, "graft_post_lists")
    val statsPhys = physBase(m0, "graft_post_stats")
    adoptLanded(spark, dir, "graft_post_meta")
    adoptLanded(spark, dir, listsPhys, Seq("batch_id", "tb"))
    adoptLanded(spark, dir, statsPhys, Seq("batch_id"))
    val key = postingsBuildKey(dir, excludeMod)
    val fresh = spark.catalog.tableExists(tbl(dir, "graft_post_meta")) &&
      spark.catalog.tableExists(tbl(dir, listsPhys)) &&
      spark.catalog.tableExists(tbl(dir, statsPhys)) && {
        val m = spark.table(tbl(dir, "graft_post_meta"))
        // a pre-round-14 meta (no gen column) is a stale physical
        // format: rebuild rather than guessing a generation
        m.columns.contains("gen") && {
          val r = m.select(col("build_key")).collect()
          r.length == 1 && r(0).getString(0) == key
        }
      } &&
      // an excl=0 build admits NO legitimate upserts (round-13 advice):
      // a batch partition on top of a full build double-counts its
      // docs' postings AND stats rows — detect and rebuild instead of
      // reporting the corrupted index fresh forever. The stats table
      // has one row per batch, so this check is O(batches).
      (excludeMod != 0 ||
        landedBatchIds(spark, tbl(dir, statsPhys)) == Set(-1L))
    if (!fresh) buildPostings(spark, dir, excludeMod)
  }

  def postLists(spark: SparkSession, dir: String): DataFrame =
    spark.table(currentTable(spark, dir, "graft_post_lists"))
  def postStats(spark: SparkSession, dir: String): DataFrame =
    spark.table(currentTable(spark, dir, "graft_post_stats"))

  /** Incremental posting maintenance — the text twin of [[upsertIvf]]:
    * the arriving batch (`doc_id % batchMod == 0`) tokenizes itself,
    * lands its posting rows under its own batch_id partitions, and
    * adds ONE stats row — the standing postings are never read,
    * rewritten, or re-sharded, and probe-side (N, avgdl) stays exact
    * because stats are summable counts (see
    * RetrievalOps.postingPartsFrom).
    */
  def upsertPostings(spark: SparkSession, dir: String, batchMod: Int,
                     batchKey: Long = 0L): Unit = {
    requireUpsertCoverage(spark, tbl(dir, "graft_post_meta"), batchMod)
    upsertPostingsFrom(Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(batchMod)) === 0), dir, batchKey)
  }

  /** The upsert body over a caller-supplied document batch frame —
    * shared by the dir-based form above and the streaming maintenance
    * flow (`CorpusStream.maintainPostings`). Exactly-once under
    * replay: both writes are DYNAMIC partition overwrites of this
    * batch's own `batch_id=batchKey` partitions (the upsertIvfFrom
    * contract) — a replayed micro-batch replaces its own files and
    * never double-appends, and standing partitions are never touched.
    */
  def upsertPostingsFrom(batchDocs: DataFrame, dir: String,
                         batchKey: Long = 0L): Unit = {
    import graft.operators.RetrievalOps
    val spark = batchDocs.sparkSession
    // a live-tombstoned doc re-arriving in a batch stays deleted (its
    // rows never land, so stats never count what probes must hide);
    // re-admitting content is an explicit un-delete, not a side effect
    // of a recrawl
    val (lists, stats) = RetrievalOps.postingPartsFrom(
      exceptTombstoned(batchDocs, dir, "doc_id"))
    // manifest fence BEFORE the write + re-land re-check AFTER it
    // (see [[mutatorFenced]]): a compaction snapshotted before the
    // bump fails its commit instead of folding-and-dropping a batch
    // it never saw; one that snapshotted after the bump but committed
    // mid-write triggers a re-land against the new generation
    // absorption probe: the batch's first surviving doc present in the
    // NEW generation means the racing fold carried the batch (its
    // snapshot postdated our write) — re-landing would double it
    val absorbed = (now: Manifest) =>
      lists.select(col("doc_id")).limit(1).collect().headOption.forall { r =>
        !spark.table(tbl(dir, physBase(now, "graft_post_lists")))
          .filter(col("doc_id") === r.getLong(0)).isEmpty
      }
    mutatorFenced(spark, dir,
                  Seq("graft_post_lists", "graft_post_stats"),
                  absorbed) { mf =>
      val owKey = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.get(owKey)
      spark.conf.set(owKey, "dynamic")
      try {
        lists
          .select(col("term"), col("doc_id"), col("dl"), col("tf"),
                  lit(batchKey).as("batch_id"), col("tb"))
          .repartition(col("tb"), pmod(xxhash64(col("doc_id")), lit(4L)))
          .write.mode(SaveMode.Overwrite)
          .insertInto(tbl(dir, physBase(mf, "graft_post_lists")))
        stats
          .select(col("n_docs"), col("sum_dl"), lit(batchKey).as("batch_id"))
          .write.mode(SaveMode.Overwrite)
          .insertInto(tbl(dir, physBase(mf, "graft_post_stats")))
      } finally spark.conf.set(owKey, prior)
    }
  }

  /** e16b: BM25 over the landed posting index — delegate kept next to
    * the other landed probes; see RetrievalOps.bm25SearchIndexed.
    */
  def bm25Indexed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RetrievalOps.bm25SearchIndexed(spark, dir)

  // ---------- landed NB quality model (e17b / CorpusStream.nbGate) ----------

  /** One-time quality-model landing for e17b and the streaming quality
    * gate: the Laplace-smoothed NB term-weight table (term, lw) —
    * vocabulary-sized, landed term-bucketed so the scoring join's
    * weight side never re-shards — and the 1-row priors. Training is
    * one counts shuffle (TextOps.nbModelFrom); at 100 TB it runs once
    * per curation cycle and every scoring run joins the landed
    * weights instead of re-deriving them (the e17 verdict-item-2
    * posture fix). Metadata-gated like ensureIvf.
    */
  def buildNbModel(spark: SparkSession, dir: String,
                   refSource: String = "src0"): Unit = {
    dropManaged(spark, Seq(tbl(dir, "graft_nb_weights"), tbl(dir, "graft_nb_priors"),
                           tbl(dir, "graft_nb_meta")))
    // live-tombstoned docs are excluded from TRAINING (a deleted doc's
    // counts must leave the model, not just its score row; the build
    // key carries the tombstone-state fingerprint so ensureNbModel
    // retrains on the next probe after a live deletion)
    val (weights, priors) = graft.operators.TextOps
      .nbModelFrom(exceptTombstoned(Tables.documents(spark, dir),
                                    dir, "doc_id"), refSource)
    weights.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "term").sortBy("term")
      .format("parquet")
      .saveAsTable(tbl(dir, "graft_nb_weights"))
    priors.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_nb_priors"))
    import spark.implicits._
    Seq(nbBuildKey(spark, dir, refSource)).toDF("build_key")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(tbl(dir, "graft_nb_meta"))
  }

  /** Build the NB model only if the landed one doesn't match these
    * parameters (the ensureIvf gate): first scoring run in a JVM pays
    * the training shuffle, every subsequent run is join-only.
    */
  private def nbBuildKey(spark: SparkSession, dir: String,
                         refSource: String): String =
    s"$dir|ref=$refSource|fp=${corpusFingerprint(dir, "documents")}|" +
      s"tfp=${tombstoneFingerprint(spark, dir)}"

  def ensureNbModel(spark: SparkSession, dir: String,
                    refSource: String = "src0"): Unit = {
    val key = nbBuildKey(spark, dir, refSource)
    val fresh = adoptLanded(spark, dir, "graft_nb_meta") &&
      adoptLanded(spark, dir, "graft_nb_weights") &&
      adoptLanded(spark, dir, "graft_nb_priors") && {
        val r = spark.table(tbl(dir, "graft_nb_meta")).collect()
        r.length == 1 && r(0).getString(0) == key
      }
    if (!fresh) buildNbModel(spark, dir, refSource)
  }

  // ---------- deletion / retraction (round 14) -----------------------------

  /** The production tombstone scope. Every landed probe consults this
    * scope by default, so a doc passed to [[deleteDocs]] under it
    * stops serving from EVERY index immediately — the
    * right-to-be-forgotten path the reference's burn/cancel event
    * folds play for marketplace state (order state machine
    * tasks.service.ts:599-796; burn-owner exclusions listNFTs
    * app.service.ts:779), applied to a training-data corpus. Other
    * scope strings are self-contained what-if deletion sets (the
    * registered deletion-demo rows use one so they never perturb the
    * default-scope rows sharing the warehouse); scopes do not union.
    */
  val LiveScope = "live"

  /** Logical deletion of a set of doc/vec ids from every landed index
    * of this corpus namespace. The mechanism is a TOMBSTONE layer, not
    * a rewrite: ids land under their (scope, batch_id) partition of
    * graft_tombstones, and every probe anti-joins the (broadcast,
    * deletion-sized) tombstone set — standing index files are NEVER
    * touched (physical removal is [[compactPostings]]/[[compactIvf]]'s
    * job). BM25's corpus stats stay EXACT: the delete batch computes
    * the tombstoned docs' (n_docs, sum_dl) contribution from the
    * landed posting rows themselves (one columnar postings scan per
    * delete batch — curation-cadence cost, never probe cost) and lands
    * it as a delta row tagged with the posting index's current
    * (build_key, gen) identity; landedStats subtracts only deltas
    * matching the CURRENT identity, so a rebuild or compaction (which
    * both exclude/purge live tombstones physically) can never
    * double-subtract.
    *
    * Exactly-once under replay: both writes are dynamic partition
    * overwrites of this batch's own (scope, batch_id) partitions (the
    * upsertIvfFrom contract); the already-tombstoned exclusion ignores
    * the batch's OWN prior rows so a replay recomputes — not drops —
    * them. Ids never indexed are harmless (their delta contribution is
    * zero; anti-joins of absent ids are no-ops).
    */
  def deleteDocs(spark: SparkSession, dir: String, ids: DataFrame,
                 scope: String = LiveScope, batchKey: Long = 0L): Unit = {
    require(scope.nonEmpty && !scope.exists(c => c == '/' || c == '='),
      s"bad tombstone scope: '$scope'")
    // delete batch keys live below 1e6; undeleteDocs lands its
    // compensating deltas at 1e6+key so the two flows can never
    // overwrite each other's tomb_stats partitions
    require(batchKey < 1000000L, s"delete batchKey must be < 1e6: $batchKey")
    recoverMaintenance(spark, dir)
    val idsDf = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .distinct()
    // manifest fence BEFORE any write + re-land re-check AFTER (see
    // [[mutatorFenced]]): a compaction/vacuum snapshotted before the
    // bump fails its commit — its fold can neither absorb this batch's
    // rows without purging them nor erase the tombstone rewrite below;
    // one that committed mid-write triggers a re-land, recomputing the
    // stats delta at the new posting identity
    mutatorFenced(spark, dir,
                  Seq("graft_tombstones", "graft_tomb_stats",
                      "graft_post_lists", "graft_post_stats")) { mf =>
    {
    // exclude ids already tombstoned in this scope by OTHER batches
    // (their stats delta is already landed — re-landing would
    // double-subtract); the batch's own prior rows are fair game so a
    // replay overwrites rather than empties its partition
    val newIds = (if (recoverTombTable(spark, dir, "graft_tombstones"))
      idsDf.join(
        spark.table(tbl(dir, physBase(mf, "graft_tombstones")))
          .filter(col("scope") === scope && col("batch_id") =!= batchKey)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    else idsDf).localCheckpoint(false)
    val rows = newIds
      .select(col("doc_id"), lit(scope).as("scope"),
              lit(batchKey).as("batch_id"))
    writePartitioned(spark, dir, "graft_tombstones", rows,
                     Seq("scope", "batch_id"))
    // postings stats delta (only meaningful when a posting index is
    // landed): subtract exactly what is PHYSICALLY INDEXED for these
    // ids — a doc absent from the postings (never indexed, or already
    // purged) contributes nothing, which is what keeps replays after
    // compaction self-healing
    // adoption, not tableExists: after a JVM restart the landed
    // posting index survives only as files — skipping the stats delta
    // because the catalog forgot the table would bake an over-count
    // into the next compaction's folded stats (pre-adoption this
    // self-healed because a restart forced a born-clean rebuild)
    if (adoptLanded(spark, dir, "graft_post_meta") &&
        adoptLanded(spark, dir, physBase(mf, "graft_post_lists"),
                    Seq("batch_id", "tb"))) {
      val (bkey, gen) = postingsIdentity(spark, dir)
      val d = spark.table(tbl(dir, physBase(mf, "graft_post_lists")))
        .join(broadcast(newIds), "doc_id")
        .select(col("doc_id"), col("dl")).distinct()
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"),
             coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"))
        .select(col("n_docs"), col("sum_dl"), lit(bkey).as("bkey"),
                lit(gen).as("gen"), lit(scope).as("scope"),
                lit(batchKey).as("batch_id"))
      writePartitioned(spark, dir, "graft_tomb_stats", d,
                       Seq("scope", "batch_id"))
    }
    }
    }
  }

  /** [[deleteDocs]] over a literal id list. */
  def deleteDocIds(spark: SparkSession, dir: String, ids: Seq[Long],
                   scope: String = LiveScope, batchKey: Long = 0L): Unit = {
    import spark.implicits._
    deleteDocs(spark, dir, ids.toDF("doc_id"), scope, batchKey)
  }

  /** Tombstone-table schemas for cross-JVM recovery (see
    * [[recoverTombTable]]).
    */
  private val tombSchemas: Map[String, (String, String)] = Map(
    "graft_tombstones" -> ("doc_id BIGINT, scope STRING, batch_id BIGINT",
                           "scope, batch_id"),
    "graft_tomb_stats" -> ("n_docs BIGINT, sum_dl BIGINT, bkey STRING, " +
                             "gen BIGINT, scope STRING, batch_id BIGINT",
                           "scope, batch_id"))

  /** True iff the tombstone table is catalog-visible, RECOVERING it
    * first when only its files survived a previous JVM (the in-memory
    * catalog forgets tables across sessions; every other landed table
    * is rebuilt by its gate, but silently recreating THIS one would
    * silently UN-DELETE every tombstoned doc — the one state loss that
    * must never happen, so the surviving location is re-registered and
    * its partitions recovered instead).
    */
  private def recoverTombTable(spark: SparkSession, dir: String,
                               base: String): Boolean = {
    val wh = warehousePath(spark)
    val fs = fsOf(spark, wh)
    // stage-awareness (round-15 advice fix): a crash inside a LEGACY
    // stage-and-rewrite swap of this table leaves its only committed
    // copy in <base>_stage — roll the maintenance layer forward before
    // concluding "no tombstones" (which would silently un-delete);
    // manifest-committed swaps never enter this branch (the standing
    // generation is immutable until the commit)
    if (fs.exists(new Path(wh, tbl(dir, s"${base}_stage")))) {
      recoverMaintenance(spark, dir)
      ()
    }
    val phys = physBase(readManifest(spark, dir), base)
    spark.catalog.tableExists(tbl(dir, phys)) || {
      val loc = new Path(wh, tbl(dir, phys))
      fs.exists(loc) && {
        val (cols, parts) = tombSchemas(base)
        spark.sql(s"CREATE TABLE ${tbl(dir, phys)} ($cols) USING parquet " +
          s"PARTITIONED BY ($parts) LOCATION '${fs.makeQualified(loc)}'")
        spark.catalog.recoverPartitions(tbl(dir, phys))
        true
      }
    }
  }

  /** Create-or-dynamic-overwrite a (scope, batch_id)-partitioned
    * maintenance table: first write creates it partitioned; later
    * writes replace exactly the partitions present in `rows` (the
    * upsertIvfFrom exactly-once contract).
    */
  private def writePartitioned(spark: SparkSession, dir: String,
                               base: String, rows: DataFrame,
                               parts: Seq[String]): Unit = {
    val phys = physBase(readManifest(spark, dir), base)
    if (!recoverTombTable(spark, dir, base)) {
      rows.write.mode(SaveMode.Overwrite)
        .partitionBy(parts: _*)
        .format("parquet")
        .saveAsTable(tbl(dir, phys))
    } else {
      val owKey = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.get(owKey)
      spark.conf.set(owKey, "dynamic")
      try rows.write.mode(SaveMode.Overwrite).insertInto(tbl(dir, phys))
      finally spark.conf.set(owKey, prior)
    }
  }

  /** The landed posting index's identity: (build_key, gen). gen counts
    * physical generations — 0 at build, +1 per compaction — so stats
    * deltas tagged with a superseded generation are inert (the
    * generation that replaced them already folded or purged what they
    * corrected).
    */
  private[graft] def postingsIdentity(spark: SparkSession,
                                      dir: String): (String, Long) = {
    val m = spark.table(tbl(dir, "graft_post_meta"))
    val r = m.select(col("build_key"),
                     (if (m.columns.contains("gen")) col("gen")
                      else lit(0L)).as("gen")).collect()(0)
    // manifest-first generation: a compaction bumps gen IN THE SAME
    // atomic commit that swaps the folded stats, so readers can never
    // pair new stats with an old gen (the round-14 two-write window);
    // post_meta's column governs only pre-manifest (legacy) stores
    (r.getString(0),
     readManifest(spark, dir).postGen.getOrElse(r.getLong(1)))
  }

  /** The scope-filtered deletion stats deltas, recovered across JVMs
    * like the tombstones themselves — None when nothing was ever
    * deleted.
    */
  private[graft] def tombStats(spark: SparkSession, dir: String): Option[DataFrame] =
    if (recoverTombTable(spark, dir, "graft_tomb_stats"))
      Some(spark.table(currentTable(spark, dir, "graft_tomb_stats")))
    else None

  /** The tombstoned id set of one scope — empty frame when nothing was
    * ever deleted. Bounded by deletion volume, never corpus size; the
    * probes broadcast it.
    */
  private[graft] def tombstoneIds(spark: SparkSession, dir: String,
                                  scope: String): Option[DataFrame] =
    if (recoverTombTable(spark, dir, "graft_tombstones"))
      Some(spark.table(currentTable(spark, dir, "graft_tombstones"))
        .filter(col("scope") === scope).select(col("doc_id")))
    else None

  /** Conf key bounding the tombstone anti-join's broadcast side (bytes
    * of the scope's live partition files). Defaults to Spark's own
    * autoBroadcastJoinThreshold; set lower/higher to move the
    * broadcast→shuffle crossover, or -1 to always shuffle.
    */
  val TombBroadcastKey = "spark.graft.tombstoneBroadcastBytes"

  /** Conf key: how many manifest versions a superseded generation
    * stays readable for after a maintenance swap (snapshot retention,
    * round 16). A reader that resolved physical table names within
    * the last N manifest versions is guaranteed its tables survive
    * [[recoverMaintenance]]'s GC; raise it for long-running readers,
    * lower it to reclaim space faster. Bounded either way: every
    * mutation bumps a version, so retired generations age out at
    * curation cadence (manifest log truncation keeps ~17 versions, so
    * values above that are clamped by the log itself).
    */
  val SnapshotRetainKey = "spark.graft.snapshotRetainVersions"

  /** On-disk bytes of one scope's tombstone partition — the broadcast-
    * decision estimate (driver-side file metadata, the same
    * size-from-files basis Spark's own broadcast threshold uses).
    */
  private def tombScopeBytes(spark: SparkSession, dir: String,
                             scope: String): Long = {
    val loc = new Path(
      new Path(warehousePath(spark), currentTable(spark, dir, "graft_tombstones")),
      s"scope=$scope")
    listFilesRec(fsOf(spark, loc), loc)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  // byte-string parsing via Spark's own machinery (round-16 advice
  // fix: a bare toLong silently fell back to the default on every
  // human-readable form Spark itself accepts, '10MB'/'20m'/...)
  private def tombBroadcastLimit(spark: SparkSession): Long =
    spark.conf.getOption(TombBroadcastKey)
      .orElse(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption // bare numbers incl. -1
        .orElse(scala.util.Try(
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s.trim))
          .toOption))
      .getOrElse(10L * 1024 * 1024)

  /** Anti-join `df` against the scope's tombstone set on `idCol` — the
    * one hook every landed probe routes through. A never-deleted
    * corpus (no tombstone table) costs NOTHING: the plan is returned
    * unchanged. While the scope's set is below [[TombBroadcastKey]]
    * the cost is one broadcast hash anti-join of the deletion-sized id
    * set — the standing side never re-shards. PAST the threshold
    * (round-15 verdict item 3: crawl churn + right-to-be-forgotten can
    * grow live tombstones to 10⁸ rows, where a forced broadcast OOMs
    * the driver) the hint is withheld and the anti-join shuffles both
    * sides on the id key — for the landed probes the probe side is
    * already partition-pruned/query-bounded, so the shuffle is
    * per-query-sized, never corpus-sized. The standing remedy at that
    * scale is the purge itself: autoMaintain's pending-purge arm
    * compacts the physical rows away and vacuumTombstones prunes the
    * set back under the threshold.
    */
  private[graft] def exceptTombstoned(df: DataFrame, dir: String,
                                      idCol: String,
                                      scope: String = LiveScope): DataFrame =
    tombstoneIds(df.sparkSession, dir, scope) match {
      case Some(t) =>
        val spark = df.sparkSession
        val ids = t.withColumnRenamed("doc_id", idCol)
        val side =
          if (tombScopeBytes(spark, dir, scope) <=
                tombBroadcastLimit(spark)) broadcast(ids)
          else ids
        df.join(side, Seq(idCol), "left_anti")
      case None => df
    }

  /** Content fingerprint of the LIVE tombstone state — folded into the
    * NB-model build key so a live deletion retrains the model without
    * the deleted docs' counts (weights are corpus aggregates; unlike
    * the postings there is no exact summable delta for a smoothed
    * log-odds table, and retraining is the documented
    * once-per-curation-cycle cost).
    */
  private[graft] def tombstoneFingerprint(spark: SparkSession,
                                          dir: String): String = {
    val loc = new Path(
      new Path(warehousePath(spark), currentTable(spark, dir, "graft_tombstones")),
      s"scope=$LiveScope")
    val fs = fsOf(spark, loc)
    if (fs.exists(loc)) manifestHash(fs, loc) else "none"
  }

  /** Explicit re-admission — the inverse of [[deleteDocs]] (a
    * retraction reversed lawfully is a real curation event, not a
    * recrawl side effect): remove the ids' tombstone rows in `scope`
    * and land a COMPENSATING positive stats delta recomputed from the
    * landed postings at the current identity — ids still physically
    * indexed return to service with stats exactly as if never deleted;
    * ids a compaction or rebuild already excluded physically
    * contribute a zero delta and STAY absent until explicitly
    * re-ingested (upsertPostingsFrom / a corpus-change rebuild) — the
    * data is physically gone, and un-deleting must not fabricate it.
    * Returns (restored, needsReingest) counts.
    *
    * Idempotent under replay: only ids currently tombstoned in the
    * scope participate (a repeat finds none, lands a zero-row delta
    * frame whose dynamic overwrite is a no-op, and the first call's
    * compensation survives); never-deleted ids are filtered out, so
    * the compensation can never inflate stats. Replaying the ORIGINAL
    * delete batch after an undelete re-deletes — the same at-least-once
    * boundary as replaying a pre-compaction batch, run curation flows
    * at quiet points. NB/bloom gates key on the tombstone state, so
    * the restored doc re-enters training/sketch on their next touch.
    */
  def undeleteDocs(spark: SparkSession, dir: String, ids: DataFrame,
                   scope: String = LiveScope,
                   batchKey: Long = 0L): (Long, Long) =
    undeleteDocsHooked(spark, dir, ids, scope, batchKey, _ => ())

  /** [[undeleteDocs]] with the kill-point seam (the crash-matrix
    * spec's injection hook). */
  private[graft] def undeleteDocsHooked(spark: SparkSession, dir: String,
                                        ids: DataFrame, scope: String,
                                        batchKey: Long,
                                        killAt: String => Unit)
      : (Long, Long) = {
    recoverMaintenance(spark, dir)
    if (!recoverTombTable(spark, dir, "graft_tombstones")) return (0L, 0L)
    // manifest snapshot BEFORE any read: the single commit below fails
    // if ANYTHING (a racing deleteDocs, an upsert, a compaction)
    // committed after this point — the rewrite can never erase a
    // tombstone batch it didn't read (round-14's disclosed residue)
    val m0 = readManifest(spark, dir)
    val tombPhys = physBase(m0, "graft_tombstones")
    val tombSnap0 = partitionSet(spark, tbl(dir, tombPhys))
    val tombLayerSnap = tombState(spark, dir)
    val idsDf = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .distinct()
    val tomb = spark.table(tbl(dir, tombPhys))
    val hit = idsDf.join(
        tomb.filter(col("scope") === scope).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val nHit = hit.count()
    if (nHit == 0L) return (0L, 0L)
    // compensating delta — COMPUTED here, but committed atomically
    // WITH the tombstone rewrite below (pre-round-15 the delta landed
    // first, so a swap abort left stats compensated while the rows
    // still hid the docs until a retry)
    var restored = 0L
    // adoption, not tableExists: after a JVM restart the landed
    // posting index survives only as files — skipping the stats delta
    // because the catalog forgot the table would bake an over-count
    // into the next compaction's folded stats (pre-adoption this
    // self-healed because a restart forced a born-clean rebuild)
    val postPhys = physBase(m0, "graft_post_lists")
    val delta: Option[DataFrame] =
      if (adoptLanded(spark, dir, "graft_post_meta") &&
          adoptLanded(spark, dir, postPhys, Seq("batch_id", "tb"))) {
        val (bkey, gen) = postingsIdentity(spark, dir)
        val phys = spark.table(tbl(dir, postPhys))
          .join(broadcast(hit), "doc_id")
          .select(col("doc_id"), col("dl")).distinct()
          .localCheckpoint(false)
        restored = phys.count()
        // deltas are stored as amounts-to-SUBTRACT (landedStats negates
        // every row at read) — so the compensation lands NEGATED, and
        // compaction's fold likewise nets it against the delete's row
        Some(phys
          .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
               coalesce(sum(col("dl").cast("long")), lit(0L)).as("s"))
          .filter(col("n") > 0)
          .select((-col("n")).as("n_docs"), (-col("s")).as("sum_dl"),
                  lit(bkey).as("bkey"), lit(gen).as("gen"),
                  lit(scope).as("scope"),
                  lit(1000000L + batchKey).as("batch_id")))
      } else None
    val kept = tomb.join(
      broadcast(hit.select(col("doc_id").as("p_id"))),
      col("scope") === scope && col("doc_id") === col("p_id"),
      "left_anti")
    var moves = Map("graft_tombstones" ->
      stageGeneration(spark, dir, m0, "graft_tombstones",
        kept.select(col("doc_id"), col("scope"), col("batch_id")),
        Seq("scope", "batch_id")))
    killAt("staged-tombstones")
    delta.foreach { d =>
      // the new tomb_stats generation = current rows (minus any prior
      // landing of THIS undelete batch's partition — replay overwrites,
      // the writePartitioned contract) ∪ the compensation; the table is
      // O(delete batches), so the rewrite is metadata-cheap
      val curStats: DataFrame =
        if (recoverTombTable(spark, dir, "graft_tomb_stats"))
          spark.table(tbl(dir, physBase(m0, "graft_tomb_stats")))
            .filter(!(col("scope") === scope &&
                      col("batch_id") === (1000000L + batchKey)))
        else d.limit(0)
      moves += ("graft_tomb_stats" ->
        stageGeneration(spark, dir, m0, "graft_tomb_stats",
          curStats.select(col("n_docs"), col("sum_dl"), col("bkey"),
                          col("gen"), col("scope"), col("batch_id"))
            .unionAll(d),
          Seq("scope", "batch_id")))
    }
    killAt("staged-stats")
    try partitionGuard(spark, dir, tombPhys, tombSnap0, tombLayerSnap,
                       "writer")()
    catch {
      case e: Throwable =>
        dropManaged(spark, moves.values.toSeq.map(tbl(dir, _)))
        throw e
    }
    killAt("pre-commit")
    commitGenerations(spark, dir, m0, moves, None, "writer", killAt)
    killAt("post-gc")
    (restored, nHit - restored)
  }

  /** Prune live tombstones that no longer protect anything — the
    * growth bound for the deletion layer (every probe broadcasts the
    * live set, so it must not grow forever). A live tombstone is
    * prunable only when its id is gone from BOTH re-entry surfaces:
    * the CORPUS tables (else the next fingerprint-keyed rebuild would
    * silently re-admit the doc — the tombstone must outlive the raw
    * data, which upstream hard-deletes on its own retention schedule)
    * and every LANDED store (else pruning would put physically-present
    * rows back into service; run compactPostings/compactIvf first).
    * Stats deltas never need adjustment: a still-physical id keeps its
    * tombstone, and a compacted id's deltas are already inert behind
    * the generation bump. Cost: one broadcast-semi id-scan per store
    * at curation cadence. What-if scopes are never pruned. Returns the
    * pruned-row count. Pruning perturbs the tombstone-state
    * fingerprint, so the NB/bloom gates rebuild on next touch —
    * content-identical, since pruned ids are in neither corpus nor
    * training slice.
    */
  def vacuumTombstones(spark: SparkSession, dir: String): Long =
    vacuumTombstonesHooked(spark, dir, _ => ())

  /** [[vacuumTombstones]] with the kill-point seam. */
  private[graft] def vacuumTombstonesHooked(spark: SparkSession, dir: String,
                                            killAt: String => Unit): Long = {
    recoverMaintenance(spark, dir)
    if (!recoverTombTable(spark, dir, "graft_tombstones")) return 0L
    val m0 = readManifest(spark, dir)
    val tombPhys = physBase(m0, "graft_tombstones")
    val tombSnap0 = partitionSet(spark, tbl(dir, tombPhys))
    val tombLayerSnap = tombState(spark, dir)
    val tomb = spark.table(tbl(dir, tombPhys))
    val live = tomb.filter(col("scope") === LiveScope)
      .select(col("doc_id")).distinct().localCheckpoint(false)
    if (live.isEmpty) return 0L
    // ADOPT each landed store before treating it as a re-entry
    // surface: after a JVM restart the catalog has forgotten them,
    // and a tableExists check here would silently drop every landed
    // store from the surface list — pruning tombstones whose docs are
    // still PHYSICALLY indexed, which the next adoption would then
    // serve back into service (a silent un-delete). Adoption makes
    // the surviving files count exactly like registered tables.
    def idsOf(base: String, c: String): Option[DataFrame] = {
      val phys = physBase(m0, base)
      if (adoptLanded(spark, dir, phys, swapParts(base)))
        Some(spark.table(tbl(dir, phys)).select(col(c).as("doc_id")))
      else None
    }
    def corpusOf(table: String, c: String): Option[DataFrame] = {
      val p = new Path(dir, s"$table.parquet")
      if (fsOf(spark, p).exists(p))
        Some(Tables.table(spark, dir, table).select(col(c).as("doc_id")))
      else None
    }
    val surfaces: Seq[DataFrame] = Seq(
      corpusOf("documents", "doc_id"), corpusOf("embeddings", "vec_id"),
      idsOf("graft_post_lists", "doc_id"), idsOf("graft_ivf_lists", "vec_id"),
      idsOf("graft_minhash_sigs", "doc_id"), idsOf("graft_phash_sigs", "doc_id"),
      idsOf("graft_audio_sigs", "doc_id"), idsOf("graft_bloom_fps", "ex_id")
    ).flatten
    val referenced = surfaces
      .map(s => s.join(broadcast(live), Seq("doc_id"), "left_semi"))
      .reduce(_.unionAll(_)).distinct().localCheckpoint(false)
    val pruned = live.count() - referenced.count()
    if (pruned > 0) {
      val pruneIds = live.join(referenced, Seq("doc_id"), "left_anti")
      val kept = tomb.join(
        broadcast(pruneIds.select(col("doc_id").as("p_id"))),
        col("scope") === LiveScope && col("doc_id") === col("p_id"),
        "left_anti")
      val moves = Map("graft_tombstones" ->
        stageGeneration(spark, dir, m0, "graft_tombstones",
          kept.select(col("doc_id"), col("scope"), col("batch_id")),
          Seq("scope", "batch_id")))
      killAt("staged-tombstones")
      try partitionGuard(spark, dir, tombPhys, tombSnap0, tombLayerSnap,
                         "writer")()
      catch {
        case e: Throwable =>
          dropManaged(spark, moves.values.toSeq.map(tbl(dir, _)))
          throw e
      }
      killAt("pre-commit")
      commitGenerations(spark, dir, m0, moves, None, "writer", killAt)
      killAt("post-gc")
    }
    pruned
  }

  // ---------- compaction / vacuum (round 14) --------------------------------

  /** Fold every batch_id partition of the landed posting index into
    * one base generation and PHYSICALLY PURGE live-tombstoned rows —
    * the small-file/vacuum maintenance every batch_id-partitioned
    * incremental store eventually needs (probe cost degrades with file
    * count, not data size; and purge is the physical
    * right-to-be-forgotten step the tombstone layer defers). Stats
    * re-sum exactly: one surviving row = Σ landed stats − Σ live
    * deltas at the current identity. The metadata generation
    * increments, so superseded deltas go inert; live tombstone ROWS
    * stay (their future replays and probe anti-joins are no-ops over
    * purged ids — self-healing), and non-live what-if scopes keep
    * their rows but must re-apply after a compaction (their
    * deleteDocs-per-invocation demo rows do).
    *
    * Run at a maintenance quiet point (the contract of any checkpoint
    * compaction): a micro-batch replayed with a PRE-compaction
    * batchKey would re-append rows the fold already absorbed. The
    * quiet-point contract is ENFORCED, not assumed, and the commit is
    * ATOMIC (round 15): the folded lists and stats are staged as a NEW
    * generation under version-suffixed names — the standing tables are
    * never touched — and become current only through ONE manifest link
    * ([[commitGenerations]]) that also carries the generation bump, so
    * a crash at any step leaves probes on the old or the new
    * generation in full (never folded lists with unfolded stats, never
    * new stats with an old gen — the two round-14 windows), and a
    * racing upsert/delete (which bumps the manifest before writing)
    * makes the commit fail with everything it wrote intact.
    */
  def compactPostings(spark: SparkSession, dir: String): Unit =
    compactPostingsHooked(spark, dir, () => ())

  /** [[compactPostings]] with test seams: `afterSnapshot` runs between
    * the entry snapshot and the fold (the spec interleaves a
    * concurrent upsert and proves the abort loses nothing); `killAt`
    * is invoked with a step label at every distinct crash point (the
    * kill-point matrix spec throws there and proves recovery serves
    * old-or-new, never a mix).
    */
  private[graft] def compactPostingsHooked(spark: SparkSession, dir: String,
                                           afterSnapshot: () => Unit,
                                           killAt: String => Unit =
                                             _ => ()): Unit = {
    recoverMaintenance(spark, dir)
    val m0 = readManifest(spark, dir)
    val listsPhys = physBase(m0, "graft_post_lists")
    val statsPhys = physBase(m0, "graft_post_stats")
    // adopt the FULL store family (round-15 advice fix): a scheduled
    // maintenance run in a fresh JVM must compact the surviving files,
    // not crash on the catalog's amnesia
    require(adoptLanded(spark, dir, "graft_post_meta") &&
            adoptLanded(spark, dir, listsPhys, Seq("batch_id", "tb")) &&
            adoptLanded(spark, dir, statsPhys, Seq("batch_id")),
      "no landed posting index to compact")
    val listsSnap = partitionSet(spark, tbl(dir, listsPhys))
    val statsSnap = partitionSet(spark, tbl(dir, statsPhys))
    // the deletion layer is part of the snapshot (belt) and of the
    // manifest fence (suspenders): a deleteDocs racing the fold would
    // land a gen-g delta the generation bump then inerts while its
    // rows were folded in un-purged — it bumps the manifest first, so
    // the commit below fails even if it lands between the re-check and
    // the link
    val tombSnap = tombState(spark, dir)
    afterSnapshot()
    val (bkey, gen) = postingsIdentity(spark, dir)
    val folded = exceptTombstoned(
        spark.table(tbl(dir, listsPhys)), dir, "doc_id")
      .select(col("term"), col("doc_id"), col("dl"), col("tf"),
              lit(-1L).as("batch_id"), col("tb"))
    val newStats = {
      val base = spark.table(tbl(dir, statsPhys))
        .select(col("n_docs").cast("long").as("n_docs"),
                col("sum_dl").cast("long").as("sum_dl"))
      val negs = tombStats(spark, dir) match {
        case Some(t) =>
          t.filter(col("scope") === LiveScope && col("bkey") === bkey &&
                   col("gen") === gen)
            .select((-col("n_docs")).as("n_docs"), (-col("sum_dl")).as("sum_dl"))
        case None => base.limit(0)
      }
      base.union(negs)
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
             coalesce(sum(col("sum_dl")), lit(0L)).as("sum_dl"))
        .select(col("n_docs"), col("sum_dl"), lit(-1L).as("batch_id"))
    }
    // (tb, id-slice) clustering — the buildPostings layout, so a
    // compacted store keeps the hot-bucket parallelism the round-15
    // skew audit bought (see buildPostings)
    val clustered = folded.repartition(col("tb"),
      pmod(xxhash64(col("doc_id")), lit(4L)))
    val moves = Map(
      "graft_post_lists" -> {
        val b = stageGeneration(spark, dir, m0, "graft_post_lists",
                                clustered, Seq("batch_id", "tb"))
        killAt("staged-lists"); b
      },
      "graft_post_stats" -> {
        val b = stageGeneration(spark, dir, m0, "graft_post_stats", newStats,
                                Seq("batch_id"))
        killAt("staged-stats"); b
      })
    try {
      partitionGuard(spark, dir, listsPhys, listsSnap, tombSnap,
                     "upsert/delete")()
      partitionGuard(spark, dir, statsPhys, statsSnap, tombSnap,
                     "upsert/delete")()
    } catch {
      case e: Throwable =>
        dropManaged(spark, moves.values.toSeq.map(tbl(dir, _)))
        throw e
    }
    killAt("pre-commit")
    commitGenerations(spark, dir, m0, moves, postGen = Some(gen + 1L),
                      actor = "upsert/delete", killAt = killAt)
    killAt("post-gc")
  }

  /** [[compactPostings]] for the IVF posting lists: fold every
    * batch_id partition into the base generation and purge
    * live-tombstoned vectors. Centroids and PQ codebook are untouched
    * (a fold changes WHERE codes live, never what they are), so probe
    * routing — and therefore probe results over the surviving ids —
    * is bit-identical before/after (WarehouseSpec pins it).
    */
  def compactIvf(spark: SparkSession, dir: String): Unit =
    compactIvfHooked(spark, dir, () => ())

  private[graft] def compactIvfHooked(spark: SparkSession, dir: String,
                                      afterSnapshot: () => Unit,
                                      killAt: String => Unit =
                                        _ => ()): Unit = {
    recoverMaintenance(spark, dir)
    val m0 = readManifest(spark, dir)
    val listsPhys = physBase(m0, "graft_ivf_lists")
    // full-family adoption (round-15 advice fix): fresh-JVM scheduled
    // maintenance must see the surviving store, not crash
    require(adoptLanded(spark, dir, "graft_ivf_meta") &&
            adoptLanded(spark, dir, listsPhys, Seq("batch_id", "cent_id")),
      "no landed IVF index to compact")
    val listsSnap = partitionSet(spark, tbl(dir, listsPhys))
    val tombSnap = tombState(spark, dir)
    afterSnapshot()
    val folded = exceptTombstoned(
        spark.table(tbl(dir, listsPhys)), dir, "vec_id")
      .select(col("vec_id"), col("sub_j"), col("ce"), col("cn"),
              lit(-1L).as("batch_id"), col("cent_id"))
    // cluster by (cell, id-slice): without clustering every write task
    // sprays a file into every cell directory (the compaction fails at
    // its own job — measured 1,558 files from a 2,304-file input), but
    // ONE file per cell serializes each probed cell to a single task
    // (measured 9.2 → 11.1 s on the ×100 probe). Four id-slices per
    // cell keeps directories at a handful of splittable files AND the
    // probe's per-cell parallelism.
    val clustered = folded.repartition(256, col("cent_id"),
      pmod(xxhash64(col("vec_id")), lit(4L)))
    val moves = Map("graft_ivf_lists" ->
      stageGeneration(spark, dir, m0, "graft_ivf_lists", clustered,
                      Seq("batch_id", "cent_id")))
    killAt("staged-lists")
    try partitionGuard(spark, dir, listsPhys, listsSnap, tombSnap,
                       "upsert/delete")()
    catch {
      case e: Throwable =>
        dropManaged(spark, moves.values.toSeq.map(tbl(dir, _)))
        throw e
    }
    killAt("pre-commit")
    commitGenerations(spark, dir, m0, moves, None, "upsert/delete", killAt)
    killAt("post-gc")
  }

  /** Write `rows` as the CANDIDATE next generation of `logical` under
    * a version-suffixed physical name derived from the manifest
    * snapshot `m0` — the standing generation is never read-modified,
    * dropped, or rewritten (the round-14 stage/drop/rewrite swap and
    * both its crash windows are gone). A leftover candidate from a
    * crashed earlier attempt at the same version is cleared first
    * (versions only advance on commit, so the name is deterministic).
    * Visibility comes only from [[commitGenerations]].
    */
  private def stageGeneration(spark: SparkSession, dir: String,
                              m0: Manifest, logical: String,
                              rows: DataFrame, parts: Seq[String],
                              bucketCol: Option[String] = None): String = {
    val newBase = s"${logical}__v${m0.version + 1}"
    dropManaged(spark, Seq(tbl(dir, newBase)))
    val staged = bucketCol match {
      case Some(c) => rows.repartition(col(c))
      case None    => rows
    }
    staged.write.mode(SaveMode.Overwrite)
      .partitionBy(parts: _*)
      .format("parquet")
      .saveAsTable(tbl(dir, newBase))
    newBase
  }

  /** THE commit point of every maintenance swap: one atomic manifest
    * link re-points every staged logical→physical move — and, for
    * posting compactions, the generation bump — TOGETHER, so readers
    * can never observe folded lists with unfolded stats, new stats
    * with an old generation, or any other mix (the round-14 verdict's
    * two one-write-wide windows). Fails — dropping the staged tables
    * and leaving the standing generation untouched — iff ANY writer
    * bumped the manifest after `m0` was read: the optimistic-
    * concurrency fence that closes the re-check→drop window (a racing
    * upsert/delete always bumps before writing, so it either aborts
    * this commit or lands in the new generation it resolves).
    * Superseded physical tables are NOT dropped here (round 16 —
    * snapshot retention): a reader that resolved its physical names
    * against the pre-swap manifest may still be executing its plan,
    * and same-instant GC was the one disclosed reader-correctness
    * residue. They age out through [[recoverMaintenance]]'s
    * superseded-generation GC once no manifest version inside the
    * retention window ([[SnapshotRetainKey]], default 8 versions)
    * references them — the plain-parquet equivalent of a table
    * format's snapshot retention/VACUUM horizon.
    */
  private def commitGenerations(spark: SparkSession, dir: String,
                                m0: Manifest, moves: Map[String, String],
                                postGen: Option[Long],
                                actor: String,
                                killAt: String => Unit = _ => ()): Unit = {
    val next = m0.copy(tabs = m0.tabs ++ moves,
                       postGen = postGen.orElse(m0.postGen))
    if (!tryCommitManifest(spark, dir, m0, next)) {
      dropManaged(spark, moves.values.toSeq.map(tbl(dir, _)))
      throw new IllegalStateException(
        s"concurrent $actor committed during maintenance of " +
          s"${moves.keys.mkString(",")} — aborted with the standing " +
          "generation untouched; re-run at a quiet point")
    }
    killAt("committed")
  }

  // ---------- maintenance: crash recovery + auto policy (round 14) ----------

  /** LEGACY stage-swap registry: base name → (partition columns,
    * bucket column) — the registry [[recoverMaintenance]] needs to
    * finish an interrupted swap. Partition-column types are pinned in
    * [[PartTypes]] (directory-name inference would narrow `batch_id=-1`
    * to int and break the positional insertInto contract of the upsert
    * paths).
    */
  private val SwapManaged: Seq[(String, Seq[String], Option[String])] = Seq(
    ("graft_post_lists", Seq("batch_id", "tb"), Some("tb")),
    ("graft_post_stats", Seq("batch_id"), None),
    ("graft_ivf_lists", Seq("batch_id", "cent_id"), None),
    ("graft_tombstones", Seq("scope", "batch_id"), None))

  private val PartTypes: Map[String, String] = Map(
    "batch_id" -> "bigint", "tb" -> "bigint",
    "cent_id" -> "bigint", "scope" -> "string")

  /** Partition columns of a landed store by base name (empty for the
    * unpartitioned band/sketch stores) — what adoption of an
    * arbitrary store needs.
    */
  private def swapParts(base: String): Seq[String] = base match {
    case "graft_post_lists" => Seq("batch_id", "tb")
    case "graft_post_stats" => Seq("batch_id")
    case "graft_ivf_lists"  => Seq("batch_id", "cent_id")
    case "graft_tombstones" | "graft_tomb_stats" => Seq("scope", "batch_id")
    case _ => Nil
  }

  /** Landed tables written bucketed — adoption must re-declare the
    * bucket spec or the bucketed-join property silently degrades to a
    * shuffle (results identical either way; the spec pins files, not
    * plans, so the property is preserved rather than re-proved).
    */
  private val BucketedLanded: Map[String, (Int, String)] =
    Map("graft_nb_weights" -> ((Buckets, "term")))

  /** Adopt a landed table whose FILES survived a previous JVM (round
    * 14, the recoverTombTable precedent generalized): the in-memory
    * catalog forgets every table across sessions, so without adoption
    * each new process re-pays every index build — at 100 TB a driver
    * restart must not cost a corpus-sized rebuild. The surviving
    * location is re-registered (schema inferred from the parquet
    * footers; partition-column types re-pinned per [[PartTypes]]
    * because directory-name inference would narrow `batch_id=-1` to
    * int and break upsert insertInto positionality; bucket specs
    * re-declared per [[BucketedLanded]]) and its partitions recovered.
    * SAFE because every ensure* gate then validates the adopted meta
    * build key — which folds in the corpus fingerprint and (NB/bloom)
    * the tombstone-state fingerprint — so a stale adopted index
    * rebuilds exactly as a stale registered one does. Returns true iff
    * the table is catalog-visible afterwards.
    */
  private def adoptLanded(spark: SparkSession, dir: String, base: String,
                          parts: Seq[String] = Nil): Boolean = {
    val t = tbl(dir, base)
    spark.catalog.tableExists(t) || {
      val loc = new Path(warehousePath(spark), t)
      val fs = fsOf(spark, loc)
      committedLoc(fs, loc) && {
        // a committed-but-empty location (only _SUCCESS survives) has
        // no footers to infer from — unadoptable, let the gate rebuild
        val inferredOpt =
          scala.util.Try(spark.read.parquet(loc.toString).schema)
        inferredOpt.isSuccess && {
        val inferred = inferredOpt.get
        val dataDdl = inferred.fields.filterNot(f => parts.contains(f.name))
          .map(f => s"${f.name} ${f.dataType.sql}")
        val partDdl = parts.map(p => s"$p ${PartTypes(p)}")
        val cols = (dataDdl ++ partDdl).mkString(", ")
        val partClause =
          if (parts.isEmpty) "" else s" PARTITIONED BY (${parts.mkString(", ")})"
        val bucketClause = BucketedLanded.get(base) match {
          case Some((n, c)) =>
            s" CLUSTERED BY ($c) SORTED BY ($c) INTO $n BUCKETS"
          case None => ""
        }
        spark.sql(s"CREATE TABLE $t ($cols) USING parquet" +
          s"$partClause$bucketClause LOCATION '${fs.makeQualified(loc)}'")
        if (parts.nonEmpty) spark.catalog.recoverPartitions(t)
        true
        }
      }
    }
  }

  /** A table location holds a COMMITTED write iff the job-commit
    * marker survived and no in-flight staging dir did: `_SUCCESS` is
    * written at job commit (and covers the zero-row edge where no
    * parquet file exists), `_temporary` exists only while a write job
    * is in flight.
    */
  private def committedLoc(fs: FileSystem, loc: Path): Boolean =
    fs.exists(loc) && !fs.exists(new Path(loc, "_temporary")) &&
      listFilesRec(fs, loc).exists(f =>
        f.getPath.getName == "_SUCCESS" ||
          f.getPath.getName.endsWith(".parquet"))

  /** The full partition-value strings of a partitioned table (e.g.
    * `batch_id=3/tb=7`) — the concurrency guard's snapshot unit: a
    * catalog partition listing, never a data scan.
    */
  private def partitionSet(spark: SparkSession, table: String): Set[String] =
    spark.sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0)).toSet

  /** The deletion-layer state snapshot for the maintenance guards:
    * the tombstone and tomb-stats partition sets (with table absence
    * itself part of the state, so a table APPEARING mid-maintenance
    * trips the guard too). Location-recovered first, so a fresh JVM
    * snapshots the surviving layer rather than "absent".
    */
  private def tombState(spark: SparkSession, dir: String): Set[String] =
    Seq("graft_tombstones", "graft_tomb_stats").flatMap { b =>
      if (recoverTombTable(spark, dir, b))
        partitionSet(spark, currentTable(spark, dir, b)).map(p => s"$b/$p")
      else Seq(s"$b=absent")
    }.toSet

  /** The partition-set concurrency guard, shared by every maintenance
    * swap: snapshot at entry, re-verify right before the destructive
    * step; any drift aborts with the standing table untouched.
    */
  private def partitionGuard(spark: SparkSession, dir: String,
                             table: String, snap: Set[String],
                             tombSnap: Set[String],
                             actor: String): () => Unit = () => {
    val now = partitionSet(spark, tbl(dir, table))
    val nowTomb = tombState(spark, dir)
    if (now != snap || nowTomb != tombSnap) {
      val drift =
        (now -- snap).map("+" + _) ++ (snap -- now).map("-" + _) ++
          (nowTomb -- tombSnap).map("+" + _) ++ (tombSnap -- nowTomb).map("-" + _)
      throw new IllegalStateException(
        s"concurrent $actor changed ${tbl(dir, table)}/deletion-layer " +
          s"state during maintenance (${drift.mkString(",")}) — aborted " +
          "with the standing table untouched; re-run at a quiet point")
    }
  }

  /** Crash recovery for an interrupted LEGACY stage swap (compaction
    * or vacuum): the plain-parquet stand-in for a table format's
    * atomic snapshot commit stages the folded rows to `<base>_stage`,
    * drops the base, rewrites it, drops the stage — so a crash between
    * the drop and the rewrite leaves the ONLY copy of the table in the
    * stage, and a rebuild-from-corpus could NOT recover it (upserted /
    * streamed batches never existed in the corpus dir). Location-
    * driven, like [[recoverTombTable]], because the in-memory catalog
    * forgets tables across JVMs:
    *
    *  - committed base + surviving stage → the crash happened before
    *    the drop (or after the rewrite): roll BACK by dropping the
    *    stage, the base is intact;
    *  - missing/uncommitted base + committed stage → the crash
    *    happened inside the swap: roll FORWARD — rewrite the base from
    *    the stage (partition types re-pinned per [[PartTypes]]; the
    *    inference off a `batch_id=-1` directory name would narrow the
    *    column and break upsert insertInto positionality), then drop
    *    the stage.
    *
    * Round 15: maintenance swaps now commit through the atomic
    * manifest ([[commitGenerations]]) and never stage-drop-rewrite, so
    * the roll-forward/back arms below serve only LEGACY crash states
    * (a pre-manifest deployment's stage surviving an upgrade). What
    * the manifest protocol leaves behind on a crash is bounded
    * garbage, collected here: staged generation tables never
    * committed (crash before the link) and superseded generations
    * never dropped (crash between the link and the GC) — both
    * identified as version-suffixed physicals the manifest does not
    * currently name; probes are correct throughout either way.
    *
    * Called by every maintenance entrypoint and the ensure* gates;
    * costs one directory listing when nothing crashed. Returns the
    * actions taken.
    */
  def recoverMaintenance(spark: SparkSession, dir: String): Seq[String] = {
    val wh = warehousePath(spark)
    val fs = fsOf(spark, wh)
    // generation GC under SNAPSHOT RETENTION (round 16): a version-
    // suffixed physical is dropped only when NO manifest version
    // inside the retention window still references it —
    //  - staged-but-never-committed crash leftovers are referenced by
    //    no version file at all, so they age into the rule as soon as
    //    the manifest passes their version (same as before);
    //  - SUPERSEDED generations stay readable for `SnapshotRetainKey`
    //    further manifest versions (default 8), so a reader that
    //    resolved its physical names against a recent manifest keeps
    //    a live table under its plan even while maintenance commits
    //    and this GC runs (the round-15 disclosed residue, closed);
    //    storage stays bounded — every mutation bumps a version, so
    //    retired generations age out at curation cadence.
    // A candidate at version+1 is left alone: it may be an IN-FLIGHT
    // stager's (its own next attempt clears it, and any later commit
    // ages it into this rule).
    val log = readManifestLog(spark, dir)
    val m = log.lastOption.getOrElse(Manifest(0L, Map.empty, None))
    val retain = spark.conf.getOption(SnapshotRetainKey)
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(8L)
    val window = log.filter(_.version >= m.version - retain)
    val keepVersioned: Set[String] =
      (window.flatMap(_.tabs.values) ++ m.tabs.values).toSet
    val suffix = s"_${ns(dir)}"
    val Versioned = ("(graft_[a-z_]+__v(\\d+))" +
      java.util.regex.Pattern.quote(suffix)).r
    val gced = listDir(fs, wh)
      .flatMap(f => f.getPath.getName match {
        case Versioned(physBaseName, v)
            if v.toLong <= m.version &&
              !keepVersioned.contains(physBaseName) =>
          dropManaged(spark, Seq(tbl(dir, physBaseName)))
          Some(s"gc-orphan ${tbl(dir, physBaseName)}")
        case _ => None
      }) ++
      // a superseded PLAIN-named generation (the store's first swap
      // re-addressed the logical): versions WITHOUT a tab entry for
      // the logical reference the plain name implicitly, so it is
      // retained while any window version lacks the mapping and
      // collected once the whole window maps the logical elsewhere
      m.tabs.toSeq.flatMap { case (logical, phys) =>
        val windowRefsPlain = window.exists(v => !v.tabs.contains(logical))
        if (phys != logical && !windowRefsPlain &&
            fs.exists(new Path(wh, tbl(dir, logical)))) {
          dropManaged(spark, Seq(tbl(dir, logical)))
          Some(s"gc-superseded ${tbl(dir, logical)}")
        } else None
      } ++
      // stale manifest commit temp files (round-16 advice fix): a
      // crash between the temp write and the link leaks commit_*.tmp;
      // age-guarded so an in-flight writer's fresh temp is never swept
      listDir(fs, manifestDir(spark, dir))
        .filter(f => f.getPath.getName.startsWith("commit_") &&
          f.getPath.getName.endsWith(".tmp") &&
          f.getModificationTime < System.currentTimeMillis() - 600000L)
        .map { f =>
          fs.delete(f.getPath, false)
          s"gc-commit-tmp ${f.getPath.getName}"
        }
    gced ++ SwapManaged.flatMap { case (base, parts, bucketCol) =>
      val stageT = tbl(dir, s"${base}_stage")
      val stageLoc = new Path(wh, stageT)
      if (!fs.exists(stageLoc)) None
      else {
        val baseT = tbl(dir, base)
        val baseLoc = new Path(wh, baseT)
        if (committedLoc(fs, baseLoc)) {
          dropManaged(spark, Seq(stageT))
          Some(s"dropped-stage $baseT")
        } else if (committedLoc(fs, stageLoc)) {
          dropManaged(spark, Seq(baseT)) // partial rewrite / catalog ghost
          scala.util.Try(spark.read.parquet(stageLoc.toString)) match {
            case scala.util.Success(raw) =>
              val typed = parts.foldLeft(raw) { (df, p) =>
                df.withColumn(p, col(p).cast(PartTypes(p)))
              }
              val staged = bucketCol match {
                case Some(c) => typed.repartition(col(c))
                case None    => typed
              }
              staged.write.mode(SaveMode.Overwrite)
                .partitionBy(parts: _*)
                .format("parquet")
                .saveAsTable(baseT)
              dropManaged(spark, Seq(stageT))
              Some(s"rolled-forward $baseT")
            case scala.util.Failure(_) if tombSchemas.contains(base) =>
              // committed-but-EMPTY stage (only _SUCCESS): legitimate
              // when a vacuum pruned every tombstone — roll forward to
              // an empty table from the pinned schema (no footers to
              // infer from); other stores never fold to empty
              val (cols2, parts2) = tombSchemas(base)
              spark.sql(s"CREATE TABLE $baseT ($cols2) USING parquet " +
                s"PARTITIONED BY ($parts2)")
              dropManaged(spark, Seq(stageT))
              Some(s"rolled-forward-empty $baseT")
            case scala.util.Failure(_) =>
              Some(s"unrecoverable $baseT")
          }
        } else {
          // both uncommitted: unreachable by the swap's write order
          // (the stage commits before the base is touched) — report,
          // touch nothing
          Some(s"unrecoverable $baseT")
        }
      }
    }
  }

  /** One row per landed incremental store: landed batch partitions,
    * physical file count, and live-tombstoned ids still physically
    * present (the deferred-purge backlog). The facts behind
    * [[autoMaintain]]'s policy, also useful on their own as the ops
    * dashboard a 1000-executor deployment watches: probe cost degrades
    * with FILE count (the measured ×100 small-file spiral:
    * 64 → 2,112 files = +45% probe latency), not data size.
    */
  def maintenanceStatus(spark: SparkSession, dir: String): DataFrame = {
    val wh = warehousePath(spark)
    def files(table: String): Long = {
      val p = new Path(wh, table)
      listFilesRec(fsOf(spark, p), p)
        .count(_.getPath.getName.endsWith(".parquet")).toLong
    }
    val live = tombstoneIds(spark, dir, LiveScope)
    def purgeable(table: String, idCol: String): Long = live match {
      case Some(t) =>
        spark.table(table).select(col(idCol).as("doc_id")).distinct()
          .join(broadcast(t.toDF("doc_id")), Seq("doc_id"), "left_semi")
          .count()
      case None => 0L
    }
    val stores = Seq(
      ("postings", "graft_post_lists", "doc_id"),
      ("ivf", "graft_ivf_lists", "vec_id"))
    import spark.implicits._
    val m = readManifest(spark, dir)
    stores.flatMap { case (store, base, idCol) =>
      val t = tbl(dir, physBase(m, base))
      // adoption, not tableExists: a scheduled autoMaintain in a fresh
      // JVM must see the surviving stores, or the spiral/purge backlog
      // it exists to bound grows invisibly until some probe runs first
      if (!adoptLanded(spark, dir, physBase(m, base), swapParts(base))) None
      else {
        val batches = landedBatchIds(spark, t)
        Some((store, (batches - (-1L)).size.toLong, files(t),
              purgeable(t, idCol)))
      }
    }.toDF("store", "upsert_batches", "files", "purgeable_tombstoned")
  }

  /** The maintenance policy over [[maintenanceStatus]]'s facts: first
    * finish any interrupted swap ([[recoverMaintenance]]), then
    * compact a store when its upsert-batch partitions exceed
    * `maxBatches` (the small-file bound) or at least `minPurge`
    * live-tombstoned ids are still physically present (the deferred
    * right-to-be-forgotten purge), then prune tombstones whose ids are
    * gone from every re-entry surface ([[vacuumTombstones]]). Runs at
    * curation cadence (the reference's cron shape); every step is
    * probe-identity-preserving, so scheduling it is an ops decision,
    * not a correctness one. Returns the actions taken.
    *
    * Abort handling (round-15, verdict item 4): a compaction or
    * vacuum that loses its commit race to an interleaved writer
    * aborts idempotently — but a busy store would starve maintenance
    * forever if the cron just skipped, so each step re-attempts up to
    * `retries` times (the work is recomputed from the post-writer
    * state each time); a step still losing after that is reported as
    * `aborted-*` for the next cycle rather than thrown.
    */
  def autoMaintain(spark: SparkSession, dir: String, maxBatches: Int = 8,
                   minPurge: Long = 1L, retries: Int = 2): Seq[String] =
    autoMaintainHooked(spark, dir, maxBatches, minPurge, retries, () => ())

  /** [[autoMaintain]] with a test seam run inside each compaction
    * attempt's fold window (the compactPostingsHooked seam) — lets the
    * spec interleave writers per-attempt and prove the bounded retry
    * lands once quiet.
    */
  private[graft] def autoMaintainHooked(spark: SparkSession, dir: String,
                                        maxBatches: Int, minPurge: Long,
                                        retries: Int,
                                        attemptSeam: () => Unit)
      : Seq[String] = {
    def attempt(what: String)(body: () => Unit): String = {
      var left = retries
      var done = false
      while (!done) {
        try { body(); done = true }
        catch {
          case _: IllegalStateException if left > 0 =>
            left -= 1
          case _: IllegalStateException =>
            return s"aborted-$what"
        }
      }
      what
    }
    val recovered = recoverMaintenance(spark, dir)
    val status = maintenanceStatus(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val compacted = status.toSeq.sortBy(_._1).flatMap {
      case (store, (batches, purge)) =>
        if (batches <= maxBatches && purge < minPurge) None
        else Some(attempt(s"compacted-$store") { () =>
          if (store == "postings")
            compactPostingsHooked(spark, dir, attemptSeam)
          else compactIvfHooked(spark, dir, attemptSeam)
        })
    }
    var pruned = 0L
    val vac = attempt("vacuumed") { () =>
      pruned = vacuumTombstones(spark, dir)
    }
    recovered ++ compacted ++
      (if (vac != "vacuumed") Seq(vac)
       else if (pruned > 0) Seq(s"vacuumed-$pruned") else Nil)
  }
}
