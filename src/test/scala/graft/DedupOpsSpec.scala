package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}
import graft.operators.DedupOps
import graft.sources.Tables

/** Module C specs — the non-oracle dedup operators verified against
  * naive Scala recomputations of the same definitions (the synthetic
  * corpus plants ~28 near-dup pairs at sf0.001, so ranked outputs have
  * real signal to check).
  */
class DedupOpsSpec extends SparkSpec {

  private lazy val texts: Map[Long, String] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def shingleSet(t: String): Set[String] =
    t.split(" ", -1).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet

  private def exactJaccard(a: Long, b: Long): Double = {
    val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("c1 exact dedup: all docs canonical when no exact dups exist") {
    val got = DedupOps.dedupExact(spark, sf).collect()
    assert(got.length == texts.size)
    assert(got.forall(_.getAs[Long]("dup_count") == 1L))
    assert(got.forall(_.getAs[Boolean]("is_canonical")))
  }

  test("c2 minhash: top candidates are true near-dups; estimate tracks exact jaccard") {
    val got = DedupOps.dedupMinhash(spark, sf).collect()
    assert(got.nonEmpty)
    // est within [0,1], sorted desc
    val ests = got.map(_.getAs[Double]("est_jaccard"))
    assert(ests.forall(e => e >= 0.0 && e <= 1.0))
    assert(ests.sameElements(ests.sortBy(-_)))
    // for the high-confidence head (est >= 0.5), the 128-perm estimate
    // must track exact jaccard within ~4 sigma of the minhash stderr
    got.filter(_.getAs[Double]("est_jaccard") >= 0.5).foreach { r =>
      val exact = exactJaccard(r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(math.abs(r.getAs[Double]("est_jaccard") - exact) < 0.2,
        s"pair ${r.getAs[Long]("a_id")},${r.getAs[Long]("b_id")}: est=${r.getAs[Double]("est_jaccard")} exact=$exact")
    }
    // the planted near-identical pairs (exact j >= 0.9) must be found
    val found = got.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val planted = texts.keys.toSeq.sorted.combinations(2).collect {
      case Seq(a, b) if exactJaccard(a, b) >= 0.9 => (a, b)
    }.toSet
    assert(planted.nonEmpty && planted.subsetOf(found),
      s"missing ${planted -- found}")
  }

  test("c3 simhash: hamming values are exact and pairs share a band") {
    val got = DedupOps.dedupSimhash(spark, sf).collect()
    assert(got.nonEmpty)
    val sigs = Tables.documents(spark, sf).select(
        col("doc_id"), TextFns.simhash64(TextFns.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      assert(r.getAs[Int]("hamming") == ham)
      // default layout: a pair shares a C(6,3) block-combination band
      // iff at least 3 of the 6 signature blocks are equal
      val equalBlocks = (0 until 6).count(i =>
        DedupOps.simhashBlockOf(sigs(a), i) == DedupOps.simhashBlockOf(sigs(b), i))
      assert(equalBlocks >= 3, s"pair $a,$b shares no block-combination band")
    }
    val hams = got.map(_.getAs[Int]("hamming"))
    assert(hams.sameElements(hams.sorted))
  }

  test("c4 ngram jaccard: values exactly match naive capped-vocabulary jaccard") {
    val got = DedupOps.ngramJaccard(spark, sf).collect()
    assert(got.nonEmpty)
    // replicate the df<=100 cap (multiset df: one count per occurrence
    // in each doc's distinct shingle set)
    val allShingles = texts.toSeq.flatMap { case (id, t) => shingleSet(t).map(_ -> id) }
    val df = allShingles.groupBy(_._1).view.mapValues(_.size).toMap
    val kept: Map[Long, Set[String]] = texts.map { case (id, t) =>
      id -> shingleSet(t).filter(s => df(s) <= 100)
    }
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val inter = kept(a).intersect(kept(b)).size
      val expected = inter.toDouble / (kept(a).size + kept(b).size - inter)
      assert(math.abs(r.getAs[Double]("jaccard") - expected) < 1e-5,
        s"pair $a,$b: got ${r.getAs[Double]("jaccard")} expected $expected")
    }
  }

  test("c4 prefix arm: byte-identical to exhaustive when the τ-guard holds (planted completeness)") {
    // ≥50 planted near-dup pairs with J ≥ τ=0.5, so the prefix fast
    // path's exactness guard passes and the auto path must take it —
    // this is the planted-pair completeness proof for the prefix-filter
    // theorem: if the prefix candidate generation missed ANY qualifying
    // pair, the top-50 could not match the exhaustive arm's.
    val vocab = (0 until 400).map(i => s"w$i")
    val rnd = new scala.util.Random(7)
    def mkDoc(): String = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 60).map(i => i.toLong -> mkDoc()).toMap
    def editOneToken(t: String): String = {
      val ts = t.split(" "); ts(30) = "edited"; ts.mkString(" ")
    }
    // 60 near-dup pairs (J ≈ 0.9) + 20 pure-noise docs
    val docs = base ++
      base.map { case (id, t) => (100 + id) -> editOneToken(t) } ++
      (0 until 20).map(i => (200 + i).toLong -> mkDoc())
    val dir = java.nio.file.Files.createTempDirectory("graft-c4prefix").toString
    import spark.implicits._
    docs.toSeq.sortBy(_._1).map { case (id, t) =>
        (id, t, "en", "planted", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard")))
    val exh = rowsOf(DedupOps.ngramJaccardExhaustive(spark, dir))
    val pre = rowsOf(DedupOps.ngramJaccardPrefix(spark, dir))
    assert(pre.length == 50 && pre.forall(_._3 >= 0.5),
      "guard precondition not met — corpus has <50 pairs at τ")
    assert(pre.sameElements(exh),
      s"prefix arm diverges from exhaustive: ${pre.toSeq.diff(exh.toSeq)}")
    // the banded arm (round 16's registered fast path) must agree
    // byte-for-byte on a corpus where its guard passes: 60 planted
    // J≈0.9 pairs, no mega-cluster, so LSH surfaces every top-50 pair
    // and no band bucket exceeds the cap
    val banded = rowsOf(DedupOps.ngramJaccardBanded(spark, dir))
    assert(banded.sameElements(exh),
      s"banded arm diverges from exhaustive: ${banded.toSeq.diff(exh.toSeq)}")
    // the auto path must return the identical rows (fast path taken)
    val auto = rowsOf(DedupOps.ngramJaccard(spark, dir))
    assert(auto.sameElements(exh))
    // every planted pair the exhaustive top-50 surfaces is found
    val planted = (0 until 60).map(i => (i.toLong, (100 + i).toLong)).toSet
    val got = pre.map(r => (r._1, r._2)).toSet
    assert(got.subsetOf(planted),
      "top-50 should be planted pairs only on this corpus")
  }

  test("planted corpus: every dedup operator recovers controlled duplicates") {
    // Controlled ground truth: 40 random-token base docs, 4 exact-dup
    // pairs, 6 near-dup pairs (one token edited — jaccard ≈ 0.9+).
    val vocab = Vector("spark", "table", "row", "join", "group", "query",
      "scan", "merge", "sort", "batch", "window", "hash", "filter", "agg",
      "column", "vector", "stream", "key", "value", "order")
    val rnd = new scala.util.Random(42)
    def mkDoc(): String = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 40).map(i => i.toLong -> mkDoc()).toMap
    val exactPairs = (0 until 4).map(i => (i.toLong, (40 + i).toLong))
    val nearPairs = (0 until 6).map(i => ((4 + i).toLong, (44 + i).toLong))
    def editOneToken(t: String): String = {
      val ts = t.split(" "); ts(30) = "edited"; ts.mkString(" ")
    }
    val docs = base ++
      exactPairs.map { case (src, id) => id -> base(src) } ++
      nearPairs.map { case (src, id) => id -> editOneToken(base(src)) }
    val dir = java.nio.file.Files.createTempDirectory("graft-planted").toString
    import spark.implicits._
    docs.toSeq.sortBy(_._1).map { case (id, t) =>
        (id, t, "en", "planted", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // c1: exact groups have dup_count 2 and the lower id is canonical
    val exact = DedupOps.dedupExact(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_count"), r.getAs[Boolean]("is_canonical"))).toMap
    exactPairs.foreach { case (a, b) =>
      assert(exact(a) == (2L, true) && exact(b) == (2L, false), s"exact $a,$b")
    }
    // c2/c3/c4: every planted pair (exact AND near) must be surfaced
    val planted = (exactPairs ++ nearPairs).toSet
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val mh = DedupOps.dedupMinhash(spark, dir)
    assert(planted.subsetOf(pairsOf(mh)), "minhash missed planted pairs")
    val sh = DedupOps.dedupSimhash(spark, dir)
    assert(planted.subsetOf(pairsOf(sh)), "simhash missed planted pairs")
    val nj = DedupOps.ngramJaccard(spark, dir)
    assert(planted.subsetOf(pairsOf(nj)), "ngram-jaccard missed planted pairs")
    // near-dup pairs rank with high estimated jaccard in c2
    val ests = mh.collect().map(r =>
      ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
       r.getAs[Double]("est_jaccard"))).toMap
    exactPairs.foreach(p => assert(ests(p) == 1.0, s"exact pair $p est ${ests(p)}"))
    nearPairs.foreach(p => assert(ests(p) >= 0.7, s"near pair $p est ${ests(p)}"))
  }

  test("c6 clusters: transitive chain collapses to one component (planted)") {
    // A~B share the first half, B~C share the second half, A and C
    // share NOTHING — exactly the case pair operators (c2–c5) cannot
    // express and connected components must: {A,B,C} is one cluster.
    // Token count is a multiple of the 8-token chunk so shared halves
    // align on chunk boundaries.
    val h1 = (0 until 32).map(i => s"alpha$i").mkString(" ")
    val h2 = (0 until 32).map(i => s"beta$i").mkString(" ")
    val h3 = (0 until 32).map(i => s"gamma$i").mkString(" ")
    val h4 = (0 until 32).map(i => s"delta$i").mkString(" ")
    val docs = Seq(
      0L -> s"$h1 $h2",   // A
      1L -> s"$h1 $h3",   // B: shares h1 with A
      2L -> s"$h4 $h3",   // C: shares h3 with B, nothing with A
      3L -> (0 until 64).map(i => s"solo$i").mkString(" "))  // singleton
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = DedupOps.dedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(got(0L) == (0L, 3L))
    assert(got(1L) == (0L, 3L))
    assert(got(2L) == (0L, 3L), "transitive member C must join A's cluster")
    assert(got(3L) == (3L, 1L), "singleton keeps its own label")
  }

  test("c12 bloom dedup: planted word-set dups labeled exactly; bloom never decides") {
    // Ground truth under the word-SET fingerprint: batch docs
    // (id % 10 == 0) that permute/repeat a standing doc's vocabulary
    // are dups of it; novel vocabularies are not. dup_of must be the
    // MIN standing partner when several share the set.
    val docs = Seq(
      1L  -> "alpha beta gamma delta",
      2L  -> "delta gamma beta alpha",        // standing twin of 1 (permuted)
      3L  -> "epsilon zeta eta theta",
      5L  -> "iota kappa lambda mu",
      10L -> "beta alpha delta gamma gamma",  // batch: same SET as 1 and 2 → dup_of 1
      20L -> "theta eta zeta epsilon",        // batch: permutes 3 → dup_of 3
      30L -> "nu xi omicron pi",              // batch: novel → not a dup
      40L -> "iota kappa lambda")             // batch: SUBSET of 5's set ≠ equal → not a dup
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = DedupOps.bloomDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         r.getAs[Boolean]("is_dup"))).toMap
    assert(got.keySet == Set(10L, 20L, 30L, 40L), "output = the arriving batch")
    assert(got(10L) == (Some(1L), true), "min standing partner wins")
    assert(got(20L) == (Some(3L), true))
    assert(got(30L) == (None, false))
    assert(got(40L) == (None, false), "subset vocabulary is not set equality")
  }

  test("c12 bloom dedup == naive set-join recompute on the real corpus (no false negatives)") {
    // The bloom is a pruner: the output must equal the plain
    // normalized-key join's answer doc for doc — a bloom false
    // negative (the one failure the sketch contract forbids) would
    // surface here as a missed dup.
    val norm: String => String = t => t.split(" ", -1).distinct.sorted.mkString(" ")
    val standing = texts.collect { case (id, t) if id % 10 != 0 => (id, norm(t)) }
    val expected = texts.collect { case (id, t) if id % 10 == 0 =>
      val partners = standing.collect { case (sid, k) if k == norm(t) => sid }
      id -> (if (partners.isEmpty) None else Some(partners.min))
    }
    val got = DedupOps.bloomDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == expected.toMap)
  }

  test("c6 clusters on the real corpus: labels are a valid CC fixpoint") {
    val got = DedupOps.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(got.size == texts.size)
    // cluster ids are the min member; sizes consistent with membership
    val byCluster = got.groupBy(_._2._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid label isn't min member")
      members.foreach { case (_, (_, sz)) =>
        assert(sz == members.size, s"cluster $cid size mismatch")
      }
    }
  }

  /** Naive ground truth for p3: union-find closure over ALL pairs with
    * exact 3-gram-set Jaccard >= tau. Also the direct justification of
    * p3's exact SQL oracle: equality proves the LSH candidate stage
    * missed NO >=tau pair on this corpus (recall = 1).
    */
  private def naiveFuzzyClusters(docTexts: Map[Long, String],
                                 tau: Double): Map[Long, Long] = {
    def sset(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sets = docTexts.map { case (id, t) => id -> sset(t) }
    val parent = scala.collection.mutable.Map(docTexts.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docTexts.keys.toSeq.sorted
    for {
      i <- ids.indices; j <- (i + 1) until ids.size
      (a, b) = (ids(i), ids(j))
      inter = sets(a).intersect(sets(b)).size
      uni = sets(a).size + sets(b).size - inter
      if uni > 0 && inter.toDouble / uni >= tau
    } union(a, b)
    ids.map(id => id -> find(id)).toMap
  }

  test("p3 fuzzy dedup equals the naive exact-Jaccard closure on the real corpus") {
    val got = DedupOps.fuzzyDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
         r.getAs[Boolean]("is_representative"))).toMap
    assert(got.size == texts.size)
    val expected = naiveFuzzyClusters(texts, 0.8)
    val expSizes = expected.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (id, (cid, sz, rep)) =>
      assert(cid == expected(id), s"doc $id: cluster $cid != ${expected(id)}")
      assert(sz == expSizes(expected(id)), s"doc $id: size")
      assert(rep == (id == cid), s"doc $id: representative flag")
    }
    // non-vacuous: the corpus plants real fuzzy clusters
    assert(got.values.exists(_._2 > 1), "no multi-doc cluster found")
  }

  test("p3 planted transitive chain: A~B~C collapse even when A,C are below tau") {
    // B = A with the last 10 of 100 tokens rewritten (3-gram sets:
    // 88 shared of 108 union, J(A,B) = 0.815); C = B with the FIRST 10
    // rewritten (J(B,C) = 0.815, J(A,C) = 78/118 = 0.661 < 0.8) — the
    // transitive case pair ranking cannot express.
    val mid = (10 until 90).map(i => s"tok$i")
    val a = ((0 until 10).map(i => s"head$i") ++ mid ++ (0 until 10).map(i => s"tail$i")).mkString(" ")
    val b = ((0 until 10).map(i => s"head$i") ++ mid ++ (0 until 10).map(i => s"newt$i")).mkString(" ")
    val c = ((0 until 10).map(i => s"newh$i") ++ mid ++ (0 until 10).map(i => s"newt$i")).mkString(" ")
    val solo = (0 until 100).map(i => s"solo$i").mkString(" ")
    val docTexts = Map(0L -> a, 1L -> b, 2L -> c, 3L -> solo)
    // confirm the construction actually straddles tau
    val naive = naiveFuzzyClusters(docTexts, 0.8)
    assert(naive == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L),
      s"planted construction broke: $naive")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    import spark.implicits._
    docTexts.toSeq.sortBy(_._1).map { case (id, t) =>
        (id, t, "en", "planted", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = DedupOps.fuzzyDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(got(0L) == (0L, 3L) && got(1L) == (0L, 3L) && got(2L) == (0L, 3L),
      s"chain did not collapse: $got")
    assert(got(3L) == (3L, 1L))
  }

  test("c5 embedding cosine: values exact vs JVM recompute; pairs from real buckets") {
    val got = DedupOps.dedupEmbedding(spark, sf).collect()
    assert(got.nonEmpty)
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { r =>
      val expected = cos(embs(r.getAs[Long]("a_id")), embs(r.getAs[Long]("b_id")))
      assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-5)
    }
    val cosines = got.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)))
  }

  test("c7 CDC chunking resynchronizes after a prepended token; fixed chunks don't") {
    // the motivating property: doc B = one junk token + doc A. Fixed
    // 8-token stride (c6's chunking) shifts EVERY chunk, so A and B
    // share nothing; CDC boundaries depend only on local content, so
    // after the first boundary every later chunk matches again.
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull &&
        size(split(col("text"), " ")) >= 60)
      .orderBy("doc_id").limit(5).collect()
    assert(docs.nonEmpty)
    val maxId = Tables.documents(spark, sf).agg(max("doc_id")).head.getLong(0)
    val spark2 = spark; import spark2.implicits._
    val shifted = docs.zipWithIndex.map { case (r, i) =>
      (maxId + 1 + i, "zzshift " + r.getAs[String]("text"),
       r.getAs[String]("lang"), r.getAs[String]("source"))
    }.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_").toString
    Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(shifted)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val truth = docs.zipWithIndex
      .map { case (r, i) => (r.getAs[Long]("doc_id"), maxId + 1 + i) }.toSet
    val c7 = DedupOps.cdcChunks(spark, tmp, limit = 1 << 20).collect()
    val c7pairs = c7.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val found = truth.filter(c7pairs.contains)
    assert(found.size == truth.size,
      s"CDC missed shifted twins: found ${found.size}/${truth.size}")
    // shared chunks dominate once boundaries resync
    c7.filter(r => truth.contains((r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))))
      .foreach { r =>
        assert(r.getAs[Double]("overlap") >= 0.5,
          s"resync overlap too low: ${r.getAs[Double]("overlap")}")
      }
    // the fixed-stride contrast: c6's aligned 8-token chunk edges place
    // each shifted twin in a DIFFERENT cluster from its base
    val c6 = DedupOps.dedupClusters(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val c6Joined = truth.count { case (a, b) => c6(a) == c6(b) }
    assert(c6Joined == 0,
      s"fixed-stride chunking unexpectedly paired $c6Joined shifted twins")
  }

  test("c7 short docs survive as one whole-doc chunk (no descending-sequence walk)") {
    // 1-3 token docs are below the rolling window: they must flow
    // through as a single chunk, not crash or emit nothing
    val spark2 = spark; import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_short_").toString
    Seq((1L, "one", "en", "s"), (2L, "two words", "en", "s"),
        (3L, "one", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupOps.cdcChunks(spark, tmp).collect()
    // docs 1 and 3 share their single whole-doc chunk
    assert(got.exists(r => r.getAs[Long]("a_id") == 1L &&
      r.getAs[Long]("b_id") == 3L && r.getAs[Double]("overlap") == 1.0))
  }

  test("c8 duplicate spans equal a naive JVM recompute of the same definition") {
    val k = 8
    val winCounts = scala.collection.mutable.Map.empty[String, Int]
    val docWins = texts.map { case (id, t) =>
      val ws = t.split(" ", -1).sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toVector
      ws.foreach(w => winCounts(w) = winCounts.getOrElse(w, 0) + 1)
      id -> ws
    }
    val want = docWins.map { case (id, ws) =>
      val dupPos = ws.zipWithIndex.collect {
        case (w, i) if winCounts(w) > 1 => i + 1
      }
      // gaps-and-islands merge: gap <= k between starts ⇒ same span
      val spans = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((lo, hi) :: rest, p) if p - hi <= k => (lo, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      val dupTokens = spans.map { case (lo, hi) => hi - lo + k }.sum.toLong
      id -> ((spans.size.toLong, dupTokens,
              BigDecimal(dupTokens.toDouble / texts(id).split(" ", -1).length)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = DedupOps.dupSpans(spark, sf).collect()
    assert(got.length == texts.size)
    assert(got.exists(_.getAs[Long]("n_spans") > 0L),
      "corpus should contain at least one duplicated span")
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (ns, dt, frac) = want(id)
      assert(r.getAs[Long]("n_spans") == ns, s"doc $id n_spans")
      assert(r.getAs[Long]("dup_tokens") == dt, s"doc $id dup_tokens")
      assert(math.abs(r.getAs[Double]("dup_token_frac") - frac) < 1e-6,
        s"doc $id frac")
    }
  }

  test("c8 merges overlapping windows into one span; separates distant repeats") {
    val spark2 = spark; import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_spans_").toString
    val block = (1 to 9).map(i => s"w$i").mkString(" ") // 9 toks: 2 windows
    val filler = (1 to 20).map(i => s"u$i").mkString(" ")
    Seq(
      // doc 1 and 2 share `block`: both get ONE span of 9 tokens (the
      // two overlapping 8-windows merge), plus doc-unique tails
      (1L, s"$block $filler", "en", "s"),
      (2L, s"$block ${filler.replace("u", "v")}", "en", "s"),
      // doc 3 repeats the block internally, far apart: two spans
      (3L, s"$block ${filler.replace("u", "x")} $block", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupOps.dupSpans(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens")))).toMap
    assert(got(1L) == ((1L, 9L)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((1L, 9L)), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 18L)), s"doc 3: ${got(3L)}")
  }

  test("p11 incremental labels equal the full-batch pipeline on a two-batch corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("p11corpus").toString
    // standing corpus (ids % 10 != 0): mutually-distinct token streams;
    // arriving batch (ids % 10 == 0): one exact copy, one near-copy,
    // one moderate-overlap doc, one novel doc
    def toks(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val standing = (1L to 19L).filter(_ % 10 != 0)
      .map(i => (i, toks(s"d${i}t")))
    val near = toks("d3t").split(" ").dropRight(2).mkString(" ") + " zz1 zz2"
    val half = (toks("d7t").split(" ").take(24) ++
                (1 to 16).map(i => s"q$i")).mkString(" ")
    val arriving = Seq(
      (10L, toks("d3t")),   // exact copy of doc 3 → est 1.0
      (20L, near),          // near-copy of doc 3
      (30L, half),          // moderate overlap with doc 7
      (40L, toks("novel"))) // no standing partner
    (standing ++ arriving).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // incremental: arriving batch probes the standing index (cap
    // unbound so the equality is about the algorithm, not the knob)
    val inc = DedupOps.incrementalMinhash(spark, tmp, bucketCap = 1 << 20,
        tau = 0.3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("est_jaccard")).map(_.toDouble))))
      .toMap

    // full-batch reference: the c2 pipeline over the UNION corpus,
    // restricted to (standing, arriving) pairs, same tau, best
    // partner per arriving doc by (max est, min standing id)
    val pairs = DedupOps.dedupMinhash(spark, tmp, bucketCap = 1 << 20,
        limit = 1 << 20).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                 r.getAs[Double]("est_jaccard")))
    val crossBatch = pairs.flatMap { case (a, b, e) =>
      (a % 10 == 0, b % 10 == 0) match {
        case (true, false) => Some((a, b, e)) // (new, existing)
        case (false, true) => Some((b, a, e))
        case _ => None
      }
    }.filter(_._3 >= 0.3)
    val batchBest = crossBatch.groupBy(_._1).map { case (id, xs) =>
      val best = xs.minBy { case (_, ex, e) => (-e, ex) }
      id -> ((Option(best._2), Option(best._3)))
    }
    val expected = arriving.map(_._1)
      .map(id => id -> batchBest.getOrElse(id, (None, None))).toMap
    assert(inc == expected, s"inc=$inc expected=$expected")
    // and the planted structure actually exercised all arms
    assert(inc(10L)._1.contains(3L) && inc(10L)._2.contains(1.0))
    assert(inc(20L)._1.contains(3L))
    assert(inc(30L)._1.contains(7L))
    assert(inc(40L)._1.isEmpty)
  }

  test("c10 dedup cut equals a naive JVM recompute; first occurrence survives") {
    val k = 8
    val occ = scala.collection.mutable.Map.empty[String, Vector[(Long, Int)]]
    val docWins = texts.toSeq.sortBy(_._1).map { case (id, t) =>
      val ws = t.split(" ", -1).sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toVector
      ws.zipWithIndex.foreach { case (w, i) =>
        occ(w) = occ.getOrElse(w, Vector.empty) :+ ((id, i + 1)) }
      id -> ws
    }
    val expected = docWins.map { case (id, ws) =>
      val toks = texts(id).split(" ", -1)
      val cut = Array.fill(toks.length)(false)
      ws.zipWithIndex.foreach { case (w, i) =>
        val os = occ(w) // (doc_id, pos)-ordered by construction
        if (os.length > 1 && os.head != ((id, i + 1)))
          (i until math.min(i + k, toks.length)).foreach(cut(_) = true)
      }
      val keptToks = toks.zipWithIndex.collect { case (t2, i2) if !cut(i2) => t2 }
      id -> ((toks.length.toLong, (toks.length - keptToks.length).toLong,
              keptToks.mkString(" ")))
    }.toMap
    val got = DedupOps.dedupCut(spark, sf).collect()
    assert(got.length == texts.size)
    assert(got.exists(_.getAs[Long]("n_removed") > 0L),
      "corpus should contain at least one cut")
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nt, nr, ct) = expected(id)
      assert(r.getAs[Long]("n_tokens") == nt, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_removed") == nr, s"doc $id n_removed")
      assert(r.getAs[String]("clean_text") == ct, s"doc $id clean_text")
    }
  }

  test("c10 planted: exact copy is fully cut, original and unique docs intact") {
    val spark2 = spark; import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cut_").toString
    val a = (1 to 40).map(i => s"a$i").mkString(" ")
    val u = (1 to 40).map(i => s"u$i").mkString(" ")
    Seq((1L, a), (2L, a), (3L, u))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupOps.dedupCut(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((0L, a)), "first occurrence must survive intact")
    assert(got(2L) == ((40L, "")), "exact copy must be fully cut")
    assert(got(3L) == ((0L, u)), "unique doc untouched")
  }

  test("c9 semdedup equals a naive JVM recompute of the full definition") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val m = vecs.toMap
    val nrm = m.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(m(a), m(b)) / (nrm(a) * nrm(b))
    val cents = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(64)
    // single nearest centroid: (cos desc, cent_id asc)
    val assigned = vecs.map { case (id, _) =>
      val best = cents.map(c => (c, cos(id, c)))
        .minBy { case (c, s) => (-s, c) }
      (id, best._1, best._2)
    }
    val ranked = assigned.groupBy(_._2).toSeq.flatMap { case (_, ms) =>
      ms.sortBy { case (id, _, cs) => (cs, id) }.zipWithIndex
        .map { case ((id, c, cs), i) => (id, c, cs, i + 1) }.toSeq
    }
    val removed = ranked.filter { case (id, c, _, k) =>
      ranked.exists { case (id2, c2, _, k2) =>
        c2 == c && k2 < k && cos(id, id2) >= 0.45 }
    }.map(_._1).toSet
    val expected = ranked.map { case (id, c, cs, _) =>
      (id, c, BigDecimal(cs).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, !removed.contains(id))
    }.toSet
    val got = DedupOps.semDedup(spark, sf).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
       r.getAs[Double]("cent_cos"), r.getAs[Boolean]("kept"))).toSet
    assert(got.size == vecs.length)
    assert(got == expected,
      s"diff spark-only=${(got -- expected).take(5)} model-only=${(expected -- got).take(5)}")
  }

  test("c9 planted: exact twin of the most atypical member is removed, singleton clusters keep") {
    import spark.implicits._
    // 8 base orthogonal-ish vectors + one exact copy of vec 3
    val dim = 64
    def unit(i: Int): Array[Float] = {
      val a = Array.fill(dim)(0.01f); a(i % dim) = 1.0f; a
    }
    val rows = (0L until 8L).map(i => (i, unit(i.toInt * 7).toSeq)) :+
      (100L, unit(3 * 7).toSeq)
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = DedupOps.semDedupFrom(df, nlist = 4, tau = 0.9, clusterCap = 1024)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cent_id"), r.getAs[Boolean]("kept"))).toMap
    assert(got.size == 9)
    // the twin pair lands in the same cluster; exactly one of (3, 100)
    // is removed — the earlier keep-rank (lower vec_id on equal
    // cent_cos) survives
    assert(got(3L)._1 == got(100L)._1)
    assert(got(3L)._2 != got(100L)._2)
    // everything without a twin is kept
    (0L until 8L).filter(_ != 3L).foreach(i => assert(got(i)._2, s"vec $i"))
  }

  test("c9 over-cap clusters: bounded-heap threshold admits exactly the cap lowest-ranked members (naive recompute)") {
    // clusterCap=5 over the sf corpus forces most of the 64 clusters
    // past the cap, so the TopK-threshold path (which replaced the full
    // per-cluster row_number sort) is the live arm — the round-9 form
    // never exercised it at test SFs. Model = the full definition with
    // the cap applied literally via ranking.
    val cap = 5
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val m = vecs.toMap
    val nrm = m.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(m(a), m(b)) / (nrm(a) * nrm(b))
    val cents = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(64)
    val assigned = vecs.map { case (id, _) =>
      val best = cents.map(c => (c, cos(id, c)))
        .minBy { case (c, s) => (-s, c) }
      (id, best._1, best._2)
    }
    val ranked = assigned.groupBy(_._2).toSeq.flatMap { case (_, ms) =>
      ms.sortBy { case (id, _, cs) => (cs, id) }.zipWithIndex
        .map { case ((id, c, cs), i) => (id, c, cs, i + 1) }.toSeq
    }
    val within = ranked.filter(_._4 <= cap)
    val removed = within.filter { case (id, c, _, k) =>
      within.exists { case (id2, c2, _, k2) =>
        c2 == c && k2 < k && cos(id, id2) >= 0.45 }
    }.map(_._1).toSet
    val overCap = ranked.groupBy(_._2).count(_._2.size > cap)
    assert(overCap > 0, "the corpus must actually produce over-cap clusters")
    val expected = ranked.map { case (id, c, cs, _) =>
      (id, c, BigDecimal(cs).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, !removed.contains(id))
    }.toSet
    val got = DedupOps.semDedup(spark, sf, clusterCap = cap).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cent_id"),
       r.getAs[Double]("cent_cos"), r.getAs[Boolean]("kept"))).toSet
    assert(got == expected,
      s"diff spark-only=${(got -- expected).take(5)} model-only=${(expected -- got).take(5)}")
  }

  test("c9 hierarchical routing: same output contract, assignment agrees with exhaustive routing on most vectors") {
    val exact = DedupOps.semDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    def agreement(probes: Int): (Array[org.apache.spark.sql.Row], Double) = {
      val rows = DedupOps.semDedupHier(spark, sf, coarseProbes = probes)
        .collect()
      val m = rows.map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
      (rows, m.count { case (id, c) => exact(id) == c }.toDouble / exact.size)
    }
    val (hier, agree4) = agreement(4)
    assert(hier.length == exact.size, "one row per vector, like the exact form")
    // coarse probing is approximate by design; on this near-random
    // synthetic corpus the coarse level is weakly informative (the
    // regime where hierarchical routing pays is LARGE nlist, where the
    // fine/coarse ratio is high — ScaleBench measures that), so the
    // contract here is: clearly better than the 4/8 random-probe floor
    // (0.5) and monotone in probe depth
    assert(agree4 >= 0.6, s"hier agreement $agree4 below 0.6 at 4 probes")
    val (_, agree6) = agreement(6)
    assert(agree6 >= agree4,
      s"agreement must not degrade with more coarse probes ($agree6 < $agree4)")
    // deterministic: two runs bit-identical
    val again = DedupOps.semDedupHier(spark, sf).collect()
    assert(hier.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
