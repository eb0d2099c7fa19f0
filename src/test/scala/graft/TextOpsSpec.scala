package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Module E specs — naive Scala recomputations at sf0.001. */
class TextOpsSpec extends SparkSpec {

  private lazy val texts: Map[Long, String] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("e1 token totals match naive split counts") {
    val got = TextOps.tokenStats(spark, sf)
      .agg(sum("total_tokens")).collect()(0).getLong(0)
    val naive = texts.values.map(_.split(" ", -1).length.toLong).sum
    assert(got == naive)
  }

  test("e2 quality components are in range and ttr/stopword ratios are exact") {
    val got = TextOps.qualityScore(spark, sf).collect()
    assert(got.length == texts.size)
    val stops = Set("the", "a", "of", "to", "and")
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") == t.length)
      val exp = t.count(stops) .toDouble / t.length
      assert(math.abs(r.getAs[Double]("stopword_ratio") - exp) < 1e-5)
      val ttr = t.distinct.length.toDouble / t.length
      assert(math.abs(r.getAs[Double]("type_token_ratio") - ttr) < 1e-5)
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  // naive JVM Cavnar–Trenkle recompute of TextOps.langId's definition
  private def naiveCt(docs: Seq[(Long, String, String)])
      : Map[Long, (String, Long)] = {
    val K = TextOps.LangProfileK
    def grams(t: String): Seq[String] =
      (1 to 3).flatMap(n => if (t.length >= n) t.sliding(n).toSeq else Nil)
    def topK(gs: Seq[String]): Map[String, Int] =
      gs.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(K)
        .zipWithIndex.map { case ((g, _), i) => g -> (i + 1) }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val sample = docs.groupBy(_._3).values.flatMap(ds =>
      ds.sortBy(d => (md5hex(d._1.toString), d._1))
        .take(TextOps.LangTrainPerLang)).toSeq
    val profiles: Map[String, Map[String, Int]] = sample.groupBy(_._3)
      .view.mapValues(ds => topK(ds.flatMap(d => grams(d._2)))).toMap
    val langs = profiles.keys.toSeq.sorted
    docs.map { case (id, text, _) =>
      val dt = topK(grams(text))
      val scored = langs.map { l =>
        val p = profiles(l)
        l -> dt.map { case (g, dr) =>
          p.get(g).map(pr => math.abs(dr - pr).toLong).getOrElse(K.toLong)
        }.sum
      }
      val (bl, bd) = scored.minBy { case (l, d) => (d, l) }
      id -> (bl, bd)
    }.toMap
  }

  test("e3 lang-id: C&T profiles separate a planted multilingual corpus; dist matches JVM recompute") {
    // three fake languages with disjoint character distributions — the
    // discriminative-power proof the shared-vocabulary synthetic corpus
    // cannot give
    val vocab = Map(
      "aa" -> Vector("alpha", "arbor", "amber", "altar", "apple"),
      "bb" -> Vector("bubble", "barrel", "bobbin", "bramble", "board"),
      "cc" -> Vector("cocoa", "cactus", "circus", "cycle", "crest"))
    val rnd = new scala.util.Random(3)
    val docs = (0 until 90).map { i =>
      val l = Seq("aa", "bb", "cc")(i % 3)
      val v = vocab(l)
      (i.toLong, Seq.fill(40)(v(rnd.nextInt(v.size))).mkString(" "), l)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ct").toString
    import spark.implicits._
    docs.map { case (id, t, l) => (id, t, l, "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextOps.langId(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("guessed_lang"), r.getAs[Long]("profile_dist"))).toMap
    // 100% accuracy on the planted corpus
    docs.foreach { case (id, _, l) =>
      assert(got(id)._1 == l, s"doc $id: guessed ${got(id)._1}, labeled $l")
    }
    // and the (guess, distance) pair matches the naive recompute exactly
    val naive = naiveCt(docs)
    docs.foreach { case (id, _, _) =>
      assert(got(id) == naive(id), s"doc $id: ${got(id)} vs ${naive(id)}")
    }
  }

  test("e3 lang-id on the real corpus: valid label space, deterministic, JVM-exact") {
    val rows = TextOps.langId(spark, sf).collect()
    assert(rows.length == texts.size)
    val labels = rows.map(_.getAs[String]("labeled_lang")).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getAs[String]("guessed_lang")),
        "guess outside the corpus label space")
    }
    val full = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val naive = naiveCt(full.toSeq)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[String]("guessed_lang"),
              r.getAs[Long]("profile_dist")) == naive(id))
    }
    // accuracy vs `lang` must strictly beat the retired round-1
    // stopword mechanism (frozen here as the comparison baseline; it
    // guessed outside the label space for all but 'en'). The corpus
    // shares one vocabulary across langs, so neither mechanism can
    // beat noise-level separability — the claim is strictly-better,
    // not good (measured 0.05 -> 0.26 at sf0.01).
    def oldGuess(text: String): String = {
      val toks = text.split(" ", -1)
      def ratio(ws: Set[String]) = toks.count(ws).toDouble / toks.length
      val (en, da, qu) = (ratio(Set("the", "a")),
        ratio(Set("data", "table", "row")), ratio(Set("query", "join", "group")))
      if (en >= da && en >= qu) "en" else if (da >= qu) "data-ish" else "query-ish"
    }
    val oldAcc = full.count { case (_, t, l) => oldGuess(t) == l }.toDouble / full.length
    val newAcc = rows.count(r =>
      r.getAs[String]("guessed_lang") == r.getAs[String]("labeled_lang"))
      .toDouble / rows.length
    assert(newAcc > oldAcc,
      f"C&T accuracy $newAcc%.3f must beat the stopword toy's $oldAcc%.3f")
  }

  test("e14b accounting agrees with e14 and upper-bounds the learned-BPE count") {
    val acc = TextOps.bpeAccounting(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bytes"))).toMap
    val bpe = TextOps.bpeTokenStats(spark, sf).collect()
    assert(bpe.length == acc.size)
    bpe.foreach { r =>
      val (ws, bytes) = acc(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_ws_tokens") == ws)
      // byte-level BPE starts from the byte sequence and every merge
      // strictly shrinks it
      assert(r.getAs[Long]("n_bpe_tokens") <= bytes)
    }
  }

  test("e5 rolling fingerprint matches JVM fold and is order-sensitive") {
    val got = TextOps.rollingFingerprint(spark, sf).collect()
    def roll(tokens: Array[String]): Long =
      tokens.foldLeft(0L)((acc, t) =>
        ((acc * 1000003L + (t.headOption.map(_.toLong).getOrElse(0L) * 256 + t.length))
          % 2147483647L + 2147483647L) % 2147483647L)
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("rolling_fp") == roll(t))
    }
    // order sensitivity: swapping two distinct tokens changes the hash
    val sample = texts.values.find(t => t.split(" ").distinct.length > 2).get
    val a = sample.split(" ")
    val b = a.clone()
    val i = b.indices.find(i => b(i) != b(0)).get
    val tmp = b(0); b(0) = b(i); b(i) = tmp
    assert(roll(a) != roll(b))
  }

  test("e4 fingerprint matches JVM md5 of the text") {
    val got = TextOps.fingerprint(spark, sf).collect()
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("fp") == md)
      assert(r.getAs[Long]("n_chars_actual") == t.length)
    }
  }

  test("e6 ngram frequencies match naive global counts with the same tiebreak") {
    val got = TextOps.ngramFreq(spark, sf).collect()
      .map(r => (r.getAs[String]("ngram"), r.getAs[Long]("n_occurrences")))
    val counts = scala.collection.mutable.Map[String, Long]()
    texts.values.foreach { t =>
      t.split(" ", -1).sliding(2).filter(_.size == 2)
        .foreach(w => { val k = w.mkString(" "); counts(k) = counts.getOrElse(k, 0L) + 1 })
    }
    val naive = counts.toSeq.sortBy { case (g, n) => (-n, g) }.take(50)
    assert(got.toSeq == naive)
  }

  test("e7 dup-ngram ratio matches naive per-doc distinct-window arithmetic") {
    val got = TextOps.dupNgramRatio(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val ws = texts(r.getAs[Long]("doc_id"))
        .split(" ", -1).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_ngrams") == ws.size)
      assert(r.getAs[Long]("n_distinct") == ws.distinct.size)
      val exp = if (ws.isEmpty) 0.0 else 1.0 - ws.distinct.size.toDouble / ws.size
      assert(math.abs(r.getAs[Double]("dup_ratio") - exp) < 1e-6)
    }
  }

  test("e8 pii scrub: detection matches the planting rule; redaction changes exactly the PII docs") {
    val got = TextOps.piiScrub(spark, sf).collect()
    assert(got.length == texts.size)
    // reference fingerprints of the UNREDACTED augmented text: docs
    // with no planted PII must hash identically (redaction is a no-op
    // on them), docs with PII must hash differently.
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (hasEmail, hasPhone) = (id % 7 == 0, id % 11 == 0)
      assert(r.getAs[Long]("n_emails") == (if (hasEmail) 1L else 0L), s"doc $id emails")
      assert(r.getAs[Long]("n_phones") == (if (hasPhone) 1L else 0L), s"doc $id phones")
      val aug = texts(id) +
        (if (hasEmail) s" contact u$id@example.com" else "") +
        (if (hasPhone) f" call 555-123-${id % 10000}%04d" else "")
      val augMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(aug.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (hasEmail || hasPhone)
        assert(r.getAs[String]("redacted_fp") != augMd5, s"doc $id not redacted")
      else
        assert(r.getAs[String]("redacted_fp") == augMd5, s"doc $id altered without PII")
    }
    // the redacted form itself is deterministic and matches a JVM
    // recompute of the same regex chain on a planted doc
    val sample = got.find(r => r.getAs[Long]("n_emails") == 1).get
    val id = sample.getAs[Long]("doc_id")
    val aug = texts(id) + s" contact u$id@example.com" +
      (if (id % 11 == 0) f" call 555-123-${id % 10000}%04d" else "")
    val redacted = aug
      .replaceAll("[a-z0-9]+@[a-z0-9.]+\\.[a-z]+", "[EMAIL]")
      .replaceAll("555-[0-9]{3}-[0-9]{4}", "[PHONE]")
    val redMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(redacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sample.getAs[String]("redacted_fp") == redMd5)
  }

  test("generic scrub finds and redacts naturally-embedded PII (no augmentation path)") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jo.doe1@mail.example.org or bob@x.io thanks"),
      (2L, "call 555-867-5309 now or later 555-000-1111"),
      (3L, "nothing sensitive here at all"),
      (4L, "mixed: a@b.cd and 555-123-4567 together"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.scrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
         r.getAs[String]("redacted_fp"))).toMap
    assert(got(1L)._1 == 2 && got(1L)._2 == 0)
    assert(got(2L)._1 == 0 && got(2L)._2 == 2)
    assert(got(3L) == (0L, 0L, got(3L)._3))
    assert(got(4L)._1 == 1 && got(4L)._2 == 1)
    assert(got(3L)._3 == md5hex("nothing sensitive here at all"),
      "PII-free text must survive redaction byte-identical")
    assert(got(4L)._3 == md5hex("mixed: [EMAIL] and [PHONE] together"))
  }

  test("e9 paragraph dedup matches a naive recompute doc-for-doc") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    // naive: chunk every doc into 16-token runs, count distinct-doc df
    // per chunk, drop df>=2, reassemble in order
    val chunksOf = texts.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(16).map(_.mkString(" ")).toVector
    }
    val df = chunksOf.toSeq.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.size }
    val got = graft.operators.TextOps.paraDedup(spark, sf).collect()
    assert(got.length == texts.size)
    var dropped = 0L
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val cs = chunksOf(id)
      val kept = cs.filter(df(_) < 2)
      assert(r.getAs[Long]("n_chunks") == cs.size, s"doc $id n_chunks")
      assert(r.getAs[Long]("n_dropped") == cs.size - kept.size, s"doc $id n_dropped")
      assert(r.getAs[Long]("clean_n_tokens") ==
        kept.map(_.split(" ", -1).length).sum, s"doc $id clean_n_tokens")
      assert(r.getAs[String]("clean_fp") == md5hex(kept.mkString(" ")),
        s"doc $id reassembly")
      dropped += r.getAs[Long]("n_dropped")
    }
    // non-vacuous: the corpus' duplicated docs share chunks, so the
    // boilerplate filter must actually fire at this SF
    assert(dropped > 0, "no chunk dropped — boilerplate path untested")
  }

  test("e10 top-ngram fractions match a naive mode recompute per doc") {
    val got = TextOps.topNgramShare(spark, sf).collect()
    assert(got.length == texts.size)
    def naive(text: String, n: Int): Double = {
      val toks = text.split(" ", -1)
      if (toks.length < n) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        // max count, then lexicographically-smallest gram — the fold's
        // sorted-order tie-break
        val best = grams.groupBy(identity).view.mapValues(_.size).toSeq
          .sortBy { case (g, c) => (-c, g) }.head
        BigDecimal(best._2.toDouble * best._1.length / text.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      Seq(2, 3, 4).foreach { n =>
        val exp = naive(t, n)
        val g = r.getAs[Double](s"top${n}gram_frac")
        assert(math.abs(g - exp) < 2e-6,
          s"doc ${r.getAs[Long]("doc_id")} n=$n: $g vs $exp")
      }
    }
    // non-vacuous: the corpus' template-heavy docs repeat bigrams
    assert(got.exists(_.getAs[Double]("top2gram_frac") > 0.05))
  }

  test("e11 unigram logprob: score matches naive LM, buckets are exact thirds") {
    val got = TextOps.unigramLogprob(spark, sf).collect()
    assert(got.length == texts.size)
    val all = texts.values.flatMap(_.split(" ", -1)).toSeq
    val freq = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = all.size.toDouble
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      val exp = t.map(w => math.log10(freq(w) / total)).sum / t.length
      assert(math.abs(r.getAs[Double]("avg_logprob") - exp) < 1e-3)
      assert(r.getAs[Long]("n_tokens") == t.length)
    }
    // buckets: sizes differ by at most 1 and ordering respects score
    val sizes = got.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.size)
    assert(sizes.keys.toSet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1)
    val b1min = got.filter(_.getAs[Int]("bucket") == 1)
      .map(_.getAs[Double]("avg_logprob")).min
    val b3max = got.filter(_.getAs[Int]("bucket") == 3)
      .map(_.getAs[Double]("avg_logprob")).max
    assert(b1min >= b3max, "bucket 1 must dominate bucket 3")
  }

  test("e11 co-partitioned vocab path is row-identical to the broadcast path") {
    // the scaladoc's "at a vocabulary too large to broadcast it
    // becomes an ordinary co-partitioned join — nothing else changes"
    // claim, as a tested fact rather than a comment
    val a = TextOps.unigramLogprob(spark, sf).collect().map(_.toString).toSeq
    val b = TextOps.unigramLogprob(spark, sf, broadcastVocab = false)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("e12 Gopher rules match a naive recompute; keep = AND of the rules") {
    val got = TextOps.gopherRules(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val toks = t.split(" ", -1)
      val n = toks.length
      val mw = toks.map(_.length).sum.toDouble / n
      val sym = (t.count(_ == '#') +
        "\\.\\.\\.".r.findAllIn(t).size).toDouble / n
      val af = toks.count(_.exists(_.isLetter)).toDouble / n
      val ns = toks.filter(Set("the", "a", "of", "to", "and")).distinct.length
      assert(math.abs(r.getAs[Double]("mean_word_len") - mw) < 2e-6)
      assert(math.abs(r.getAs[Double]("alpha_word_frac") - af) < 2e-6)
      assert(r.getAs[Long]("n_distinct_stops") == ns.toLong)
      assert(r.getAs[Boolean]("r_len") == (n >= 50 && n <= 100000))
      assert(r.getAs[Boolean]("r_mean_word") == (mw >= 3.0 && mw <= 10.0))
      assert(r.getAs[Boolean]("r_symbol") == (sym < 0.1))
      assert(r.getAs[Boolean]("r_alpha") == (af > 0.8))
      assert(r.getAs[Boolean]("r_stops") == (ns >= 2))
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("r_len") && r.getAs[Boolean]("r_mean_word") &&
         r.getAs[Boolean]("r_symbol") && r.getAs[Boolean]("r_alpha") &&
         r.getAs[Boolean]("r_stops")))
    }
    // non-vacuous in BOTH directions at this SF
    assert(got.exists(_.getAs[Boolean]("keep")), "no doc keeps")
    assert(got.exists(!_.getAs[Boolean]("keep")), "no doc drops")
  }

  test("e13 bigram LM: backoff arm real on held-out docs, join-strategy parity") {
    val rows = TextOps.bigramLogprob(spark, sf).collect()
    assert(rows.nonEmpty)
    val (ref, held) = rows.partition(_.getAs[Long]("doc_id") % 50 == 1)
    // reference docs trained the counts: every one of their bigrams is
    // seen by construction
    assert(ref.nonEmpty && ref.forall(_.getAs[Double]("unseen_rate") == 0.0))
    // the held-out tenth must actually exercise the backoff arm
    assert(held.nonEmpty && held.exists(_.getAs[Double]("unseen_rate") > 0.0))
    // an unseen bigram can only lower the doc's average log-prob, so
    // the held-out mean must sit below the reference mean
    def mean(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(_.getAs[Double]("avg_logprob")).sum / xs.length
    assert(mean(held) < mean(ref))
    // e11's escape hatch: the shuffle-join form is row-identical
    val b = TextOps.bigramLogprob(spark, sf, broadcastVocab = false)
      .collect().toSeq.map(_.toString)
    assert(b == rows.toSeq.map(_.toString))
  }

  test("e14 BPE algorithm: hand-computed merge table and encode truths") {
    import graft.functions.Bpe
    // corpus: 'abab' x2, 'abc' x1 → pair counts ab:5 bc:1 ba:2 →
    // merge1 = (a,b); then 'ab ab'x2 'ab c' → (ab,ab):2 beats (ab,c):1
    // → merge2 = (ab,ab); nothing left repeating (ab,c appears once)
    val merges = Bpe.train(Seq("abab abab abc"), nMerges = 10)
    assert(merges == Vector(("a", "b"), ("ab", "ab")))
    val rank = merges.zipWithIndex.toMap
    assert(Bpe.encode("abab", rank) == Vector("abab"))
    assert(Bpe.encode("abc", rank) == Vector("ab", "c"))
    assert(Bpe.encode("zzz", rank) == Vector("z", "z", "z"),
      "byte fallback must keep unseen input total")
    assert(Bpe.tokenCount("abab abc zz", rank) == 1 + 2 + 2)
    // determinism tie-break: equal counts pick the lexicographically
    // smallest pair — 'ba' and 'ab' both occur twice in 'abab'... use
    // a clean tie: 'xy xy zw zw' → (x,y):2 ties (z,w):2 → (x,y) first
    val tie = Bpe.train(Seq("xy xy zw zw"), nMerges = 1)
    assert(tie == Vector(("x", "y")))
  }

  test("e14 BPE token stats equal a doc-by-doc JVM re-encode (the rows-only query's hash-strength check)") {
    import graft.functions.Bpe
    val got = TextOps.bpeTokenStats(spark, sf).collect()
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // replicate the training-sample selection rule (md5-rank top-64)
    val sample = texts.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(64).map(_._2).toSeq
    val rank = Bpe.train(sample, 192).zipWithIndex.toMap
    assert(got.length == texts.length)
    val byId = texts.toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = byId(id)
      val ws = text.split(" ", -1).length.toLong
      val bpe = Bpe.tokenCount(text, rank).toLong
      assert(r.getAs[Long]("n_ws_tokens") == ws, s"doc $id ws")
      assert(r.getAs[Long]("n_bpe_tokens") == bpe, s"doc $id bpe")
      assert(r.getAs[Double]("bpe_per_ws") ==
        BigDecimal(bpe.toDouble / ws.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id ratio")
    }
    // subword compression is real: merges must make BPE counts land
    // strictly under the per-byte ceiling for typical docs
    val anyCompressed = got.exists { r =>
      r.getAs[Long]("n_bpe_tokens") <
        byId(r.getAs[Long]("doc_id")).getBytes("UTF-8").length }
    assert(anyCompressed, "no doc compressed below byte count — merges dead")
  }

  test("e14 oracle builder emits the recursive-CTE replay for the ASCII corpus") {
    // the corpus is ASCII and trains >0 merges, so the dir-aware
    // builder must yield SQL (rows-only fallback would silently
    // downgrade the driver gate); the merge literals must be present
    val sql = TextOps.bpeOracleSql(spark, sf)
    assert(sql.isDefined, "bpeOracleSql returned None on the test corpus")
    assert(sql.get.contains("WITH RECURSIVE"))
    assert(sql.get.contains("VALUES ('"), "no interpolated merge literals")
    // and the enriched map Verify dumps carries it under e14's name
    val m = SparkEntry.oracleSqlFor(spark, sf)
    assert(m.get("e14_bpe_token_stats").contains(sql.get))
  }

  test("e15 word entropy: hand-computed truths and a doc-by-doc JVM recompute") {
    // hand-computed: "a a b" → counts over sorted uniq [a,b] = [2,1],
    // H = -(2/3·log2(2/3) + 1/3·log2(1/3)) ≈ 0.918296; uniform "a b c"
    // → H = log2 3, norm exactly 1; constant "x x x" → H = 0, norm 0.
    val docs = Seq(0L -> "a a b", 1L -> "a b c", 2L -> "x x x")
    val dir = java.nio.file.Files.createTempDirectory("graft-ent").toString
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextOps.wordEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-6
    assert(got(0L).getAs[Long]("n_tokens") == 3L)
    assert(got(0L).getAs[Long]("n_distinct") == 2L)
    assert(approx(got(0L).getAs[Double]("entropy"), 0.918296))
    assert(approx(got(0L).getAs[Double]("top_share"), 0.666667))
    assert(approx(got(1L).getAs[Double]("entropy"), math.log(3) / math.log(2)))
    assert(got(1L).getAs[Double]("norm_entropy") == 1.0)
    assert(got(2L).getAs[Double]("entropy") == 0.0)
    assert(got(2L).getAs[Double]("norm_entropy") == 0.0)
    assert(got(2L).getAs[Double]("top_share") == 1.0)
    // real corpus: full-definition recompute doc by doc, plus the
    // norm_entropy ∈ [0, 1] invariant
    val real = TextOps.wordEntropy(spark, sf).collect()
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    real.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val n = toks.length.toDouble
      val counts = toks.distinct.sorted.map(w => toks.count(_ == w).toDouble)
      val ent = -counts.foldLeft(0.0)((acc, c) =>
        acc + (c / n) * (math.log(c / n) / math.log(2.0)))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_distinct") == counts.length.toLong)
      assert(approx(r.getAs[Double]("entropy"), ent))
      assert(approx(r.getAs[Double]("top_share"), counts.max / n))
      val ne = r.getAs[Double]("norm_entropy")
      assert(ne >= 0.0 && ne <= 1.0 + 1e-9, s"norm_entropy $ne out of range")
    }
  }

  test("e17b landed model: scoring-only probe identical to one-shot e17") {
    import graft.sources.Warehouse
    Warehouse.buildNbModel(spark, sf)
    val fromIndex = graft.operators.TextOps.qualityClassifierIndexed(spark, sf)
      .collect().toSeq.map(_.toString)
    val oneShot = graft.operators.TextOps.qualityClassifier(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(fromIndex == oneShot && fromIndex.nonEmpty)
    // freshness gate: matching params reuse the landed model, a
    // different reference slice forces a retrain
    def weightFiles(): Set[String] = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(wh,
        graft.sources.Warehouse.tbl(sf, "graft_nb_weights")))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    val built = weightFiles()
    Warehouse.ensureNbModel(spark, sf)
    assert(weightFiles() == built, "matching-params ensureNbModel retrained")
    Warehouse.ensureNbModel(spark, sf, refSource = "src1")
    assert(weightFiles() != built, "changed-ref ensureNbModel did not retrain")
    Warehouse.buildNbModel(spark, sf) // restore the default model
  }
}
