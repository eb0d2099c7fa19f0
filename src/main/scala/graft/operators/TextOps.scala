package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Bpe, MaxRun, TextFns}
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (SURVEY.md §2.E)
  * — the LLM-training-pipeline layer the north star adds on top of the
  * reference's query surface: token accounting, quality scoring,
  * language heuristics and content fingerprinting.
  *
  * Everything is per-row native expression work (whole-stage codegen,
  * no UDFs, no shuffle except the final aggregates), so throughput
  * scales linearly with executors at 100 TB — the scan is the cost.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** e1: per-language token accounting — whitespace tokens and
    * BPE-ish alnum-run tokens per doc, aggregated per lang.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"),
              size(TextFns.tokens(col("text"))).as("ws"),
              size(TextFns.reTokens(col("text"))).as("re"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws")).as("total_tokens"),
           round(avg(col("ws")), 4).as("avg_tokens"),
           sum(col("re")).as("total_re_tokens"))
      .orderBy(col("lang"))

  /** e2's component expressions over `text` — shared by the batch
    * operator below and the streaming ingest (CorpusStream), so both
    * paths compute the identical formula by construction.
    */
  private[graft] object Quality {
    val toks: Column = TextFns.tokens(col("text"))
    private val nTok = size(toks).cast("double")
    private val nStop =
      size(filter(toks, t => t.isin("the", "a", "of", "to", "and"))).cast("double")
    private val nPunct =
      length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
    val ttr: Column = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio: Column = nStop / nTok
    val punctRatio: Column = nPunct / length(col("text")).cast("double")
    val score: Column =
      lit(0.25) * least(nTok / 100.0, lit(1.0)) +
      lit(0.25) * (lit(1.0) - stopRatio) +
      lit(0.25) * (lit(1.0) - punctRatio) +
      lit(0.25) * ttr
  }

  /** e2: per-doc quality score from length / stopword ratio / punct
    * ratio / type-token ratio — the usual pretraining-corpus filters.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(Quality.toks).cast("long").as("n_tokens"),
      round(Quality.stopRatio, 6).as("stopword_ratio"),
      round(Quality.punctRatio, 6).as("punct_ratio"),
      round(Quality.ttr, 6).as("type_token_ratio"),
      round(Quality.score, 4).as("quality"))
      .orderBy(col("doc_id"))

  /** e3's training/profile constants — interpolated into the DuckDB
    * oracle (the c9/c2 no-drift pattern): per-lang training sample
    * size (md5-rank prefix of each lang's docs) and the rank-profile
    * length K (both the per-lang profile and the per-doc profile keep
    * their K most frequent grams; an out-of-profile gram costs K).
    */
  val LangTrainPerLang: Int = 32
  val LangProfileK: Int = 64

  /** Char n-grams (n = 1..3) of a text column as one array — the
    * Cavnar–Trenkle feature space, spaces included (the publication
    * pads word boundaries; raw-text windows keep the DuckDB replay a
    * plain substr loop). The codegen'd [[graft.functions.CharGrams]]
    * kernel: the composable substr-transform chain is interpreted and
    * was 60% of e3's cost.
    */
  private def charGrams(text: Column): Column =
    TextFns.charGrams(text, 1, 3)

  /** e3: language-ID via the public char-n-gram rank-profile method
    * (Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization").
    * TRAINING is deterministic relational algebra — each lang's
    * profile is the top-[[LangProfileK]] char 1–3-grams by (count
    * DESC, gram) over that lang's [[LangTrainPerLang]] md5-rank
    * sample docs — so the DuckDB oracle replays the training itself
    * (stronger than literal interpolation: zero drift by
    * construction). SCORING: each doc's top-K gram ranks compare to
    * each lang profile by the out-of-place measure Σ |doc_rank −
    * profile_rank| (an absent gram costs K); guessed lang = argmin
    * (distance, lang). All-integer distances — no float compare
    * hazards between engines.
    *
    * Scale shape: profiles are nLang·K rows (broadcast); the doc side
    * is two linear shuffles (count by (doc, gram), rank by doc) and a
    * broadcast join — no corpus-size pair term. On this synthetic
    * corpus every lang shares one vocabulary, so separability is
    * noise-bound (disclosed); the mechanism's discriminative power is
    * proven on a planted multilingual corpus in TextOpsSpec.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val byLangRank = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val sample = d
      .withColumn("trn", row_number().over(byLangRank))
      .filter(col("trn") <= LangTrainPerLang)
      .select(col("lang"), col("text"))
    val byLangCnt = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("g"))
    // ≤ nLang·K rows, but the lineage is a sampled-corpus gram explode
    // + count + rank — and it has TWO consumers below (the distinct
    // lang list and the broadcast profile join), which re-ran the
    // whole training pass twice. Materialize once (the fuzzyDedup
    // localCheckpoint pattern; guide §1.2).
    val profiles = sample
      .select(col("lang"), explode(charGrams(col("text"))).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("prnk", row_number().over(byLangCnt))
      .filter(col("prnk") <= LangProfileK)
      .select(col("lang").as("plang"), col("g"), col("prnk"))
      .localCheckpoint(false)
    // per-doc profiles via the per-ROW CharGramRanks kernel: counting,
    // (count DESC, gram) ranking and the top-K cut happen inside each
    // row, so the doc side never explodes ~900 gram rows per doc
    // through a (doc, gram) aggregation + rank window (that relational
    // form — which the oracle still replays — moved 4.4M rows through
    // three exchanges and was 80% of e3's cost at sf0.1)
    val docTop = d
      .select(col("doc_id"),
              posexplode(TextFns.charGramRanks(col("text"), 1, 3,
                                               LangProfileK))
                .as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("drnk"), col("g"))
    val byDocDist = Window.partitionBy(col("doc_id"))
      .orderBy(col("dist"), col("plang"))
    val langs = profiles.select(col("plang")).distinct()
    val scored = docTop
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("plang", "g"), "left")
      .groupBy(col("doc_id"), col("plang"))
      .agg(sum(coalesce(abs(col("drnk") - col("prnk")),
                        lit(LangProfileK.toLong))).as("dist"))
      .withColumn("gr", row_number().over(byDocDist))
      .filter(col("gr") === 1)
      .select(col("doc_id"), col("plang").as("guessed_lang"),
              col("dist").as("profile_dist"))
    d.select(col("doc_id"), col("lang").as("labeled_lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("labeled_lang"), col("guessed_lang"),
              col("profile_dist"))
      .orderBy(col("doc_id"))
  }

  /** e5: rolling-hash fingerprint — an order-sensitive polynomial hash
    * folded left-to-right over the token stream (Rabin–Karp style):
    * h = (h·B + v(token)) mod M. Unlike the order-insensitive md5-set
    * forms, a token swap changes this fingerprint, and the fold is
    * incremental — a streaming ingester can extend it token by token.
    * 31-bit modulus keeps h·B + v below 2^52 (ANSI-safe).
    */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val vals = transform(toks, t =>
      (ascii(t) * 256 + length(t)).cast("long"))
    val rolled = aggregate(vals, lit(0L),
      (acc, v) => pmod(acc * 1000003L + v, lit(2147483647L)))
    docs(spark, dir).select(
      col("doc_id"),
      rolled.as("rolling_fp"),
      size(toks).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** e6: corpus-level n-gram frequency — the global phrase table
    * (boilerplate detection, template mining, corpus statistics all
    * start here). Explode each doc's n-gram windows, count, keep the
    * global top-N with a deterministic (count desc, ngram) tiebreak.
    *
    * 100 TB shape: the count is a map-side-combined aggregate over the
    * exploded shingles (hot phrases partially collapse before the
    * shuffle) and the top-N is a TakeOrdered — per-partition top-N,
    * only N rows per partition travel; the full frequency table never
    * materializes on one node.
    */
  def ngramFreq(spark: SparkSession, dir: String,
                n: Int = 2, topN: Int = 50): DataFrame =
    // Token array materialized as its OWN projection before the shingle
    // transform: shingles() references `toks` once per window, and with
    // split() inlined there the doc would re-split once per window —
    // O(tokens²) chars per doc. CollapseProject keeps the stage split
    // because the alias is non-cheap and multiply-referenced.
    docs(spark, dir)
      .select(TextFns.tokens(col("text")).as("toks"))
      .select(explode(TextFns.shingles(col("toks"), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(topN)

  /** e7: per-doc repeated-n-gram ratio — the Gopher-style repetition
    * quality signal (a doc whose 3-grams are mostly repeats is
    * boilerplate/spam; pretraining filters cut on exactly this ratio).
    * Pure per-row expression work: the windows, the distinct count and
    * the ratio all evaluate inside the scan — no explode, no shuffle,
    * no state. Composes with e2's quality gate as another conjunct.
    */
  def dupNgramRatio(spark: SparkSession, dir: String,
                    n: Int = 3): DataFrame = {
    // Three deliberate projection stages (CollapseProject keeps them
    // apart — each alias is non-cheap and referenced more than once):
    //   1. tokens  — split once per doc, NOT once per window (split
    //      inlined into the shingle lambda re-splits per window:
    //      O(tokens²) chars per doc — measured 8 s for 5k docs);
    //   2. shingle hashes — xxhash64 each window to BIGINT so the
    //      distinct below runs the primitive fast path instead of
    //      O(n²) string comparisons (distinct count is unchanged:
    //      64-bit collisions within a ~1k-window doc are negligible,
    //      and the oracle's string-side distinct agrees);
    //   3. the sizes/ratio — all refs to `hs` are cheap attributes.
    val nG = size(col("hs"))
    val nD = size(array_distinct(col("hs")))
    docs(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
              transform(TextFns.shingles(col("toks"), n),
                        s => xxhash64(s)).as("hs"))
      .select(
        col("doc_id"),
        nG.cast("long").as("n_ngrams"),
        nD.cast("long").as("n_distinct"),
        round(when(nG === 0, 0.0)
                .otherwise(lit(1.0) - nD.cast("double") / nG.cast("double")),
              6).as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The PII patterns — deliberately in the Java∩RE2 common regex
    * subset so Spark and the DuckDB oracle match identically.
    */
  val EmailRe = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
  val PhoneRe = "555-[0-9]{3}-[0-9]{4}"

  /** The generic PII scrub: per-doc detection counts + redacted
    * fingerprint over ANY (doc_id, <textCol>) frame — this is the form
    * a user points at a real corpus. Pure codegen'd per-row work:
    * `regexp_extract_all` counts + chained `regexp_replace` redaction
    * evaluate inside the scan; no shuffle but the caller's sort.
    */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
                         PhoneRe, "[PHONE]")).as("redacted_fp"))

  /** e8: the scrub over the test corpus — which contains no natural
    * PII (no digits, no '@'), so the driver query plants it first: a
    * deterministically AUGMENTED copy of the text gains an email for
    * every doc_id ≡ 0 (mod 7) and a phone for every doc_id ≡ 0
    * (mod 11), both derived from doc_id — non-vacuous detection AND
    * exactly reproducible in the DuckDB oracle. A real deployment
    * calls `scrub` directly.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(
      col("text"),
      when(pmod(col("doc_id"), lit(7)) === 0,
           concat(lit(" contact u"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0,
           concat(lit(" call 555-123-"),
                  lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    scrub(docs(spark, dir).select(col("doc_id"), aug.as("t")), "t")
      .orderBy(col("doc_id"))
  }

  /** e4: content fingerprint — md5 of the exact text plus a
    * whitespace-normalized md5 (near-identical whitespace variants
    * collapse to the same normalized fingerprint).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(col("text")).as("fp"),
      md5(concat_ws(" ", TextFns.tokens(col("text")))).as("fp_norm"),
      length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy(col("doc_id"))

  /** e9: paragraph-level boilerplate removal (the CCNet/RefinedWeb
    * cleaning step that runs BEFORE document-level dedup): split each
    * doc into paragraphs, drop every paragraph whose fingerprint
    * appears in ≥ `minDf` distinct documents (shared headers, nav
    * bars, license blurbs), and reassemble the survivors in order.
    * The corpus has no newline structure, so a "paragraph" here is a
    * non-overlapping `chunkTokens`-token run — the unit is a
    * parameter; real corpora would split on \n\n instead and nothing
    * else changes.
    *
    * 100 TB shape: chunking is per-row expression work inside the
    * scan; the df count and the join back are both keyed on the chunk
    * fingerprint (co-partitioned shuffle pair, no broadcast of a
    * corpus-sized side anywhere); reassembly is one groupBy(doc_id)
    * whose collect_list is bounded by the doc's own chunk count. The
    * boilerplate table is NEVER materialized to the driver.
    *
    * Output per doc: chunk totals, drops, surviving token count and
    * the md5 of the reassembled text (the full cleaned text flows at
    * scale; the fingerprint keeps the verify artifact small while
    * still hash-pinning exact reassembly).
    */
  def paraDedup(spark: SparkSession, dir: String, chunkTokens: Int = 16,
                minDf: Int = 2): DataFrame = {
    val t = docs(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val nChunks = ceil(size(col("toks")).cast("double") / chunkTokens)
      .cast("int")
    val chunks = t.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        j => array_join(slice(col("toks"), j * chunkTokens + 1,
                              lit(chunkTokens)), " "))))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"),
              md5(col("col")).as("cfp"))
    // document frequency per chunk fingerprint — distinct docs, so a
    // chunk repeated WITHIN one doc is not self-boilerplate
    val df = chunks.groupBy(col("cfp"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = col("df") < minDf
    chunks.join(df, "cfp")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(!kept, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(kept, size(split(col("chunk"), " ")).cast("long"))
          .otherwise(0L)).as("clean_n_tokens"),
        // collect_list skips the nulls `when` leaves for dropped
        // chunks; sort by pos restores document order
        md5(array_join(transform(
          array_sort(collect_list(when(kept,
            struct(col("pos"), col("chunk"))))),
          s => s.getField("chunk")), " ")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  /** e10: Gopher-style top-n-gram repetition fractions (Rae et al.
    * 2021 §A1.1: "fraction of characters in the most common n-gram",
    * n = 2, 3, 4 — a pretraining quality filter cuts docs where any
    * of these exceeds its threshold). Complements e7, which measures
    * DISTINCTNESS of all windows; this measures the mass of the
    * single heaviest one.
    *
    * 100 TB shape: zero shuffles — per-row expression work only. The
    * per-doc mode-of-array is `MaxRun`, a codegen'd expression that
    * sorts the n-gram windows and scans adjacent runs in one tight
    * loop (the longest run of equal sorted elements IS the mode, and
    * sorted order makes the tie-break deterministic —
    * lexicographically smallest gram wins). No explode, no
    * groupBy(doc, gram) — the 3×windows intermediate a naive plan
    * shuffles never exists. First shipped as an `aggregate()`
    * sorted-run fold; higher-order lambdas are interpreted per element
    * with a struct allocation per step, and those three folds were the
    * entire cost of the query (~2.8 s → native at sf0.1).
    */
  def topNgramShare(spark: SparkSession, dir: String): DataFrame = {
    def folded(n: Int): Column =
      MaxRun(TextFns.shingles(col("toks"), n))
    def share(n: Int): Column = {
      val best = col(s"f$n").getField("best")
      val bg = col(s"f$n").getField("gram")
      round(when(best === 0, 0.0)
              .otherwise(best.cast("double") * length(bg) /
                         length(col("text"))), 6).as(s"top${n}gram_frac")
    }
    // Three projection stages (e7's lesson — CollapseProject keeps
    // them apart because each alias is non-cheap and multiply
    // referenced): tokens once per doc; each sort+scan ONCE per doc
    // (the share() extraction reads two fields of `f$n` — inlining
    // MaxRun there would evaluate it twice per n); then the cheap
    // field reads.
    docs(spark, dir)
      .select(col("doc_id"), col("text"),
              TextFns.tokens(col("text")).as("toks"))
      .select(Seq(col("doc_id"), col("text")) ++
              (2 to 4).map(n => folded(n).as(s"f$n")): _*)
      .select(col("doc_id") +: (2 to 4).map(share): _*)
      .orderBy(col("doc_id"))
  }

  /** e11: corpus-unigram log-probability scoring — the CCNet-style
    * language-model quality proxy (Wenzek et al. 2020: score each doc
    * by model perplexity, bucket into head/middle/tail thirds; a
    * corpus-unigram model is the degenerate-but-shuffle-honest form).
    * score = avg over the doc's tokens of log10 p(tok), with
    * p = corpus frequency.
    *
    * 100 TB shape: the unigram table is VOCAB-sized (≪ corpus) — one
    * partial-aggregable count pass, then the per-token lookup is a
    * broadcast hash join (at a vocabulary too large to broadcast it
    * becomes an ordinary co-partitioned join on the token; nothing
    * else changes). The total-token scalar rides the same broadcast
    * (1-row cross join). Buckets rank on the ROUNDED score + doc_id
    * so the cut is reproducible across engines and partitionings.
    */
  def unigramLogprob(spark: SparkSession, dir: String,
                     broadcastVocab: Boolean = true): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("total"))
    // `broadcastVocab=false` is the too-big-to-broadcast escape hatch:
    // an ordinary shuffle join on the token — same rows, same scores
    // (parity-checked in TextOpsSpec), only the join
    // strategy changes
    val scored = toks
      .join(if (broadcastVocab) broadcast(uni) else uni, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(log10(col("c").cast("double") / col("total"))), 4)
             .as("avg_logprob"))
    // Global rank WITHOUT a single-partition sort (p6/p8's block
    // prefix-sum pattern): per-score counts first (partial-aggregable,
    // distinct-score cardinality ≪ corpus), the running offset over
    // that TINY table (its unpartitioned window is over distinct
    // scores only), then rank = offset + row_number within the score
    // (partitioned window). Bucket = the standard ntile(3) assignment
    // computed arithmetically from (rank, N): the first N%3 buckets
    // take one extra row — identical to the oracle's ntile.
    val offs = scored.groupBy(col("avg_logprob"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        sum(col("cnt")).over(
          Window.orderBy(col("avg_logprob").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("cnt"))
      .select(col("avg_logprob"), col("off"))
    val ranked = scored
      .join(broadcast(offs), "avg_logprob")
      .withColumn("rank",
        col("off") + row_number().over(
          Window.partitionBy(col("avg_logprob")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n_docs"))))
    // `div` = exact integral division (the round-6 ADVICE rule: a
    // double `/` + cast can flip the truncated integer at scale)
    ranked
      .withColumn("q", expr("n_docs div 3"))
      .withColumn("r", col("n_docs") % 3)
      .withColumn("bucket",
        when(col("rank") <= (col("q") + 1) * col("r"),
             expr("(rank - 1) div (q + 1) + 1"))
          // greatest(q,1): when n_docs < 3, q = 0 and every rank takes
          // the `when` branch — the guard only keeps the unevaluated
          // divisor legal under ANSI
          .otherwise(expr("r + (rank - r * (q + 1) - 1) div greatest(q, 1) + 1"))
          .cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("avg_logprob"),
              col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** e13: bigram log-probability scoring — the CCNet-style LM quality
    * filter (Wenzek et al. 2020: score new data under an LM trained on
    * a reference corpus; low perplexity ⇒ clean): a bigram model with
    * stupid backoff is TRAINED on a SMALL reference slice (doc_id %
    * 50 == 1, ~2% — CCNet's actual shape: a small curated reference
    * scores a large crawl; and on this ~30-token-vocabulary synthetic
    * corpus a large reference would see every possible bigram and
    * make the backoff arm vacuous — the c5 lesson) and applied to
    * every document.
    *
    *   P(w_i | w_{i-1}) = c_b(w_{i-1} w_i) / c_u(w_{i-1})   if seen
    *                    = 0.4 · (c_u(w_i) + 1) / (T + V + 1) otherwise
    *
    * (add-one-smoothed unigram with one OOV pseudo-entry as the
    * backoff base; T = reference token count, V = reference vocab).
    * Output per doc (≥ 2 tokens): bigram count, avg log10 P, and the
    * unseen-bigram rate — the two columns a corpus review reads.
    *
    * 100 TB shape: counts are two partial-aggregable groupBys over
    * the reference slice; scoring is broadcast joins on token keys
    * (`broadcastVocab=false` = e11's too-big-to-broadcast escape
    * hatch, an ordinary shuffle join, parity-tested) + a 1-row (T, V)
    * broadcast; the per-doc fold is one aggregate. The bigram pairs
    * come from a zip_with over the token array — no self-join on
    * position.
    */
  def bigramLogprob(spark: SparkSession, dir: String,
                    broadcastVocab: Boolean = true): DataFrame = {
    val alpha = 0.4
    val base = docs(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    val ref = base.filter(pmod(col("doc_id"), lit(50)) === 1)
    val uni = ref.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val tv = uni.agg(sum(col("cu")).as("t"), count(lit(1)).as("v"))
    val bi = ref.select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (p, c) => concat_ws(" ", p, c))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    def side(df: DataFrame) = if (broadcastVocab) broadcast(df) else df
    base
      .select(col("doc_id"), explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (p, c) => struct(p.as("prev"), c.as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"),
              concat_ws(" ", col("p.prev"), col("p.cur")).as("bg"))
      .join(side(bi), Seq("bg"), "left")
      .join(side(uni.select(col("tok").as("prev"), col("cu").as("cu_prev"))),
            Seq("prev"), "left")
      .join(side(uni.select(col("tok").as("cur"), col("cu").as("cu_cur"))),
            Seq("cur"), "left")
      .crossJoin(broadcast(tv))
      .select(col("doc_id"),
        when(col("cb").isNotNull, log10(col("cb") / col("cu_prev")))
          .otherwise(log10(lit(alpha) *
            (coalesce(col("cu_cur"), lit(0L)) + 1).cast("double") /
            (col("t") + col("v") + 1))).as("lp"),
        col("cb").isNull.cast("int").as("oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(col("lp")), 4).as("avg_logprob"),
           round(sum(col("oov")).cast("double") / count(lit(1)), 6)
             .as("unseen_rate"))
      .orderBy(col("doc_id"))
  }

  /** e12: the Gopher RULE set (Rae et al. 2021 §A1.1) — the
    * hard-threshold word-level filters, reported as per-rule booleans
    * plus the combined keep flag. e2 scores quality on a continuous
    * scale; this is the form the paper (and most production cleanups)
    * actually apply: a doc is dropped the moment any rule trips, and
    * the per-rule columns say WHICH rule, which is what gets reviewed
    * when a filter change shifts corpus volume.
    *
    * Rules (word-level subset — the corpus is single-line, so the
    * line-shape rules are vacuous here): 50 ≤ tokens ≤ 100 000; mean
    * word length in [3, 10]; symbol-to-word ratio (# and …) < 0.1;
    * > 80 % of words contain an alphabetic character; ≥ 2 distinct
    * stop words present.
    *
    * 100 TB shape: pure per-row expression work, no shuffle at all
    * (even the final sort is the driver-contract orderBy). Mean word
    * length needs no fold: single-space text makes it
    * (chars − spaces) / words = (length − n + 1) / n exactly.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val n = size(toks).cast("double")
    val meanWord = (length(col("text")).cast("double") - n + 1.0) / n
    val nSymbols =
      (length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
        size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))
    val symbolRatio = nSymbols.cast("double") / n
    val alphaFrac =
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / n
    val nStops = size(array_distinct(
      filter(toks, t => t.isin("the", "a", "of", "to", "and"))))
    docs(spark, dir)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
              round(meanWord, 6).as("mean_word_len"),
              round(symbolRatio, 6).as("symbol_ratio"),
              round(alphaFrac, 6).as("alpha_word_frac"),
              nStops.cast("long").as("n_distinct_stops"),
              (size(toks) >= 50 && size(toks) <= 100000).as("r_len"),
              (meanWord >= 3.0 && meanWord <= 10.0).as("r_mean_word"),
              (symbolRatio < 0.1).as("r_symbol"),
              (alphaFrac > 0.8).as("r_alpha"),
              (nStops >= 2).as("r_stops"))
      .withColumn("keep",
        col("r_len") && col("r_mean_word") && col("r_symbol") &&
          col("r_alpha") && col("r_stops"))
      .orderBy(col("doc_id"))
  }

  /** e14: token accounting under a LEARNED subword vocabulary — the
    * public byte-level BPE algorithm (Bpe.scala) mounted on the
    * tokenizer seam the rest of the e/c families stub with whitespace
    * tokens; the biggest realism gap between this engine's token
    * counts and a real pretraining pipeline's, now measured instead
    * of ignored.
    *
    * Train side: merges learned from the md5-rank top-`sampleDocs`
    * documents — a BOUNDED driver-side build (≤ 64 docs at ANY SF,
    * the same documented build-once pattern as the PQ codebook
    * training in SimOps); the learned table is ≤ `nMerges` entries
    * and ships to executors inside the UDF closure.
    *
    * Encode side: a scalar Scala UDF — the ONE e-family kernel that
    * is JVM code rather than a codegen'd expression, disclosed and
    * deliberate: BPE's iterate-until-no-merge-applies loop over a
    * learned table has no built-in equivalent, and this signature
    * (TextFns.bpeTokenCount) is exactly where a production pipeline
    * mounts its real tokenizer. Per-row work is O(bytes · merges
    * applied); no shuffle — scan-bound like the rest of the family.
    *
    * Oracle (hash-green since round 12): the ENCODE replays in DuckDB
    * as a recursive CTE over the distinct-word set — each step merges
    * all occurrences of the lowest-rank adjacent pair (bpeOracleSql),
    * with the trained merge table interpolated as literals (the
    * data-derived-constants convention; training itself is the
    * bounded 64-doc build whose determinism TextOpsSpec pins with
    * hand-computed merge tables, and the e3 precedent of re-deriving
    * it relationally doesn't apply — BPE training is iterative-global
    * argmax, not relational algebra). The full-definition naive
    * recompute — a doc-by-doc JVM re-encode — also lives in
    * TextOpsSpec.
    */
  /** e14's knob defaults, shared by the query and its oracle builder
    * so the two can never train at different parameters.
    */
  private def bpeMergesDefault: Int = sys.env.get("SPARK_GRAFT_BPE_MERGES")
    .flatMap(s => scala.util.Try(s.toInt).toOption)
    .filter(_ >= 0).getOrElse(192)
  private def bpeSampleDefault: Int = sys.env.get("SPARK_GRAFT_BPE_SAMPLE")
    .flatMap(s => scala.util.Try(s.toInt).toOption)
    .filter(_ >= 1).getOrElse(64)

  /** The bounded driver-side merge training shared by e14 and its
    * oracle: md5-rank top-`sampleDocs` documents → Bpe.train. ≤ 64
    * docs at ANY SF (the PQ-codebook build-once pattern).
    */
  private def bpeMerges(spark: SparkSession, dir: String, nMerges: Int,
                        sampleDocs: Int): Vector[Bpe.Pair] = {
    val sample = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
              md5(col("doc_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("doc_id")).limit(sampleDocs)
      .select(col("text")).collect().map(_.getString(0)).toSeq
    Bpe.train(sample, nMerges)
  }

  def bpeTokenStats(spark: SparkSession, dir: String,
                    nMerges: Int = bpeMergesDefault,
                    sampleDocs: Int = bpeSampleDefault): DataFrame = {
    val rank = bpeMerges(spark, dir, nMerges, sampleDocs).zipWithIndex.toMap
    // The encode is WORD-independent, so it runs once per DISTINCT
    // word and joins back by word — the oracle's own docw ⋈ done
    // shape. The first cut ran the UDF per DOCUMENT (every word
    // occurrence re-encoded): 545 s at the ×1000 slice, ~40× more
    // kernel work than the vocabulary demands. Word-distinct, the UDF
    // runs |vocab| times (the synthetic vocab ≈ 31·SF words), the
    // encoded table broadcasts, and the query is scan-bound: explode →
    // broadcast-join → per-doc partial-agg sum. At web scale the vocab
    // is millions of rows — still a broadcast-or-bucketed dim versus
    // re-encoding every occurrence.
    val nBpeWord = udf((w: String) => Bpe.encode(w, rank).length)
    val words = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .distinct()
    val enc = words.select(col("word"), nBpeWord(col("word")).as("ntok"))
    val agg = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("ntok")).cast("long").as("n_bpe_tokens"))
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
              size(TextFns.tokens(col("text"))).cast("long")
                .as("n_ws_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ws_tokens"),
              coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .withColumn("bpe_per_ws",
        round(col("n_bpe_tokens").cast("double") /
              col("n_ws_tokens").cast("double"), 4))
      .orderBy(col("doc_id"))
  }

  /** e14's DuckDB oracle, built per data directory (the merge table is
    * data-derived, so the SQL interpolates it as literals — Verify
    * dumps this through SparkEntry.oracleSqlFor). The ENCODE is fully
    * replayed: a recursive CTE iterates each distinct word, every step
    * merging ALL occurrences (left-to-right, the fold below) of the
    * lowest-rank adjacent pair present, until none applies — exactly
    * Bpe.encode; per-doc totals then join back over the word stream.
    *
    * Byte-vs-char seam: Bpe symbols are UTF-8 BYTES, the SQL's are
    * characters — identical only on ASCII corpora, so the builder
    * scans for any char ≥ 0x80 and returns None (rows-only fallback,
    * the pre-round-12 behavior) rather than dump an unsound oracle.
    * None likewise when training yields zero merges (degenerate
    * corpus) — a VALUES list needs at least one row.
    */
  private[graft] def bpeOracleSql(spark: SparkSession, dir: String,
                                  nMerges: Int = bpeMergesDefault,
                                  sampleDocs: Int = bpeSampleDefault)
      : Option[String] = {
    val nonAscii = docs(spark, dir)
      .filter(col("text").isNotNull && col("text").rlike("[^\\x00-\\x7F]"))
      .limit(1).count() > 0
    if (nonAscii) return None
    val merges = bpeMerges(spark, dir, nMerges, sampleDocs)
    if (merges.isEmpty) return None
    def lit(s: String): String = "'" + s.replace("'", "''") + "'"
    val vals = merges.zipWithIndex
      .map { case ((a, b), r) => s"(${lit(a)}, ${lit(b)}, $r)" }
      .mkString(", ")
    Some(s"""WITH RECURSIVE
      mg(ma, mb, r) AS (VALUES $vals),
      mgl AS (SELECT list(struct_pack(a := ma, b := mb, r := r)
                          ORDER BY r) AS ml FROM mg),
      wd AS (SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                                w -> w <> '')) AS word
             FROM documents WHERE text IS NOT NULL),
      enc AS (
        SELECT word, list_transform(generate_series(1, length(word)),
                                    i -> substr(word, i, 1)) AS syms
        FROM wd
        UNION ALL
        SELECT word,
          list_reduce(
            list_prepend(CAST([] AS VARCHAR[]),
                         list_transform(syms, s -> [s])),
            (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = ml[br + 1].a
                                  AND x[1] = ml[br + 1].b
                        THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                         ml[br + 1].a || ml[br + 1].b)
                        ELSE list_append(acc, x[1]) END) AS syms
        FROM (SELECT word, syms, ml,
                list_min(list_transform(generate_series(1, len(syms) - 1),
                  i -> list_min(list_transform(ml,
                    m -> CASE WHEN m.a = syms[i] AND m.b = syms[i + 1]
                              THEN m.r END)))) AS br
              FROM enc, mgl) s
        WHERE br IS NOT NULL),
      done AS (
        SELECT word, len(syms) AS ntok
        FROM (SELECT word, syms,
                list_min(list_transform(generate_series(1, len(syms) - 1),
                  i -> list_min(list_transform(ml,
                    m -> CASE WHEN m.a = syms[i] AND m.b = syms[i + 1]
                              THEN m.r END)))) AS br
              FROM enc, mgl) s
        WHERE br IS NULL),
      docw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                                 w -> w <> '')) AS word
               FROM documents WHERE text IS NOT NULL),
      agg AS (SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens
              FROM docw JOIN done USING (word) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_ws_tokens,
        coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
        round(coalesce(agg.n_bpe_tokens, 0)::DOUBLE
              / len(string_split(d.text, ' '))::DOUBLE, 4) AS bpe_per_ws
      FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
      WHERE d.text IS NOT NULL
      ORDER BY d.doc_id""")
  }

  /** e14b: the DuckDB-replayable half of e14's accounting, registered
    * so the driver hash-gates what it CAN about the tokenizer seam
    * (round-10 verdict item): the same doc set and whitespace counts
    * as e14, plus the byte length — the byte-level BPE's PRE-merge
    * token count and a hard upper bound on `n_bpe_tokens` (every merge
    * strictly shrinks the sequence; TextOpsSpec pins the inequality
    * against e14 itself). The learned-merge columns stay JVM-spec'd in
    * e14's rows-only row — this companion turns "no oracle" into
    * "everything expressible is hashed".
    */
  def bpeAccounting(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
              size(TextFns.tokens(col("text"))).cast("long")
                .as("n_ws_tokens"),
              octet_length(col("text")).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))

  /** e17: learned model-based quality filtering — the DCLM/FineWeb-
    * class signal the rule-based e-family (e2 heuristics, e12 Gopher)
    * lacks: a multinomial Naive Bayes classifier trained
    * DISTRIBUTIVELY (reference docs = one trusted source slice,
    * everything else = background), scoring every document with its
    * reference-vs-background log-odds and a keep flag. The e3
    * convention: training is counts-based relational algebra (one
    * term-class aggregate + three 1-row totals), so the ORACLE
    * re-derives the model exactly — nothing is fit iteratively.
    *
    * Model: log-odds(d) = [ln N⁺ − ln N⁻] +
    *   Σ_t tf(t,d) · [ln((c⁺_t+1)/(T⁺+V)) − ln((c⁻_t+1)/(T⁻+V))]
    * (Laplace-smoothed multinomial NB; V = corpus vocabulary size).
    *
    * 100 TB shape: class counts are ONE partial-aggregable shuffle on
    * term; the scoring join shuffles doc terms against the term-weight
    * table on term (both sides hash-partition; the weight table is
    * vocabulary-sized — millions of rows at web scale, so it is NOT
    * broadcast), then one groupBy(doc) fold. Per-doc accumulation
    * runs over the (term ASC)-sorted contribution list in both
    * engines (the e15/e16 determinism convention).
    */
  def qualityClassifier(spark: SparkSession, dir: String,
                        refSource: String = "src0"): DataFrame =
    qualityClassifierFrom(docs(spark, dir), refSource)

  /** e17's body over a caller-supplied (doc_id, text, source) frame —
    * exposed so the spec can plant a corpus with known separation.
    */
  private[graft] def qualityClassifierFrom(docsDf: DataFrame,
                                           refSource: String): DataFrame = {
    val (weights, priors) = nbModelFrom(docsDf, refSource)
    nbScoreFrom(docsDf, refSource, weights, priors)
  }

  /** The NB model over a caller-supplied frame: the term-weight table
    * (term, lw — vocabulary-sized, NOT broadcast at scale) and the
    * 1-row priors (npos, nneg). Training is counts-based relational
    * algebra — one map-side-combinable term-class shuffle + three
    * 1-row totals — so the DuckDB oracle re-derives it exactly AND the
    * landed form (Warehouse.buildNbModel) is value-identical to the
    * in-query one: parquet roundtrips doubles bit-exactly.
    */
  private[graft] def nbModelFrom(docsDf: DataFrame,
                                 refSource: String): (DataFrame, DataFrame) = {
    val toks = filter(split(col("text"), " "), w => w =!= "")
    val base = docsDf
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("source") === refSource).as("is_ref"),
              explode(toks).as("term"))
    // term-class counts: one shuffle, map-side combinable
    val tc = base.groupBy(col("term"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cpos"),
           sum(when(col("is_ref"), 0L).otherwise(1L)).as("cneg"))
    // totals: class token masses + vocabulary size + doc counts —
    // 1-row broadcast (the b34 pattern)
    val totals = tc.agg(sum(col("cpos")).cast("double").as("tpos"),
                        sum(col("cneg")).cast("double").as("tneg"),
                        count(lit(1)).cast("double").as("v"))
    val priors = docsDf
      .filter(col("text").isNotNull)
      .agg(sum(when(col("source") === refSource, 1L).otherwise(0L))
             .cast("double").as("npos"),
           sum(when(col("source") === refSource, 0L).otherwise(1L))
             .cast("double").as("nneg"))
    val weights = tc.crossJoin(broadcast(totals))
      .select(col("term"),
              (log((col("cpos") + lit(1.0d)) / (col("tpos") + col("v"))) -
               log((col("cneg") + lit(1.0d)) / (col("tneg") + col("v"))))
                .as("lw"))
    (weights, priors)
  }

  /** The scoring-only pass: per-doc tf against a given weight table +
    * priors — shared by the one-shot e17 (in-query model), the landed
    * e17b (persisted model) and the streaming quality gate (each
    * micro-batch scores itself against the landed weights). The
    * occurrence-explode form is MEASURED against the e15-style
    * run-length rewrite at the ×100 slice: the run-length form's
    * per-row interpreted HOF work (array_sort + two lambda passes)
    * cost 3× more than the two occurrence-stream shuffles it
    * eliminated (33.5 s vs 11.6 s) — the token stream here is
    * term-keyed small rows with map-side combine, which local AND
    * cluster shuffles move cheaply. Keep the explode. Per-doc
    * accumulation folds the (term ASC)-sorted contribution list (the
    * e15/e16 cross-engine determinism convention).
    */
  private[graft] def nbScoreFrom(docsDf: DataFrame, refSource: String,
                                 weights: DataFrame,
                                 priors: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), w => w =!= "")
    val docTf = docsDf
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("source") === refSource).as("is_ref"),
              explode(toks).as("term"))
      .groupBy(col("doc_id"), col("is_ref"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val contrib = docTf.join(weights, "term")
      .select(col("doc_id"), col("is_ref"), col("term"),
              col("tf"), (col("tf") * col("lw")).as("s"))
    contrib.groupBy(col("doc_id"), col("is_ref"))
      .agg(aggregate(
             transform(array_sort(collect_list(struct(col("term"), col("s")))),
                       x => x.getField("s")),
             lit(0.0d), (acc, x) => acc + x).as("score"),
           sum(col("tf")).cast("long").as("n_tokens"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("n_tokens"), col("is_ref"),
              round((log(col("npos")) - log(col("nneg"))) + col("score"), 6)
                .as("log_odds"))
      .withColumn("keep", col("log_odds") > 0)
      .orderBy(col("doc_id"))
  }

  /** e17b: scoring through the LANDED model (Warehouse.buildNbModel —
    * the d10→d12 amortization applied to the quality classifier): at
    * 100 TB the weight table is trained once on the curated slice and
    * every scoring run joins it, no retraining pass. Result-identical
    * to e17 (TextOpsSpec proves it; the registered query shares e17's
    * DuckDB replay verbatim).
    */
  def qualityClassifierIndexed(spark: SparkSession, dir: String,
                               refSource: String = "src0"): DataFrame = {
    graft.sources.Warehouse.ensureNbModel(spark, dir, refSource)
    nbScoreProbeFrom(docs(spark, dir), dir, refSource)
  }

  /** The landed-model scoring probe over an arbitrary (doc_id, text,
    * source) batch frame — shared by e17b's full-corpus form and the
    * streaming quality gate (CorpusStream.nbGate hands each
    * micro-batch here). Scoring is per-doc against a FIXED model, so
    * verdicts are micro-batch-split-invariant.
    */
  private[graft] def nbScoreProbeFrom(batch: DataFrame, dir: String,
                                      refSource: String = "src0"): DataFrame = {
    import graft.sources.Warehouse
    import graft.sources.Warehouse.tbl
    val spark = batch.sparkSession
    // deletion layer: tombstoned docs are neither scored nor served
    // (the model itself retrains without them — ensureNbModel keys on
    // the live tombstone state)
    nbScoreFrom(Warehouse.exceptTombstoned(batch, dir, "doc_id"), refSource,
                spark.table(tbl(dir, "graft_nb_weights")),
                spark.table(tbl(dir, "graft_nb_priors")))
  }

  /** e15: within-doc lexical diversity — word-distribution Shannon
    * entropy, type-token ratio and top-word share, the
    * MassiveText/FineWeb "fraction of unique words" signal family
    * that e2's shape heuristics and e7/e10's n-gram repetition ratios
    * don't capture: a doc cycling three words has healthy mean word
    * length (e2 passes it) and can stay under e10's top-SHARE radar
    * while its entropy collapses toward log2(3). `norm_entropy`
    * (entropy / log2(n_distinct)) is the vocabulary-size-free form —
    * 1.0 = perfectly uniform usage, → 0 = one word dominating.
    *
    * 100 TB shape: pure per-row expression work, zero shuffles (the
    * orderBy is the driver contract); per-doc cost is
    * O(distinct · tokens) element compares — bounded by doc length
    * squared, all inside one whole-stage-codegen'd projection.
    *
    * Determinism across engines: the entropy sum folds over the
    * SORTED distinct-token list in both Spark (`aggregate` over
    * array_sort) and DuckDB (list_reduce over list_sort), so the
    * floating-point accumulation order is identical — the round(6) is
    * presentation, not a tolerance.
    */
  def wordEntropy(spark: SparkSession, dir: String): DataFrame = {
    val n = size(col("toks")).cast("double")
    // run-length counting over the SORTED token array — O(n log n)
    // per row instead of the O(distinct·n) filter-per-unique form
    // (measured 28.6 → single-digit seconds at the ×100 slice): run
    // starts are the 1-based positions whose token differs from the
    // predecessor; run k's count is the gap to the next start (n+1
    // sentinel past the last). `get` (0-based, null past the end)
    // keeps the next-start lookup ANSI-safe; the distinct tokens come
    // out in sorted order, so the entropy fold's accumulation order —
    // the cross-engine determinism contract — is unchanged.
    // `sorted` is a materialized column, NOT inlined into the lambda —
    // an expression inside a higher-order-function lambda re-evaluates
    // per element, which would turn one sort into n sorts per row
    val starts = filter(sequence(lit(1), size(col("toks"))), i =>
      i === 1 ||
        element_at(col("sorted"), i) =!= element_at(col("sorted"), i - 1))
    val counts = transform(col("starts"), (s, j) =>
      (coalesce(get(col("starts"), j + 1),
                size(col("toks")) + 1) - s).cast("double"))
    val entropyRaw = -aggregate(col("counts"), lit(0.0),
      (acc, c) => acc + (c / n) * log2(c / n))
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .withColumn("sorted", array_sort(col("toks")))
      .withColumn("starts", starts)
      .withColumn("counts", counts)
      .withColumn("ent", entropyRaw)
      .select(col("doc_id"),
              size(col("toks")).cast("long").as("n_tokens"),
              size(col("starts")).cast("long").as("n_distinct"),
              round(size(col("starts")).cast("double") / n, 6).as("ttr"),
              round(col("ent"), 6).as("entropy"),
              round(when(size(col("starts")) > 1,
                         col("ent") / log2(size(col("starts")).cast("double")))
                      .otherwise(lit(0.0)), 6).as("norm_entropy"),
              round(array_max(col("counts")) / n, 6).as("top_share"))
      .orderBy(col("doc_id"))
  }
}
