package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ranked retrieval over the documents corpus (SURVEY §2.E/§2.D
  * round-12 additions): BM25 keyword search (e16) and hybrid
  * keyword+vector retrieval with reciprocal-rank fusion (d17) — the
  * retrieval surface the reference's LIKE filters (quickSearch
  * app.service.ts:1274, searchTokens :1366) stop short of, and the
  * RAG-shaped workload every LLM data pipeline runs against its own
  * corpus.
  *
  * Scale shape (the inverted-index story): at warehouse scale the
  * posting table (term, doc_id, tf, dl) is landed once, term-bucketed
  * (the text twin of the IVF posting lists) and probed by key. The
  * in-query form plays the probe WITHOUT materializing the index:
  * the broadcast query-term filter runs against the raw occurrence
  * stream inside the scan stage, so every post-scan stage is bounded
  * by the QUERY side — tf/df aggregate over matched occurrences only
  * (≈ Σ_t ctf(t) rows, never the corpus token stream), and the
  * per-(query, doc) score fold + top-k ranking run on candidate rows
  * ≈ Σ_t df(t). No stage materializes a global sort; ranking is the
  * WindowGroupLimit partial top-k everywhere.
  *
  * Cross-engine determinism: the per-document score is a SUM of
  * per-term float contributions, and Spark aggregation order is
  * nondeterministic — so the fold runs over the SORTED (term ASC)
  * contribution list in BOTH engines (the e15 convention), making the
  * accumulation order — and the hash — identical.
  */
object RetrievalOps {

  /** BM25 parameters (Robertson/Spärck Jones; the k1/b defaults every
    * public implementation ships).
    */
  val K1 = 1.2
  val B = 0.75
  /** Rank-fusion constant (Cormack & Clarke 2009's RRF k=60). */
  val RrfK = 60

  /** e16's fixed query workload — literal, like b7's keyword: user
    * queries are inputs, not corpus derivations. Interpolated into the
    * oracle from here so Scala and SQL can never drift.
    */
  val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "hash join",
    2 -> "window agg sort",
    3 -> "stream batch",
    4 -> "vector scan",
    5 -> "slow query filter",
    6 -> "spark data table",
    7 -> "merge sort order key",
    8 -> "customer line part")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** The token stream with dl riding along: (doc_id, dl, term) — one
    * occurrence row per token. `toks` is materialized as its own
    * projection so the non-cheap split+filter evaluates ONCE per doc
    * (CollapseProject keeps a multiply-referenced expensive alias in
    * its own Project; inlined, size() and explode() would each re-run
    * the split — measured 2× scan cost at the ×1000 slice).
    * Tokenization = whitespace split, empties dropped (the
    * Bpe.tokenCount word convention).
    */
  private def tokenStream(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
              filter(split(col("text"), " "), w => w =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
              explode(col("toks")).as("term"))

  /** Corpus stats as a 1-row broadcast (the b34 total pattern). */
  private def corpusStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(size(filter(split(col("text"), " "), w => w =!= ""))
                .cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n"),
           avg(col("dl")).as("avgdl"))

  /** One BM25 term contribution (all-double arithmetic, written with
    * the exact parenthesization the oracle replays — Lucene's
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1), non-negative by
    * construction).
    */
  private def bm25Term(tf: Column, df: Column, dl: Column,
                       n: Column, avgdl: Column): Column =
    log((n - df + lit(0.5d)) / (df + lit(0.5d)) + lit(1.0d)) *
      (tf * lit(K1 + 1.0d) /
        (tf + lit(K1) * (lit(1.0d - B) + lit(B) * dl / avgdl)))

  /** The shared BM25 scoring tail over an already-matched posting
    * slice (`matched`: term, doc_id, dl, tf — ONLY query-term
    * occurrences, whether filtered in-scan by the one-shot or read
    * from the landed index's pruned partitions) and a 1-row `stats`
    * frame (n, avgdl): df over the matched term slice, per-(query,
    * doc) score as the SORTED-term fold, per-query top-k by
    * (score DESC, doc_id). `qterms` (query_id, term) is TINY and
    * broadcast. `exclSelf` drops doc_id == query_id candidates (d17's
    * more-like-this contract; e16 query ids are not doc ids).
    */
  private def bm25ScoreTail(matched: DataFrame, stats: DataFrame,
                            qterms: DataFrame, k: Int,
                            exclSelf: Boolean, maxTerms: Int): DataFrame = {
    // ONE linear pass over `matched` (guide §2.4): the old shape had
    // TWO consumers — a df groupBy branch and the candidate stream —
    // and since the df branch exchanged on term while the candidate
    // branch stayed map-side under broadcast joins, no exchange could
    // be shared and the matched lineage (a full corpus tokenization
    // pass at the one-shot) ran TWICE. Instead: df(t) rides in as a
    // COUNT WINDOW on the term exchange (same value — matched is
    // (term, doc) unique), then one repartition by doc_id whose
    // hash(doc_id) partitioning satisfies the score fold's
    // ClusteredDistribution(query_id, doc_id) — every row of a
    // (query, doc) group shares the doc — so the per-(query, doc)
    // fold below aggregates EXCHANGE-FREE. That fold's shuffle was the
    // single largest exchange in d17/d17b (155–273 MB of 3.1M-row
    // aggregation state); what remains is two narrow exchanges of the
    // matched slice itself, which is query-bounded (≈ Σ_t df(t) rows)
    // at any corpus size.
    val wDf = Window.partitionBy(col("term"))
    val mat = matched
      .withColumn("df", count(lit(1)).over(wDf).cast("double"))
      .repartition(col("doc_id"))
    // Each query's terms get a DENSE per-query ordinal in term-ASC
    // order (a window over the TINY qterms frame). Within one
    // (query, doc) group every contribution carries a distinct tord ≤
    // maxTerms, and tord order ≡ term order — which is what lets the
    // deterministic fold below run as a PIVOTED, partial-aggregable
    // HashAggregate instead of collect_list + array_sort: the old
    // object aggregate shipped every (term, s) struct through the
    // (query, doc) exchange (measured 3.98 s of shuffle write / 155 MB
    // serialized on d17's 3.1M-candidate stream) and aggregated
    // object-typed; the pivot ships ≤ maxTerms doubles per GROUP
    // map-side combined, fully codegen (guide §2.3: aggregate before
    // you shuffle).
    val wOrd = Window.partitionBy(col("query_id")).orderBy(col("term"))
    val qt = qterms.withColumn("tord", row_number().over(wOrd))
    val cands0 = mat
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
    val cands = if (exclSelf) cands0.filter(col("doc_id") =!= col("query_id"))
                else cands0
    val contrib = cands.select(
      col("query_id"), col("doc_id"), col("tord"),
      bm25Term(col("tf").cast("double"), col("df"),
               col("dl").cast("double"), col("n"), col("avgdl")).as("s"))
    // deterministic accumulation, same order as the oracle's
    // term-ASC list_reduce: fold the tord-indexed slots ascending.
    // max(when(tord = i, s)) is the slot's single value (tord is
    // unique per group); absent slots are null and are filtered out
    // of the fold, so the accumulation sequence is exactly the sorted
    // contribution list. The n_terms cross-check raises instead of
    // silently mis-scoring if any contribution missed its slot (tord
    // > maxTerms would be a caller bug).
    val slots = (1 to maxTerms).map(i =>
      max(when(col("tord") === i, col("s"))).as(s"_s$i"))
    val folded = aggregate(
      filter(array((1 to maxTerms).map(i => col(s"_s$i")): _*),
             x => x.isNotNull),
      lit(0.0d), (acc, x) => acc + x)
    val nNonNull = size(filter(array((1 to maxTerms).map(i => col(s"_s$i")): _*),
                               x => x.isNotNull)).cast("long")
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(slots.head, (slots.tail :+
        count(lit(1)).cast("long").as("n_terms")): _*)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
              when(nNonNull === col("n_terms"), folded)
                .otherwise(raise_error(lit(
                  "bm25ScoreTail: tord overflow — maxTerms too small")))
                .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("n_terms"),
              round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The one-shot BM25 rank: the inverted-index PROBE shape WITHOUT a
    * materialized index — the broadcast term filter runs against the
    * raw occurrence stream INSIDE the scan stage, so the only rows
    * that ever reach a shuffle are occurrences of query terms
    * (≈ Σ_t ctf(t)); the corpus-wide (term, doc) tf aggregation this
    * replaces shuffled the WHOLE token stream (~270M occurrence rows
    * at the ×1000 slice) to serve a 24-term query. tf then aggregates
    * the survivors; df counts (term, doc) rows AFTER that aggregation.
    */
  private def bm25Rank(spark: SparkSession, dir: String, qterms: DataFrame,
                       k: Int, exclSelf: Boolean, maxTerms: Int): DataFrame = {
    val terms = qterms.select(col("term")).distinct()
    val matched = tokenStream(spark, dir).join(broadcast(terms), "term")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    bm25ScoreTail(matched, corpusStats(spark, dir), qterms, k, exclSelf,
                  maxTerms)
  }

  /** Static per-query distinct-term bound for a literal (id, text)
    * workload — the pivot width [[bm25ScoreTail]] folds over.
    */
  private def maxQueryTerms(qs: Seq[(Int, String)]): Int =
    qs.map(_._2.split(" ").filter(_.nonEmpty).distinct.length).max

  // ---------- landed posting index (e16b/d17b; Warehouse.buildPostings) ----

  /** Term-bucket partition count for the landed posting table. The
    * index is PARTITIONED by pmod(xxhash64(term), TermBuckets), so a
    * probe's broadcast term join prunes to the buckets its terms hash
    * into (dynamic partition pruning — the d12 cent_id mechanism
    * applied to text). 64 buckets keeps directories coarse enough for
    * healthy file sizes at any SF while still pruning ~7/8ths of the
    * index for a typical 8-term query.
    */
  val TermBuckets = 64

  /** The index's bucket routing — shared by build and probe so they
    * can never disagree (xxhash64 is Spark-stable across versions of
    * this library; the bucket count is baked into the metadata key).
    */
  private[graft] def termBucket(term: Column): Column =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** The landed index's two parts over a caller-supplied document
    * frame: the posting rows (term, doc_id, dl, tf, tb) and the 1-row
    * corpus-stats frame (n_docs, sum_dl) — counts, not averages, so
    * incremental batches land their OWN stats row and the probe-side
    * avgdl = Σ sum_dl / Σ n_docs stays exact under upserts. (dl is
    * integral, so double partial sums are exact below 2^53 total
    * tokens ≈ 36 PB of text — avg(dl double) and Σdl/Σn are therefore
    * bit-identical, the identity WarehouseSpec pins.)
    */
  private[graft] def postingPartsFrom(docsDf: DataFrame)
      : (DataFrame, DataFrame) = {
    val withToks = docsDf
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
              filter(split(col("text"), " "), w => w =!= "").as("toks"))
    val lists = withToks
      .select(col("doc_id"), size(col("toks")).as("dl"),
              explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("term")))
    val stats = withToks
      .agg(count(lit(1)).as("n_docs"),
           coalesce(sum(size(col("toks")).cast("long")), lit(0L))
             .as("sum_dl"))
    (lists, stats)
  }

  /** Corpus stats reconstructed from the landed per-batch stats rows,
    * minus the scope's deletion deltas at the CURRENT index identity
    * (deleteDocs lands one (n_docs, sum_dl) delta row per delete
    * batch, tagged (build_key, gen) — superseded generations already
    * folded or excluded what they corrected, so their deltas are
    * inert): n = Σ n_docs − Σ Δn, avgdl = (Σ sum_dl − Σ Δdl)/n (exact
    * — see postingPartsFrom). Bounded: one row per landed batch plus
    * one per delete batch.
    */
  private[graft] def landedStats(spark: SparkSession, dir: String,
                                 tombScope: String =
                                   graft.sources.Warehouse.LiveScope)
      : DataFrame = {
    import graft.sources.Warehouse
    val base = Warehouse.postStats(spark, dir)
      .select(col("n_docs").cast("long").as("n_docs"),
              col("sum_dl").cast("long").as("sum_dl"))
    val all = Warehouse.tombStats(spark, dir) match {
      case Some(t) =>
        val (bkey, gen) = Warehouse.postingsIdentity(spark, dir)
        base.union(
          t.filter(col("scope") === tombScope && col("bkey") === bkey &&
                   col("gen") === gen)
            .select((-col("n_docs")).as("n_docs"),
                    (-col("sum_dl")).as("sum_dl")))
      case None => base
    }
    all.agg(sum(col("n_docs")).cast("double").as("n"),
            (sum(col("sum_dl")).cast("double") /
              sum(col("n_docs")).cast("double")).as("avgdl"))
  }

  /** BM25 rank over the LANDED posting index: the probe joins the
    * broadcast query terms against the term-bucket PARTITION column,
    * so dynamic partition pruning opens only the buckets the query
    * terms hash into — zero corpus scans per run; every post-scan
    * stage is bounded by the query side exactly as in the one-shot.
    * Must run after Warehouse.ensurePostings at matching parameters;
    * result-identical to [[bm25Rank]] (WarehouseSpec proves it, and
    * the registered e16b shares e16's DuckDB replay verbatim).
    */
  private[graft] def bm25RankIndexed(spark: SparkSession, dir: String,
                                     qterms: DataFrame,
                                     k: Int, exclSelf: Boolean,
                                     maxTerms: Int = 16,
                                     tombScope: String =
                                       graft.sources.Warehouse.LiveScope)
      : DataFrame = {
    // the trailing =!= "" filter is semantically a no-op (qterms are
    // split-and-dropped-empties by construction) but it is what makes
    // the terms side DPP-ELIGIBLE: Spark's PartitionPruning rule only
    // inserts the pruning subquery when the filtering side carries a
    // selective plan Filter (PredicateHelper.isLikelySelective), and a
    // literal workload's explode/distinct chain has none — without it
    // the probe degrades to a full-index scan. WarehouseSpec asserts
    // the dynamicpruning expression is present.
    val terms = qterms.select(col("term")).distinct()
      .filter(col("term") =!= "")
      .withColumn("tb", termBucket(col("term")))
    // deletion layer: tombstoned docs drop BEFORE df counts, so idf
    // and scores equal a physically-purged index's exactly (the
    // no-tombstone case costs nothing — the plan is unchanged)
    val matched = graft.sources.Warehouse.exceptTombstoned(
        graft.sources.Warehouse.postLists(spark, dir)
          .join(broadcast(terms), Seq("tb", "term")),
        dir, "doc_id", tombScope)
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    bm25ScoreTail(matched, landedStats(spark, dir, tombScope), qterms, k,
                  exclSelf, maxTerms)
  }

  /** e16's literal query workload as (query_id, term) rows. */
  private def bm25QueryTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Bm25Queries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
              explode(array_distinct(
                filter(split(col("qtext"), " "), w => w =!= ""))).as("term"))
  }

  /** e16: BM25 top-k per query over the fixed literal workload. */
  def bm25Search(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25Rank(spark, dir, bm25QueryTerms(spark), k, exclSelf = false,
             maxTerms = maxQueryTerms(Bm25Queries))

  /** e16b: the same search through the landed posting index — the
    * production retrieval posture (the d10→d12 amortization applied
    * to text): first touch in a JVM lands the index, every subsequent
    * run is probe-cost only and never re-reads the corpus.
    */
  def bm25SearchIndexed(spark: SparkSession, dir: String,
                        k: Int = 10): DataFrame = {
    graft.sources.Warehouse.ensurePostings(spark, dir)
    bm25RankIndexed(spark, dir, bm25QueryTerms(spark), k, exclSelf = false,
                    maxTerms = maxQueryTerms(Bm25Queries))
  }

  /** e16z (round 15): the landed BM25 probe over the deterministic
    * Zipf-vocabulary corpus — the driver-checked correctness row for a
    * NON-degenerate vocabulary (verdict item 5: GenZipf corpora were
    * bench-only; this one runs through the standard DuckDB hash gate,
    * whose replay re-derives the corpus in SQL — see
    * [[graft.sources.ZipfCheck]]). Production path end-to-end:
    * materialize corpus → ensurePostings (fingerprint-gated, amortized
    * across runs) → DPP-pruned probe over a rank-spanning workload.
    */
  def bm25SearchZipf(spark: SparkSession, k: Int = 10): DataFrame = {
    import graft.sources.ZipfCheck
    val dir = ZipfCheck.corpusDir(spark)
    graft.sources.Warehouse.ensurePostings(spark, dir)
    import spark.implicits._
    val qt = ZipfCheck.Queries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
              explode(array_distinct(
                filter(split(col("qtext"), " "), w => w =!= ""))).as("term"))
    bm25RankIndexed(spark, dir, qt, k, exclSelf = false,
                    maxTerms = maxQueryTerms(ZipfCheck.Queries))
  }

  /** e16c: the deletion demo — e16b's landed probe AFTER retracting
    * the `doc_id % delMod == 0` slice through [[graft.sources.Warehouse.deleteDocs]].
    * The row registers the whole production flow (ensure → delete →
    * probe): tombstones land exactly-once under their own (scope,
    * batch) partitions, the probe anti-joins them before df counts,
    * and (N, avgdl) re-sum through the delete batch's stats delta — so
    * the output is hash-identical to BM25 over a corpus that never
    * contained the deleted docs, which is exactly what the derived
    * DuckDB oracle replays (e16's SQL with the slice filtered out of
    * the corpus CTE). Runs in its own what-if scope so e16b and every
    * other default-scope row sharing the warehouse is untouched; the
    * production path is the same call with the default live scope.
    * Deliberately re-deletes per invocation (the delete is the demo),
    * so the benched cost is delete + probe.
    */
  def bm25SearchDeleted(spark: SparkSession, dir: String, k: Int = 10,
                        delMod: Int = 17): DataFrame = {
    import graft.sources.Warehouse
    Warehouse.ensurePostings(spark, dir)
    val scope = s"demo-doc-m$delMod"
    Warehouse.deleteDocs(spark, dir,
      docs(spark, dir).filter(pmod(col("doc_id"), lit(delMod)) === 0)
        .select(col("doc_id")),
      scope)
    bm25RankIndexed(spark, dir, bm25QueryTerms(spark), k, exclSelf = false,
                    maxTerms = maxQueryTerms(Bm25Queries), tombScope = scope)
  }

  /** The e16b probe WITHOUT the freshness gate — for callers that just
    * maintained the landed index themselves (upsert specs, streaming
    * maintenance) and must probe the standing+upserted state rather
    * than trigger a metadata-mismatch rebuild.
    */
  private[graft] def bm25SearchIndexedUnchecked(spark: SparkSession,
                                                dir: String,
                                                k: Int = 10): DataFrame =
    bm25RankIndexed(spark, dir, bm25QueryTerms(spark), k, exclSelf = false,
                    maxTerms = maxQueryTerms(Bm25Queries))

  /** d17's text side: each query DOC's top-`nTerms` terms by
    * (tf·idf DESC, term ASC) — the Lucene-MoreLikeThis term selection
    * (bounded per query, so the broadcast stays |Q|·nTerms rows at any
    * corpus size). The idf factor is what makes more-like-this survive
    * a REAL corpus: under a Zipf vocabulary a document's top-tf words
    * are the corpus's stopwords (df ≈ N), so raw-tf selection
    * degenerates the candidate set to |Q|·corpus — idf-weighted
    * selection keeps candidates at Σ_t df(t). Disclosed honestly: on
    * THIS synthetic corpus the change measures neutral (df is
    * near-uniform at ~0.8% of N — ×100: min 250 / median 3862 / max
    * 3923 over 3100 terms — so no selection can matter and d17's cost
    * is its three corpus passes: the posting scan, this df pass, and
    * the d13 vector side). The df table is vocab-sized: per-doc
    * DISTINCT terms explode (array_distinct in the row), then a
    * term-keyed count whose map-side partial compacts to ≤vocab rows
    * per task — the shuffle is vocabulary-sized, never the corpus
    * token stream.
    *
    * The query ids are EXACTLY d13's md5-salted fixed
    * batch over EMBEDDINGS vec_ids (not a parallel rank over doc_ids —
    * documents ⊋ embeddings at sf0.1, so the two rankings would pick
    * different ids); the batch joins to documents for its text.
    */
  private def queryDocTerms(spark: SparkSession, dir: String,
                            nq: Int, nTerms: Int): DataFrame = {
    val toks = filter(split(col("text"), " "), w => w =!= "")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val qids = SimOps.fixedQueryBatch(emb, nq).select(col("query_id"))
    val qdocs = docs(spark, dir)
      .filter(col("text").isNotNull)
      .join(broadcast(qids), col("doc_id") === col("query_id"))
    val dfs = docs(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(array_distinct(toks)).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("qdf"))
    val nDocs = docs(spark, dir)
      .filter(col("text").isNotNull)
      .agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("tsc").desc, col("term"))
    qdocs
      .select(col("query_id"), explode(toks).as("term"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("qtf"))
      .join(dfs, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tsc", col("qtf").cast("double") *
        log((col("n") + lit(1.0d)) / (col("qdf") + lit(1.0d))))
      .withColumn("tr", row_number().over(w))
      .filter(col("tr") <= nTerms)
      .select(col("query_id"), col("term"))
  }

  /** The more-like-this term selection against the LANDED posting
    * index: identical selection to [[queryDocTerms]] — same tsc
    * expression, same (tsc DESC, term) window — with every corpus
    * pass replaced by an index read: qdf(t) = that term's landed
    * posting-row count (≡ the per-doc-distinct df the one-shot
    * derives, because posting rows are (term, doc) unique), n from the
    * landed stats, and only the |Q| query docs themselves are
    * tokenized (their rows survive the broadcast id join; the scan is
    * the only corpus touch and it feeds no shuffle). The qdf probe
    * joins broadcast terms against the tb partition column — DPP, the
    * bm25RankIndexed shape.
    */
  private def queryDocTermsIndexed(spark: SparkSession, dir: String,
                                   nq: Int, nTerms: Int,
                                   tombScope: String =
                                     graft.sources.Warehouse.LiveScope)
      : DataFrame = {
    val toks = filter(split(col("text"), " "), w => w =!= "")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
              graft.functions.VectorFns.norm(col("embedding")).as("nrm"))
    val qids = SimOps.fixedQueryBatch(emb, nq).select(col("query_id"))
    val qtf = docs(spark, dir)
      .filter(col("text").isNotNull)
      .join(broadcast(qids), col("doc_id") === col("query_id"))
      .select(col("query_id"), explode(toks).as("term"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("qtf"))
    val qdfTerms = qtf.select(col("term")).distinct()
      .filter(col("term") =!= "")  // DPP eligibility (see bm25RankIndexed)
      .withColumn("tb", termBucket(col("term")))
    val dfs = graft.sources.Warehouse.exceptTombstoned(
        graft.sources.Warehouse.postLists(spark, dir)
          .join(broadcast(qdfTerms), Seq("tb", "term")),
        dir, "doc_id", tombScope)
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("qdf"))
    val nDocs = landedStats(spark, dir, tombScope).select(col("n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("tsc").desc, col("term"))
    qtf
      .join(dfs, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tsc", col("qtf").cast("double") *
        log((col("n") + lit(1.0d)) / (col("qdf") + lit(1.0d))))
      .withColumn("tr", row_number().over(w))
      .filter(col("tr") <= nTerms)
      .select(col("query_id"), col("term"))
  }

  /** The RRF fusion tail shared by d17 and d17b: rrf(d) = Σ_lists
    * 1/(RrfK + rank_list(d)), missing list membership contributing 0.
    * The two lists are full-outer-joined on (query, doc) — k·|Q| rows
    * a side — and re-ranked by (rrf DESC, doc_id). RRF is the standard
    * score-scale-free fusion (Cormack & Clarke 2009): no score
    * normalization to tune, and every arithmetic step is a single
    * division + fixed-order add, so the fused ranking is
    * bit-reproducible and the oracle replays it exactly.
    */
  private def rrfFuse(text: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val fused = text.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
              (coalesce(lit(1.0d) / (lit(RrfK.toDouble) + col("trnk")),
                        lit(0.0d)) +
               coalesce(lit(1.0d) / (lit(RrfK.toDouble) + col("vrnk")),
                        lit(0.0d))).as("rrf"),
              col("trnk"), col("vrnk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
              round(col("rrf"), 6).as("rrf_score"),
              col("trnk").as("text_rank"), col("vrnk").as("vec_rank"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** d17: hybrid retrieval — BM25 more-like-this (top-8 terms of each
    * query doc) fused with the d13 fixed-|Q| IVF vector ranking by
    * reciprocal-rank fusion ([[rrfFuse]]).
    *
    * Queries = the d13 md5-salted fixed batch ids; doc_id == vec_id
    * by corpus construction. Both sides exclude the query doc itself.
    */
  def hybridRetrieval(spark: SparkSession, dir: String, k: Int = 10,
                      nq: Int = SimOps.FixedQBatch, nTerms: Int = 8,
                      listK: Int = 20): DataFrame = {
    // the selected-terms frame is ≤ |Q|·nTerms rows at ANY corpus size
    // but its lineage is a corpus df pass + window — and bm25Rank
    // consumes it twice (the distinct probe-term set and the broadcast
    // scoring join). Materialize it once (the fuzzyDedup localCheckpoint
    // pattern) so the more-like-this selection pass runs once per query
    // instead of twice (guide §1.2: don't compute things twice).
    val qterms = queryDocTerms(spark, dir, nq, nTerms).localCheckpoint(false)
    val text = bm25Rank(spark, dir, qterms, listK, exclSelf = true,
                        maxTerms = nTerms)
      .select(col("query_id"), col("doc_id"), col("rnk").as("trnk"))
    val vec = SimOps.annIvf(spark, dir, k = listK, nq = nq)
      .select(col("query_id"), col("cand_id").as("doc_id"),
              col("rnk").as("vrnk"))
    rrfFuse(text, vec, k)
  }

  /** d17b: the same hybrid retrieval with BOTH lists served from
    * landed indexes — the production posture that kills d17's three
    * per-run corpus passes: the text list probes the term-bucketed
    * posting index (build amortized by ensurePostings), the vector
    * list probes the persisted IVF lists through the frozen md5-rank
    * routing (ensureIvf at kmeansIters=0, the d12 convention — the
    * config d17's oracle replays), and only the |Q| query docs are
    * tokenized per run. Result-identical to [[hybridRetrieval]]
    * (RetrievalOpsSpec proves it; the registered query shares d17's
    * DuckDB replay verbatim).
    */
  def hybridRetrievalIndexed(spark: SparkSession, dir: String, k: Int = 10,
                             nq: Int = SimOps.FixedQBatch, nTerms: Int = 8,
                             listK: Int = 20,
                             tombScope: String =
                               graft.sources.Warehouse.LiveScope): DataFrame = {
    graft.sources.Warehouse.ensurePostings(spark, dir)
    graft.sources.Warehouse.ensureIvf(spark, dir, kmeansIters = 0)
    val qterms = queryDocTermsIndexed(spark, dir, nq, nTerms, tombScope)
    val text = bm25RankIndexed(spark, dir, qterms,
                               listK, exclSelf = true, maxTerms = nTerms,
                               tombScope = tombScope)
      .select(col("query_id"), col("doc_id"), col("rnk").as("trnk"))
    val vec = graft.sources.Warehouse
      .annIvfFlatIndexed(spark, dir, k = listK, nq = nq,
                         tombScope = tombScope)
      .select(col("query_id"), col("cand_id").as("doc_id"),
              col("rnk").as("vrnk"))
    rrfFuse(text, vec, k)
  }
}
