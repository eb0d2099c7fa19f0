package graft

import org.apache.spark.sql.functions._
import graft.operators.{RetrievalOps, TextOps}
import graft.sources.Tables

/** e16 BM25 / d17 hybrid / e17 quality-classifier correctness: a naive
  * JVM BM25 recompute (full definition, no inverted index), fused-rank
  * invariants, and a planted-separation corpus for the NB classifier.
  */
class RetrievalOpsSpec extends SparkSpec {

  private def roundTo(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e16 BM25 equals a naive full-definition JVM recompute") {
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = texts.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty) }.toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length.toDouble).sum / n
    def bm25(qterms: Seq[String], docId: Long): (Double, Int) = {
      val dtoks = toks(docId)
      val dl = dtoks.length.toDouble
      // per-term contribution, folded in term-ASC order (the engine's
      // determinism contract) with the exact same parenthesization
      val contribs = qterms.flatMap { t =>
        val tf = dtoks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val s = math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
            (tf * (RetrievalOps.K1 + 1.0) /
              (tf + RetrievalOps.K1 *
                ((1.0 - RetrievalOps.B) + RetrievalOps.B * dl / avgdl)))
          Some(t -> s)
        }
      }.sortBy(_._1)
      (contribs.map(_._2).foldLeft(0.0)(_ + _), contribs.size)
    }
    val got = RetrievalOps.bm25Search(spark, sf).collect()
    assert(got.nonEmpty)
    val byQuery = got.groupBy(_.getAs[Long]("query_id"))
    RetrievalOps.Bm25Queries.foreach { case (qid, qtext) =>
      val qterms = qtext.split(" ").filter(_.nonEmpty).distinct.toSeq
      val expected = toks.keys.toSeq
        .map(id => (id, bm25(qterms, id)))
        .filter(_._2._2 > 0)
        .sortBy { case (id, (s, _)) => (-s, id) }
        .take(10)
      val rows = byQuery(qid.toLong).sortBy(_.getAs[Int]("rnk"))
      assert(rows.length == expected.length, s"q$qid row count")
      rows.zip(expected).zipWithIndex.foreach {
        case ((r, (id, (s, nt))), i) =>
          assert(r.getAs[Long]("doc_id") == id, s"q$qid rank ${i + 1} doc")
          assert(r.getAs[Int]("rnk") == i + 1)
          assert(r.getAs[Long]("n_terms") == nt.toLong, s"q$qid $id n_terms")
          assert(r.getAs[Double]("score") == roundTo(s, 6), s"q$qid $id score")
      }
    }
  }

  test("d17 fused output: RRF arithmetic, rank contract, list provenance") {
    val got = RetrievalOps.hybridRetrieval(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = Option(r.getAs[Integer]("text_rank")).map(_.toInt)
      val v = Option(r.getAs[Integer]("vec_rank")).map(_.toInt)
      assert(t.isDefined || v.isDefined,
        "fused row from neither list — provenance broken")
      val rrf = t.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        v.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf_score") == roundTo(rrf, 6), "rrf arithmetic")
      assert(t.forall(x => x >= 1 && x <= 20) && v.forall(x => x >= 1 && x <= 20))
      // more-like-this: the query doc itself is excluded from both lists
      assert(r.getAs[Long]("doc_id") != r.getAs[Long]("query_id"))
    }
    // per-query: ranks 1..k contiguous and ordered by (rrf DESC, doc_id)
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val keys = sorted.map(r =>
        (-r.getAs[Double]("rrf_score"), r.getAs[Long]("doc_id"))).toSeq
      assert(keys == keys.sorted, s"q$q not ordered by (rrf desc, doc_id)")
    }
  }

  test("d17b over landed indexes is row-identical to the one-shot d17") {
    // both index families land (or reuse) inside the query via their
    // metadata gates; the fused output must be the EXACT d17 rows —
    // same text list (posting probe ≡ in-scan filter, MLT selection ≡
    // corpus-derived), same vector list (persisted md5-rank routing ≡
    // in-query), same RRF tail (shared code)
    val indexed = RetrievalOps.hybridRetrievalIndexed(spark, sf)
    val plan = indexed.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      "d17b text probe did not partition-prune the posting index")
    val fromIndex = indexed.collect().toSeq.map(_.toString)
    val oneShot = RetrievalOps.hybridRetrieval(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(fromIndex == oneShot && fromIndex.nonEmpty)
  }

  test("e17 separates a planted corpus and scores the real one sanely") {
    import spark.implicits._
    // planted: ref docs speak vocabulary A, background speaks B, one
    // ambiguous doc mixes both — NB log-odds must separate the pure
    // classes with the ambiguous doc strictly between them
    val planted = Seq(
      (1L, "alpha beta alpha gamma", "ref"),
      (2L, "beta alpha gamma gamma", "ref"),
      (3L, "delta epsilon zeta zeta", "bg"),
      (4L, "epsilon delta delta zeta", "bg"),
      (5L, "alpha beta delta epsilon", "bg")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.qualityClassifierFrom(planted, "ref")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("log_odds")).toMap
    assert(out(1L) > 0 && out(2L) > 0, "ref docs must score positive")
    assert(out(3L) < 0 && out(4L) < 0, "pure background must score negative")
    assert(out(5L) > out(3L) && out(5L) < out(1L),
      "mixed doc must land between the pure classes")
    // real corpus: every doc scored, keep == (log_odds > 0), and both
    // verdicts occur (the filter is live, not degenerate)
    val real = TextOps.qualityClassifier(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(real.length.toLong == nDocs)
    real.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Double]("log_odds") > 0))
    }
  }
}
