package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k as a typed Aggregator — the aggregate-expression tier
  * of custom Catalyst work (SURVEY §7.1).
  *
  * Versus the window `row_number() <= k` form: the aggregate combines
  * top-k heaps MAP-SIDE, so each partition ships at most k rows per
  * group into the shuffle regardless of group size — the property that
  * matters when one query key has millions of candidates. Ordering is
  * (score desc, id asc): total and deterministic, so results are
  * stable across partitionings.
  */
case class ScoredCand(cand_id: Long, cos: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredCand, List[ScoredCand], Seq[ScoredCand]] {

  private def better(a: ScoredCand, b: ScoredCand): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.cand_id < b.cand_id)

  private def insert(buf: List[ScoredCand], x: ScoredCand): List[ScoredCand] = {
    // buf is kept sorted best-first and capped at k
    val (pre, post) = buf.span(better(_, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[ScoredCand] = Nil

  override def reduce(buf: List[ScoredCand], x: ScoredCand): List[ScoredCand] =
    if (buf.length == k && better(buf.last, x)) buf else insert(buf, x)

  override def merge(b1: List[ScoredCand], b2: List[ScoredCand]): List[ScoredCand] =
    b2.foldLeft(b1)(insert)

  override def finish(buf: List[ScoredCand]): Seq[ScoredCand] = buf

  override def bufferEncoder: Encoder[List[ScoredCand]] =
    Encoders.kryo[List[ScoredCand]]

  override def outputEncoder: Encoder[Seq[ScoredCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `top_k(cand_id, cos)` → array<struct<cand_id,cos>>
    * (the product encoder flattens the case class into two args).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[ScoredCand])
    (id: Column, cos: Column) => fn(id, cos)
  }
}
