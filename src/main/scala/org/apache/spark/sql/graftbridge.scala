package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the supported way for third-party Catalyst expressions to surface as
  * `Column`s in Spark 4's split Column API. No Spark internals are
  * modified; this only re-exports two conversion calls.
  */
object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Executed physical plan of a streaming query's most recent
    * micro-batch (None before the first batch) — the streaming analog
    * of `queryExecution.executedPlan`, used by PlanAuditSpec to audit
    * state-store operator placement in the micro-batch plans.
    */
  def lastStreamPlan(q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: execution.streaming.runtime.StreamingQueryWrapper =>
        Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString)
      case _ => None
    }
}
