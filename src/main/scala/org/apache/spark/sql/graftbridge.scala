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

  /** Every physical node of an executed plan, descending through the
    * AQE wrappers (`AdaptiveSparkPlanExec`, materialized
    * `QueryStageExec`s, reused exchanges) that hide their subtrees
    * from a plain `children` walk. Under AQE a finalized plan's top
    * level is a single `ResultQueryStage` with NO children — a naive
    * walk sees one node and counts zero exchanges, making any
    * "shuffle-free" assertion vacuous. Spec helpers walk with this.
    */
  def planNodes(p: execution.SparkPlan): Seq[execution.SparkPlan] =
    p +: planChildren(p).flatMap(planNodes)

  /** Structural children of a physical node, looking through the AQE
    * wrappers planNodes documents.
    */
  def planChildren(p: execution.SparkPlan): Seq[execution.SparkPlan] = p match {
    case a: execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: execution.adaptive.QueryStageExec => Seq(q.plan)
    case r: execution.exchange.ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }
}
