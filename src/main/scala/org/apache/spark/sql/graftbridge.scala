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
}
