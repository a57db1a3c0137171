package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters.
  *
  * Needed by exactly one call site: `Scorer.scoreBundle` binds a DECODED
  * MODEL into its [[graft.functions.XgbScore]] expression, so the
  * expression cannot go through the session function registry the other
  * graft functions use — a registry entry is session-global mutable
  * state, and two models scoring concurrently would race on it
  * (last-writer-wins), while the binding would leak into later
  * `spark.sql` lookups. Constructing the Column directly keeps the model
  * scoped to the one plan that uses it.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
