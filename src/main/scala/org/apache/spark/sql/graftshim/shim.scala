package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Column⇄Expression converters so
  * graft can register native Catalyst expressions (SURVEY §4). Lives inside
  * the org.apache.spark.sql package purely for access; nothing else from
  * Spark internals is touched.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Stable per-session key (private[sql] in the classic session). */
  def sessionKey(s: SparkSession): String = s match {
    case c: classic.SparkSession => c.sessionUUID
    case other                   => System.identityHashCode(other).toString
  }

  /** `explain("formatted")` as a string (r12 plan artifacts). */
  def formattedPlan(df: Dataset[_]): String = df match {
    case d: classic.Dataset[_] =>
      d.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    case other => other.queryExecution.toString
  }
}
