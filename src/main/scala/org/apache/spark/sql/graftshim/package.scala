package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column` and Catalyst `Expression` for
  * custom expressions (Spark 4 wraps Column around ColumnNode; the
  * converters live in `sql.classic`, package-private to sql). This
  * is the standard extension-library shim — no Spark internals are
  * modified, only re-exported.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Resolve the optimizer rules an extensions installer registered —
    * `SparkSessionExtensions.buildOptimizerRules` is private[sql];
    * re-exported so specs can assert extension wiring without
    * constructing a dedicated SparkSession. */
  def optimizerRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
