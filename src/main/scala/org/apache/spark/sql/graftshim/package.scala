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
}
