package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, graftshim}

/** Native Catalyst Z-order (Morton) interleave of two non-negative
  * long keys: bit i of the left child lands at result bit 2i, bit i
  * of the right child at 2i+1, over the low 31 bits of each (z fits
  * in 62 bits — never negative).
  *
  * Why it exists: sorting/partitioning an export by ONE key gives
  * parquet min/max skipping on that key only; sorting by the Z-value
  * keeps BOTH dimensions bounded within every contiguous z-range, so
  * row-group stats prune selective filters on either column. This is
  * the layout trick (Delta/Iceberg `ZORDER BY`) a 100-TB fact export
  * uses when two independent columns both carry selective filters.
  *
  * Codegen'd (one static call per row); the same interleave is
  * expressible in ANSI SQL as a 31-term bit-shift fold, so a DuckDB
  * oracle replays it exactly (p53). Inputs are masked to their low 31
  * bits — callers with wider or negative keys must pre-normalize
  * (documented, not silently truncated beyond the mask).
  */
case class ZOrderBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderBits.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderBits.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderBits =
    copy(left = newLeft, right = newRight)
}

object ZOrderBits {
  /** Interleave the low 31 bits of a (even positions) and b (odd). */
  def compute(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  def apply(a: Column, b: Column): Column =
    graftshim.column(ZOrderBits(graftshim.expression(a), graftshim.expression(b)))
}
