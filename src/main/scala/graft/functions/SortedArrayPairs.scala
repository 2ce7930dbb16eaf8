package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** array → array of (x, y) structs for every index pair i < j — the
  * C(k,2) within-group pair generator.
  *
  * The HOF spelling (`flatten(transform(sequence(1, k-1), i ->
  * transform(slice(arr, i+1, k-i), y -> struct(arr[i], y))))`) runs
  * interpreted: every collection higher-order function is
  * CodegenFallback, and `slice` materializes a fresh suffix array per
  * outer index — O(k) array allocations and ~15 interpreted
  * expression-node evals per emitted pair. This expression emits the
  * same pairs from one compiled double loop with exactly one
  * two-field row allocation per pair. Pair order (lexicographic by
  * (i, j)) matches the HOF spelling, so downstream explode output is
  * row-for-row identical.
  *
  * Element type is whatever the input array carries (the callers use
  * sorted collect_set output); elements are read generically, never
  * copied. Null elements pass through untouched (collect_set never
  * produces them).
  */
case class SortedArrayPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array argument, got $other")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", elemType), StructField("y", elemType))),
    containsNull = false)

  override def prettyName: String = "graft_sorted_array_pairs"

  override def nullSafeEval(input: Any): Any =
    SortedArrayPairs.compute(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SortedArrayPairs.compute($c, $et)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedArrayPairs = copy(child = newChild)
}

object SortedArrayPairs {

  def compute(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val x = arr.get(i, et)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](x, arr.get(j, et))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(arr: Column): Column =
    graftshim.column(SortedArrayPairs(graftshim.expression(arr)))
}
