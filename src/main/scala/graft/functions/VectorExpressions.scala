package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,(x,y)->x*y), 0d, (s,v)->s+v)`) allocates
  * a zipped array and makes two closure calls per element in the
  * interpreted expression path; this expression is one static call
  * over the raw ArrayData buffers inside whole-stage codegen. Same
  * left-to-right accumulation order, so results are bit-identical to
  * the HOF form (and to the DuckDB oracle formula).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** dot(a,b) / (|a| |b|), simple left-to-right loops. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: Column, b: Column): Column =
    graftshim.column(CosineSim(graftshim.expression(a), graftshim.expression(b)))
}

/** Codegen'd PQ encoder: nearest codebook entry (1-based, first-min
  * tie-break) per subspace for an `array<double>` vector against an
  * `array<array<array<double>>>` codebook (m × codes × sub). The HOF
  * formulation materializes an m×codes distance matrix through
  * interpreted lambdas per row; this is one static call with tight
  * loops over the raw buffers — same left-to-right accumulation and
  * the same first-minimum argmin, so codes are bit-identical to the
  * HOF form and to the DuckDB oracle's list_position(list_min) replay.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
        ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<array<double>>>), got $other")
    }

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.PqEncode.compute($v, $cb)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  def compute(v: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val out = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val entries = cb.getArray(mi)
      val codes = entries.numElements()
      var bestJ = 0
      var best = Double.MaxValue
      var j = 0
      while (j < codes) {
        val e = entries.getArray(j)
        val sub = e.numElements()
        var d = 0d
        var dd = 0
        while (dd < sub) {
          val diff = v.getDouble(off + dd) - e.getDouble(dd)
          d += diff * diff
          dd += 1
        }
        // strict < keeps the FIRST minimal entry, matching
        // array_position(ds, array_min(ds))
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      out(mi) = bestJ + 1 // 1-based, like array_position
      off += entries.getArray(0).numElements()
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(v: Column, cb: Column): Column =
    graftshim.column(PqEncode(graftshim.expression(v), graftshim.expression(cb)))
}

/** Codegen'd ADC (asymmetric-distance) sum: given a query's m×codes
  * LUT (`array<array<double>>`) and a candidate's m codes (1-based
  * `array<int>`), returns Σ_mi lut[mi][code[mi]] with the same
  * left-to-right order as the HOF/list_reduce formulation. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
        ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<double>>, array<int>), got $other")
    }

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqAdc.compute(lut.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (lut, code) => s"graft.functions.PqAdc.compute($lut, $code)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def compute(lut: ArrayData, code: ArrayData): Double = {
    val m = math.min(lut.numElements(), code.numElements())
    var s = 0d
    var mi = 0
    while (mi < m) {
      s += lut.getArray(mi).getDouble(code.getInt(mi) - 1)
      mi += 1
    }
    s
  }

  def apply(lut: Column, code: Column): Column =
    graftshim.column(PqAdc(graftshim.expression(lut), graftshim.expression(code)))
}
