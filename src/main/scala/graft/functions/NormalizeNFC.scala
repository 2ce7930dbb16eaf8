package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark has no built-in normalizer, yet corpus curation needs one:
  * the same visible text can arrive composed (é = U+00E9) or
  * decomposed (e + U+0301), and every downstream content hash, dedup
  * key, and shingle would treat them as different documents. NFC-
  * normalizing at ingest makes content identity canonical. A single
  * static call per row inside whole-stage codegen — the same
  * codegen-over-UDF reasoning as [[RollingHash]]. DuckDB's
  * `nfc_normalize` computes the identical transform, so normalized
  * hashes remain oracle-checkable (p34).
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNFC.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFC.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {
  /** Already-normalized strings (the overwhelmingly common case) pass
    * through without re-encoding. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    graftshim.column(NormalizeNFC(graftshim.expression(c)))
}
