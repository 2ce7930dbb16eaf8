package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** text → count of BPE-ish segments, the exact match count of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — without the regex engine and
  * without materializing the match array.
  *
  * `regexp_extract_all` builds a string array per row only to take
  * its size; on a 5M-doc corpus that array build dominated p10's
  * 100× wall. One code-point scan counts maximal ASCII letter runs,
  * maximal digit runs, and every other non-whitespace code point
  * (the regex's single-char branch matches per code point, which is
  * also what one scan counts). `\s` here is Java's ASCII class
  * — space, tab, newline, vertical tab, form feed, carriage return —
  * matching the regex the DuckDB oracle runs.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  private final val LETTER = 1
  private final val DIGIT = 2
  private final val NONE = 0

  def compute(s: UTF8String): Long = {
    val raw = s.toString
    val len = raw.length
    var count = 0L
    var run = NONE
    var i = 0
    while (i < len) {
      val cp = raw.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        if (run != LETTER) { count += 1; run = LETTER }
      } else if (cp >= '0' && cp <= '9') {
        if (run != DIGIT) { count += 1; run = DIGIT }
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r') {
        run = NONE
      } else {
        count += 1; run = NONE
      }
      i += Character.charCount(cp)
    }
    count
  }

  def apply(text: Column): Column =
    graftshim.column(BpeCount(graftshim.expression(text)))
}
