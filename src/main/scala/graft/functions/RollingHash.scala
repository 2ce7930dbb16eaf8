package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graftshim
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial document
  * fingerprint h = (h*mult + codepoint) mod `mod` (defaults 31 /
  * 1e9+7 — the p11 fingerprint family).
  *
  * The same fold expressed with `aggregate(sequence(1, length(s)) …)`
  * runs in the interpreted higher-order-function path — one closure
  * call and one substring per character. This expression stays inside
  * whole-stage codegen (a single static call per row over the UTF8
  * bytes), ~10× faster on the documents corpus; at 100 TB that is the
  * difference between a scan-speed narrow pass and a CPU-bound one.
  *
  * The (mult, mod) parameters exist so operators that need several
  * independent hash families (e.g. the portable SimHash, which wants
  * 60 bits from two 30-bit hashes) can derive them — and because the
  * polynomial fold is expressible in ANSI SQL, a DuckDB oracle can
  * replay every family exactly.
  */
case class RollingHash(child: Expression, mult: Long = 31L,
    mod: Long = 1000000007L) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.compute($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  /** Identical semantics to the SQL fold over per-character
    * codepoints (`ascii(substring(s, i, 1))`). */
  def compute(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def compute(s: UTF8String): Long = compute(s, 31L, Mod)

  /** Column form with an explicit hash family. */
  def apply(c: Column, mult: Long, mod: Long): Column =
    graftshim.column(RollingHash(graftshim.expression(c), mult, mod))

  /** Register as a SQL function on the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  def registerFor(df: DataFrame): Unit = register(df.sparkSession)
}
