package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** text → per-marker-set token hit counts (with multiplicity) in ONE
  * codegen'd tokenize pass — the language-ID workhorse.
  *
  * The HOF formulation evaluates `size(filter(tk, x -> x IN (...)))`
  * once per language: the token array materializes per row and every
  * lambda body runs interpreted per element per language (|langs|
  * scans). This expression tokenizes once and routes each token
  * through a shared token→set-indices hash map, so the cost is one
  * scan + one probe per token regardless of how many marker sets are
  * registered — the [[TokenStats]] discipline applied to the p08
  * class (61.5s of the 100× ScaleVerify wall before this).
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` exactly
  * (the oracle-validated [[ShingleHashes]]/[[TokenStats]] stream).
  * Returns one BIGINT per marker set, in registration order.
  */
case class MarkerCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty, "MarkerCounts needs at least one marker set")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_marker_counts"

  /** token → indices of the sets containing it (a token may mark
    * several languages — 'a' is an English and a Spanish marker). */
  @transient private lazy val index: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.foreach { tok =>
        val prev = m.get(tok)
        m.put(tok, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    MarkerCounts.compute(input.asInstanceOf[UTF8String], index, sets.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerIndex", index, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MarkerCounts.compute($c, $ref, ${sets.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

object MarkerCounts {

  def compute(s: UTF8String, index: java.util.HashMap[String, Array[Int]],
      n: Int): ArrayData = {
    val counts = new Array[Long](n)
    val toks = s.trim().toLowerCase().toString.split("\\s+")
    var t = 0
    while (t < toks.length) {
      val hits = index.get(toks(t))
      if (hits != null) {
        var i = 0
        while (i < hits.length) { counts(hits(i)) += 1; i += 1 }
      }
      t += 1
    }
    new GenericArrayData(counts)
  }

  def apply(text: Column, sets: Seq[Seq[String]]): Column =
    graftshim.column(MarkerCounts(graftshim.expression(text), sets))
}
