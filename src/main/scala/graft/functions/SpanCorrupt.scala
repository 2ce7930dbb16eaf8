package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** text × document seed → T5 span-corruption example, in one
  * codegen'd narrow pass: (n_spans, n_tokens, input, target) where
  * `input` is the token stream with each contiguous masked run
  * replaced by `<extra_id_k>` and `target` is each sentinel followed
  * by its span's tokens (Raffel et al. 2020 §3.1.4).
  *
  * A position is masked iff the Carter-Wegman mix of (seed, position)
  * lands under `noisePpm` per million:
  * `((1103515245·((seed + pos·1013904223) mod P) + 12345) mod P)
  * mod 1e6 < ppm`, P = 2^31−1 — exact 64-bit arithmetic an ANSI
  * engine replays verbatim, with the seed derived from the portable
  * 60-bit document hash OUTSIDE this expression (so the whole mask
  * is oracle-replayable). Tokenization matches
  * `split(trim(lower(text)), "\s+")`, the library's shared
  * definition.
  *
  * Why an Expression and not array HOFs: `transform`/`filter`
  * lambdas evaluate interpreted per element (HigherOrderFunction is
  * CodegenFallback) — the HOF formulation of this operator measured
  * ~100 s at the 100× point, ~2× slower than even an
  * explode-window-reassemble plan, with the time going to expression
  * -tree walking per token. This loop does the same work inside
  * whole-stage codegen at scan speed with zero exchanges.
  */
case class SpanCorrupt(left: Expression, right: Expression,
    noisePpm: Long) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, long), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = StructType(Seq(
    StructField("n_spans", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false)))

  override def prettyName: String = "graft_span_corrupt"

  override def nullSafeEval(text: Any, seed: Any): Any =
    SpanCorrupt.compute(text.asInstanceOf[UTF8String],
      seed.asInstanceOf[Long], noisePpm)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.SpanCorrupt.compute($t, $s, ${noisePpm}L)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SpanCorrupt =
    copy(left = newLeft, right = newRight)
}

object SpanCorrupt {
  private final val P = 2147483647L

  def apply(text: org.apache.spark.sql.Column,
      seed: org.apache.spark.sql.Column,
      noisePpm: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.column(SpanCorrupt(
      org.apache.spark.sql.graftshim.expression(text),
      org.apache.spark.sql.graftshim.expression(seed), noisePpm))

  /** The per-position mask decision; `seed` must already lie in
    * [0, P). Public so specs can assert the exact arithmetic. */
  @inline def masked(seed: Long, pos: Long, ppm: Long): Boolean =
    ((1103515245L * ((seed + pos * 1013904223L) % P) + 12345L) % P) %
      1000000L < ppm

  def compute(s: UTF8String, seedIn: Long, ppm: Long): InternalRow = {
    val seed = ((seedIn % P) + P) % P
    val toks = s.trim().toLowerCase().toString.split("\\s+")
    val n = toks.length
    val in = new java.lang.StringBuilder
    val tg = new java.lang.StringBuilder
    var spans = 0
    var prevMasked = false
    var i = 1
    while (i <= n) {
      val m = masked(seed, i.toLong, ppm)
      if (!m) {
        if (in.length > 0) in.append(' ')
        in.append(toks(i - 1))
      } else {
        if (!prevMasked) {
          if (in.length > 0) in.append(' ')
          in.append("<extra_id_").append(spans).append('>')
          if (tg.length > 0) tg.append(' ')
          tg.append("<extra_id_").append(spans).append('>')
          spans += 1
        }
        tg.append(' ').append(toks(i - 1))
      }
      prevMasked = m
      i += 1
    }
    new GenericInternalRow(Array[Any](spans.toLong, n.toLong,
      UTF8String.fromString(in.toString),
      UTF8String.fromString(tg.toString)))
  }
}
