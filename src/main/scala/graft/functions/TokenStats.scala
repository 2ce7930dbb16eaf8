package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** text → one struct of the per-document token statistics every
  * heuristic quality gate consumes, in ONE codegen'd narrow pass.
  *
  * The HOF formulation (`aggregate(transform(tk, ...))`,
  * `size(filter(tk, x -> x rlike ...))`, `size(filter(tk, x -> x IN
  * (...)))`) re-materializes the token array per metric and Catalyst
  * evaluates every lambda body INTERPRETED per element — the p107
  * span-corruption shoot-out measured a 5× win for a codegen
  * expression over the equivalent HOF chain, and the r16 verdict
  * flagged this exact cost class as the dominant wall of the
  * quality-audit entries (p125 72.2s / p129 70.6s at 100×). This
  * expression tokenizes once and folds all ten counters in a single
  * scan inside whole-stage codegen; the token array never exists
  * past the row.
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` exactly
  * (UTF8String trim/toLowerCase, Java regex split) — the definition
  * the DuckDB oracle mirrors with `str_split_regex(trim(lower(text)),
  * '\s+')` and the one [[ShingleHashes]] already hash-validated
  * against it battery-wide. Character counts are CODE POINTS (Spark
  * `length` / UTF8String.numChars semantics), not UTF-16 units.
  *
  * Fields (all BIGINT, never null for a non-null input):
  *  - `n_words`       token count (`size(tk)`; the empty string has
  *                    one empty token, matching Java regex split)
  *  - `chars`         Σ per-token length (`aggregate(transform(tk,
  *                    length))`)
  *  - `alpha`         tokens containing an ASCII letter run
  *                    (`size(filter(tk, x -> x rlike '[a-z]'))` —
  *                    text is lowercased before tokenizing)
  *  - `n_distinct`    distinct tokens (`size(array_distinct(tk))`)
  *  - `stop_hits`     tokens ∈ the stop set, WITH multiplicity
  *  - `stop_distinct` DISTINCT tokens ∈ the stop set
  *  - `n_sym`         '#' occurrences + non-overlapping ASCII '...'
  *                    occurrences + '…' (U+2026) occurrences in the
  *                    RAW text (Gopher Table A1's symbol set; the
  *                    real-ellipsis count fixes the r16 ADVICE gap
  *                    where only the three-dot form was counted)
  *  - `n_punct`       raw-text characters ∈ [.,!?;:]
  *  - `n_upper`       raw-text characters ∈ [A-Z]
  *  - `n_chars`       raw-text length (code points)
  *
  * The stop set rides into generated code as a codegen reference
  * object (one shared HashSet per task, zero per-row allocation for
  * the membership probes).
  */
case class TokenStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = TokenStats.schema
  override def prettyName: String = "graft_token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(stops.size * 2, 4))
    stops.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStatsStops", stopSet,
      "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStats.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  val schema: StructType = StructType(Seq(
    "n_words", "chars", "alpha", "n_distinct", "stop_hits",
    "stop_distinct", "n_sym", "n_punct", "n_upper", "n_chars")
    .map(StructField(_, LongType, nullable = false)))

  /** One pass over the raw text (symbol/punct/upper/char counts) +
    * one over the token stream (word-grain counts). */
  def compute(s: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val raw = s.toString
    val len = raw.length
    var nSym = 0L; var nPunct = 0L; var nUpper = 0L; var nChars = 0L
    var i = 0
    while (i < len) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' ||
        cp == ';' || cp == ':') nPunct += 1
      if (cp >= 'A' && cp <= 'Z') nUpper += 1
      if (cp == '#' || cp == '…') nSym += 1
      i += Character.charCount(cp)
    }
    // non-overlapping left-to-right '...' scan — identical count to
    // (length(t) - length(replace(t, '...', ''))) / 3
    i = 0
    while (i + 2 < len) {
      if (raw.charAt(i) == '.' && raw.charAt(i + 1) == '.' &&
        raw.charAt(i + 2) == '.') { nSym += 1; i += 3 }
      else i += 1
    }
    // identical token stream to split(trim(lower(text)), "\s+")
    val toks = s.trim().toLowerCase().toString.split("\\s+")
    val nWords = toks.length.toLong
    var chars = 0L; var alpha = 0L; var stopHits = 0L
    val distinct = new java.util.HashSet[String](toks.length * 2)
    val stopSeen = new java.util.HashSet[String](8)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      chars += tok.codePointCount(0, tok.length)
      var j = 0
      var hasAlpha = false
      while (!hasAlpha && j < tok.length) {
        val c = tok.charAt(j)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1
      distinct.add(tok)
      if (stops.contains(tok)) { stopHits += 1; stopSeen.add(tok) }
      t += 1
    }
    new GenericInternalRow(Array[Any](nWords, chars, alpha,
      distinct.size.toLong, stopHits, stopSeen.size.toLong,
      nSym, nPunct, nUpper, nChars))
  }

  def apply(text: Column, stops: Seq[String]): Column =
    graftshim.column(TokenStats(graftshim.expression(text), stops))
}
