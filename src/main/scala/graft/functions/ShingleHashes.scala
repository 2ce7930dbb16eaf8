package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** text → array of 64-bit hashes of the DISTINCT word n-gram shingles,
  * in one codegen'd narrow pass.
  *
  * The relational formulation (posexplode tokens → lead() window per
  * doc → concat → distinct → xxhash64) costs a shuffle for the window
  * and a second for the distinct before any pair logic runs; the
  * array HOF formulation (`transform(sequence(...), i ->
  * element_at...)`) runs interpreted per element. This expression
  * tokenizes, shingles, hashes and dedupes inside whole-stage codegen
  * — the shingle set never exists as strings past the row, so a
  * 100-TB corpus streams through at scan speed with zero exchanges
  * before the aggregation that consumes the hashes.
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` exactly
  * (UTF8String trim/toLowerCase, Java regex split) — the definition
  * the DuckDB oracle mirrors with `str_split_regex(trim(lower(text)),
  * '\s+')`. The hash is FNV-1a 64 over the UTF-8 bytes of the
  * space-joined shingle: set cardinalities and intersections computed
  * on hashes equal those on strings up to a ~1e-14 collision chance.
  */
case class ShingleHashes(child: Expression, n: Int, poly: Boolean = false,
    distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, poly, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n, $poly, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val PolyMod = 1000000007L

  /** FNV-1a fold of one byte into h. */
  @inline private def mix(h: Long, b: Byte): Long = (h ^ (b & 0xffL)) * FnvPrime

  /** poly=false: FNV-1a 64 over UTF-8 bytes (default — stronger and
    * cheaper; used where nothing external must re-derive the hash).
    * poly=true: the (h*31 + codepoint) mod 1e9+7 rolling hash of the
    * space-joined shingle — identical to RollingHash.compute over the
    * shingle string, so an ANSI-SQL oracle can recompute every hash
    * from the shingle text (the portable MinHash base). */
  def compute(s: UTF8String, n: Int, poly: Boolean): ArrayData =
    compute(s, n, poly, distinct = true)

  /** distinct=false: every window's hash in document order (one per
    * n-gram POSITION — the positional stream span-level exact dedup
    * consumes); distinct=true: first occurrence only (the set the
    * Jaccard/MinHash family consumes). */
  def compute(s: UTF8String, n: Int, poly: Boolean,
      distinct: Boolean): ArrayData = {
    // identical token stream to split(trim(lower(text)), "\s+")
    val toks = s.trim().toLowerCase().toString.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    // per-token bytes cached once for the FNV path (each token is
    // touched up to n times as the shingle window slides)
    val tokBytes: Array[Array[Byte]] =
      if (poly) null
      else toks.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val seen = if (distinct)
      new java.util.HashSet[java.lang.Long](toks.length * 2) else null
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      var h = if (poly) 0L else FnvOffset
      var k = 0
      while (k < n) {
        if (k > 0) {
          if (poly) h = (h * 31 + ' ') % PolyMod else h = mix(h, ' '.toByte)
        }
        if (poly) {
          val t = toks(i + k)
          var j = 0
          while (j < t.length) {
            val cp = t.codePointAt(j)
            h = (h * 31 + cp) % PolyMod
            j += Character.charCount(cp)
          }
        } else {
          val tb = tokBytes(i + k)
          var j = 0
          while (j < tb.length) { h = mix(h, tb(j)); j += 1 }
        }
        k += 1
      }
      if (!distinct || seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def compute(s: UTF8String, n: Int): ArrayData = compute(s, n, poly = false)

  def apply(text: Column, n: Int): Column = apply(text, n, poly = false)

  def apply(text: Column, n: Int, poly: Boolean): Column =
    graftshim.column(ShingleHashes(graftshim.expression(text), n, poly))

  def apply(text: Column, n: Int, poly: Boolean, distinct: Boolean): Column =
    graftshim.column(
      ShingleHashes(graftshim.expression(text), n, poly, distinct))
}
