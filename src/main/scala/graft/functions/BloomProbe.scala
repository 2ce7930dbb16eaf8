package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.sql.{Column, graftshim}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe into a pre-built [[BloomFilter]]: true when
  * the filter MIGHT contain the string child, false when it
  * DEFINITELY does not. The filter ships with the serialized plan
  * (Spark's sketch `BloomFilterImpl` is `Serializable`) and the probe
  * stays inside whole-stage codegen — one `mightContainBinary` call
  * per row over the UTF8 bytes, no UDF boxing.
  *
  * This is the probe half of the bloom-prefiltered incremental-dedup
  * pattern (`Dedup.bloomNovelty`): the filter is built once from the
  * corpus content hashes (`DataFrameStatFunctions.bloomFilter`, a
  * distributed treeAggregate), and the new batch is culled to its
  * plausible-duplicate subset BEFORE any join touches the corpus.
  * Probing uses `mightContainBinary(utf8.getBytes)` — byte-identical
  * to how the builder inserted string columns — so the no-false-
  * negative guarantee holds (asserted by OperatorSpec).
  *
  * Spark has an internal twin (`BloomFilterMightContain`, used by the
  * runtime-filter optimizer rule) but it is not constructible from
  * the public API with an already-built filter, hence this mirror.
  */
case class BloomProbe(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  def apply(c: Column, bloom: BloomFilter): Column =
    graftshim.column(BloomProbe(graftshim.expression(c), bloom))
}
