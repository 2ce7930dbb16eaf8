package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a real aggregate, not a window.
  *
  * `Window.partitionBy(q_id)` + `row_number` funnels the ENTIRE scored
  * candidate set into ≤|queries| tasks before discarding all but k rows
  * per query — at 100 TB that is a handful of tasks holding everything.
  * A typed `Aggregator` instead rides Spark's two-phase aggregation:
  * every map task reduces its slice to a ≤k-element buffer per key
  * (ObjectHashAggregate partial), and only those tiny buffers cross the
  * shuffle. The exchange carries O(partitions × keys × k) rows instead
  * of O(candidates).
  */
object TopK {

  /** One scored candidate. `id` is the tie-breaker (ascending) for
    * equal scores, which keeps results deterministic under any
    * partitioning — the same total order `ORDER BY score DESC, id`
    * a window formulation would use. */
  case class Scored(id: Long, score: Double)

  /** `better(x, y)` ⇔ x precedes y in the top-k order. Uses
    * `java.lang.Double.compare` so NaN ordering matches Spark's and
    * DuckDB's sort semantics (NaN sorts as the largest double). */
  private def better(x: Scored, y: Scored): Boolean = {
    val c = java.lang.Double.compare(x.score, y.score)
    c > 0 || (c == 0 && x.id < y.id)
  }

  /** Keeps the k best `Scored` per group. The buffer is an unsorted
    * ArrayBuffer culled back to k whenever it doubles — amortized O(1)
    * per input row, no per-row allocation. */
  class TopKAgg(k: Int)
      extends Aggregator[Scored, ArrayBuffer[Scored], Seq[Scored]] {

    private def cull(b: ArrayBuffer[Scored]): ArrayBuffer[Scored] =
      if (b.length <= k) b
      else {
        val best = b.sortWith(better).take(k)
        b.clear(); b ++= best
      }

    override def zero: ArrayBuffer[Scored] = ArrayBuffer.empty

    override def reduce(b: ArrayBuffer[Scored], x: Scored): ArrayBuffer[Scored] = {
      b += x
      if (b.length >= 2 * k) cull(b) else b
    }

    override def merge(a: ArrayBuffer[Scored],
        b: ArrayBuffer[Scored]): ArrayBuffer[Scored] = cull(a ++= b)

    override def finish(b: ArrayBuffer[Scored]): Seq[Scored] =
      b.sortWith(better).take(k).toSeq

    // The buffer only serializes at the partial→final shuffle boundary
    // (≤k elements), so an opaque binary encoding is fine.
    override def bufferEncoder: Encoder[ArrayBuffer[Scored]] =
      Encoders.kryo[ArrayBuffer[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Per-key top-k: `df.groupBy(keys).agg(topK(k)(id, score))` column.
    * The result is an `array<struct<id,score>>` sorted best-first. */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAgg(k), Encoders.product[Scored])
      .apply(id.cast("long"), score.cast("double"))

  /** Reduce `scored(groupCols..., idCol, scoreCol)` to the k best rows
    * per group, appending a 1-based `rnk`. Deterministic: ties in
    * score break ascending on `idCol`. */
  def perKey(scored: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, k: Int, rnkCol: String = "rnk"): DataFrame = {
    val grouped = scored
      .groupBy(groupCols.map(col): _*)
      .agg(topK(k)(col(idCol), col(scoreCol)).as("__top"))
    grouped
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__n")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__n.id").as(idCol),
        col("__n.score").as(scoreCol),
        (col("__pos") + 1).as(rnkCol)): _*)
  }
}
