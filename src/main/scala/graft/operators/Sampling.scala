package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partitioning and not
  * reproducible across engines or re-runs over re-partitioned data.
  * These operators derive the sampling decision from a content hash
  * of a key column instead: the same row is always in or out, on any
  * cluster layout, and an external engine can recompute the exact
  * sample. Both are narrow or bounded-shuffle shapes that survive
  * 100 TB: the Bernoulli filter is per-row with no shuffle at all;
  * the stratified top-n shuffles once on the stratum key.
  */
object Sampling {

  /** Uniform [0,1) weight for a key: the md5 hex string of the key is
    * uniform per nibble, so a lexicographic compare against a hex
    * prefix is an exact quantile test — and md5 of a string is
    * identical in every engine. */
  def hashWeight(key: Column): Column = md5(key.cast("string"))

  /** Deterministic Bernoulli sample: keep rows whose md5(key) falls
    * below the hex threshold (e.g. "2" keeps 1/8, "1a" keeps
    * 26/256). Per-row filter, no shuffle, reproducible anywhere. */
  def deterministicSample(df: DataFrame, keyCol: String,
      hexThreshold: String): DataFrame =
    df.filter(hashWeight(col(keyCol)) < lit(hexThreshold.toLowerCase))

  /** Deterministic stratified sample: exactly `n` rows per stratum
    * (fewer if the stratum is smaller), chosen by hash order so the
    * pick is stable. One shuffle on the stratum key; each stratum's
    * window is an ordinary partitioned window. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashWeight(col(keyCol)), col(keyCol))
    df.withColumn("__sr", row_number().over(w))
      .filter(col("__sr") <= n)
      .drop("__sr")
  }
}
