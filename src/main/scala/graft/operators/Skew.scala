package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join handling covers joins at
  * runtime; for *aggregations* over heavily-skewed keys the standard
  * fix is salting: a two-phase aggregate that fans one hot key out
  * over `buckets` partial groups, then merges. Correct for any
  * algebraic aggregate (sum/count/min/max); the spec asserts equality
  * with the unsalted plan.
  */
object Skew {

  /** Two-phase salted sum/count per key. Phase 1 groups on
    * (key, salt) — the hot key's rows spread over `buckets` reducers
    * — phase 2 merges the partials on the key alone. Spark's partial
    * aggregation already does map-side combine; salting matters when
    * one key's *post-combine* partials still overwhelm one reducer
    * (e.g. high-cardinality payloads or collect-like aggregates). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    // which salt a row gets is irrelevant to the merged result, but
    // deriving it from the row's own values — not from
    // monotonically_increasing_id, which depends on partition layout —
    // keeps partials (and any debugging sample of them) deterministic
    // under repartitioning, like every other operator in this library
    val salted = df.withColumn("__salt",
      pmod(xxhash64((keys :+ valueCol).map(col): _*), lit(buckets.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("cnt"))
  }

  /** Key-distribution profile: the `k` heaviest keys with row counts
    * and share of total — the diagnostic that decides whether a key
    * needs salting or AQE skew handling before a big join/agg.
    *
    * Works at any key cardinality: per-key counts partial-aggregate
    * map-side, the total rides a broadcast 1-row aggregate, and the
    * heavy-hitter merge is the bounded [[TopK]] k-heap keyed on the
    * portable key hash (so the shuffle after counting carries
    * O(partitions × k) heap rows, never the full key dictionary).
    * Count ties rank ascending on the key hash — deterministic and
    * replayable in any engine. */
  def profile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .withColumn("kh",
        TextAnalysis.portableHash60(col(keyCol).cast("string")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = df.agg(count(lit(1)).as("n_total"),
      lit(1).as("__one"))
    val top = TopK.perKey(
      counts.select(lit(1).as("__one"), col("kh").as("id"),
        col("n_rows").cast("double").as("score")),
      Seq("__one"), "id", "score", k)
    top.join(counts.select(col("kh").as("id"), col(keyCol), col("n_rows")),
        Seq("id"))
      .join(broadcast(total), Seq("__one"))
      .select(col("rnk"), col(keyCol), col("n_rows"),
        (col("n_rows").cast("double") / col("n_total").cast("double"))
          .as("share"))
  }
}
