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
    // which salt a row gets is irrelevant to the merged result; a
    // cheap row-id mod spreads uniformly without any hashing
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast("long").as("cnt"))
  }
}
