package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over a change data feed — the read
  * path that makes the engine's CDF (`GraftEngine.changes`, the
  * rowid-keyed snapshot diff) USEFUL at 100 TB: a downstream
  * aggregate is folded forward by O(delta) instead of recomputed by
  * O(corpus). The reference has no CDF (sled mutations are
  * destructive, `/root/reference/src/execute_impl/update.rs:55-108`);
  * this is the lakehouse-era capability its statement surface grows
  * into once versions exist.
  *
  * Algebra: COUNT/SUM are Abelian-group aggregates — every change
  * event carries a sign (+1 for `insert`/`update_postimage`, −1 for
  * `delete`/`update_preimage`), so an UPDATE contributes exactly
  * (new − old) and the maintained state is
  * `base ⊕ Σ signed deltas`, associative and replayable in any
  * order. AVG derives as sum/count downstream; MIN/MAX are NOT
  * group-invertible and need a recompute of affected groups —
  * deliberately out of scope here.
  *
  * Scale shape: one partial-combined aggregate over the delta
  * (map-side signs, exchange carries O(groups-touched) rows), then a
  * full-outer join against the base state keyed on the group — cost
  * O(|delta| + |touched groups|), never O(corpus). Groups whose
  * maintained count reaches 0 drop out, matching a recompute
  * exactly (an all-rows-deleted group vanishes from a GROUP BY).
  */
object Incremental {

  /** Fold a CDF frame (`_change_type` ∈ insert/delete/
    * update_preimage/update_postimage, as produced by
    * `GraftEngine.changes`) into a maintained per-key (cnt, total)
    * state.
    *
    * @param base     prior state: (`keyCol`, `cnt` BIGINT, `total`
    *                 BIGINT) — e.g. the same aggregate computed once
    *                 at the from-version
    * @param changes  the CDF between the base's version and now
    * @param keyCol   group key column (present in both frames)
    * @param valueOf  measure as a column over the CDF rows (pre-image
    *                 rows carry old values, post-image rows new ones
    *                 — exactly what the signed fold needs); use an
    *                 integer-exact encoding (e.g. cents) for
    *                 replayable totals
    * @return (`keyCol`, cnt, total), zero-count groups dropped
    */
  def maintainGroupSum(base: DataFrame, changes: DataFrame,
      keyCol: String, valueOf: Column): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(lit(null).cast("long")) // unknown type → loud null, not silent 0
    val delta = changes
      .select(col(keyCol), sign.as("__s"), valueOf.cast("long").as("__v"))
      .groupBy(col(keyCol))
      .agg(sum(col("__s")).as("__dcnt"),
        sum(col("__s") * col("__v")).as("__dtot"))
    base.select(col(keyCol), col("cnt"), col("total"))
      .join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("__dtot"), lit(0L)))
          .as("total"))
      .filter(col("cnt") > 0)
  }
}
