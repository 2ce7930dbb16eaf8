package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data-profiling report — the ingest audit a pipeline
  * runs before trusting a new 100-TB drop: row/null/distinct counts
  * and value bounds for every column, in a fixed number of passes
  * regardless of column count. (The reference exposes table metadata
  * through SHOW/information_schema — `GraftEngine` replicates that —
  * but has no data-statistics operator; this is Spark-native
  * extension surface, the batch analog of `ANALYZE TABLE`.)
  */
object Profile {

  /** Profile every column of `df`: returns one row per column,
    * `(col_name, n_rows, n_null, n_distinct, min_repr, max_repr)`,
    * ordered by col_name.
    *
    * Semantics: `n_distinct` counts distinct NON-null values;
    * `min_repr`/`max_repr` are the TYPED min/max (so numeric columns
    * order numerically, not lexicographically) rendered to their
    * canonical string AFTER aggregation. Callers feed oracle-stable
    * types (integers, strings, dates — pre-project doubles to
    * fixed-point and timestamps to dates) when the report must
    * hash-match an external replay; the operator itself is
    * type-agnostic.
    *
    * Scale shape: exactly TWO jobs independent of column count.
    * (1) min/max for ALL columns ride one partial-combined aggregate
    * to a single 1-row frame — no shuffle wider than 2·ncols scalars.
    * (2) null/distinct counts go through a melt: each row explodes
    * into ncols (col_name, canonical-string value) entries GENERATED
    * in place (codegen'd array of structs, no join), then a
    * two-level aggregate — partial distinct on (col, value), count
    * on col — so the wide shuffle carries at most Σ|distinct(c)|
    * rows and no single reducer sees more than one column's distinct
    * set. That is the same work Spark's multi-count-distinct Expand
    * would do, made explicit and skew-spread. The final join of the
    * ncols-row stats frame with the 1-row min/max frame is
    * broadcast-sized by construction. */
  def tableProfile(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val mmAggs = cols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val mm1 = df.agg(mmAggs.head, mmAggs.tail: _*)
    val bounds = mm1.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__mn_$c").as("min_repr"),
        col(s"__mx_$c").as("max_repr"))): _*)).as("__b"))
      .select(col("__b.col_name"), col("__b.min_repr"),
        col("__b.max_repr"))
    val melted = df.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(c).cast("string").as("__v"))): _*)).as("__e"))
      .select(col("__e.col_name"), col("__e.__v"))
    val stats = melted.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__v").isNull.cast("long")).as("n_null"),
        countDistinct(col("__v")).as("n_distinct"))
    stats.join(bounds, Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_repr"), col("max_repr"))
      .orderBy(col("col_name"))
  }
}
