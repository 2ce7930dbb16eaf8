package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the most recent right
  * row with the same key and right.time <= left.time.
  *
  * Spark has no ASOF JOIN operator; the naive formulation is a range
  * join that plans as a per-key nested loop. This implementation
  * composes built-ins instead (preference (a) over a custom
  * SparkPlan): union the two sides tagged, sort within each key, and
  * carry the latest right-side values forward with
  * last(_, ignoreNulls) over a running frame. One shuffle on the key,
  * one sort — the sort-merge shape an engine-native ASOF join would
  * use, and it inherits AQE partition/skew handling for free.
  */
object AsOf {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are carried)
    * @param keyCol    equality key on both sides
    * @param timeCol   ordering column on both sides (any orderable type)
    * @param valueCols right-side columns to attach to each left row
    *
    * Right rows must be unique per (key, time) — pre-aggregate ties
    * upstream, as any ASOF semantics requires.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .select(col(keyCol) +: col(timeCol).as("__t") +: lit(1).as("__is_left") +:
        leftCols.filterNot(c => c == keyCol).map(c => col(c).as(s"__l_$c")) ++:
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .select(col(keyCol) +: col(timeCol).as("__t") +: lit(0).as("__is_left") +:
        leftCols.filterNot(c => c == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++:
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal time → a right row at
    // exactly left.time is visible (the `>=` ASOF convention)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col(keyCol) +: col("__t") +: col("__is_left") +:
        leftCols.filterNot(_ == keyCol).map(c => col(s"__l_$c")) ++:
        valueCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
    carried.filter(col("__is_left") === 1)
      .select(col(keyCol) +:
        leftCols.filterNot(_ == keyCol).map(c => col(s"__l_$c").as(c)) ++:
        valueCols.map(c => col(s"__c_$c").as(c)): _*)
  }

  /** As-of join with a staleness bound: carried right-side values are
    * nulled when `within(leftTime, matchedRightTime)` is not true —
    * e.g. "the latest purchase, but only if it happened in the last
    * hour". Same single-shuffle union + carry-forward shape as
    * [[join]]; the matched right timestamp rides along as one extra
    * carried column, so the bound costs no additional exchange. */
  def joinWithTolerance(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String],
      within: (Column, Column) => Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .select(col(keyCol) +: col(timeCol).as("__t") +: lit(1).as("__is_left") +:
        lit(null).cast(left.schema(timeCol).dataType).as("__rt") +:
        leftCols.filterNot(c => c == keyCol).map(c => col(c).as(s"__l_$c")) ++:
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .select(col(keyCol) +: col(timeCol).as("__t") +: lit(0).as("__is_left") +:
        col(timeCol).as("__rt") +:
        leftCols.filterNot(c => c == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++:
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col(keyCol) +: col("__t") +: col("__is_left") +:
        last(col("__rt"), ignoreNulls = true).over(w).as("__c_rt") +:
        leftCols.filterNot(_ == keyCol).map(c => col(s"__l_$c")) ++:
        valueCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
    carried.filter(col("__is_left") === 1)
      .select(col(keyCol) +:
        leftCols.filterNot(_ == keyCol).map(c => col(s"__l_$c").as(c)) ++:
        valueCols.map(c =>
          when(within(col("__t"), col("__c_rt")), col(s"__c_$c")).as(c)): _*)
  }
}
