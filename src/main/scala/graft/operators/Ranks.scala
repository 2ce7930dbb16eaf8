package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * `Window.orderBy(...)` with no partition moves the entire dataset
  * into ONE task (Spark itself warns "No Partition Defined"). This
  * operator computes the same global rank as a range-partitioned
  * two-pass instead:
  *
  *   1. bucket every row with a caller-supplied expression that is
  *      MONOTONE in the global ordering (e.g. `floor(price/1000)`),
  *      and rank locally per bucket — an ordinary partitioned window;
  *   2. aggregate per-bucket counts (tiny: O(#buckets) rows), prefix-
  *      sum them into bucket offsets, and broadcast-join the offsets
  *      back: global rank = bucket offset + local rank.
  *
  * The full data moves through exactly one hash shuffle on the bucket
  * key; the only single-task step is the prefix sum over the bucket
  * COUNT table, whose size is fixed by the bucket width, not the data.
  * Bucket granularity is the caller's scale knob: finer buckets →
  * more parallelism in pass 1 and a (still tiny) larger offset table.
  */
object Ranks {

  /** Append `rank` (1-based global rank by `order`) and `n_total`
    * columns. `bucket` MUST be monotone non-decreasing along `order`
    * (rows in bucket b all precede rows in bucket b+1); ties of the
    * ordering prefix must never straddle a bucket boundary — deriving
    * the bucket from the first ordering column guarantees both. */
  def withGlobalRank(df: DataFrame, bucket: Column, order: Seq[Column],
      rankCol: String = "rank", totalCol: String = "n_total"): DataFrame = {
    val b = df.withColumn("__b", bucket)
    val local = b.withColumn("__lr",
      row_number().over(Window.partitionBy(col("__b")).orderBy(order: _*)))
    val counts = b.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    // Prefix sum over the bucket-count table: a deliberate single
    // bounded group — the table has one row per bucket (fixed by
    // bucket width), so one task over it is the right plan at any
    // data scale. pmod(__b, 1) ≡ 0 but is not foldable, so the
    // partition spec stays explicit instead of degenerating into
    // Spark's "No Partition Defined" whole-data single-task shape.
    val one = pmod(col("__b"), lit(1))
    val wOff = Window.partitionBy(one).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(one)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col("__b"),
      coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"),
      sum(col("__c")).over(wTot).as(totalCol))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__b", "__lr", "__off")
  }

  /** Append a global rank AND a global running `sum(weight)` over the
    * same ordering — the primitive behind budget-prefix selection
    * ("take documents in quality order until the token budget is
    * spent"). Identical two-pass shape to [[withGlobalRank]]: local
    * rank + local running sum per bucket, then a bucket-level
    * (count, sum) table — one row per bucket, fixed by bucket width —
    * prefix-summed in a single bounded task and broadcast back.
    * `bucket` must be numeric and monotone non-decreasing along
    * `order`, with ordering-prefix ties never straddling a boundary
    * (derive it from the leading order column). `weight` must be
    * integral (the running sum stays exact under any partitioning). */
  def withGlobalRunningSum(df: DataFrame, bucket: Column,
      order: Seq[Column], weight: Column, rankCol: String = "rank",
      cumCol: String = "cum_weight",
      totalCol: String = "total_weight"): DataFrame = {
    val b = df.withColumn("__b", bucket)
      .withColumn("__w", weight.cast("long"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(order: _*)
    val local = b
      .withColumn("__lr", row_number().over(wLoc))
      .withColumn("__ls", sum(col("__w")).over(
        wLoc.rowsBetween(Window.unboundedPreceding, 0)))
    val counts = b.groupBy(col("__b"))
      .agg(count(lit(1)).as("__c"), sum(col("__w")).as("__s"))
    val one = pmod(col("__b"), lit(1))
    val wOff = Window.partitionBy(one).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(one)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col("__b"),
      coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__roff"),
      coalesce(sum(col("__s")).over(wOff), lit(0L)).as("__soff"),
      sum(col("__s")).over(wTot).as(totalCol))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn(rankCol, col("__roff") + col("__lr"))
      .withColumn(cumCol, col("__soff") + col("__ls"))
      .drop("__b", "__w", "__lr", "__ls", "__roff", "__soff")
  }

  /** ntile over a global rank: first (n mod t) tiles get one extra
    * row — the standard SQL ntile split, computed from (rank, n)
    * without any global window. */
  def ntileFromRank(rank: Column, n: Column, t: Int): Column = {
    val base = floor(n / t)
    val rem = n % t
    val threshold = (base + 1) * rem
    when(rank <= threshold, floor((rank - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((rank - threshold - 1) / base) + 1)
      .cast("int")
  }

  /** percent_rank from a global rank, valid when the ordering is a
    * total order (unique tie-breaker), so rank == SQL rank(). */
  def percentRankFromRank(rank: Column, n: Column): Column =
    when(n === 1, 0.0)
      .otherwise((rank - 1).cast("double") / (n - 1).cast("double"))

  /** cume_dist from a global rank — again requires a unique total
    * ordering, under which cume_dist(r) = r / n exactly. */
  def cumeDistFromRank(rank: Column, n: Column): Column =
    rank.cast("double") / n.cast("double")
}
