package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryUtil._

/** Window-function surface (SURVEY.md §2.5): the reference reaches
  * DataFusion 6's window set through SQL (`select.rs:47`); Spark's
  * `Window` spec + analytic functions are a 1:1 superset. All frames
  * use deterministic total orderings (unique tiebreaker columns) so
  * results hash-match the oracle.
  */
object Windows {

  val defs: Map[String, Q] = Map(

    // ---- row_number: top-3 customers per nation by balance.
    "q17_rownum_topn_per_group" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        tbl(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_nationkey"), col("rn"))
      },
      Some("""SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin)),

    // ---- rank / dense_rank with ties.
    "q18_rank_dense" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity").desc)
        tbl(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_quantity"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"))
          .orderBy(col("l_returnflag"), col("l_quantity").desc,
            col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
        |dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber""".stripMargin)),

    // ---- lag / lead across each customer's order history.
    "q19_lag_lead" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        tbl(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"))
          .orderBy(col("o_custkey"), col("o_orderkey")) // orderkey unique
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |lag(o_totalprice, 1) OVER w AS prev_price,
        |lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- running sum (ROWS UNBOUNDED PRECEDING): integer cents keep
    // the cumulative sum exact and order-independent.
    "q20_running_sum" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            money(sum(cents(col("o_totalprice"))).over(w)).as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
        |  AS running_spend
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- ntile / percent_rank / cume_dist over a global total order.
    // A bare `Window.orderBy` would move ALL orders into one task;
    // instead compute a distributed global rank (range-bucketed
    // two-pass, operators.Ranks) and derive all three functions from
    // (rank, n) — valid because (o_totalprice, o_orderkey) is a total
    // order. Bucket = price div 1000: monotone in the ordering, and
    // ties in o_totalprice can never straddle a bucket boundary.
    "q21_ntile_pct" -> Q(
      (s, dir) => {
        val ranked = graft.operators.Ranks.withGlobalRank(
          tbl(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          expr("CAST(floor(o_totalprice / 1000) AS LONG)"),
          Seq(col("o_totalprice"), col("o_orderkey")))
        ranked.select(col("o_orderkey"),
            graft.operators.Ranks.ntileFromRank(col("rank"), col("n_total"), 4)
              .as("quartile"),
            graft.operators.Ranks.percentRankFromRank(col("rank"), col("n_total"))
              .as("pr"),
            graft.operators.Ranks.cumeDistFromRank(col("rank"), col("n_total"))
              .as("cd"))
          .orderBy(col("o_orderkey")).limit(500)
      },
      Some("""SELECT o_orderkey,
        |ntile(4) OVER w AS quartile,
        |percent_rank() OVER w AS pr,
        |cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey LIMIT 500""".stripMargin)),

    // ---- first_value / last_value / nth_value over full-partition
    // frames.
    "q40_first_last_nth" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        tbl(s, dir, "orders")
          .select(col("o_custkey"),
            first(col("o_totalprice")).over(w).as("first_price"),
            last(col("o_totalprice")).over(w).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .distinct()
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT DISTINCT o_custkey,
        |first_value(o_totalprice) OVER w AS first_price,
        |last_value(o_totalprice) OVER w AS last_price,
        |nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin)),

    // ---- RANGE frame with numeric bounds (value-based window): all
    // orders within 1000.00 below the current price for the customer.
    // Integer-cents ordering keeps the range bounds and the windowed
    // sum exact on both engines; RANGE frames are tie-deterministic
    // by definition (peers share a frame).
    "q46_range_frame" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(cents(col("o_totalprice")))
          .rangeBetween(-100000, 0)
        tbl(s, dir, "orders").filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"),
            cents(col("o_totalprice")).as("price_cents"),
            count(lit(1)).over(w).as("n_within_1k"),
            money(sum(cents(col("o_totalprice"))).over(w)).as("sum_within_1k"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |count(*) OVER w AS n_within_1k,
        |CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS DOUBLE)/100.0
        |  AS sum_within_1k
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(round(o_totalprice*100) AS BIGINT)
        |  RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
