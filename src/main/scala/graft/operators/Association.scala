package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining (Agrawal & Srikant, VLDB'94
  * support/confidence framework; lift per Brin et al., SIGMOD'97) —
  * the "users who bought X also bought Y" co-occurrence analytics an
  * OLAP engine is asked for over any (basket, item) fact table, and
  * the same machinery a data pipeline uses to find strongly-associated
  * tag / domain / token pairs.
  *
  * Scale shape: the pair space is generated WITHIN EACH BASKET from
  * its sorted item array ([[withinGroupPairs]] — map-side codegen
  * explode, no self-join shuffle), so fan-out is C(basket size, 2) —
  * bounded by the largest basket, never quadratic in the item
  * catalog; `maxBasket` drops degenerate mega-baskets
  * (carts of thousands of items contribute C(n,2) pairs and no
  * signal — the exact skew guard a 100 TB run needs, applied BEFORE
  * the pair explode). Supports are two partial-combined count
  * aggregates; item supports attach to pairs by hash joins (item
  * table ≪ pair table, AQE broadcasts it); the basket total rides a
  * broadcast 1-row cross. Lift/confidence sort keys are single IEEE
  * divisions of exactly-evaluated integer doubles mirrored verbatim
  * by the oracle, so ranking is engine-independent; ties break on
  * (antecedent, consequent). Top-k collapses via
  * TakeOrderedAndProject — O(partitions·k) merge, no full sort.
  */
object Association {

  /** All unordered within-group item pairs (x < y): group to a sorted
    * distinct item array (ONE O(rows) exchange), then explode the
    * C(k,2) ordered pairs inside codegen — no group-keyed self-join,
    * so the quadratic fan-out is generated map-side rather than
    * shuffled. Callers bound k (basket caps, per-order line limits);
    * the sort makes x < y free and the pair stream deterministic. */
  def withinGroupPairs(df: DataFrame, grpCol: String,
      itemCol: String): DataFrame =
    df.groupBy(col(grpCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__is"))
      // C(k,2) pair generation runs as ONE compiled double loop
      // ([[graft.functions.SortedArrayPairs]]) instead of the nested
      // flatten/transform/slice HOF chain: collection HOFs are
      // CodegenFallback (interpreted per element) and slice copied an
      // array suffix per outer index — measured ~40% of this
      // builder's post-shuffle wall at sf0.1, growing with basket
      // size. Same pairs in the same (i, j) order.
      .select(explode(
        graft.functions.SortedArrayPairs(col("__is"))).as("__p"))
      .select(col("__p.x").as("x"), col("__p.y").as("y"))

  /** Top-`k` two-item association rules by lift from a
    * (basketCol, itemCol) fact table. Both directions of each
    * surviving pair are emitted (lift is symmetric, confidence is
    * not). `minSupport` is the minimum co-occurrence basket count.
    * Output: antecedent, consequent, n_pair, n_ante, n_cons,
    * confidence (P(cons|ante), 4dp), lift (4dp). */
  def rulesTopK(df: DataFrame, basketCol: String, itemCol: String,
      k: Int, minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    val bi = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val sized = bi.groupBy(col("bk"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket)
      .select(col("bk"))
    val items = bi.join(sized, "bk")
    val nBaskets = sized.agg(count(lit(1)).cast("double").as("n_baskets"))
    val supp = items.groupBy(col("it")).agg(count(lit(1)).as("c_it"))
    val pairs = withinGroupPairs(items, "bk", "it")
      .groupBy(col("x").as("ia"), col("y").as("ib"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minSupport)
    val scored = pairs
      .join(supp.select(col("it").as("ia"), col("c_it").as("c_ia")), "ia")
      .join(supp.select(col("it").as("ib"), col("c_it").as("c_ib")), "ib")
      .crossJoin(broadcast(nBaskets))
      // lift = P(ab)/(P(a)P(b)) = c_pair·n_baskets/(c_a·c_b): one
      // double product then one division, mirrored operand-for-operand
      // in the oracle so the sort key is bit-identical.
      .withColumn("lift_raw",
        (col("c_pair").cast("double") * col("n_baskets")) /
          (col("c_ia").cast("double") * col("c_ib").cast("double")))
    // both rule directions from each canonical pair
    val rules = scored.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("c_pair"),
        col("c_ia").as("n_ante"), col("c_ib").as("n_cons"),
        col("lift_raw"))
      .unionAll(scored.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("c_pair"),
        col("c_ib").as("n_ante"), col("c_ia").as("n_cons"),
        col("lift_raw")))
    rules
      .orderBy(col("lift_raw").desc, col("antecedent"), col("consequent"))
      .limit(k)
      .select(col("antecedent"), col("consequent"),
        col("c_pair").as("n_pair"), col("n_ante"), col("n_cons"),
        round(col("c_pair").cast("double") / col("n_ante").cast("double"),
          4).as("confidence"),
        round(col("lift_raw"), 4).as("lift"))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: for each key (user/session owner), order events by
    * (ts, id) and count consecutive (from_state → to_state) steps,
    * breaking the chain when the gap exceeds `maxGapSeconds` — the
    * behavioral prior a pipeline fits before simulating traffic,
    * scoring funnel health, or generating synthetic event data.
    * Probabilities are row-normalized per from_state and emitted as
    * integer micros (round(1e6·n/row_total)) so the report is
    * hash-replayable.
    *
    * Scale shape: ONE window pass partitioned by key — each key's
    * history stays in one task (bounded per-user volume; billions of
    * independent keys parallelize freely), with (ts, id) ordering
    * making successor choice deterministic under timestamp ties.
    * The matrix itself is two partial-combined aggregates over
    * |states|² keys at most, and the row-total attach is a
    * broadcast-sized join by construction. No event-sized data
    * moves after the window.
    *
    * Returns (from_state, to_state, n_transitions, prob_micro)
    * ordered by (from_state, to_state). */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, stateCol: String,
      maxGapSeconds: Long = 1800L): DataFrame = {
    require(maxGapSeconds > 0, s"maxGapSeconds $maxGapSeconds must be > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val steps = events.select(col(stateCol).as("from_state"),
        col(tsCol).as("__ts"),
        lead(col(stateCol), 1).over(w).as("to_state"),
        lead(col(tsCol), 1).over(w).as("__nts"))
      .filter(col("to_state").isNotNull &&
        col("__nts") <= col("__ts") + expr(s"INTERVAL $maxGapSeconds SECONDS"))
    val counts = steps.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy(col("from_state"))
      .agg(sum(col("n_transitions")).as("__tot"))
    counts.join(totals, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n_transitions"),
        expr("CAST(ROUND(1e6 * n_transitions / __tot) AS BIGINT)")
          .as("prob_micro"))
      .orderBy(col("from_state"), col("to_state"))
  }
}
