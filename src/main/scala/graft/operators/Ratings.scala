package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference rating estimation — the analysis layer a
  * preference-data pipeline (RLHF reward modeling, arena-style model
  * comparison, [[Curation.preferencePairs]]' output QA) needs before
  * trusting its pairs: turn a stream of decided matches into a
  * per-player strength scale.
  *
  * Reference scope note: the reference engine (wqc200/ebike) has no
  * rating operator — this is part of the beyond-reference
  * training-data-pipeline surface, same tier as the dedup/similarity
  * families.
  */
object Ratings {

  /** Fixed-iteration Bradley–Terry strengths via Hunter (2004)'s MM
    * algorithm, as exactly-replayable integer arithmetic (the
    * [[Graph.pageRankMicro]] / [[Graph.hitsMicro]] discipline): every
    * player starts at 1e6 micros; each round computes
    *
    *   D_i  = Σ_j n_ij · 1e12 div max(s_i + s_j, 1)
    *   raw_i = W_i · 1e12 div max(D_i, 1)
    *
    * in exact Long math (n_ij = matches between i and j, W_i = total
    * wins of i), then rescales to max = 1e6 micros with ONE
    * correctly-rounded IEEE double multiply+divide per player — the
    * same single-double-op normalization [[Graph.hitsMicro]] proved
    * replayable, so any engine (DuckDB included) reproduces the whole
    * trajectory bit-for-bit. Rounds are a fixed hyperparameter, not
    * data-dependent; a never-winning player converges to strength 0
    * (the MM fixed point for W_i = 0), which the max(…,1) guards keep
    * division-safe.
    *
    * Scale shape per round: two hash joins of the O(distinct pairs)
    * edge table against the O(players) score frame, one
    * partial-aggregated sum to player grain, one node-sized join, and
    * a 1-row broadcast max for the rescale — Pregel-lite, no driver
    * action inside the loop, fixed O(rounds) plan depth. Self-matches
    * (winner == loser) carry no signal and are dropped as edges. The
    * result is materialized eagerly (localCheckpoint) so every
    * intermediate cache is released before returning.
    *
    * Long-exactness bound (the [[Curation.kneserNeyScore]] doc
    * convention): each denominator term is n_ij·1e12 with the divisor
    * ≥ 1, so the math is overflow-free while no single unordered
    * player pair accumulates more than ~9.2e6 decided matches
    * (2^63 / 1e12) — two orders past any arena's per-pair replay
    * count. Corpora beyond that should pre-aggregate matches to a
    * coarser pair grain (e.g. per epoch) before calling.
    *
    * Returns (player, bt_micro, n_matches, n_wins) — one row per
    * player that appears in at least one non-self match. */
  def bradleyTerryMicro(matches: DataFrame, winnerCol: String,
      loserCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds $rounds must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val pairWins = matches
      .select(col(winnerCol).as("__w"), col(loserCol).as("__l"))
      .filter(col("__w") =!= col("__l"))
      .groupBy(col("__w"), col("__l")).agg(count(lit(1)).as("__n"))
      .persist(lvl)
    cached += pairWins
    // symmetric match-count edges: n_ij = n_ji = wins(i over j) +
    // wins(j over i), one row per ordered pair
    val edges = pairWins
      .select(col("__w").as("__i"), col("__l").as("__j"), col("__n"))
      .union(pairWins
        .select(col("__l").as("__i"), col("__w").as("__j"), col("__n")))
      .groupBy(col("__i"), col("__j")).agg(sum(col("__n")).as("__n"))
      .persist(lvl)
    cached += edges
    val perPlayer = edges.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__nm"))
    val wins = pairWins.select(col("__w").as("__i"), col("__n"))
      .groupBy(col("__i")).agg(sum(col("__n")).as("__wn"))
    val players = perPlayer
      .join(wins, Seq("__i"), "left")
      .select(col("__i"), col("__nm"),
        coalesce(col("__wn"), lit(0L)).as("__wn"))
      .persist(lvl)
    cached += players
    var s = players.select(col("__i"), lit(1000000L).as("__s"))
    (1 to rounds).foreach { _ =>
      val si = s.toDF("__i", "__si")
      val sj = s.toDF("__j", "__sj")
      val denom = edges.join(si, "__i").join(sj, "__j")
        .groupBy(col("__i"))
        .agg(sum(expr(
          """__n * CAST(1000000000000 AS BIGINT)
            |  div greatest(__si + __sj, CAST(1 AS BIGINT))""".stripMargin))
          .as("__d"))
      val raw = players.join(denom, Seq("__i"))
        .select(col("__i"), expr(
          """__wn * CAST(1000000000000 AS BIGINT)
            |  div greatest(__d, CAST(1 AS BIGINT))""".stripMargin).as("__r"))
        .persist(lvl)
      cached += raw
      val mx = raw.agg(max(col("__r")).as("__mx"))
      // eager per-round lineage cut (the Graph-loop discipline): s
      // feeds BOTH sides of next round's score join, so an un-cut
      // plan doubles every round — O(2^rounds) analysis/canonicalize
      // cost dominated wall time long before any data did. One tiny
      // player-sized job per round caps plan depth at O(1).
      s = raw.crossJoin(broadcast(mx))
        .select(col("__i"),
          round(col("__r").cast("double") * lit(1000000.0) /
            col("__mx").cast("double"), 0).cast("long").as("__s"))
        .localCheckpoint(eager = true)
    }
    val out = s.join(players, Seq("__i"))
      .select(col("__i").as("player"), col("__s").as("bt_micro"),
        col("__nm").as("n_matches"), col("__wn").as("n_wins"))
      .localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** Adjacent-rank preference pairs from per-judge scored candidates
    * (the arena reduction: within each judge's ranking, each candidate
    * beats the next-strictly-weaker one): orders a judge's rows by
    * (score desc, tieCol asc), pairs each row with its successor, and
    * keeps pairs where the score strictly decreases and the players
    * differ — ties and self-pairs carry no signal. One partitioned
    * window (judge-grain partitions, bounded by candidates per judge),
    * zero joins; (score, tieCol) must be unique per judge for a
    * deterministic order, which a unique event/row id provides.
    *
    * Returns (winner, loser) — one row per decided adjacent pair. */
  def adjacentPreferences(df: DataFrame, judgeCol: String,
      playerCol: String, scoreCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(judgeCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.select(col(judgeCol), col(playerCol), col(scoreCol), col(tieCol))
      .withColumn("__pk", lag(col(playerCol), 1).over(w))
      .withColumn("__ps", lag(col(scoreCol), 1).over(w))
      .filter(col("__pk").isNotNull && col("__ps") > col(scoreCol) &&
        col("__pk") =!= col(playerCol))
      .select(col("__pk").as("winner"), col(playerCol).as("loser"))
  }
}
