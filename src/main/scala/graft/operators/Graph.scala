package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative bipartite-graph importance scoring — the crawl-side
  * quality signal of a training-data pipeline (which items/pages are
  * authoritative, which actors are good hubs), computed as a
  * fixed-depth, engine-replayable iteration.
  */
object Graph {

  /** Fixed-iteration HITS (Kleinberg 1999, "Authoritative sources in
    * a hyperlinked environment") over a bipartite edge list:
    * `srcCol` is the hub side, `dstCol` the authority side. Each
    * half-step is the exact integer sum of the opposite side's
    * scores followed by L∞ normalization back to 1e6 micros
    * (`round(1e6·raw/max(raw))`) — normalization choice is free in
    * HITS, and max-normalization needs no libm, so the whole
    * trajectory is integer state with one deterministic double
    * divide per half-step that any engine replays bit-for-bit.
    *
    * Scale shape: per round, two hash joins of the edge table
    * against the O(nodes) score frames, two partial-aggregated sums,
    * and a broadcast 1-row max — the Pregel-lite iterative-graph
    * shape. No driver action inside the loop; plan depth is
    * O(rounds), fixed and small, so no lineage truncation is needed.
    * The deduplicated edge table persists across its 2·rounds+1
    * consumers.
    *
    * Returns (dstCol, auth_micro, degree): the authority-side score
    * after `rounds` full iterations plus the in-degree. */
  def hitsMicro(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds $rounds must be >= 1")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def normed(raw0: DataFrame, kCol: String, vCol: String): DataFrame = {
      // persist the O(nodes) pre-norm frame: it feeds BOTH the scalar
      // max and the normalized output, and without the cache each
      // round's two consumers would replay every earlier round —
      // exponential recompute in `rounds` (measured: 45.7s -> 13.4s
      // at sf0.1 for rounds = 3, REPS-2 bench totals)
      val raw = raw0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mx = raw.agg(max(col(vCol)).as("__mx"))
      raw.crossJoin(broadcast(mx))
        .select(col(kCol),
          round(col(vCol).cast("double") * lit(1000000.0) /
            col("__mx").cast("double"), 0).cast("long").as(vCol))
    }
    var auth = e.select(col("__d")).distinct()
      .select(col("__d"), lit(1000000L).as("__a"))
    (1 to rounds).foreach { _ =>
      val hub = normed(
        e.join(auth, "__d").groupBy(col("__s"))
          .agg(sum(col("__a")).as("__h")), "__s", "__h")
      auth = normed(
        e.join(hub, "__s").groupBy(col("__d"))
          .agg(sum(col("__h")).as("__a")), "__d", "__a")
    }
    val deg = e.groupBy(col("__d")).agg(count(lit(1)).as("degree"))
    auth.join(deg, "__d")
      .select(col("__d").as(dstCol), col("__a").as("auth_micro"),
        col("degree"))
  }
}
