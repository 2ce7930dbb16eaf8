package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, functions => F}

/** Distributed build of multi-segment KV tables — the write half of
  * the connector. Where the reference's sled store is driver-written
  * row by row (`/root/reference/src/store/engine/sled.rs`), a
  * cluster-scale build must never materialize the table on the
  * driver: the frame is range-partitioned on the key (disjoint,
  * sorted segment key ranges), sorted within each partition, and each
  * TASK writes its own write-once segment via
  * [[KvSegment.writeSorted]] — per-task publish is atomic
  * (unique-tmp + rename), and task retries converge because the
  * deterministic sort makes every attempt byte-identical.
  *
  * The new segments get sequence numbers above every existing one, so
  * against prior segments they are "newer" as a group; among
  * themselves their key ranges are disjoint (range partitioning), so
  * relative order is irrelevant to newest-wins visibility.
  *
  * `dir` must be storage every executor can reach (shared filesystem
  * on a real cluster; any local path on local[*]). Keys must be
  * unique within the frame — [[KvSegment.writeSorted]] rejects
  * duplicates rather than picking a silent winner.
  */
object KvSegmentWriter {

  /** Write `df`'s (`keyCol`, `valueCol`) as `numSegments`
    * range-partitioned segments appended to the multi-segment table at
    * `dir`. Returns the published segment paths (ascending). Driver
    * memory: O(numSegments) paths — rows never leave the executors. */
  def writeDataFrame(df: DataFrame, dir: String, keyCol: String = "k",
      valueCol: String = "v", numSegments: Int = 4): Seq[String] = {
    new java.io.File(dir).mkdirs()
    val base = KvSegment.listSegments(dir).lastOption
      .map(p => new java.io.File(p).getName.stripSuffix(".seg").toInt)
      .getOrElse(0)
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(F.col(keyCol).cast("long").as("k"),
      F.col(valueCol).cast("string").as("v"))
    val parts = math.max(1, numSegments)
    val ranged =
      if (parts == 1) pairs.repartition(1)
      else pairs.repartitionByRange(parts, F.col("k"))
    ranged
      .sortWithinPartitions("k")
      .as[(Long, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = TaskContext.getPartitionId()
          val path = new java.io.File(dir, f"${base + pid + 1}%06d.seg").getPath
          KvSegment.writeSorted(path, it.toArray)
          Iterator.single(path)
        }
      }
      .collect().toSeq.sorted
  }
}
