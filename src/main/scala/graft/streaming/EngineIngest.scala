package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.GraftEngine

/** Streaming ingestion INTO the engine's managed KV store — the
  * bridge between the two halves of this library: a Structured
  * Streaming source drains micro-batches through `foreachBatch`, and
  * each batch lands as an engine-SQL `INSERT OVERWRITE` into a
  * `CREATE TABLE … USING KV` table.
  *
  * Exactly-once WITHOUT a commit log: Structured Streaming replays a
  * micro-batch whenever a failure lands between sink output and
  * checkpoint commit, so the sink must be idempotent. The managed KV
  * table's INSERT OVERWRITE is the LSM upsert (the appended segment
  * shadows equal keys newest-wins), so a replayed batch REWRITES the
  * same keys to the same values and the visible image converges —
  * byte-identical to the single-delivery run. That makes the pair
  * (replayable source, upsert sink) end-to-end exactly-once by the
  * standard foreachBatch idempotence argument, with the row identity
  * (the KV key) as the dedup handle. No driver-side state: the batch
  * frame goes through a temp view into the engine's distributed
  * INSERT…SELECT path, so rows travel executor→segment files.
  */
object EngineIngest {

  /** Upsert one micro-batch into managed KV table `table` (must be
    * `(k INT, v CHAR) USING KV`, schema selected via the engine
    * session). `keySql` / `valueSql` are SQL expressions over the
    * batch's columns. Idempotent: replaying the same batch converges. */
  def upsertBatch(eng: GraftEngine, table: String, batch: DataFrame,
      keySql: String, valueSql: String): Unit = {
    val view = s"__ingest_${table}_batch"
    // GLOBAL temp view: foreachBatch hands over a frame owned by a
    // per-micro-batch SESSION CLONE, whose local temp views the
    // engine's own session can't see — the global registry is the
    // one namespace the clone and the engine share.
    batch.createOrReplaceGlobalTempView(view)
    try eng.sql(
      s"insert overwrite into $table select $keySql, $valueSql from global_temp.$view")
    finally batch.sparkSession.catalog.dropGlobalTempView(view)
  }

  /** Drain a bounded stream into `table` with [[upsertBatch]] per
    * micro-batch (Trigger.AvailableNow, blocks until drained). */
  def ingestAvailableNow(eng: GraftEngine, table: String, stream: DataFrame,
      keySql: String, valueSql: String, checkpoint: String): StreamingQuery = {
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        upsertBatch(eng, table, b, keySql, valueSql)
      }
      .start()
    q.awaitTermination()
    q
  }
}
