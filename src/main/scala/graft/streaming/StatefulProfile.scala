package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running profile through Spark 4's arbitrary-state
  * operator (`transformWithState`, SPARK-46815) — the successor API
  * to `flatMapGroupsWithState` that this library's sessionization
  * already exercises. The processor keeps TWO typed state variables
  * per user key: a `ValueState` with the running (count, cents sum,
  * cents max) triple and a `MapState` with per-event-type counts —
  * the online feature-store shape (running aggregates a model server
  * reads at request time).
  *
  * Every emitted row carries the CUMULATIVE state, and every state
  * transition is commutative over input rows, so the per-user row
  * with the highest n_events is the final profile regardless of how
  * a bounded source's rows split into micro-batches — that is what
  * makes a drained AvailableNow run equal a plain batch GROUP BY and
  * lets the DuckDB oracle gate the RocksDB state path end to end.
  *
  * Scale shape: state is O(users + users·event_types) in the state
  * store (RocksDB — transformWithState's required provider), input
  * rows stream through one shuffle on the grouping key, and each
  * micro-batch emits at most one row per user seen in it.
  */
object StatefulProfile {

  case class EventIn(user_id: Long, event_type: String, cents: Long)
  case class Agg(n: Long, sum: Long, mx: Long)
  case class ProfileOut(user_id: Long, n_events: Long, n_types: Long,
      total_cents: Long, max_cents: Long)

  class Processor extends StatefulProcessor[Long, EventIn, ProfileOut] {
    @transient private var agg: ValueState[Agg] = _
    @transient private var types: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[Agg]("agg",
        Encoders.product[Agg], TTLConfig.NONE)
      types = getHandle.getMapState[String, Long]("types",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[ProfileOut] = {
      var cur = if (agg.exists()) agg.get() else Agg(0L, 0L, Long.MinValue)
      rows.foreach { e =>
        val c = if (types.containsKey(e.event_type))
          types.getValue(e.event_type) else 0L
        types.updateValue(e.event_type, c + 1L)
        cur = Agg(cur.n + 1L, cur.sum + e.cents, math.max(cur.mx, e.cents))
      }
      agg.update(cur)
      Iterator.single(
        ProfileOut(key, cur.n, types.keys().size.toLong, cur.sum, cur.mx))
    }
  }

  /** events → cumulative per-user profile emissions (one per user per
    * micro-batch that touched the user). */
  def userProfiles(events: Dataset[EventIn]): Dataset[ProfileOut] = {
    implicit val outEnc = Encoders.product[ProfileOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }

  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, cents: Long)
  case class Running(n: Long, sum: Long, lastTs: Long)
  case class Closed(user_id: Long, n_events: Long, total_cents: Long,
      closed_at: Long)

  /** Event-time TIMER path of the same API: per-user state plus an
    * inactivity timer re-armed at last_ts + gap on every arrival.
    * When the watermark passes the armed instant,
    * `handleExpiredTimer` emits the closed profile and clears the
    * state — the production state-eviction shape (unbounded key
    * spaces stay bounded because idle keys evict themselves), which
    * TTLConfig alone can't express when the deadline is event-time.
    * Emission happens ONLY on expiry, so output order is governed by
    * watermark advancement, not micro-batching. */
  class InactivityEvictProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEvent, Closed] {
    @transient private var agg: ValueState[Running] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[Running]("agg",
        Encoders.product[Running], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[Closed] = {
      var cur = if (agg.exists()) agg.get() else Running(0L, 0L, Long.MinValue)
      rows.foreach { e =>
        cur = Running(cur.n + 1L, cur.sum + e.cents,
          math.max(cur.lastTs, e.ts.getTime))
      }
      agg.update(cur)
      // one live timer per key: re-arm at the new inactivity deadline.
      // Materialize the timer list BEFORE deleting — mutating timer
      // state while iterating the state-store-backed iterator is
      // implementation-defined.
      getHandle.listTimers().map(_.asInstanceOf[Long]).toList
        .foreach(getHandle.deleteTimer)
      getHandle.registerTimer(cur.lastTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Closed] = {
      val cur = agg.get()
      agg.clear()
      Iterator.single(Closed(key, cur.n, cur.sum,
        expiredTimerInfo.getExpiryTimeInMs()))
    }
  }

  /** timed events (must carry a watermark on `ts`) → profiles closed
    * by event-time inactivity. */
  def evictedProfiles(events: Dataset[TimedEvent],
      gapMs: Long): Dataset[Closed] = {
    implicit val outEnc = Encoders.product[Closed]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new InactivityEvictProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
