package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: per-key hourly grid generation with
  * last-observation-carried-forward fill — the feature-store /
  * monitoring resample shape (the reference has no temporal
  * operators; this is Spark-native extension surface, the batch twin
  * of the streaming windowed aggregates).
  */
object Resample {

  private val HourMs = 3600000L

  /** Densify per-key hourly observations `(key, hour_ms, value)` onto
    * a contiguous hourly grid spanning each key's observed range and
    * carry the last observed value forward into silent hours.
    * Returns (key, hour_ms, observed ∈ {0,1}, filled_value).
    *
    * Scale shape: the grid explode is narrow per key (rows are
    * GENERATED in place, no shuffle to build them), the fill is one
    * key-partitioned running window — no unpartitioned ordering
    * anywhere.
    *
    * `maxGridHours` caps the generated grid length per key. Uncapped
    * (the default, `Long.MaxValue`) the grid is the key's full
    * [min, max] hour span — bounded per key and correctly
    * partitioned, but ONE sparse ten-year key emits ~87k generated
    * rows for 2 observations and inflates its own partition. With a
    * cap the grid keeps the LATEST `maxGridHours` hours ending at the
    * key's last observation; observations older than the capped
    * window are dropped with it, so the fill starts NULL until the
    * first in-window observation. */
  def resampleHourlyLocf(hours: DataFrame, keyCol: String,
      hourMsCol: String, valueCol: String,
      maxGridHours: Long = Long.MaxValue): DataFrame = {
    val span = hours.groupBy(col(keyCol))
      .agg(min(col(hourMsCol)).as("__h0"), max(col(hourMsCol)).as("__h1"))
    // Any cap at or beyond Long.MaxValue / HourMs hours would overflow
    // (maxGridHours - 1) * HourMs, flip gridStart negative, and make
    // greatest() silently IGNORE the cap — treat such caps as the
    // uncapped grid they semantically are (≈ 10^12 hours ≫ any span).
    val gridStart =
      if (maxGridHours >= Long.MaxValue / HourMs) col("__h0")
      else greatest(col("__h0"),
        col("__h1") - lit((maxGridHours - 1L) * HourMs))
    val grid = span.select(col(keyCol),
      explode(sequence(gridStart, col("__h1"), lit(HourMs)))
        .as(hourMsCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(hourMsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hours.select(col(keyCol), col(hourMsCol), col(valueCol)),
        Seq(keyCol, hourMsCol), "left")
      .select(col(keyCol), col(hourMsCol),
        col(valueCol).isNotNull.cast("long").as("observed"),
        last(col(valueCol), ignoreNulls = true).over(w)
          .as("filled_value"))
  }

  /** Rolling z-score anomaly detection over an integer-valued event
    * stream, reported per key: each event is compared against the
    * mean/stddev of the `window` events IMMEDIATELY BEFORE it within
    * its (key, day) partition, and flagged when it sits more than
    * `zThresh` sample standard deviations from that trailing mean —
    * the monitoring / data-drift gate a training-data ingest pipeline
    * runs on its telemetry before trusting a day's feed.
    *
    * Exactness: the z-test is evaluated in INTEGER arithmetic, never
    * floats. With trailing-frame count n, sum S, and sum of squares
    * Q over integer values x (pass values as fixed-point, e.g.
    * cents), `|x-μ| > z·σ_sample` is equivalent to
    * `(n·x − S)² · (n−1) > z² · n · (n·Q − S²)`, every term a Long —
    * summation-order-independent, so Spark's partitioned window and
    * the oracle's serial one agree bit-for-bit (no stddev-of-doubles
    * ulp hazard). Overflow bound: |values| ≤ V needs
    * z²·n²·(nQ−S²) ≲ z²·n³·V² < 2⁶³ — V to ~10⁷ at window 50, far
    * past fixed-point telemetry. Events with fewer than `minN`
    * predecessors in frame (start of each day) are counted but not
    * scored — a deliberately replayable cold-start rule.
    *
    * Scale shape: ONE window pass, partitioned by (key, day) — the
    * day split is what makes this 100-TB-safe: a global per-key
    * ordering would serialize each key's full history through one
    * task, while (key, day) bounds every partition at a day's volume
    * and loses only the first `window` events of each day to the
    * cold-start rule (documented, replayed by the oracle). Ordering
    * within the frame is (ts, id) with `id` a unique tiebreaker, so
    * frame MEMBERSHIP is deterministic under timestamp ties. The
    * report is a partial-combined per-key aggregate on top — no
    * second shuffle of event-sized data.
    *
    * Returns (key, n_events, n_scored, n_anomalies, sum_anom_value)
    * ordered by key. */
  def rollingAnomalyReport(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, valueCol: String,
      window: Int = 50, minN: Int = 20, zThresh: Int = 3): DataFrame = {
    require(window >= 2, s"window $window must be >= 2")
    require(minN >= 2 && minN <= window,
      s"minN $minN must be in [2, window]")
    val w = Window
      .partitionBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    val x = col(valueCol).cast("long")
    val n = count(x).over(w)
    val s = sum(x).over(w)
    val q = sum(x * x).over(w)
    val lhs = (n * x - s) * (n * x - s) * (n - lit(1L))
    val rhs = lit(zThresh.toLong * zThresh) * n * (n * q - s * s)
    val scored = events.select(col(keyCol), x.as("__x"),
      (n >= minN).as("__scored"),
      (n >= minN && lhs > rhs).as("__anom"))
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__scored").cast("long")).as("n_scored"),
        sum(col("__anom").cast("long")).as("n_anomalies"),
        coalesce(sum(when(col("__anom"), col("__x"))), lit(0L))
          .as("sum_anom_value"))
      .orderBy(col(keyCol))
  }
}
