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
}
