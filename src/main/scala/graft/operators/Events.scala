package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics that run identically on batch DataFrames and
  * (where noted) Structured Streaming inputs. */
object Events {

  /** Tumbling-window counts/sums per event type. Streaming-safe: the same
    * expression works under `readStream` with a watermark on `tsCol`
    * (see graft.streaming.StreamOps). */
  def windowedStats(events: DataFrame, tsCol: String = "ts",
                    windowLength: String = "1 hour"): DataFrame =
    events.groupBy(
        window(col(tsCol), windowLength).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (batch form): a new session starts after
    * `gapSeconds` of inactivity per user. Single shuffle keyed by user;
    * the running sum is a narrow window cumulation within partitions.
    * Output: one row per session with bounds and size. */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 userCol: String = "user_id",
                 tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gap = unix_micros(col(tsCol)) - unix_micros(
      lag(col(tsCol), 1).over(byUser))
    val sessions = events
      .withColumn("new_session",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_index",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions.groupBy(col(userCol), col("session_index"))
      .agg(count(lit(1)).as("n_events"),
        min(col(idCol)).as("first_event_id"),
        max(col(idCol)).as("last_event_id"))
  }
}
