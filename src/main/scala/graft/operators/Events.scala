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

  /** Cohort retention: users grouped by their first-active period (the
    * cohort), counted as retained in each later period they act in —
    * the standard product/engagement table, and in corpus terms the
    * contributor-survival curve of a crawl source. Period index =
    * floor(epoch_micros / periodSeconds·10⁶) — pure integer division,
    * no float boundary for engines to disagree on.
    *
    * Scale shape: one distinct over (user, period), then everything is
    * keyed by user or by cohort — the user-keyed groupBy and the join
    * back share partitioning; no window, no driver scalars. Output:
    * (cohort, period_offset, n_active, cohort_size, retention), one
    * row per cohort × active offset (offset 0 is the cohort itself,
    * retention 1 by construction). */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts",
                       periodSeconds: Long = 7L * 86400L): DataFrame = {
    require(periodSeconds >= 1, "periodSeconds must be >= 1")
    val act = events.select(col(userCol).as("u"),
        expr(s"unix_micros($tsCol) div ${periodSeconds * 1000000L}")
          .as("p"))
      .distinct()
      .localCheckpoint(false)
    val firstSeen = act.groupBy(col("u")).agg(min(col("p")).as("cohort"))
    val sizes = firstSeen.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(firstSeen, Seq("u"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** Anchored funnel analysis: how far each user progresses through an
    * ordered sequence of event types, anchored at their FIRST
    * `steps(0)` event. Step k completes with the user's earliest
    * `steps(k)` event STRICTLY after step k−1's completion and within
    * `windowSeconds` of the anchor (first-touch attribution — the
    * deterministic product-analytics convention; a sliding-anchor
    * variant would need per-candidate chains). Progress stops at the
    * first missed step.
    *
    * Output: one row per user who entered the funnel:
    * (user, n_steps, completed). Cost: one (join + per-user min)
    * stage per step — each a single shuffle keyed by user; the event
    * scan is filtered to one type per stage so predicate pushdown
    * keeps every stage narrow. */
  def funnel(events: DataFrame, steps: Seq[String], windowSeconds: Long,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var frame = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__anchor"))
      .withColumn("__t_prev", col("__anchor"))
      .withColumn("n_steps", lit(1))
    steps.drop(1).foreach { st =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts"))
      // __t_prev is null once a step was missed: the chain stays dead
      frame = frame.join(nxt, Seq(userCol), "left")
        .withColumn("__ok", col("__t_prev").isNotNull &&
          col("__ts") > col("__t_prev") &&
          col("__ts") <= col("__anchor") +
            expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy(col(userCol), col("__anchor"), col("__t_prev"),
          col("n_steps"))
        .agg(min(when(col("__ok"), col("__ts"))).as("__t_next"))
        .withColumn("n_steps",
          col("n_steps") + when(col("__t_next").isNotNull, 1).otherwise(0))
        .withColumn("__t_prev", col("__t_next"))
        .drop("__t_next")
    }
    frame.select(col(userCol), col("n_steps"),
      (col("n_steps") === steps.length).as("completed"))
  }

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
