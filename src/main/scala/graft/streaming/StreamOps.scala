package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's operators.
  *
  * The parity core (`graft.Functioniser`) is a stateless narrow projection
  * and therefore works on streaming DataFrames unchanged — see
  * `StreamingSpec`. The operators here are the stateful ones that need
  * watermarks.
  *
  * Scale notes: all state is keyed and bounded by the watermark; nothing
  * here holds unbounded per-key state. Output mode `update`/`append` both
  * work for the windowed aggregate depending on sink semantics.
  */
object StreamOps {

  /** Watermarked tumbling-window stats per event type — the streaming
    * form of `Events.windowedStats`. */
  def windowedStats(events: DataFrame, tsCol: String = "ts",
                    windowLength: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: first event per key wins; state expires with
    * the watermark so memory is bounded by the dedup horizon. */
  def dedupByKey(events: DataFrame, keyCols: Seq[String],
                 tsCol: String = "ts",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)
}
