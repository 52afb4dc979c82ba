package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming exact dedup: first event per key wins (a replayed event
    * with a different timestamp is still a duplicate); state expires with
    * the watermark so memory is bounded by the dedup horizon. */
  def dedupByKey(events: DataFrame, keyCols: Seq[String],
                 tsCol: String = "ts",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Input/output/state rows for streaming sessionization. */
  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionOut(user_id: Long, session_index: Long, n_events: Long,
                        first_event_id: Long, last_event_id: Long)
  case class SessionState(sessionIndex: Long, firstTsMicros: Long,
                          lastTsMicros: Long, n: Long, firstId: Long,
                          lastId: Long)

  /** Streaming gap sessionization — the `flatMapGroupsWithState` form of
    * `Events.sessionize`. State is one open session per user (constant
    * per key); a session closes and is EMITTED either when a later event
    * arrives past the gap, or when the event-time timeout fires after the
    * watermark passes `gap` beyond its last event. Requires a watermark
    * on `ts` upstream. */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, s.sessionIndex, s.n, s.firstId, s.lastId))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                // within-gap of the open session's span (a late event may
                // precede lastTs but must still be within gap of the
                // session START to belong to it, like the batch operator)
                case Some(s) if t - s.lastTsMicros <= gapMicros &&
                    s.firstTsMicros - t <= gapMicros =>
                  // ids are min/max like the batch operator; the span
                  // never moves backwards
                  open = Some(s.copy(
                    firstTsMicros = math.min(s.firstTsMicros, t),
                    lastTsMicros = math.max(s.lastTsMicros, t),
                    n = s.n + 1,
                    firstId = math.min(s.firstId, e.event_id),
                    lastId = math.max(s.lastId, e.event_id)))
                // a straggler older than the open session by more than the
                // gap: it is its own (already closed) session; session
                // INDEX order can diverge from a batch replay here — true
                // chronological renumbering would require buffering the
                // whole watermark horizon
                case Some(s) if s.firstTsMicros - t > gapMicros =>
                  closed += SessionOut(userId, s.sessionIndex, 1,
                    e.event_id, e.event_id)
                  open = Some(s.copy(sessionIndex = s.sessionIndex + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionIndex, s.n,
                    s.firstId, s.lastId)
                  open = Some(SessionState(s.sessionIndex + 1, t, t, 1,
                    e.event_id, e.event_id))
                case None =>
                  open = Some(SessionState(1L, t, t, 1,
                    e.event_id, e.event_id))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes its gap
              state.setTimeoutTimestamp(s.lastTsMicros / 1000 + gapSeconds * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
