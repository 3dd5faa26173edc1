package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY.md §1.4: nothing in the
  * reference streams — this exposes the events table's shape through
  * `readStream` as the beyond-reference capability).
  *
  * The transforms are plain Dataset functions so the SAME code runs in
  * batch (events parquet) and streaming (readStream/Kafka) — the Spark
  * unified-API contract. Watermarks bound state; windows are tumbling.
  */
object StreamingOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionState(start: Long, lastTs: Long, n: Int,
                                sumValue: Double)

  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Int,
                           sum_value: Double)

  /** Hourly tumbling-window counts per event type, watermarked so state
    * for closed windows is dropped — the streaming form of the batch
    * `window_hourly` oracle query. */
  def hourlyCounts(events: DataFrame,
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup for a training-data ingest pipeline: drop
    * rows whose `idCols` were already seen within the watermark horizon
    * (state is bounded by the watermark — unbounded exact dedup on an
    * infinite stream is unbounded state by definition). Batch callers
    * get plain dropDuplicates semantics from the same transform. */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom
    * stateful operator the built-in windows can't express. Emits a
    * session when `gapMs` of event-time silence passes (or on state
    * timeout in streaming mode). */
  def sessionize(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          // Events arrive unordered within a trigger: sort by event time.
          val evs = it.toSeq.sortBy(_.ts.getTime)
          var out = List.empty[Session]
          var cur = state.getOption
          evs.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastTs <= gapMs =>
                cur = Some(s.copy(lastTs = t, n = s.n + 1,
                  sumValue = s.sumValue + e.value))
              case Some(s) =>
                out ::= Session(uid, s.start, s.lastTs, s.n, s.sumValue)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => ()
          }
          out.reverseIterator
      }
  }

  /** Flush any open sessions (batch-mode finalization helper): run
    * sessionize then append one session per remaining state by treating
    * the max timestamp as end-of-stream. In batch mode Spark invokes the
    * function once per key with all data, so open sessions are simply the
    * per-key tail — emit them by appending a sentinel flush. */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ListBuffer.empty[Session]
        var cur: Option[SessionState] = None
        evs.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs =>
              cur = Some(s.copy(lastTs = t, n = s.n + 1,
                sumValue = s.sumValue + e.value))
            case Some(s) =>
              out += Session(uid, s.start, s.lastTs, s.n, s.sumValue)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach(s =>
          out += Session(uid, s.start, s.lastTs, s.n, s.sumValue))
        out.iterator
      }
  }
}
