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

  /** Times are epoch-MICROseconds — the native precision of both a
    * Spark TimestampType and the DuckDB oracle's `ts - lag(ts)`
    * comparison. Folding at ms (Timestamp.getTime) silently merged
    * gaps in (gap, gap+1ms] that the oracle split. */
  final case class SessionState(start: Long, lastTs: Long, n: Int,
                                sumValue: Double)

  /** session_start / session_end are epoch-microseconds (see
    * [[SessionState]]). */
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Int,
                           sum_value: Double)

  /** Epoch micros of a Timestamp: getTime already carries the ms part
    * of nanos, so only the sub-ms remainder is added. */
  def epochUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Streaming point-in-interval join — the streaming form of
    * [[graft.operators.RelationalOps.pointInIntervalJoin]] (the
    * `range_join` query): points stream-stream-joined to the windows
    * a second stream opens, e.g. "all events inside each error's
    * 10-minute incident window", emitted continuously.
    *
    * Same grain-bucketed rewrite as the batch form — the interval
    * side is exploded to every `grainSec` bucket it touches and the
    * join carries a bucket EQUALITY key, so the state store is probed
    * per bucket instead of scanning every buffered interval per point
    * (the no-equi-key stream-stream join Spark would otherwise run).
    * Both sides are watermarked, and the join condition spells the
    * point's time range out against `loCol` literally
    * (`pt BETWEEN lo AND lo + windowDur`) — the analyzer derives
    * state-eviction bounds from exactly this shape, which is why the
    * streaming form takes a DURATION, not a precomputed hi column the
    * engine could not reason about.
    *
    * Output columns: both sides' (minus the internal bucket keys),
    * plus `hi` = `lo + windowDur`. Append-mode safe (inner join).
    *
    * @param windowDur SQL interval literal body, e.g. "10 minutes"
    * @param watermark lateness horizon for BOTH sides */
  def streamingPointInIntervalJoin(points: DataFrame, ptCol: String,
                                   intervals: DataFrame, loCol: String,
                                   windowDur: String, grainSec: Long,
                                   watermark: String = "20 minutes")
      : DataFrame = {
    require(grainSec > 0, s"grainSec must be positive, got $grainSec")
    def grain(c: org.apache.spark.sql.Column) =
      floor(c.cast("long") / lit(grainSec)).cast("long")
    val hi = col(loCol) + expr(s"INTERVAL $windowDur")
    val p = points.withWatermark(ptCol, watermark)
      .withColumn("__pg", grain(col(ptCol)))
    val i = intervals.withWatermark(loCol, watermark)
      .withColumn("hi", hi)
      .withColumn("__ig", explode(sequence(grain(col(loCol)),
        grain(col("hi")))))
    p.join(i, col("__pg") === col("__ig") &&
        col(ptCol) >= col(loCol) &&
        col(ptCol) <= col(loCol) + expr(s"INTERVAL $windowDur"))
      .drop("__pg", "__ig")
  }

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

  /** One-pass session fold over a key's time-sorted trigger events.
    * Late events (t < lastTs — only possible across triggers, since
    * each trigger's batch is sorted) must NOT move `lastTs` backwards:
    * the pre-fix fold did, so an on-time successor could wrongly split
    * the session. A late event lands in one of three regimes:
    *  - t ≥ lastTs (on time): extend or, past the gap, close-and-open.
    *  - start - gap ≤ t < lastTs: inside/adjacent to the current
    *    session — fold it in, keep `lastTs` (start extends down).
    *  - t < start - gap: stale beyond the merge horizon (its session
    *    may already be emitted) — emit it as a singleton session rather
    *    than corrupting the current one.
    */
  private[streaming] def foldSorted(uid: Long, evs: Seq[Event],
                                    init: Option[SessionState],
                                    gapUs: Long)
      : (List[Session], Option[SessionState]) = {
    var out = List.empty[Session]
    var cur = init
    // Since evs is sorted ascending, every late event (t < the CARRIED
    // state's lastTs — only possible across triggers) forms a prefix.
    // Judge that prefix against the carried session FIRST, newest-
    // first so each merge lowers `start` before staler events are
    // judged against it. The pre-fix design deferred late events to
    // AFTER the on-time fold and judged them against the final
    // session — wrong whenever an on-time event had meanwhile CLOSED
    // the carried session: a late event inside the carried session's
    // merge horizon was emitted as a spurious singleton instead of
    // extending the (already-emitted) session it belonged to.
    val initLast = init.map(_.lastTs).getOrElse(Long.MinValue)
    val (latePrefix, onTime) = evs.span(e => epochUs(e.ts) < initLast)
    latePrefix.reverse.foreach { e =>
      val t = epochUs(e.ts)
      cur match {
        case Some(s) if t >= s.start - gapUs =>
          cur = Some(s.copy(start = math.min(s.start, t), n = s.n + 1,
            sumValue = s.sumValue + e.value))
        case _ => // stale beyond the merge horizon: singleton
          out ::= Session(uid, t, t, 1, e.value)
      }
    }
    onTime.foreach { e =>
      val t = epochUs(e.ts)
      cur match {
        case Some(s) if t < s.lastTs =>
          // impossible for sorted input (the late prefix was peeled
          // off above and on-time folds only move lastTs forward) —
          // fail loudly rather than corrupt session boundaries
          throw new IllegalStateException(
            s"foldSorted: unsorted event $t < lastTs ${s.lastTs}")
        case Some(s) if t - s.lastTs <= gapUs =>
          cur = Some(s.copy(lastTs = t, n = s.n + 1,
            sumValue = s.sumValue + e.value))
        case Some(s) => // t > lastTs + gap
          out ::= Session(uid, s.start, s.lastTs, s.n, s.sumValue)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    (out.reverse, cur)
  }

  /** Gap-based sessionization via flatMapGroupsWithState — the custom
    * stateful operator the built-in windows can't express. A session is
    * emitted when `gapMs` of event-time silence passes: either an
    * on-time successor arrives past the gap, or (streaming) the
    * event-time TIMEOUT fires once the watermark passes
    * `lastTs + gapMs` — so idle keys flush and state is bounded by the
    * watermark instead of growing forever (the pre-fix NoTimeout form
    * kept every key's state for the life of the query). */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark)
      else events
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              Session(uid, s.start, s.lastTs, s.n, s.sumValue))
          } else {
            // Events arrive unordered within a trigger: sort by time
            // (micros — ms ordering could interleave same-ms events).
            val evs = it.toSeq.sortBy(e => epochUs(e.ts))
            val (closed, cur) = foldSorted(uid, evs, state.getOption,
              gapMs * 1000L)
            cur match {
              case Some(s) if streaming =>
                state.update(s)
                // state times are micros; the timeout clock is ms —
                // round UP so the timeout never fires before lastTs+gap
                state.setTimeoutTimestamp(
                  math.max((s.lastTs + gapMs * 1000L + 999L) / 1000L,
                    state.getCurrentWatermarkMs() + 1))
                closed.iterator
              case Some(s) =>
                // Batch input is complete, so the open tail session is
                // final — emit it. (Batch execution discards state and
                // never fires a timeout; updating state here silently
                // dropped every key's last session, contra the
                // same-code-in-batch contract.)
                closed.iterator ++ Iterator.single(
                  Session(uid, s.start, s.lastTs, s.n, s.sumValue))
              case None => closed.iterator
            }
          }
      }
  }

  /** Flush any open sessions (batch-mode finalization helper): in batch
    * mode Spark invokes the function once per key with all data, so open
    * sessions are simply the per-key tail — emit them after the fold. */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toSeq.sortBy(e => epochUs(e.ts))
        val (closed, cur) = foldSorted(uid, evs, None, gapMs * 1000L)
        (closed ++ cur.map(s =>
          Session(uid, s.start, s.lastTs, s.n, s.sumValue))).iterator
      }
  }
}
