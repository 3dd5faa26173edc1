package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared synthetic event feed for the streaming scale/bench
  * drivers ([[StreamScale]], [[graft.StreamBench]]): ~40 events/user
  * on an hourly lattice with a uniform [0, 60) min jitter, so
  * consecutive per-user gaps are triangular on (0, 120) min and ~7/8
  * of them exceed a 30-min session gap (~35 sessions/user — sessions
  * of 1-2 events dominate, which maximizes session-state churn per
  * event, the stressful direction). Every 4000th event is a
  * "signup" (500 incidents at the 2M tier — the rate that keeps the
  * interval-join pair output ~6M rows, not 625M) so the interval-join
  * pipelines have a real interval side. Global order is by sequence
  * number, so slicing the range into quarters yields TIME-ORDERED
  * files — the shape a real ingest directory has — while within-file
  * order is free.
  */
object StreamFeed {

  val BaseMs = 1700000000000L

  def gen(spark: SparkSession, nEvents: Long,
          nUsers: Long): DataFrame =
    spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_millis(lit(BaseMs) +
        floor(col("id") / lit(nUsers)).cast("long") * lit(3600000L) +
        pmod(xxhash64(col("id")), lit(3600000L))).as("ts"),
      pmod(col("id"), lit(nUsers)).as("user_id"),
      when(pmod(col("id"), lit(4000)) === 0, "signup")
        .otherwise("click").as("event_type"),
      (pmod(xxhash64(col("id"), lit(7)), lit(8)).cast("double") *
        lit(0.25)).as("value"))

  /** Stage `quarters` time-ordered quarter files plus two far-future
    * sentinel files (the first advances the watermark past every real
    * session/window, the second's batch then runs timeout/emission
    * under that advanced watermark — so a full append-mode flush
    * never depends on a trailing no-data micro-batch).
    *
    * `byTs = false` slices by event_id — fine for the wide-watermark
    * gates, but ts is only hour-granular in id order (uniform 0-60 min
    * jitter within an hour block), so adjacent id slices overlap by up
    * to ~1 h of EVENT time: under a tight watermark, boundary-block
    * rows arriving in slice k+1 with ts < maxTs(slice k) − watermark
    * are silently dropped as late (r12 ADVICE). `byTs = true` slices
    * by equal ts ranges instead — slice k's earliest timestamp is ≥
    * slice k-1's latest, the same no-late-rows construction as the
    * `interval_join_evict_state` registry gate — so a tight-watermark
    * replay over these files is lossless, at the cost of one min/max
    * aggregation job over `all` at staging time. */
  def mkSrc(spark: SparkSession, all: DataFrame, nEvents: Long,
            dir: String, quarters: Int, byTs: Boolean = false): Unit = {
    import spark.implicits._
    val sliceOf: Int => org.apache.spark.sql.Column =
      if (byTs) {
        val mm = all.agg(min(col("ts")).cast("long").as("lo"),
          max(col("ts")).cast("long").as("hi")).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val span = math.max(1L, hi - lo + 1)
        val bucket = least(lit(quarters - 1),
          ((col("ts").cast("long") - lit(lo)) *
            lit(quarters.toLong) / lit(span)).cast("int"))
        // Assert slice non-emptiness at STAGING time (r13 ADVICE): a
        // skewed ts distribution that lands a slice empty would stage
        // a 0-row file → a numInputRows=0 batch → the caller's
        // data-batch-count assertion fails far from the cause. One
        // counting aggregation here names the empty slices instead.
        val present = all.select(bucket.as("q")).groupBy("q").count()
          .collect().map(r => r.getInt(0)).toSet
        val emptySlices = (0 until quarters).filterNot(present)
        require(emptySlices.isEmpty,
          s"mkSrc(byTs=true): ts slices ${emptySlices.mkString(",")} " +
            s"of $quarters are empty — the event-time distribution " +
            "is too skewed for equal-ts-range slicing at this count")
        q => bucket === lit(q)
      } else {
        q => col("event_id") >= lit(q * nEvents / quarters) &&
          col("event_id") < lit((q + 1) * nEvents / quarters)
      }
    (0 until quarters).foreach { q =>
      graft.streaming.StreamStage.stageFile(
        all.where(sliceOf(q)),
        dir, f"q$q%02d", 1000000000000L + q * 2000L)
    }
    def sentinel(k: Int) = Seq(graft.streaming.StreamingOps.Event(
      -1L - k,
      new java.sql.Timestamp(BaseMs + (10L + k) * 365 * 86400000L),
      -1L, "sentinel", 0.0)).toDF()
    graft.streaming.StreamStage.stageFile(sentinel(0), dir,
      "z_sentinel0", 1000000000000L + (quarters + 10) * 2000L)
    graft.streaming.StreamStage.stageFile(sentinel(1), dir,
      "z_sentinel1", 1000000000000L + (quarters + 11) * 2000L)
  }
}
