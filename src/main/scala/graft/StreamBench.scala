package graft

import graft.examples.StreamFeed
import graft.operators.RelationalOps
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-round streaming throughput row (r9 verdict item 5): the five
  * `*_state` driver gates are timed only at sf0.1, where a streaming
  * query is ~launch cost, so a throughput regression in the streaming
  * machinery itself would go unnoticed between the one-off
  * STREAM_SCALE runs. This main drives each gate's pipeline SHAPE
  * through the real runtime at the 2M-event tier (checkpointed sinks,
  * AvailableNow, the shared [[StreamFeed]] quarter-file feed), twice
  * each with fresh checkpoints, alongside its batch-equivalent on the
  * same rows — and emits ONE diffable JSON file per round
  * (`BENCH_STREAM_r{N}.json`, committed) with streamed [min,max],
  * batch seconds, the streamed/batch ratio, and row-count parity.
  *
  * Ratios here are expected WELL above 1: a streamed AvailableNow
  * drain pays 6 micro-batch plan/commit cycles and a checkpointed
  * state store against a single batch plan. The number that must not
  * drift round-over-round is the streamed seconds at fixed feed size.
  *
  * Run: `SPARK_GRAFT_CPUS=16 sbt "runMain graft.StreamBench
  * [nEvents] [outPath] [nUsers]"` — defaults 2e6 / BENCH_STREAM.json /
  * 5e4. Scale tiers should grow nUsers WITH nEvents (the committed 10M
  * tier uses 250k users): sessionize/dedup state is user-keyed, so a
  * fixed user set would measure event throughput at constant state and
  * miss the axis that actually breaks providers at 100 TB — key
  * cardinality. */
object StreamBench {

  // Locale.ROOT (advisory r10): the f"" interpolator uses the default
  // locale — a comma-decimal host would emit unparseable JSON.
  private def f2(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(2000000L)
    val outPath = args.lift(1).getOrElse("BENCH_STREAM.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // State-store provider A/B (r10 verdict item 6): the default
    // HDFS-backed provider keeps ALL state as in-heap per-executor
    // maps — fine at the 2M-event tier, memory-bound at 100-TB key
    // cardinalities. RocksDB spills state to local disk with a
    // bounded block cache, which is the 100-TB provider choice; this
    // switch lets the same harness measure both so the throughput
    // tax of the scalable provider is a committed number, not a
    // guess. Values: "hdfs" (default) | "rocksdb".
    val provider = graft.streaming.StateProvider.fromEnv()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val nUsers = args.lift(2).map(_.toLong).getOrElse(50000L)
    val gapMs = 30L * 60000
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_streambench").toString
    val all = StreamFeed.gen(spark, nEvents, nUsers)
    val evSchema = all.schema
    StreamFeed.mkSrc(spark, all, nEvents, s"$tmp/src", 4)
    // one materialized copy for the batch equivalents, so their
    // timings measure the operator, not range() regeneration
    all.write.mode("overwrite").parquet(s"$tmp/batch_in")
    val allP = spark.read.parquet(s"$tmp/batch_in")

    def src(): DataFrame = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src")

    var runSeq = 0
    /** One streamed AvailableNow drain into a fresh checkpoint+sink;
      * returns (seconds, sink row count after `countWhere`).
      *
      * Sentinel exclusion happens at SINK-READ time, never inside the
      * streaming query: a filter on a grouping column (event_type)
      * pushes below the EventTimeWatermark operator, so the sentinel
      * rows would never advance the watermark and the last
      * `watermark` hours of windows would silently not flush
      * (measured: 76 of 82 windows; typed operators like
      * mapGroupsWithState block the pushdown, which is why the
      * sessionize pipeline was immune — the untyped agg was not). */
    def drain(build: DataFrame => DataFrame,
              countWhere: Option[String]): (Double, Long, Long, Long) = {
      runSeq += 1
      val tag = s"r$runSeq"
      val q = build(src())
        .writeStream.format("parquet")
        .option("path", s"$tmp/out_$tag")
        .option("checkpointLocation", s"$tmp/ckpt_$tag")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      require(q.awaitTermination(600000), s"$tag hung")
      val secs = (System.nanoTime() - t0) / 1e9
      // Peak state footprint across the drain's micro-batches, summed
      // over stateful operators: numRowsTotal is provider-neutral;
      // memoryUsedBytes is the provider's own accounting (in-heap map
      // bytes for HDFS-backed, block-cache+memtable for RocksDB — the
      // r11 provider table reads them side by side). AvailableNow at
      // maxFilesPerTrigger=1 yields ~6 batches, well inside
      // recentProgress's retention.
      val (stRows, stBytes) = q.recentProgress.foldLeft((0L, 0L)) {
        case ((r, b), p) =>
          val ops = p.stateOperators
          (math.max(r, ops.map(_.numRowsTotal).sum),
            math.max(b, ops.map(_.memoryUsedBytes).sum))
      }
      val sink = spark.read.parquet(s"$tmp/out_$tag")
      (secs, countWhere.fold(sink)(sink.where).count(), stRows, stBytes)
    }
    def timeBatch(df: => DataFrame): (Double, Long) = {
      df.write.format("noop").mode("overwrite").save() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, df.count())
    }

    final case class GateRow(name: String, sMin: Double, sMax: Double,
                             b: Double, streamedRows: Long,
                             batchRows: Long, stateRows: Long,
                             stateBytes: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[GateRow]
    def gate(name: String, build: DataFrame => DataFrame,
             batch: => DataFrame,
             countWhere: Option[String] = None): Unit = {
      val (s1, r1, sr1, sb1) = drain(build, countWhere)
      val (s2, r2, sr2, sb2) = drain(build, countWhere)
      require(r1 == r2, s"$name: nondeterministic sink rows $r1/$r2")
      val (b, br) = timeBatch(batch)
      rows += GateRow(name, math.min(s1, s2), math.max(s1, s2), b,
        r1, br, math.max(sr1, sr2), math.max(sb1, sb2))
      println(s"[streambench] $name streamed=[${f2(math.min(s1, s2))}," +
        s"${f2(math.max(s1, s2))}] batch=${f2(b)} rows=$r1/$br " +
        s"state=${math.max(sr1, sr2)}r/${math.max(sb1, sb2)}B")
    }

    // 1. sessionize (mapGroupsWithState) — mirror sessionize_state
    gate("sessionize",
      s => StreamingOps.sessionize(s.as[Event], gapMs,
        watermark = "2 hours").where(col("user_id") >= 0).toDF(),
      StreamingOps.sessionizeBatch(allP.as[Event], gapMs).toDF())

    // 2. tumbling window agg — mirror window_hourly_state
    gate("window_hourly",
      s => StreamingOps.hourlyCounts(s, watermark = "2 hours"),
      StreamingOps.hourlyCounts(allP),
      countWhere = Some("event_type <> 'sentinel'"))

    // 3. watermark dedup — mirror dedup_stream_state (sentinels pass
    // through the dedup and are excluded at count time)
    gate("dedup_stream",
      s => StreamingOps.dedupWithinWatermark(s,
        Seq("user_id", "event_type"), "ts", watermark = "30 days")
        .select(col("user_id"), col("event_type")),
      allP.dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type")),
      countWhere = Some("event_type <> 'sentinel'"))

    // 4. stream-stream interval join — mirror interval_join_state
    // (45-day watermark like the gate: state buffers both sides, the
    // sentinel flushes; the 1-in-4000 signup rate keeps the pair
    // output ~6M rows)
    def incBatch = allP.where(col("event_type") === "signup")
      .select(col("event_id").as("inc_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"))
    gate("interval_join",
      s => {
        val pts = s.select(col("event_id"), col("ts"), col("value"))
        val inc = s.where(col("event_type") === "signup")
          .select(col("event_id").as("inc_id"), col("ts").as("lo"))
        StreamingOps.streamingPointInIntervalJoin(pts, "ts", inc,
          "lo", "15 minutes", grainSec = 900, watermark = "45 days")
          .select(col("inc_id"), col("value"))
      },
      RelationalOps.pointInIntervalJoin(
        allP.select(col("event_id"), col("ts"), col("value")),
        "ts", incBatch, "lo", "hi", grainSec = 900)
        .select(col("inc_id"), col("value")))

    // 5. file sink drain (map-only passthrough) — the sink-side cost
    // sink_exactly_once_state gates semantically; batch = the same
    // projection through the noop sink, so the ratio reads as "file
    // sink machinery (manifest commits, per-batch planning) over raw
    // row materialization"
    gate("file_sink",
      s => s.select(col("event_id"), col("user_id"), col("value"),
        col("event_type")),
      allP.select(col("event_id"), col("user_id"), col("value"),
        col("event_type")),
      countWhere = Some("event_type <> 'sentinel'"))

    // Interval-join state EVICTION under a long replay (r11 verdict
    // item 2): gate 4 above runs a 45-day NO-evict watermark, so its
    // state_rows reads as "buffered history" — 10,005,002 rows at the
    // 10M tier (docs/STREAM_SCALE.md), linear in replay length by
    // construction. This probe re-runs the same join with a 30-MINUTE
    // watermark over 16 time-ordered slices of the same events: state
    // must plateau at the live window's set while events keep
    // flowing. The per-batch state-rows curve lands in the JSON (the
    // committed STREAM_SCALE row per provider); the plateau is
    // hard-asserted — a mid-replay batch and the last real-data batch
    // must hold the same-order state, and the peak must sit far under
    // the no-evict buffer.
    // byTs: the probe slices by EVENT TIME (equal ts ranges), the
    // same no-late-rows construction as the registry gate — id
    // slicing's ~1 h boundary overlap would silently late-drop
    // boundary-block rows under the 30-minute watermark (drops only
    // shrink state, so the plateau claim held, but the curve would
    // not be a lossless replay; r12 ADVICE).
    val evictDir = s"$tmp/src_evict"
    // single source of truth for the slice count: the batch-count
    // assertion below derives from it (r13 ADVICE — a hardcoded 18
    // next to a separately-passed 16 fails far from the cause)
    val evictSlices = 16
    StreamFeed.mkSrc(spark, all, nEvents, evictDir, evictSlices,
      byTs = true)
    val eq = {
      val s = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "1").parquet(evictDir)
      val pts = s.select(col("event_id"), col("ts"), col("value"))
      val inc = s.where(col("event_type") === "signup")
        .select(col("event_id").as("inc_id"), col("ts").as("lo"))
      StreamingOps.streamingPointInIntervalJoin(pts, "ts", inc, "lo",
        "15 minutes", grainSec = 900, watermark = "30 minutes")
        .select(col("inc_id"), col("value"))
    }.writeStream.format("parquet")
      .option("path", s"$tmp/out_evict")
      .option("checkpointLocation", s"$tmp/ckpt_evict")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    require(eq.awaitTermination(600000), "eviction probe hung")
    // Batch identification by CONTENT, not curve position (r12
    // ADVICE): maxFilesPerTrigger=1 over 16 staged slices + 2
    // sentinel files ⇒ exactly 18 data-carrying batches; a trailing
    // no-data micro-batch (on by default for watermarked queries)
    // adds a numInputRows=0 progress entry that a positional
    // dropRight(2) would let slide a collapsed-state sentinel batch
    // into `real`, making the plateau assertion vacuous.
    val withData = eq.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 && p.stateOperators.nonEmpty)
    require(withData.size == evictSlices + 2,
      s"eviction probe: expected exactly ${evictSlices + 2} data " +
        s"batches ($evictSlices slices + 2 sentinels, one file per " +
        s"trigger), got ${withData.size}")
    val evictCurve =
      withData.map(_.stateOperators.map(_.numRowsTotal).sum)
    // last two data batches are the far-future sentinels (watermark
    // jumps years — state collapses); the plateau claim is about the
    // 16 REAL-data batches before them
    val real = evictCurve.dropRight(2)
    val (evMid, evLast, evPeak) =
      (real(real.size / 2), real.last, real.max)
    require(evPeak <= nEvents / 4,
      s"eviction probe: peak state $evPeak > ${nEvents / 4} " +
        "(nEvents/4) — state grows with history, not the window")
    require(evLast <= math.max((1.5 * evMid).toLong, evMid + 1000),
      s"eviction probe: state still growing at end of replay " +
        s"(mid=$evMid last=$evLast) — watermark is not evicting")
    // Post-sentinel RESIDUE bound (r12 verdict item 4): the global
    // watermark is min-of-inputs, and only the points side sees the
    // sentinel rows (they aren't signups), so it stalls 30 minutes
    // behind the interval side's max — the residue after both
    // sentinel batches is ≈ one watermark-window of buffered points
    // (measured 26,591 at 2M / 131,822 at 10M ≈ 0.2× the plateau),
    // NOT zero and NOT the plateau. Bounding it at half the
    // mid-replay plateau turns a future multi-watermark regression
    // (residue silently growing toward buffered history) into a
    // hard failure.
    require(evictCurve.last <= math.max(evMid / 2, 1000L),
      s"eviction probe: post-sentinel residue ${evictCurve.last} > " +
        s"max(mid-plateau/2 = ${evMid / 2}, 1000) — the stalled " +
        "min-of-inputs watermark should strand only ~one window of " +
        "points, not a growing share of history")
    println(s"[streambench] interval_join_evict peak=$evPeak " +
      s"mid=$evMid last=$evLast final=${evictCurve.last} " +
      s"curve=${evictCurve.mkString(",")}")
    val evictJson =
      s""""interval_join_evict":{"watermark":"30 minutes",""" +
        s""""slices":$evictSlices,"peak_state_rows":$evPeak,""" +
        s""""mid_state_rows":$evMid,"last_real_state_rows":$evLast,""" +
        s""""final_state_rows":${evictCurve.last},""" +
        s""""state_rows_curve":[${evictCurve.mkString(",")}]}"""

    val gatesJson = rows.map { g =>
      s""""${g.name}":{"streamed":[${g.sMin},${g.sMax}],""" +
        s""""batch":${g.b},""" +
        s""""ratio":${f2(g.sMin / math.max(g.b, 1e-9))},""" +
        s""""rows":[${g.streamedRows},${g.batchRows}],""" +
        s""""state_rows":${g.stateRows},""" +
        s""""state_bytes":${g.stateBytes}}"""
    }.mkString("{", ",", "}")
    val totalStreamed = rows.map(_.sMin).sum
    val providerShort =
      if (provider.contains("RocksDB")) "rocksdb" else "hdfs"
    val line = s"""{"metric":"stream_bench","unit":"sec",""" +
      s""""n_events":$nEvents,"n_users":$nUsers,"cpus":$cpus,""" +
      s""""provider":"$providerShort",""" +
      s""""total_streamed":${f2(totalStreamed)},$evictJson,""" +
      s""""gates":$gatesJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    println(line)
    spark.stop()
  }
}
