package graft.examples

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, Session}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Empirical scale proof for the STREAMING surface (StreamingOps +
  * the `*_state` driver gates): the stateful operators' cost and state
  * must scale with the KEY population and the lateness horizon, never
  * with total events seen — that is the whole design argument for
  * running them on an unbounded 100-TB/day feed. Spec-level parity
  * (StreamingOpsSpec, AvailableNowE2ESpec) proves semantics on dozens
  * of rows; this drives MILLIONS of events through the real runtime —
  * time-ordered file batches under Trigger.AvailableNow, checkpointed
  * sinks, a far-future sentinel advancing the watermark — and asserts
  * (nonzero exit on failure):
  *
  *  1. BATCH PARITY AT VOLUME: the streamed, watermark-flushed session
  *     set equals `sessionizeBatch` on the same events, exactly
  *     (set equality on (user, start, end, n) at 2×10^6 events);
  *     likewise streamed `hourlyCounts` vs its batch form.
  *  2. BOUNDED STATE: max `stateOperators.numRowsTotal` across the run
  *     stays ≤ the key population for sessionize (one SessionState per
  *     active user) — 40× fewer rows than events seen here — and the
  *     dedup state tracks distinct keys within the horizon, not
  *     events. This is the measurable form of "state is bounded by the
  *     watermark".
  *  3. LINEARITY: full (4 data files) vs half (2) wall time ratio ≤ 3
  *     (ideal 2) for the sessionize pipeline end-to-end.
  *
  * Run: `SPARK_GRAFT_CPUS=16 sbt "runMain graft.examples.StreamScale
  * [nEvents] [reportPath]"` — defaults 2e6 / docs/STREAM_SCALE.md.
  */
object StreamScale {

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(2000000L)
    val report = args.lift(1).getOrElse("docs/STREAM_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(ok: Boolean, what: String): String = {
      if (!ok) failures += what
      if (ok) "PASS" else "FAIL"
    }

    val nUsers = 50000L
    val gapMs = 30L * 60000
    // Synthetic feed + quarter-file staging: shared with StreamBench
    // (see [[StreamFeed]] for the lattice/jitter design narrative).
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_streamscale").toString
    val all = StreamFeed.gen(spark, nEvents, nUsers)
    val evSchema = all.schema
    StreamFeed.mkSrc(spark, all, nEvents, s"$tmp/src_full", 4)
    StreamFeed.mkSrc(spark, all, nEvents, s"$tmp/src_half", 2)

    final case class RunResult(seconds: Double, maxStateRows: Long,
                               batches: Long)
    def runSessionize(srcDir: String, outTag: String): RunResult = {
      val src = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = StreamingOps.sessionize(src.as[Event], gapMs,
          watermark = "2 hours")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out_$outTag")
        .option("checkpointLocation", s"$tmp/ckpt_$outTag")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      require(q.awaitTermination(600000), s"$outTag hung")
      val secs = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      val maxState = progress.flatMap(_.stateOperators.map(
        _.numRowsTotal)).foldLeft(0L)(math.max)
      RunResult(secs, maxState, progress.length.toLong)
    }

    // half BEFORE full: JVM/codegen/state-store warmup lands on the
    // half run's numerator, so the full/half ratio can only OVERSTATE
    // the full run — the conservative direction for a linearity gate.
    val half = runSessionize(s"$tmp/src_half", "half")
    val full = runSessionize(s"$tmp/src_full", "full")

    // 1a. batch parity (sessionize): sentinel's own session is
    // unflushed by design; everything real must match exactly.
    // The second sentinel closes-and-emits the first's session (user
    // -1); everything real is user_id >= 0. MULTISET equality, not
    // set: count first (a double-emitted identical session — the
    // append-mode/checkpoint failure mode — changes the count before
    // the set), then set-compare distinct rows.
    val streamedRows = spark.read.parquet(s"$tmp/out_full")
      .where(col("user_id") >= 0)
      .as[Session].collect()
    val streamed = streamedRows.toSet
    val batch = StreamingOps.sessionizeBatch(all.as[Event], gapMs)
      .collect().toSet
    val parity = streamedRows.length == batch.size && streamed == batch
    val nSessions = batch.size

    // 1b. batch parity (hourlyCounts) through the same staged feed
    val srcH = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/src_full")
    val qh = StreamingOps.hourlyCounts(srcH, watermark = "2 hours")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out_hourly")
      .option("checkpointLocation", s"$tmp/ckpt_hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    require(qh.awaitTermination(600000), "hourly hung")
    val gotHRows = spark.read.parquet(s"$tmp/out_hourly")
      .where(col("event_type") =!= "sentinel")
      .select("hour_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect()
    val gotH = gotHRows.toSet
    val expH = StreamingOps.hourlyCounts(all)
      .select("hour_start", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // multiset equality (see the sessionize check)
    val parityH = gotHRows.length == expH.size && gotH == expH

    // 2. dedup state bound: 4× duplicated keys over the horizon
    val dupSrc = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src_full")
    val qd = StreamingOps.dedupWithinWatermark(dupSrc,
        Seq("user_id"), watermark = "30 days")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out_dedup")
      .option("checkpointLocation", s"$tmp/ckpt_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    require(qd.awaitTermination(600000), "dedup hung")
    val dedupMaxState = qd.recentProgress.flatMap(
      _.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
    val dedupRows = spark.read.parquet(s"$tmp/out_dedup").count()

    val ratio = full.seconds / math.max(half.seconds, 0.001)
    val sb = new StringBuilder
    sb.append(s"# Streaming scale proof — $nEvents events, " +
      s"$nUsers keys, real AvailableNow runs\n\n")
    sb.append("Generated by `graft.examples.StreamScale` " +
      s"(local[$cpus], time-ordered file batches + far-future " +
      "sentinel, checkpointed parquet sinks). State metrics are the " +
      "runtime's own `stateOperators.numRowsTotal`.\n\n")
    sb.append("## Batch parity at volume\n\n")
    sb.append(s"- sessionize streamed == sessionizeBatch: $nSessions " +
      s"sessions, set-equal ${check(parity, "session parity")}\n")
    sb.append(s"- hourlyCounts streamed == batch: ${expH.size} " +
      s"windows, set-equal ${check(parityH, "hourly parity")}\n\n")
    sb.append("## State bounded by keys, not events\n\n")
    sb.append(s"- sessionize max state rows: ${full.maxStateRows} " +
      s"≤ $nUsers keys (events seen: $nEvents) " +
      s"${check(full.maxStateRows <= nUsers + 1, "session state bound")}\n")
    sb.append(s"- dedup max state rows: $dedupMaxState ≤ " +
      s"${nUsers + 1} (input rows ${nEvents}, emitted $dedupRows) " +
      s"${check(dedupMaxState <= nUsers + 1 &&
        dedupRows == nUsers + 1, "dedup state bound")}\n\n")
    sb.append("## Wall time (end-to-end AvailableNow drain)\n\n")
    sb.append("| run | s | max state rows |\n|---|---|---|\n")
    sb.append(f"| half (2 files) | ${half.seconds}%.1f | " +
      s"${half.maxStateRows} |\n")
    sb.append(f"| full (4 files) | ${full.seconds}%.1f | " +
      s"${full.maxStateRows} |\n")
    sb.append(f"| ratio | $ratio%.2f " +
      s"${check(ratio <= 3.0, "linearity")} |\n\n")
    sb.append(if (failures.isEmpty) "**ALL CHECKS PASS**\n"
      else s"**FAILURES:** ${failures.mkString("; ")}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(report), sb.toString)
    println(sb)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
