package graft.streaming

import graft.{QDef, Tables}
import graft.operators.RelationalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-gated replays of the STREAMING pipeline (r7 verdict item 2):
  * each entry runs the real Structured Streaming code — file source →
  * stateful transform → checkpointed parquet sink, driven by
  * `Trigger.AvailableNow` — on the events table, then returns the
  * deterministic batch surface of the materialized sink for the DuckDB
  * oracle to hash-check. `sessionize_state` pinned the stateful
  * operator's batch path; these pin the watermark-dedup and
  * stream-stream-join paths through the actual streaming runtime
  * (offsets, state store, append-mode flush), the same machinery
  * AvailableNowE2ESpec drives for sessionize.
  *
  * Determinism doctrine: a streaming run's ARRIVAL order is not
  * deterministic (file listing, task order), so the gated surface must
  * be order-invariant — key sets and aggregates, never "which duplicate
  * survived". The watermark is set past the table's whole time span so
  * no state evicts and no late row drops mid-replay: eviction semantics
  * are spec-gated (StreamingOpsSpec, TextStreamingSpec) where arrival
  * order is controlled file-by-file; the driver gate certifies the
  * end-to-end plumbing loses and duplicates nothing. The one
  * deliberate exception is `interval_join_evict_state` (r12): it
  * controls arrival order itself (mtime-staged non-overlapping time
  * slices, one per micro-batch), so a TIGHT watermark evicts state
  * between batches without ever making a row late — the full-join
  * oracle still holds while the in-code state-peak check makes
  * "bounded by the window, not by history" falsifiable per run.
  */
object StreamGateQueries {

  /** Stage events into a fresh temp dir as plain TimestampType parquet
    * and open a file-source stream over it. Two reasons not to stream
    * the testdata file directly: (1) `Tables.load`'s schema-conditional
    * nanos/NTZ handling (r6 postmortem) must apply to the streaming
    * read too, and a file stream cannot re-type columns lazily; (2) the
    * staged copy lives in a per-call directory, so concurrent/repeated
    * invocations (bench warmup + 2 timed runs) never share source
    * listings or checkpoints. The temp dirs are OS-tmp sized (events
    * table only) and left for tmp cleanup — the returned frame still
    * lazily reads the sink, so nothing may delete eagerly here.
    */
  private def stageEvents(s: SparkSession, d: String)
      : (String, DataFrame, Long) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_streamgate").toString
    val ev = Tables.load(s, d, "events").where(col("ts").isNotNull)
    // The no-eviction determinism argument above requires the 45-day
    // watermark to exceed the table's whole time span (30 days in the
    // driver testdata). Pin that assumption: a regenerated table with
    // a longer span plus a multi-batch replay could evict state
    // mid-run and fail the gate confusingly — or pass by luck.
    // The span aggregate rides the staging write as an Observation —
    // one pass over events, not a min/max pass plus a write pass (the
    // staged bytes are the same scan either way; at corpus scale the
    // second full read is the entire cost of the check).
    val span = org.apache.spark.sql.Observation()
    ev.observe(span, min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .write.mode("overwrite").parquet(s"$base/src")
    val spanMs = span.get("hi").asInstanceOf[java.sql.Timestamp].getTime -
      span.get("lo").asInstanceOf[java.sql.Timestamp].getTime
    require(spanMs < 45L * 86400000L,
      s"events span ${spanMs / 86400000L} days >= the 45-day gate " +
        "watermark - widen the watermark in StreamGateQueries or the " +
        "no-eviction replay argument no longer holds")
    val src = s.readStream.schema(ev.schema).parquet(s"$base/src")
    (base, src)
  }

  /** Run `body` (a gate's stream start + drain) with trailing no-data
    * micro-batches disabled, restoring the session default after. The
    * no-data batch exists to advance the watermark and evict/finalize
    * state EAGERLY between data arrivals — on a run-to-completion
    * AvailableNow replay it fires once after the last data batch,
    * reloads every state store partition, evicts, and emits nothing
    * the gates read: the inner stream-stream joins emit on match and
    * dropDuplicatesWithinWatermark emits on first arrival (both
    * during data batches), and the hourly gate's second sentinel file
    * guarantees the append-mode flush in a DATA batch by design (see
    * its comment). Measured per-job (DevJobProfile, sf0.1): the
    * trailing batch is a whole state reload — 75 CPU·s of the
    * interval join's 190, 28 of the dedup gate's 49 — all spent
    * tearing down a checkpoint the replay abandons at exit. */
  private def withNoDataBatchesOff[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  private def runToSink(out: DataFrame, base: String): DataFrame = {
    withNoDataBatchesOff(out.sparkSession) {
      val q = out.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(600000))
        throw new IllegalStateException(
          s"streaming gate query hung past 600s (checkpoint $base/ckpt)")
    }
    out.sparkSession.read.parquet(s"$base/out")
  }

  val defs: Map[String, QDef] = Map(

    // Streaming exact dedup (StreamingOps.dedupWithinWatermark →
    // dropDuplicatesWithinWatermark): the ingest-side "seen within the
    // lateness horizon" filter. Gated surface is the KEY SET — which
    // physical row survives per key is arrival-order-dependent, the set
    // of keys is not (watermark spans the table, so exactly one row per
    // key leaves the sink; a loss or a duplicate both break the row
    // count before they break the hash).
    "dedup_stream_state" -> QDef(
      (s, d) => {
        val (base, src) = stageEvents(s, d)
        val deduped = StreamingOps.dedupWithinWatermark(
          src, Seq("user_id", "event_type"), "ts",
          watermark = "45 days")
        runToSink(deduped.select("user_id", "event_type"), base)
          .select(col("user_id"), col("event_type"))
      },
      "SELECT DISTINCT user_id, event_type FROM events " +
        "WHERE ts IS NOT NULL"),

    // Streaming point-in-interval join (StreamingOps
    // .streamingPointInIntervalJoin): every event inside the 15-minute
    // window each signup opens — the stream-stream self-join through
    // the grain-bucketed equi-key rewrite (state probed per bucket,
    // not scanned per point). The sink carries only (inc_id, value) —
    // aggregate inputs cross the sink, never payloads — and the
    // returned surface is the per-incident count + decimal-exact sum,
    // order-invariant by construction (decimal addition commutes
    // exactly; the batch `range_join` pins the identical relation
    // shape non-streaming).
    "interval_join_state" -> QDef(
      (s, d) => {
        val (base, src) = stageEvents(s, d)
        val pts = src.select(col("event_id"), col("ts"), col("value"))
        val inc = src.where(col("event_type") === "signup")
          .select(col("event_id").as("inc_id"), col("ts").as("lo"))
        val joined = StreamingOps.streamingPointInIntervalJoin(
          pts, "ts", inc, "lo", "15 minutes", grainSec = 900,
          watermark = "45 days")
        runToSink(joined.select(col("inc_id"), col("value")), base)
          .groupBy("inc_id")
          .agg(count(lit(1)).as("n_events"),
            RelationalOps.exactSum(col("value"), 6).as("sum_value"))
      },
      "WITH p AS (SELECT event_id, ts, value FROM events " +
        "WHERE ts IS NOT NULL), " +
        "i AS (SELECT event_id AS inc_id, ts AS lo FROM events " +
        "WHERE ts IS NOT NULL AND event_type = 'signup') " +
        "SELECT inc_id, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) " +
        "AS sum_value FROM p JOIN i " +
        "ON p.ts >= i.lo AND p.ts <= i.lo + INTERVAL 15 MINUTE " +
        "GROUP BY inc_id"),

    // Watermark EVICTION under the streaming interval join (r11
    // verdict item 2 — the one sanctioned r12 registry addition):
    // the gate above replays under a no-evict watermark, so its
    // green proves the plumbing, not bounded state. This entry
    // stages the SAME events as 16 NON-OVERLAPPING time slices
    // (mtime-ordered, one file per micro-batch) and runs the
    // identical join under a TIGHT 30-minute watermark, so eviction
    // fires between almost every pair of batches (a slice spans
    // ~days ≫ the 45 minutes of join reach) — yet no row is ever
    // LATE: slice k's earliest timestamp is ≥ slice k-1's latest,
    // so the watermark (max seen − 30 min) always trails the next
    // batch's rows, and the inner join emits on match, so the sink
    // still holds the complete pair set and hashes against the same
    // full-join oracle. The state curve is asserted in-code: peak
    // buffered rows must stay under totalRows/2 (maxFilesPerTrigger=4
    // batches ~4 slices per trigger here, so the live set spans up to
    // ~2 of 16 slices + the 30-minute tail; the tighter nEvents/4
    // bound belongs to StreamBench's strict one-file-per-trigger
    // probe) — the no-evict replay buffers ~ALL rows by the final
    // batch (measured
    // 10,005,002 at the 10M tier, docs/STREAM_SCALE.md) — turning
    // "state is bounded by the window's live set, not replay
    // history" into a per-run falsifiable check. The long-replay
    // state-rows CURVE per provider is StreamBench's eviction probe.
    "interval_join_evict_state" -> QDef(
      (s, d) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_streamgate").toString
        val srcDir = s"$base/src"
        val ev = Tables.load(s, d, "events").where(col("ts").isNotNull)
        val mm = ev.agg(min(col("ts")).cast("long").as("lo"),
          max(col("ts")).cast("long").as("hi"),
          count(lit(1)).as("n")).head()
        val (loS, hiS, total) =
          (mm.getLong(0), mm.getLong(1), mm.getLong(2))
        val slices = 16
        val span = math.max(1L, hiS - loS + 1)
        val sliced = ev.withColumn("__slice",
          least(lit(slices - 1), ((col("ts").cast("long") - lit(loS)) *
            lit(slices.toLong) / lit(span)).cast("int")))
        // One partitioned write stages all 16 slices (16 per-slice
        // coalesce(1) jobs cost ~3 s of pure scheduling at the bench
        // tier); repartition on __slice puts each slice in exactly
        // one task, so each __slice=k dir holds exactly one part
        // file, moved into mtime order below. partitionBy drops the
        // __slice column from the files — the staged schema is the
        // events schema unchanged.
        val stageTmp = s"$base/stage"
        sliced.repartition(slices, col("__slice"))
          .write.partitionBy("__slice").parquet(stageTmp)
        new java.io.File(srcDir).mkdirs()
        for (k <- 0 until slices) {
          val dir = new java.io.File(stageTmp, s"__slice=$k")
          val parts = Option(dir.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".parquet"))
          require(parts.length <= 1,
            s"slice $k staged as ${parts.length} files — repartition " +
              "on __slice must place a slice in one task")
          parts.foreach { p =>
            val dst = new java.io.File(srcDir, f"s$k%02d.parquet")
            java.nio.file.Files.move(p.toPath, dst.toPath)
            require(dst.setLastModified(1000000000000L + k * 2000L),
              s"could not set mtime on $dst — batch order undefined")
          }
        }
        // Micro-batch MACHINERY, not the join, is this gate's cost:
        // each batch commits partitions × 4 state stores (left/right
        // sides × keyToNumValues/keyWithIndex), so 16 single-file
        // batches at the session's 32 partitions ran 2,048 store
        // commits and priced the gate at 47 s on the sf0.1 bench —
        // 8× its no-evict sibling, measuring checkpoint I/O instead
        // of eviction; the floor is ~1.1 s per micro-batch (offset/
        // commit log fsyncs, store snapshots, sink manifest commit)
        // regardless of width. FOUR slices per trigger (a union of
        // ADJACENT slices — still non-overlapping in time against
        // every later batch, so the no-late-rows argument is
        // unchanged and the watermark advances/evicts between all 4
        // batches) and a session-restored 8-partition state width
        // for this one query (its per-batch state is a few thousand
        // rows; the width is an eviction-semantics no-op, asserted
        // invariant by the ci.sh partitions sweep) put the gate near
        // its sibling's cost tier with 3 real eviction rounds — the
        // full 16-batch eviction CURVE is StreamBench's probe
        // (docs/STREAM_SCALE.md), where per-batch cost is the point,
        // not a tax on every driver bench run.
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        val joined =
          try withNoDataBatchesOff(s) {
            s.conf.set("spark.sql.shuffle.partitions", "8")
            val src = s.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "4").parquet(srcDir)
            val pts = src.select(col("event_id"), col("ts"),
              col("value"))
            val inc = src.where(col("event_type") === "signup")
              .select(col("event_id").as("inc_id"), col("ts").as("lo"))
            val q = StreamingOps.streamingPointInIntervalJoin(
              pts, "ts", inc, "lo", "15 minutes", grainSec = 900,
              watermark = "30 minutes")
              .select(col("inc_id"), col("value"))
              .writeStream.format("parquet")
              .option("path", s"$base/out")
              .option("checkpointLocation", s"$base/ckpt")
              .outputMode("append")
              .trigger(Trigger.AvailableNow())
              .start()
            if (!q.awaitTermination(600000))
              throw new IllegalStateException(
                s"eviction gate hung past 600s (checkpoint $base/ckpt)")
            q
          } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        val curve = joined.recentProgress.toSeq
          .filter(_.stateOperators.nonEmpty)
          .map(p => p.stateOperators.map(_.numRowsTotal).sum)
        val peak = if (curve.isEmpty) 0L else curve.max
        require(peak > 0,
          "eviction gate: join buffered no state — vacuous run")
        require(peak <= total / 2,
          s"eviction gate: peak state $peak rows > ${total / 2} " +
            "(totalRows/2; live window is ~2 of 16 slices + the " +
            "30-min tail) — state is growing with replay history, " +
            "not bounded by the watermark's live window")
        s.read.parquet(s"$base/out")
          .groupBy("inc_id")
          .agg(count(lit(1)).as("n_events"),
            RelationalOps.exactSum(col("value"), 6).as("sum_value"))
      },
      "WITH p AS (SELECT event_id, ts, value FROM events " +
        "WHERE ts IS NOT NULL), " +
        "i AS (SELECT event_id AS inc_id, ts AS lo FROM events " +
        "WHERE ts IS NOT NULL AND event_type = 'signup') " +
        "SELECT inc_id, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) " +
        "AS sum_value FROM p JOIN i " +
        "ON p.ts >= i.lo AND p.ts <= i.lo + INTERVAL 15 MINUTE " +
        "GROUP BY inc_id"),

    // Streaming tumbling-window aggregation (StreamingOps
    // .hourlyCounts) with a REAL (finite, 1-hour) watermark — unlike
    // the two gates above, append mode here only emits what the
    // watermark FINALIZED, so this is the one entry that pins the
    // watermark/late-data machinery itself: a single far-future
    // sentinel row is staged alongside the events (the
    // AvailableNowE2ESpec trick), advancing the watermark past every
    // real window so the state store must flush exactly all of them —
    // a dropped or double-emitted window breaks the count before the
    // hash. The sentinel's own (unfinalized) window is excluded by the
    // hour_start bound; the gated surface is the integer-exact columns
    // (window, type, count) — sum_value's order-dependent double fold
    // is covered decimal-exactly by the batch `window_hourly` entry.
    "window_hourly_state" -> QDef(
      (s, d) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_streamgate").toString
        val srcDir = s"$base/src"
        new java.io.File(srcDir).mkdirs()
        val ev = Tables.load(s, d, "events").where(col("ts").isNotNull)
        // One file per micro-batch, in mtime order: ALL real events in
        // file 1 (processed under watermark 0 — no real row can be
        // dropped as late by another real row's file landing first),
        // then two sentinel files whose batches advance the watermark
        // past every real window — the second guarantees the flush
        // even if no trailing no-data batch runs (and the gate runs
        // with them disabled — see withNoDataBatchesOff).
        def stage(df: DataFrame, name: String, mtime: Long): Unit =
          StreamStage.stageFile(df, srcDir, name, mtime)
        // maxTs (the sentinel anchor and the hour_start bound) rides
        // the staging write as an Observation — one events pass, not
        // an agg pass plus a write pass.
        val hi = org.apache.spark.sql.Observation()
        stage(ev.observe(hi, max(col("ts")).as("hi")), "a_events",
          1000000000000L)
        val maxTs = hi.get("hi").asInstanceOf[java.sql.Timestamp]
        // Sentinels are single literal rows — built driver-side, not
        // projected off a limit(1) corpus scan (each of those scans
        // was its own 8-task job at the bench tier; at 100 TB it would
        // be a file listing + a scan task for one discarded row).
        def sentinel(days: Long): DataFrame = {
          import s.implicits._
          Seq((-1L,
            new java.sql.Timestamp(maxTs.getTime + days * 86400000L),
            -1L, "__sentinel", 0.0, null: String))
            .toDF("event_id", "ts", "user_id", "event_type", "value",
              "props")
        }
        stage(sentinel(90), "b_sentinel1", 1000000002000L)
        stage(sentinel(180), "c_sentinel2", 1000000004000L)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val agg = StreamingOps.hourlyCounts(src, watermark = "1 hour")
        runToSink(agg, base)
          .where(col("hour_start") <= lit(maxTs))
          .select(col("hour_start"), col("event_type"),
            col("n_events"))
      },
      "SELECT date_trunc('hour', ts) AS hour_start, event_type, " +
        "COUNT(*) AS n_events FROM events WHERE ts IS NOT NULL " +
        "GROUP BY 1, 2"),

    // Exactly-once file sink under a mid-drain kill (r8 verdict item
    // 3 — the last StreamingOps capability without a CORRECTNESS
    // row): the events table is staged as FOUR mtime-ordered files
    // (maxFilesPerTrigger=1 ⇒ four micro-batches), run 1 is STOPPED
    // as soon as the sink's _spark_metadata records its first commit
    // (a kill in the middle of the drain — an in-flight batch may
    // leave orphan part files with no manifest entry), and run 2
    // resumes from the same checkpoint with AvailableNow to finish.
    // The gated surface is the FULL ROW SET of the sink read through
    // its manifest: a lost batch breaks the row count, a re-emitted
    // batch after restart breaks it the other way, and an orphan
    // part file leaking into the read breaks the hash — so the gate
    // pins both halves of exactly-once (offset-log replay AND
    // manifest-filtered reads). Stateless map-only transform by
    // design: this entry isolates the SINK's idempotence; the state
    // store's is pinned by the three gates above.
    "sink_exactly_once_state" -> QDef(
      (s, d) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft_streamgate").toString
        val srcDir = s"$base/src"
        val ev = Tables.load(s, d, "events").where(col("ts").isNotNull)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        // One partitioned write stages all four slices (the per-slice
        // stageFile form re-scanned events once per slice — four full
        // passes for one table; the same single-pass repartition-on-
        // slice + partitionBy shape the eviction gate stages with).
        // repartition on __slice puts each slice in exactly one task,
        // so each __slice=k dir holds exactly one part file, moved
        // into mtime order below; partitionBy drops __slice from the
        // files, so the staged schema is ev's five columns unchanged.
        val stageTmp = s"$base/stage"
        ev.withColumn("__slice", (col("event_id") % 4).cast("int"))
          .repartition(4, col("__slice"))
          .write.partitionBy("__slice").parquet(stageTmp)
        new java.io.File(srcDir).mkdirs()
        for (k <- 0 to 3) {
          val dir = new java.io.File(stageTmp, s"__slice=$k")
          val parts = Option(dir.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"slice $k staged as ${parts.length} files — repartition " +
              "on __slice must place each (non-empty) slice in one task")
          val dst = new java.io.File(srcDir, s"part$k.parquet")
          java.nio.file.Files.move(parts.head.toPath, dst.toPath)
          require(dst.setLastModified(1000000000000L + k * 2000L),
            s"could not set mtime on $dst — batch order undefined")
        }
        val schema = ev.schema
        def start() = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        // run 1: kill after the FIRST sink commit lands (mid-drain —
        // batches 2-4 are still queued; on a fast drain the stop may
        // land after completion, which only makes run 2 a no-op, the
        // gate is unchanged)
        val q1 = start()
        val manifest = new java.io.File(s"$base/out/_spark_metadata")
        val t0 = System.nanoTime()
        while (q1.isActive &&
            (!manifest.exists() || manifest.list().isEmpty) &&
            System.nanoTime() - t0 < 600e9.toLong)
          Thread.sleep(20)
        if (q1.isActive) q1.stop()
        q1.awaitTermination(600000)
        // run 2: resume from the same checkpoint, drain to the end
        val q2 = start()
        if (!q2.awaitTermination(600000))
          throw new IllegalStateException(
            s"exactly-once gate hung past 600s (checkpoint $base/ckpt)")
        // read THROUGH the manifest (spark.read on a dir with
        // _spark_metadata uses the sink's file log, excluding any
        // orphan from the killed batch)
        s.read.parquet(s"$base/out")
      },
      "SELECT event_id, user_id, event_type, value FROM events " +
        "WHERE ts IS NOT NULL"))
}
