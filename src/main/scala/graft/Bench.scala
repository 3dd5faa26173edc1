package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Env-var parse with a message naming the variable (r13 ADVICE): a
    * bare `.toInt` crashed the whole bench with an anonymous
    * NumberFormatException before any query ran, and a zero/negative
    * cap would silently cap every query instantly. */
  private def posIntEnv(name: String): Option[Int] =
    sys.env.get(name).map { v =>
      val n =
        try v.trim.toInt
        catch { case _: NumberFormatException =>
          sys.error(s"$name must be a positive integer, got '$v'") }
      require(n > 0, s"$name must be a positive integer, got '$v'")
      n
    }

  /** Marker prefix for per-query wall-cap errors — the isolate-on-cap
    * child greps for it to decide "restart the JVM here". */
  private val CappedPrefix = "capped at "

  /** Core count for the session AND the artifact stamp. Default 32 =
    * the brief's `local[32]` bench methodology (and what the driver's
    * graded runs set explicitly). It was 4 until r14, when an sf10
    * sweep launched without the env var silently ran `local[4]` —
    * CPU-bound rows read 2-8× high, the ANN family spuriously hit the
    * 120 s cap, and streaming (wall-bound) rows looked normal, which
    * masked it for 45 minutes. The value is emitted in every result
    * line so a mis-set run is diagnosable from the artifact alone. */
  private def benchCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  // ---------------------------------------------------------------
  // Multi-JVM orchestration (r13 verdict items 2 + 3). Both modes are
  // OFF-TIER tools — the graded tiers run the plain single-JVM path
  // (neither env var set), byte-identical to r13.
  //
  //  SPARK_GRAFT_BENCH_JVMS=k      min-over-JVMs: run the selected set
  //    k times, each in a FRESH child JVM, report per-query min across
  //    JVMs (plus the per-JVM readings in the sidecar). The sf1
  //    shingle-family attribution proved a ~1.5x INTER-JVM band that
  //    within-JVM min-of-2 structurally cannot see (BENCH_SF1.md);
  //    this encodes min-over-JVMs in the tool instead of in prose.
  //  SPARK_GRAFT_BENCH_ISOLATE=oncap   restart the JVM after any cap
  //    hit: r13's capped sf10 sweep showed cap-cancellation debris
  //    poisons every subsequent reading in a shared JVM (asof_join
  //    83.8 s in-sweep vs 6.6 s fresh). The parent reruns the
  //    remaining queries in a fresh child after each cap, so every
  //    reading comes from a JVM that never cancelled a job group.
  // ---------------------------------------------------------------

  /** Spawn one child graft.Bench JVM with this JVM's exact args
    * (add-opens, -Xmx) and classpath; the orchestration env vars are
    * dropped and `extra` is added. Child stdout/stderr pass through. */
  private def spawnChild(extra: Map[String, String]): Int = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.inheritIO()
    val env = pb.environment()
    Seq("SPARK_GRAFT_BENCH_JVMS", "SPARK_GRAFT_BENCH_ISOLATE",
      "SPARK_GRAFT_ONLY", "SPARK_GRAFT_BENCH_OUT").foreach(env.remove)
    env.put("SPARK_GRAFT_BENCH_CHILD", "1")
    extra.foreach { case (k, v) => env.put(k, v) }
    pb.start().waitFor()
  }

  /** Read a child sidecar's queries/runs/errors maps (Jackson — on the
    * classpath via the Spark jars; no SparkSession in the parent). */
  private def readSidecar(path: String)
      : (Seq[(String, (Double, Double))], Seq[(String, String)]) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    import scala.jdk.CollectionConverters._
    val runs = Option(root.get("runs")).map { r =>
      r.fields().asScala.toSeq.map { e =>
        e.getKey -> (e.getValue.get(0).asDouble,
          e.getValue.get(1).asDouble)
      }
    }.getOrElse(Seq.empty)
    val errs = Option(root.get("errors")).map { r =>
      r.fields().asScala.toSeq.map(e =>
        e.getKey -> e.getValue.asText)
    }.getOrElse(Seq.empty)
    (runs, errs)
  }

  /** min-over-JVMs driver: k sequential fresh-JVM full runs of the
    * selected set; per-query result is the min across JVMs (each
    * child's own reading is already its within-JVM min-of-runs). A
    * query errors only if it errored in EVERY JVM. The sidecar gains
    * "bench_jvms" and a per-query "jvms" array so a cross-round
    * attribution can quote the band, not just the min. */
  private def minOverJvms(k: Int): Unit = {
    val onlyEnv = sys.env.get("SPARK_GRAFT_ONLY")
    val childOuts = (1 to k).map(i => s"/tmp/graft_bench_jvm$i.json")
    childOuts.foreach { out =>
      val rc = spawnChild(
        Map("SPARK_GRAFT_BENCH_OUT" -> out) ++
          onlyEnv.map("SPARK_GRAFT_ONLY" -> _))
      // a child with per-query errors exits 1 after writing its
      // sidecar — keep going; a child that wrote nothing is fatal
      require(new java.io.File(out).isFile,
        s"min-over-JVMs child (rc=$rc) wrote no sidecar at $out")
    }
    val perJvm = childOuts.map(readSidecar)
    val names = perJvm.flatMap { case (r, e) =>
      r.map(_._1) ++ e.map(_._1) }.distinct
    val merged = names.map { n =>
      val oks = perJvm.flatMap(_._1.collectFirst {
        case (`n`, v) => v })
      val errsFor = perJvm.flatMap(_._2.collectFirst {
        case (`n`, e) => e })
      if (oks.nonEmpty)
        n -> Right((oks.map(_._1).min, oks.map(_._1).max,
          oks.map(_._1)))
      else n -> Left(errsFor.headOption.getOrElse("no reading"))
    }
    val ok = merged.collect { case (n, Right(v)) => n -> v }
    val errs = merged.collect { case (n, Left(e)) => n -> e }
    val total = ok.map(_._2._1).sum
    val calib = ok.collectFirst {
      case ("scan_project", (mn, _, _)) => mn }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = ok.map { case (n, (mn, _, _)) => "\"" + n + "\":" + mn }
      .mkString("{", ",", "}")
    // "runs" = [min-over-JVMs, max-over-JVMs]: the inter-JVM band
    val rs = ok.map { case (n, (mn, mx, _)) =>
      "\"" + n + "\":[" + mn + "," + mx + "]" }.mkString("{", ",", "}")
    val js = ok.map { case (n, (_, _, all)) =>
      "\"" + n + "\":[" + all.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val es = errs.map { case (n, e) => "\"" + n + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val calibJson = calib
      .map(c => s""","calibration_scan_project":$c""").getOrElse("")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cpus":$benchCpus,"bench_jvms":$k,"queries":$qs,"runs":$rs,"jvms":$js,"errors":$es$calibJson,"sf":"$sfDir"}"""
    // Never the committed graded sidecar by default: this is a dev
    // mode, and a full fanout at an off-tier must not clobber
    // bench_results.json (the r13 copy-then-checkout dance).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench_jvms.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[bench] min-over-$k-JVMs results in $outPath")
    println(line)
    println("[bench-queries] {" +
      ok.sortBy { case (_, (mn, _, _)) => -mn }
        .map { case (n, (mn, _, _)) => "\"" + n + "\":" + f3(mn) }
        .mkString(",") + "}")
    if (errs.nonEmpty) sys.exit(1)
  }

  /** Isolate-on-cap driver: run the selected set in registry order in
    * a child JVM that EXITS after its first cap hit; restart a fresh
    * child on the remaining queries until done. Every reading in the
    * merged sidecar comes from a JVM with zero prior job-group
    * cancellations — a measurement, not a screen. */
  private def isolateOnCap(): Unit = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_(n)))
    var remaining = selected
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, Either[String, (Double, Double)]]
    var round = 0
    while (remaining.nonEmpty) {
      round += 1
      val out = s"/tmp/graft_bench_isolate_r$round.json"
      new java.io.File(out).delete()
      spawnChild(Map(
        "SPARK_GRAFT_ONLY" -> remaining.mkString(","),
        "SPARK_GRAFT_BENCH_OUT" -> out,
        "SPARK_GRAFT_EXIT_ON_CAP" -> "1"))
      require(new java.io.File(out).isFile,
        s"isolate-on-cap child $round wrote no sidecar — aborting " +
          s"with ${remaining.size} queries unmeasured")
      val (runs, errs) = readSidecar(out)
      runs.foreach { case (n, v) => acc(n) = Right(v) }
      errs.foreach { case (n, e) => acc(n) = Left(e) }
      val done = (runs.map(_._1) ++ errs.map(_._1)).toSet
      val before = remaining.size
      remaining = remaining.filterNot(done)
      require(remaining.size < before,
        s"isolate-on-cap child $round recorded nothing — aborting")
      if (remaining.nonEmpty)
        System.err.println(s"[bench] isolate-on-cap: restarting " +
          s"after cap (${remaining.size} queries remain)")
    }
    val ok = acc.toSeq.collect { case (n, Right(v)) => n -> v }
    val errs = acc.toSeq.collect { case (n, Left(e)) => n -> e }
    val total = ok.map(_._2._1).sum
    val calib = ok.collectFirst { case ("scan_project", (mn, _)) => mn }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = ok.map { case (n, (mn, _)) => "\"" + n + "\":" + mn }
      .mkString("{", ",", "}")
    val rs = ok.map { case (n, (mn, mx)) =>
      "\"" + n + "\":[" + mn + "," + mx + "]" }.mkString("{", ",", "}")
    val es = errs.map { case (n, e) => "\"" + n + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val calibJson = calib
      .map(c => s""","calibration_scan_project":$c""").getOrElse("")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cpus":$benchCpus,"isolate":"oncap","jvm_restarts":${round - 1},"queries":$qs,"runs":$rs,"errors":$es$calibJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench_isolate.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[bench] isolate-on-cap results in $outPath " +
      s"(${round - 1} JVM restarts)")
    println(line)
    println("[bench-queries] {" +
      ok.sortBy { case (_, (mn, _)) => -mn }
        .map { case (n, (mn, _)) => "\"" + n + "\":" + f3(mn) }
        .mkString(",") + "}")
    // cap errors are the EXPECTED outcome for by-design capped
    // witnesses in this mode; only a non-cap error fails the sweep
    if (errs.exists(!_._2.startsWith(CappedPrefix))) sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    val jvms = posIntEnv("SPARK_GRAFT_BENCH_JVMS")
    val isolate = sys.env.get("SPARK_GRAFT_BENCH_ISOLATE")
    isolate.foreach(v => require(v == "oncap",
      s"SPARK_GRAFT_BENCH_ISOLATE: unknown mode '$v' (only 'oncap')"))
    if (!sys.env.contains("SPARK_GRAFT_BENCH_CHILD")) {
      if (jvms.exists(_ > 1)) { minOverJvms(jvms.get); return }
      if (isolate.contains("oncap")) { isolateOnCap(); return }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = benchCpus
    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 times just those queries —
    // iterating on one query's plan shouldn't cost a full-surface run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Shuffle-partition sizing is per-deployment, like the scan-split
    // sizing below: partitions=cpus is right when every partition fits
    // execution memory (true through the sf1/sf10 tiers), but a tier
    // whose per-partition shuffle state outgrows its memory share pays
    // a spill tax the work model doesn't include (measured: the
    // 6M-vector LSH verify join at 32 partitions carries ~450 MB/task
    // and runs 1.6x over its pair-count prediction; 256 partitions
    // removes the excess — docs/GROWTH_SF10.md). Override for
    // off-tier runs; the driver's sf0.1 run keeps partitions=cpus.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // AQE coalesce plans each shuffle at initialPartitionNum and
    // merges down to ~advisory-size targets, so raising the INITIAL
    // count right-sizes heavy shuffles per-query (the 6M-vector LSH
    // verify join runs 6.6x faster at initial=256 than at 32 —
    // docs/GROWTH_SF10.md). It is NOT free where shuffles are small:
    // a same-host A/B at sf0.1 put initial=8x cpus at +15-48% on
    // sub-second shuffle-bearing queries (more shuffle blocks, more
    // reducer fetch segments, AQE planning over 8x the slices), so
    // the DEFAULT stays initial = shuffle.partitions — already right
    // for the sf0.1 tier — and off-tier runs size it explicitly,
    // exactly as a 100-TB deployment would run with thousands of
    // partitions and let AQE coalesce down.
    val initialPartitions = sys.env.getOrElse(
      "SPARK_GRAFT_INITIAL_PARTITIONS", shufflePartitions)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions)
      // Scan-split sizing for BENCH scale (the brief's "size
      // maxPartitionBytes to the target SF" knob): the testdata tables
      // are single parquet files of 2-200 MB, so the 128 MB default +
      // 4 MB openCost floor planned 1-3 scan splits and ran every
      // map-side stage (the broadcast range-join probe, explode+hash
      // pipelines) on 1-3 of the 32 cores. ~16 MB cap / 256 KB floor
      // puts 8-30 splits on the big facts. On a real cluster at 100 TB
      // the inputs are many files and the 128 MB default is correct —
      // this is per-deployment sizing, not engine semantics.
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Testdata-drift canary (shared with Verify; r6 postmortem): a
    // regenerated-testdata type shift should announce itself in ONE
    // line naming the drifted column before 100+ queries error out.
    TestdataSchema.driftAll(spark, sfDir).foreach(d =>
      System.err.println(s"[bench] TESTDATA DRIFT: $d"))
    // Two timed executions per query, report the min: amortizes JIT/
    // codegen warmup and the host VM's sporadic CPU-throttle stalls,
    // giving the steady-state per-query cost. A failing query is an
    // error, not a fast timing: it is recorded under "errors" and the
    // process exits nonzero so a broken registry can't bench as ~0 s.
    // Optional per-query wall cap for OFF-TIER exploratory passes
    // (e.g. the sf10 full-registry sweep): a forced-witness route
    // whose replica fan-out is a gate-tier construct can run
    // unboundedly off-tier; the cap records it as an error
    // ("capped at Ns") instead of stalling the sweep. UNSET on every
    // graded tier — the default path is byte-identical to uncapped.
    val capS = posIntEnv("SPARK_GRAFT_QUERY_CAP_S")
    val runsPer = posIntEnv("SPARK_GRAFT_BENCH_RUNS").getOrElse(2)
    val exitOnCap = sys.env.contains("SPARK_GRAFT_EXIT_ON_CAP")
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        // noop sink, not count(): count() lets column pruning delete
        // every projection-only expression (md5, dot products, regex),
        // so projection-shaped queries would bench as bare scans and a
        // regression in those expressions would be invisible. The noop
        // writer consumes fully-materialized rows — same work Verify
        // forces via parquet, minus the I/O.
        capS match {
          case None =>
            fn(spark, sfDir).write.format("noop")
              .mode("overwrite").save()
          case Some(c) =>
            // the job group is thread-local: set it INSIDE the future
            // (the thread that triggers the jobs) so the cancel from
            // this thread reaches the query's jobs and nothing else.
            // The latch (r13 ADVICE) closes the cancel race: the
            // timeout clock starts only AFTER the group is set, so a
            // saturated EC can't make cancelJobGroup a no-op; and on
            // timeout the cancel repeats until the future actually
            // completes — a multi-job query that submits its next job
            // after a single cancel landed between jobs would
            // otherwise keep running in the background, consuming
            // executor slots and contaminating every later timing.
            val gid = s"bench-cap-${System.nanoTime()}"
            val started = new java.util.concurrent.CountDownLatch(1)
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration._
            import scala.concurrent.ExecutionContext.Implicits.global
            val f = Future {
              spark.sparkContext.setJobGroup(gid, "bench query cap",
                interruptOnCancel = true)
              started.countDown()
              try fn(spark, sfDir).write.format("noop")
                .mode("overwrite").save()
              finally spark.sparkContext.clearJobGroup()
            }
            started.await()
            try Await.result(f, c.seconds)
            catch { case _: java.util.concurrent.TimeoutException =>
              // Streaming gates are not stoppable through the job
              // group alone: cancel kills the ACTIVE micro-batch job,
              // but awaitTermination blocks on (and the runner
              // restarts) the stream itself, so the pure cancel loop
              // spun forever on a capped streaming query. Stop active
              // streams too (only the capped query's can be running —
              // Bench executes one query at a time), and BOUND the
              // loop: if the thread still won't die (a driver-side
              // phase between jobs), record the cap and move on —
              // under EXIT_ON_CAP the JVM exits right after, which
              // kills any leaked work for real.
              var done = false
              var attempts = 0
              while (!done && attempts < 15) {
                attempts += 1
                spark.sparkContext.cancelJobGroup(gid)
                try spark.streams.active.foreach(_.stop())
                catch { case _: Throwable => () }
                done =
                  try { Await.ready(f, 2.seconds); true }
                  catch {
                    case _: java.util.concurrent.TimeoutException =>
                      false
                  }
              }
              if (!done) System.err.println(s"[bench] WARNING: capped " +
                s"query thread did not exit after $attempts cancel " +
                "rounds — readings after this one are suspect unless " +
                "EXIT_ON_CAP restarts the JVM")
              throw new RuntimeException(s"$CappedPrefix${c}s")
            }
        }
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        // JSON-safe: strip quotes, backslashes, and the FULL control
        // range (\b, \f, U+0000-001F would all break the output line).
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(200))
      }
    }
    // Full untimed warmup pass before any timing: min-of-2 amortizes
    // per-query JIT, but the FIRST queries in map-iteration order still
    // paid whole-JVM cold-start (classloading, codegen compiler,
    // parquet reader init) in BOTH their runs — the r4 driver bench
    // showed rollup_agg/aov_pivot 4-6× their steady state purely from
    // landing early in the iteration. One throwaway pass warms the
    // shared machinery for everyone; failures surface in the timed
    // runs where they are recorded per-query.
    // A misspelled name must fail, not produce an instant-green
    // 0-second "benchmark" of nothing.
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the registry: " +
          unknown.mkString(", "))
    }
    val selected = only
      .map(o => SparkEntry.queries.filter(kv => o(kv._1)))
      .getOrElse(SparkEntry.queries)
    // Under EXIT_ON_CAP the global warmup pass is SKIPPED: a cap hit
    // during it would dirty the JVM for every query timed after, which
    // is exactly what this mode exists to prevent. Warmup moves
    // per-query (interleaved below): earlier queries in the same child
    // warm the shared JVM machinery, and each query's own untimed
    // warmup run amortizes its JIT before its timed runs.
    if (!exitOnCap) selected.foreach { case (_, fn) =>
      timeOnce(fn) // warmup: errors (and cap hits) surface in the
      ()           // timed runs where they are recorded per-query
    } else {
      // Whole-JVM warmup that is NOT subject to the cap: after each
      // isolate-on-cap restart the first query would otherwise pay
      // JVM cold start (classloading, codegen compiler, parquet
      // reader, noop committer) inside its CAPPED warmup run — a
      // 2-5 s tax that spuriously capped a 0.3 s query in testing.
      // One tiny shuffle+noop write and one small parquet scan warm
      // the shared machinery; per-query JIT still comes from each
      // query's own warmup below.
      try {
        spark.range(100000L)
          .groupBy(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit(100L)))
          .count().write.format("noop").mode("overwrite").save()
        Tables.load(spark, sfDir, "nation").write.format("noop")
          .mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    // both runs kept, sorted: "queries" reports the min (steady
    // state, the graded number), "runs" reports [min, max] so a
    // contended host is diagnosable from the JSON alone — a 10×
    // max/min spread is noise-on-this-box, a tight pair that is
    // uniformly slower than last round is a real regression. A
    // first-run error (incl. a cap hit) short-circuits: re-running
    // a known-capped query would double the sweep's stall budget.
    // min-of-1 for OFF-TIER sweeps (SPARK_GRAFT_BENCH_RUNS=1,
    // paired with the query cap): [min,max] collapse to the one
    // reading; every graded tier keeps the min-of-2 default.
    def timedRuns(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame)
        : Either[String, (Double, Double)] =
      timeOnce(fn) match {
        case Left(e) => Left(e)
        case Right(a) if runsPer <= 1 => Right((a, a))
        case Right(a) => timeOnce(fn) match {
          case Right(b) => Right((math.min(a, b), math.max(a, b)))
          case Left(e) => Left(e)
        }
      }
    def isCap(r: Either[String, (Double, Double)]): Boolean =
      r.left.exists(_.startsWith(CappedPrefix))
    val buf = scala.collection.mutable.ListBuffer
      .empty[(String, Either[String, (Double, Double)])]
    val it = selected.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val (name, fn) = it.next()
      // Untimed inter-query hygiene: an explicit GC lets Spark's
      // ContextCleaner reclaim the previous queries' broadcasts and
      // shuffle state NOW instead of mid-way through a later query's
      // timed run — at 8g heap the accumulated pressure inflated
      // unrelated queries' readings up to 15×; with 24g + this, a
      // query's full-run timing tracks its isolated cost.
      System.gc()
      val r =
        if (!exitOnCap) timedRuns(fn)
        else timeOnce(fn) match {
          // per-query warmup (the interleaved form — see above); a
          // warmup cap counts as THIS query's cap, the timed run
          // would only re-pay it. Other warmup errors are swallowed
          // and re-surface in the timed runs, as in the global pass.
          case Left(e) if e.startsWith(CappedPrefix) => Left(e)
          case _ => timedRuns(fn)
        }
      buf += name -> r
      // EXIT_ON_CAP: record the capped query, then stop — the parent
      // restarts a fresh JVM on the rest, so no reading ever comes
      // from a JVM that cancelled a job group.
      if (exitOnCap && isCap(r)) stop = true
    }
    val results = buf.toList
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(e)) => k -> e }
    val qs = ok.map { case (k, (mn, _)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val rs = ok.map { case (k, (mn, mx)) =>
      s"\"" + k + "\":[" + mn + "," + mx + "]" }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, e) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.map(_._2._1).sum else 0.0
    // Per-run noise calibration (r8 verdict item 7): scan_project is a
    // fixed 0-shuffle scan whose cost can only move with the host, so
    // its min is this run's noise constant — cross-round comparisons
    // divide by it before attributing a delta to a plan change.
    val calib = ok.collectFirst { case ("scan_project", (mn, _)) => mn }
    val calibJson = calib.map(c => s""","calibration_scan_project":$c""")
      .getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$qs,"runs":$rs,"errors":$es$calibJson,"sf":"$sfDir"}"""
    println(line)
    // The full line ALSO lands in a file: the driver's stdout capture
    // truncated BENCH_r08.json mid-JSON (parsed: null), losing ~90 of
    // 133 per-query timings — a sidecar file the driver (or anyone)
    // can read whole is the fix. The sidecar is COMMITTED per round
    // (un-gitignored in r10) so the round artifact set is
    // self-contained. Path override for dev A/B runs; a PARTIAL run
    // (SPARK_GRAFT_ONLY) must never clobber the committed full-surface
    // sidecar — an exploratory single-query run at an off-tier once
    // overwrote it with an error record — so without an explicit
    // override it lands in /tmp instead.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "/tmp/graft_bench_partial.json"
      else "bench_results.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full results written to $outPath")
    } catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outPath: $e")
    }
    // Locale.ROOT (advisory r10): a bare "%.3f".format under a
    // comma-decimal default locale would emit "value":1,234 — an
    // unparseable graded line.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Dedicated full-map line (r11 verdict item 5's alternate form):
    // the complete 3-decimal per-query map on ONE greppable line,
    // independent of the tail window below — anyone reading the raw
    // round log (or the driver, if it ever scans whole stdout) gets
    // all entries without opening the sidecar.
    val slowFirst = ok.sortBy { case (_, (mn, _)) => -mn }
    println("[bench-queries] {" + slowFirst.map { case (k, (mn, _)) =>
      "\"" + k + "\":" + f3(mn) }.mkString(",") + "}")
    // Final COMPACT line, sized for the driver's 2000-char tail
    // capture: the full line above is ~8 KB (139 names alone are
    // 1,844 B), so it can never parse from the tail — BENCH_r08/r09
    // both recorded `parsed: null`. ALL entries can never fit either:
    // names alone (1,844 B) + per-entry JSON overhead (~550 B) exceed
    // the 2000-char window before a single value is written, so the
    // complete map lives in the committed sidecar and the
    // [bench-queries] line; this last line keeps the graded
    // aggregates (total, calibration, errors) plus as many per-query
    // mins as fit, slowest-first (the rows a perf judgment actually
    // reads). Budget: the window minus sbt's trailing "[success]
    // Total time: …" line (~80 B measured in BENCH_r11.json's tail),
    // minus slack for its variance — 1840 B total line length.
    val head = s"""{"metric":"total","value":${f3(total)},"unit":"sec","cpus":$cpus,"n":${ok.size},"nerr":${errs.size}$calibJson,"sf":"$sfDir","full":"$outPath","queries":{"""
    val tailPart = "}}"
    val budget = 1840 - head.length - tailPart.length
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    slowFirst.foreach { case (k, (mn, _)) =>
      val e = "\"" + k + "\":" + f3(mn)
      val cost = e.length + (if (entries.nonEmpty) 1 else 0)
      if (used + cost <= budget) { entries += e; used += cost }
    }
    System.out.flush(); System.err.flush()
    println(head + entries.mkString(",") + tailPart)
    spark.stop()
    // EXIT_ON_CAP: exit 3 tells the parent "stopped at a cap, restart
    // me on the rest" — distinct from 1 (real error)
    if (exitOnCap &&
        errs.exists(_._2.startsWith(CappedPrefix)) &&
        results.size < selected.size) sys.exit(3)
    if (errs.nonEmpty) sys.exit(1)
  }
}
