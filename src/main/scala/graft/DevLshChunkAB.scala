package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev A/B: the LSH verify join WITH the triangle-chunking machinery
  * (count window + explode + chunk join keys) vs WITHOUT it
  * (blockRows = Int.MaxValue short-circuit), on a tier where every
  * bucket is under blockRows so both compute the identical pair set
  * with m = 1. Exists to attribute the sf10 dedup_embed_lsh delta
  * (r10 pre-chunking doc claim 24.1 s vs r12 settled-layout reading
  * 53-68 s; DevBuckets shows Σ(count²) unchanged, so the workload is
  * the same and the plan is the suspect). Interleaved min-of-2 after
  * a shared warmup, same constants as the registry query.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 runMain graft.DevLshChunkAB
  */
object DevLshChunkAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Same override Bench documents: partitions=cpus is right while a
    // partition's shuffle state fits its memory share; the ≥6M-vector
    // tiers need more slices (GROWTH_SF10.md's 256-partition note) or
    // the verify join pays a spill tax the work model doesn't include.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, sfDir, "embeddings")
    val probes = e.where(col("vec_id") % 10 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val n = e.count()
    def q(blockRows: Int, auto: Boolean = false) =
      Similarity.lshDedupPairs(
        e.unionByName(probes), threshold = 0.95,
        nBits = Similarity.adaptiveNBits(n), probes = 2,
        sizeHint = Some(n + n / 10 + 1), blockRows = blockRows,
        autoChunk = auto)
        .select(col("a_id"), col("b_id"), round(col("cos"), 6))
    // Per-job decomposition (the DevJobProfile listener) so a variant
    // delta attributes to a STAGE, not just a wall-clock pair.
    case class Job(id: Int, var taskMs: Long = 0L, var maxMs: Long = 0L,
                   var n: Int = 0, var start: Long = 0L, var end: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.synchronized {
            jobs(e.jobId) = Job(e.jobId, start = e.time)
            e.stageIds.foreach(s => stageToJob(s) = e.jobId)
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.synchronized {
            jobs.get(e.jobId).foreach(_.end = e.time) }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          jobs.synchronized {
            stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
              if (e.taskInfo != null) {
                j.taskMs += e.taskInfo.duration
                j.maxMs = math.max(j.maxMs, e.taskInfo.duration)
                j.n += 1
              }
            }
          }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = jobs.synchronized {
          val si = e.stageInfo
          println(f"[lsh-chunk-ab]   stage ${si.stageId}%3d " +
            f"n=${si.numTasks}%4d ${si.name.take(90)}")
        }
      })
    def time(blockRows: Int, auto: Boolean, label: String,
             profile: Boolean): Double = {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      q(blockRows, auto).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Untimed inter-run hygiene (same rationale as Bench's
      // inter-query GC): a run's shuffle files live until the
      // ContextCleaner collects the driver-side references, and at the
      // ≥10M-vector tiers one run writes tens of GB — two runs'
      // accumulated files exhausted this host's disk before the r14
      // GC was added. The explicit GC lets the cleaner drop the
      // previous run's shuffles NOW, bounding peak scratch to ~one run.
      System.gc()
      Thread.sleep(2000)
      if (profile) jobs.synchronized {
        println(f"[lsh-chunk-ab] $label wall=$dt%.2f per-job:")
        jobs.values.foreach { j =>
          println(f"[lsh-chunk-ab]   job ${j.id}%3d wall=${(j.end - j.start) / 1000.0}%7.2f taskSum=${j.taskMs / 1000.0}%8.2f maxTask=${j.maxMs / 1000.0}%7.2f n=${j.n}%4d")
        }
      }
      dt
    }
    time(Int.MaxValue, auto = false, "", profile = false) // warmup
    // three-way: legacy windowed chunking (the r12-measured tax) /
    // legacy short-circuit (the r12 default) / census auto (the r13
    // default — clean census at this tier ⇒ windowless plan + the
    // eager census job)
    // Variant selector for tiers where a variant is out of envelope:
    // SPARK_GRAFT_AB_ONLY=sc,auto skips e.g. the legacy windowed
    // chunking, whose extra window sort + two non-reusable
    // vector-bearing exchanges ENOSPC'd a 55 GB scratch disk at the
    // 10M-vector tier (the short-circuit and census routes, one
    // reused/payload exchange each, fit the same disk).
    val abOnly = sys.env.get("SPARK_GRAFT_AB_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    abOnly.foreach { s =>
      val unknown = s -- Set("chunked", "sc", "auto")
      require(unknown.isEmpty,
        s"SPARK_GRAFT_AB_ONLY: unknown variant(s) ${unknown.mkString(",")}")
    }
    def want(k: String): Boolean = abOnly.forall(_(k))
    var (tC, tU, tA) = (Double.MaxValue, Double.MaxValue, Double.MaxValue)
    for (i <- 1 to 2) {
      if (want("chunked")) tC = math.min(tC,
        time(2048, auto = false, s"legacy-chunked#$i", profile = true))
      if (want("sc")) tU = math.min(tU, time(Int.MaxValue, auto = false,
        s"short-circuit#$i", profile = true))
      if (want("auto")) tA = math.min(tA,
        time(2048, auto = true, s"census-auto#$i", profile = true))
    }
    def f(v: Double): String =
      if (v == Double.MaxValue) "skipped" else f"$v%.2f s"
    println(s"[lsh-chunk-ab] n=$n legacyChunked(2048)=${f(tC)}  " +
      s"shortCircuit(MaxValue)=${f(tU)}  " +
      s"censusAuto(block=2048,engage=4096)=${f(tA)}" +
      (if (tC != Double.MaxValue && tU != Double.MaxValue)
        f"  chunked/sc=${tC / tU}%.2f" else "") +
      (if (tA != Double.MaxValue && tU != Double.MaxValue)
        f"  auto/sc=${tA / tU}%.2f" else ""))
    spark.stop()
  }
}
