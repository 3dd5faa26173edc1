package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-Spark-job decomposition of one registry query — the drill-down
  * behind docs/CORES_SCALE.md. Strong-scaling failures come in shapes
  * the top-line (wall, util) pair cannot tell apart: a serial kernel
  * stage, an iterative algorithm paying per-round scheduling latency,
  * a driver-side collect between jobs (inter-job GAP time), or
  * shuffle-machinery task time that inflates with the slot count. One
  * row per job — wall, Σ task time, task count, longest task — plus
  * the gap total makes the shape legible:
  *
  *   SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *     sbt "runMain graft.DevJobProfile semantic_dedup"
  *
  * Methodology matches Bench: one untimed warmup execution, then one
  * profiled run (min-of-2 is pointless here — per-job rows are read
  * relative to each other within the run).
  */
object DevJobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: DevJobProfile <queryName> [sfDir]"))
    val sfDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var taskMs: Long = 0L, var maxTaskMs: Long = 0L,
                   var nTasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    // AQE materializes shuffle stages as CONCURRENT jobs, so tasks must
    // be attributed via the stage → job mapping JobStart carries, not
    // "the last-started job" (which produced util > 1 rows on the
    // first run of this tool).
    val stageJob = scala.collection.mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time)
          e.stageInfos.foreach(si => stageJob(si.stageId) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          for {
            jid <- stageJob.get(e.stageId)
            j <- jobs.get(jid)
            if e.taskInfo != null
          } {
            j.taskMs += e.taskInfo.duration
            j.maxTaskMs = math.max(j.maxTaskMs, e.taskInfo.duration)
            j.nTasks += 1
          }
        }
    })

    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)

    println(f"[profile] $name cores=$cpus wall=$wall%.2f s")
    println(f"[profile] ${"job"}%4s ${"wall_s"}%8s ${"taskSum_s"}%10s " +
      f"${"maxTask_s"}%10s ${"nTasks"}%7s ${"util"}%6s")
    var prevEnd = 0L
    var gapMs = 0L
    jobs.synchronized(jobs.values.toSeq).foreach { j =>
      val w = (j.end - j.start) / 1000.0
      if (prevEnd > 0 && j.start > prevEnd) gapMs += j.start - prevEnd
      prevEnd = math.max(prevEnd, j.end)
      val u = if (w > 0) j.taskMs / 1000.0 / (w * cpus.toInt) else 0.0
      println(f"[profile] ${j.id}%4d ${w}%8.2f ${j.taskMs / 1000.0}%10.2f " +
        f"${j.maxTaskMs / 1000.0}%10.2f ${j.nTasks}%7d $u%6.2f")
    }
    println(f"[profile] inter-job gap total: ${gapMs / 1000.0}%.2f s " +
      "(driver-side work between jobs: collects, planning, UF)")
    spark.stop()
  }
}
