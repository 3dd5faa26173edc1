package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StateProvider, StreamingOps}

/** Below-the-job profile of one streaming gate (r14 verdict item 1):
  * DevJobProfile shows the interval gates' cost as one opaque
  * micro-batch job; this tool re-runs a gate's pipeline with a handle
  * on the StreamingQuery and prints, per micro-batch, the runtime's
  * own decomposition — `durationMs` (addBatch vs walCommit vs
  * planning vs offset latch) and per-stateOperator metrics (rows
  * written/read, allUpdatesTimeMs, allRemovalsTimeMs, commitTimeMs,
  * provider custom metrics) — plus the DevJobProfile-style per-job
  * task rollup for the same run. This is the measurement the r15
  * state-store work reads; it changes nothing in the registry.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DevStreamProfile interval \
  *     /root/testdata/sf0.1"
  *
  * Env knobs for A/B (all default to the gate's graded configuration):
  *   SPARK_GRAFT_STATE_PROVIDER=hdfs|rocksdb   provider axis
  *   GRAFT_DEV_JOIN_PARTS=<n>   shuffle partitions for the gate body
  *   GRAFT_DEV_EXTRA_CONF=k=v[,k=v...]   arbitrary session confs
  */
object DevStreamProfile {

  private def stageEvents(s: SparkSession, d: String)
      : (String, DataFrame) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_streamprof").toString
    val ev = Tables.load(s, d, "events").where(col("ts").isNotNull)
    ev.write.mode("overwrite").parquet(s"$base/src")
    val src = s.readStream.schema(ev.schema).parquet(s"$base/src")
    (base, src)
  }

  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse(
      sys.error("usage: DevStreamProfile <interval|dedup|hourly> [sfDir]"))
    val sfDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("GRAFT_DEV_JOIN_PARTS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config(StateProvider.confKey, StateProvider.fromEnv())
    sys.env.get("GRAFT_DEV_EXTRA_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      "false")

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var taskMs: Long = 0L, var nTasks: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
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
          for (jid <- stageJob.get(e.stageId); j <- jobs.get(jid)
               if e.taskInfo != null) {
            j.taskMs += e.taskInfo.duration; j.nTasks += 1
          }
        }
    })

    def run(): Unit = {
      val (base, src) = stageEvents(spark, sfDir)
      val out = gate match {
        case "interval" =>
          val pts = src.select(col("event_id"), col("ts"), col("value"))
          val inc = src.where(col("event_type") === "signup")
            .select(col("event_id").as("inc_id"), col("ts").as("lo"))
          StreamingOps.streamingPointInIntervalJoin(
            pts, "ts", inc, "lo", "15 minutes", grainSec = 900,
            watermark = "45 days")
            .select(col("inc_id"), col("value"))
        case "dedup" =>
          StreamingOps.dedupWithinWatermark(
            src, Seq("user_id", "event_type"), "ts",
            watermark = "45 days")
            .select("user_id", "event_type")
        case other => sys.error(s"unknown gate $other")
      }
      val q = out.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(600000), "gate hung past 600s")
      println(s"[stream-profile] === micro-batches ($gate, " +
        s"provider=${sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")}, " +
        s"parts=$parts) ===")
      q.recentProgress.foreach { p =>
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[stream-profile] batch=${p.batchId} rows=${p.numInputRows} $dur")
        p.stateOperators.foreach { so =>
          val custom = so.customMetrics.asScala.toSeq.sorted
            .filter(_._2 != 0)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[stream-profile]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"updMs=${so.allUpdatesTimeMs} rmMs=${so.allRemovalsTimeMs} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
          if (custom.nonEmpty)
            println(s"[stream-profile]   custom: $custom")
        }
      }
    }

    run() // warmup
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[stream-profile] wall=$wall%.2f s (profiled run)")
    jobs.synchronized(jobs.values.toSeq).foreach { j =>
      val w = (j.end - j.start) / 1000.0
      println(f"[stream-profile] job=${j.id}%4d wall=${w}%7.2f " +
        f"taskSum=${j.taskMs / 1000.0}%8.2f nTasks=${j.nTasks}%5d")
    }
    spark.stop()
  }
}
