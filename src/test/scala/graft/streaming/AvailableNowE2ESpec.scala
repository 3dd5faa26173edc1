package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** End-to-end materialization of the streaming pipeline: file source →
  * sessionize / hourlyCounts → CHECKPOINTED PARQUET SINK, driven by
  * `Trigger.AvailableNow` across two runs (ingest, then a late file
  * that advances the watermark), asserted EQUAL to the batch oracles.
  * The transform-level parity specs (StreamingOpsSpec, SessionFuzzSpec)
  * prove the operators; this proves the full sink round-trip — offsets,
  * state store, watermark persistence, and append-mode flush all live
  * in the checkpoint between runs.
  */
class AvailableNowE2ESpec extends SparkSpec {
  import StreamingOps._
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("AvailableNow runs materialize sessionize + hourlyCounts to " +
    "checkpointed parquet equal to the batch oracles") {
    // values on the quarter grid so double sums are order-exact and
    // the streaming/batch comparison has zero float slack
    def ev(id: Long, min: Int, uid: Long, typ: String) =
      Event(id, ts(min), uid, typ, (id % 8) * 0.25)
    // 3 users over ~3 hours; 30-min gap splits each into sessions
    val fileA = Seq(
      ev(1, 0, 10, "click"), ev(2, 10, 10, "click"),
      ev(3, 20, 10, "view"),
      ev(4, 5, 11, "click"), ev(5, 50, 11, "view"),
      ev(6, 55, 11, "click"),
      ev(7, 15, 12, "view"))
    val fileB = Seq(
      ev(8, 90, 10, "click"), ev(9, 95, 10, "view"),
      ev(10, 130, 11, "click"),
      ev(11, 160, 12, "click"), ev(12, 170, 10, "view"))
    val real = fileA ++ fileB
    val gapMs = 30L * 60000
    val base = java.nio.file.Files
      .createTempDirectory("graft_e2e").toString
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()
    def writeFile(evs: Seq[Event], name: String, mtime: Long): Unit = {
      val tmp = s"$base/stage_$name"
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    writeFile(fileA, "a", 1000000000000L)
    writeFile(fileB, "b", 1000000002000L)

    val schema = real.toDF().schema
    def runOnce(): Unit = {
      def src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val qS = sessionize(src.as[Event], gapMs, watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", s"$base/out_sessions")
        .option("checkpointLocation", s"$base/ckpt_sessions")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(qS.awaitTermination(120000), "session query hung")
      val qH = hourlyCounts(src, watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", s"$base/out_hourly")
        .option("checkpointLocation", s"$base/ckpt_hourly")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(qH.awaitTermination(120000), "hourly query hung")
    }
    // run 1: ingest the real files. Append mode only emits what the
    // watermark has finalized — the tail windows/sessions stay in the
    // checkpointed state store.
    runOnce()
    // run 2: one far-future sentinel event advances the watermark past
    // every real window and session timeout; resuming from the same
    // checkpoints must flush EXACTLY the remainder (no duplicates, no
    // losses). The sentinel's own window/session stays unemitted —
    // correctly, it is not yet finalized.
    writeFile(Seq(ev(999, 60 * 24 * 30, -1, "sentinel")), "z",
      1000000004000L)
    runOnce()

    val gotSessions = spark.read.parquet(s"$base/out_sessions")
      .as[Session].collect().toSet
    val expSessions = sessionizeBatch(real.toDS(), gapMs)
      .collect().toSet
    assert(gotSessions === expSessions,
      "streamed sessions != batch oracle")
    assert(gotSessions.size === 8) // 3+3+2 per-user session splits

    val gotHourly = spark.read.parquet(s"$base/out_hourly")
      .select("hour_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val expHourly = hourlyCounts(real.toDF())
      .select("hour_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(gotHourly === expHourly,
      "streamed hourly counts != batch oracle")
    assert(gotHourly.nonEmpty &&
      !gotHourly.exists(_._2 == "sentinel"))

    // the checkpoints carried offsets + state across the two runs
    assert(new java.io.File(s"$base/ckpt_sessions/state").exists())
    assert(new java.io.File(s"$base/ckpt_hourly/offsets")
      .list().length >= 2, "run 2 did not resume from the checkpoint")
  }
}
