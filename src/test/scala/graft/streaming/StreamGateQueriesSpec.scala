package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming driver-gate entries run end-to-end on the smoke-scale
  * testdata and match batch oracles computed in-engine. The DuckDB
  * hash-compare at sf0.01 is the authoritative gate; this pins the same
  * semantics in `sbt test` so a regression is red before the driver
  * runs — and asserts the gate-critical invariant (exactly one sink row
  * per key / per join match) that a checkpoint or append-mode bug would
  * break first.
  */
class StreamGateQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_stream_state emits exactly the distinct key set") {
    val got = StreamGateQueries.defs("dedup_stream_state")
      .fn(spark, sfDir)
      .as[(Long, String)].collect()
    val exp = Tables.load(spark, sfDir, "events")
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
      .as[(Long, String)].collect()
    // sets equal AND no duplicate rows left the sink
    assert(got.length === exp.length, "sink emitted duplicate keys")
    assert(got.toSet === exp.toSet)
    assert(got.nonEmpty)
  }

  test("interval_join_state matches the batch point-in-interval join") {
    val got = StreamGateQueries.defs("interval_join_state")
      .fn(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    val ev = Tables.load(spark, sfDir, "events")
      .where(col("ts").isNotNull)
    val p = ev.select(col("ts").as("pt"), col("value"))
    val i = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("inc_id"), col("ts").as("lo"))
    // plain theta-join batch oracle — independent of the grain-bucket
    // rewrite under test (sum through decimal, same as the engine, so
    // the comparison is bit-exact)
    val exp = p.join(i, col("pt") >= col("lo") &&
        col("pt") <= col("lo") + expr("INTERVAL 15 MINUTES"))
      .groupBy("inc_id")
      .agg(count(lit(1)).as("n_events"),
        graft.operators.RelationalOps.exactSum(col("value"), 6)
          .as("sum_value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("window_hourly_state flushes every real window exactly once " +
    "under a finite watermark") {
    val got = StreamGateQueries.defs("window_hourly_state")
      .fn(spark, sfDir)
      .as[(java.sql.Timestamp, String, Long)].collect()
    val exp = Tables.load(spark, sfDir, "events")
      .where(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect()
    // exact multiset: a stuck window (never flushed) or a double
    // emission both change the length before the set
    assert(got.length === exp.length,
      "append-mode flush emitted a window zero or two times")
    assert(got.toSet === exp.toSet)
    assert(!got.exists(_._2 == "__sentinel"),
      "sentinel rows must not reach the gated surface")
  }

  test("sink_exactly_once_state lands every event exactly once " +
    "across the mid-drain kill and restart") {
    val got = StreamGateQueries.defs("sink_exactly_once_state")
      .fn(spark, sfDir)
      .as[(Long, Long, String, Double)].collect()
    val exp = Tables.load(spark, sfDir, "events")
      .where(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .as[(Long, Long, String, Double)].collect()
    // exact multiset: a replayed batch duplicates rows, a lost one
    // drops them — both move the length before the set
    assert(got.length === exp.length,
      s"sink holds ${got.length} rows, expected ${exp.length}: " +
        "restart duplicated or dropped a batch")
    assert(got.toSet === exp.toSet)
    assert(got.nonEmpty)
  }

  test("a file-sink read goes through the manifest: orphan part " +
    "files from a killed batch are excluded") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files
      .createTempDirectory("graft_orphan").toString
    val srcDir = s"$base/src"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamStage.stageFile(df, srcDir, "a", 1000000000000L)
    val q = spark.readStream.schema(df.schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // simulate the killed batch's leftover: a parquet part file in
    // the sink dir that NO manifest entry records
    Seq((99L, "orphan")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/stray")
    val part = new java.io.File(s"$base/stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(
      s"$base/out/part-99999-orphan.snappy.parquet"))
    val ids = spark.read.parquet(s"$base/out")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L),
      "orphan part file leaked into the manifest-filtered read - " +
        "the exactly-once read surface is broken")
  }
}
