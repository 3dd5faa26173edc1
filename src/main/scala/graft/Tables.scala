package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver testdata star schema (TESTDATA.md).
  *
  * The reference (sfu-bigdata/orx-surgical, `cms_preprocess.py:26-51`) loads
  * five CSVs eagerly with manual column projection (`usecols=`). Here the
  * sources are columnar parquet and projection/pushdown is left to Catalyst:
  * a `select` above the scan prunes columns into the file reader, and
  * filters become `PushedFilters` — the scan-time optimizations the
  * reference hand-codes are free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so the engine's full
    * surface is reachable from `spark.sql(...)` (combine with
    * [[GraftExtensions]] for the native functions). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Read one testdata table from `dir` (e.g. /root/testdata/sf0.01).
    *
    * `events.ts` has shipped in two parquet physical types across testdata
    * generations: TIMESTAMP(NANOS) (older data — Spark's vectorized reader
    * rejects it with [PARQUET_TYPE_ILLEGAL] unless `nanosAsLong` surfaces
    * it as an epoch-nanos long) and TIMESTAMP(MICROS) (current data —
    * reads natively as a timestamp). The conversion below is therefore
    * SCHEMA-CONDITIONAL: only when `ts` arrives as LongType (the legacy
    * nanos path) do we truncate nanos→micros — the same truncation DuckDB
    * applies, so oracle comparison stays exact either way. Integer `div`
    * (not `/`) — epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range.
    * Micros data infers as TIMESTAMP_NTZ (isAdjustedToUTC=false +
    * `inferTimestampNTZ` default-on); we cast it to TimestampType because
    * downstream consumers require it (watermarks reject NTZ event time,
    * NTZ→BIGINT casts are illegal) — value-preserving because every graft
    * session pins `spark.sql.session.timeZone=UTC`.
    *
    * DELIBERATE SESSION SIDE EFFECT: `nanosAsLong` is a session-level SQL
    * conf (no per-read option exists) read lazily at execution time, so it
    * is set once and left set. On micros data it is a no-op; on nanos data
    * it makes the read possible at all.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
