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
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as epoch-nanos
    * long and truncate to a microsecond timestamp — the same ns→µs
    * truncation DuckDB applies, so oracle comparison stays exact.
    * Integer `div` (not `/`) — epoch-nanos ≈ 1.7e18 exceeds double's
    * 2^53 exact-integer range.
    *
    * DELIBERATE SESSION SIDE EFFECT: `nanosAsLong` is a session-level
    * SQL conf (no per-read option exists), and the events scan reads
    * it lazily at EXECUTION time — so it is set once and left set
    * rather than scoped-and-restored, which would break any events
    * DataFrame executed after the restore. Consequence: once events
    * has been loaded, other TIMESTAMP(NANOS) parquet reads in the
    * session surface as raw longs instead of failing; none of the
    * testdata tables besides events carry nanos.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
