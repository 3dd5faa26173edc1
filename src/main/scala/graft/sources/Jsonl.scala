package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) source/sink — the interchange
  * format public LLM corpora actually ship in (C4, The Pile,
  * RedPajama dumps are (compressed) JSONL). Spark's `json` source is
  * line-delimited by default, but two of its defaults are wrong at
  * corpus scale and these wrappers pin them:
  *
  *  - **No schema inference.** Inference is a full pre-scan of the
  *    data (a second 100 TB read before the first real one). The
  *    schema is required here; the read plans straight off it and
  *    column pruning reaches the parser (Spark's JSON reader skips
  *    parsing unprojected fields).
  *  - **No silent corruption.** PERMISSIVE mode turns an unparseable
  *    line into an all-null row; at billions of lines that is data
  *    loss with no witness. [[read]] routes bad lines into a
  *    `_corrupt` column so callers count/quarantine them explicitly;
  *    [[readStrict]] fails the job on the first bad line.
  *
  * Compression: pass e.g. `compression = "gzip"` on write. Note gzip
  * files are NOT splittable — one multi-GB .jsonl.gz becomes one
  * task. Large corpora should shard (many files, the default here
  * since each partition writes its own file) rather than concatenate.
  */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** Read with explicit schema; unparseable lines appear as rows with
    * every data column null and the raw line in `_corrupt`. (Spark
    * requires the corrupt column to be part of the read schema, and a
    * query may not select ONLY the corrupt column — always carry at
    * least one data column when filtering on it.) */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Read with explicit schema, failing loudly on the first
    * unparseable line. */
  def readStrict(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** The parsed rows and the corrupt raw lines, separately — the
    * quarantine split a production ingest wants. Implemented as ONE
    * text scan + `from_json` rather than the corrupt-record column:
    * Spark refuses plans whose file read projects only the corrupt
    * column ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]),
    * and the documented workaround (cache the parse) is a corpus-sized
    * materialization. The expression-level corrupt record has neither
    * problem: the corrupt field rides INSIDE the parsed struct and
    * both branches plan off the same scan.
    *
    * Routing: whitespace-only lines are separators, not records —
    * skipped, matching the PERMISSIVE file reader. Everything else
    * lands in exactly one side: unparseable lines AND lines whose
    * fields mismatch the schema's types go to the quarantine (the
    * corrupt field carries the raw line — type drift is surfaced, not
    * silently nulled); only lines that parse cleanly reach the good
    * side. The residual null-struct defense (`j.isNull`) exists
    * because `from_json` returns a null struct for some degenerate
    * inputs (e.g. a literal `null`) rather than setting the corrupt
    * field — those quarantine the raw line too, so no input can
    * become an all-null "parsed" row. */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{coalesce, from_json, trim}
    val full = schema.add(CorruptCol, StringType)
    val parsed = spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(col("value"), from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol).asJava).as("j"))
    val bad = col("j").isNull || col(s"j.$CorruptCol").isNotNull
    (parsed.where(!bad).select("j.*").drop(CorruptCol),
      parsed.where(bad)
        .select(coalesce(col(s"j.$CorruptCol"), col("value"))
          .as(CorruptCol)))
  }

  /** Streaming JSONL ingest (Structured Streaming file source): tail a
    * landing directory of JSONL drops with the same pinned schema
    * discipline as [[read]] — no inference (a streaming source cannot
    * re-scan for it anyway; Spark requires the schema up front) and
    * corrupt lines quarantined into `_corrupt` instead of nulled.
    * Compose with `writeStream` + watermarked transforms downstream;
    * `JsonlSpec` drives it through a file-source round trip. */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Write as sharded JSONL, one file per partition. */
  def write(df: DataFrame, path: String,
            compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression).json(path)
}
