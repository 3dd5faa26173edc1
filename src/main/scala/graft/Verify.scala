package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // State-provider axis (r11 verdict item 4): the *_state gates
      // must be oracle-green under the documented 100-TB default
      // (RocksDB), not only the stock HDFS provider — ci.sh re-runs
      // the five gates with SPARK_GRAFT_STATE_PROVIDER=rocksdb.
      // Default "hdfs" keeps the driver's gate unchanged.
      .config(streaming.StateProvider.confKey,
        streaming.StateProvider.fromEnv())
      .config("spark.ui.enabled", "false")
      // Reference semantics: pd.to_numeric(errors='coerce') — bad casts
      // null out instead of raising (SURVEY.md §1.3).
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Testdata-drift canary (r6 postmortem): if the driver regenerated
    // the parquet with different column types, say so in ONE place with
    // the drifted column named, before the per-query failures start.
    // Warning, not fatal — a partial gate that names its cause beats an
    // empty one.
    val drift = TestdataSchema.driftAll(spark, sfDir)
    if (drift.nonEmpty) {
      System.err.println("[verify] WARNING: TESTDATA DRIFT DETECTED — " +
        "the tables no longer match the schema the engine was built " +
        "against; expect correlated query failures below:")
      drift.foreach(d => System.err.println(s"[verify]   $d"))
    }
    // Dev-only subset filter (same contract as Bench): the driver never
    // sets it, so the gate always dumps every query. Because
    // oracle_check.py only grades directories that exist, a LEAKED env
    // value (e.g. exported for a Bench run in the same shell) would
    // silently turn the correctness gate vacuous — so a partial dump
    // warns loudly, and an empty/unmatched filter (which would dump
    // NOTHING and grade green) is a hard error.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      if (f.isEmpty || unknown.nonEmpty) {
        System.err.println(s"[verify] FATAL: SPARK_GRAFT_ONLY=" +
          s"'${sys.env("SPARK_GRAFT_ONLY")}' selects no valid query" +
          (if (unknown.nonEmpty) s" (unknown: ${unknown.mkString(",")})"
           else "") + " — refusing a vacuous dump")
        sys.exit(1)
      }
      System.err.println(s"[verify] WARNING: SPARK_GRAFT_ONLY active — " +
        s"PARTIAL dump of ${f.size}/${SparkEntry.queries.size} " +
        "queries; this is NOT the correctness gate")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any previous run's output for this query: a stale
        // parquet left behind would let the driver grade old results
        // as current and a regression would ship green
        val stale = Paths.get(s"$outDir/$name")
        if (Files.exists(stale)) {
          import scala.jdk.CollectionConverters._
          val walk = Files.walk(stale)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
          finally walk.close() // stream holds directory handles
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
