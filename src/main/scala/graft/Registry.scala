package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-verifiable query: the Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Column names/types must match exactly — the
  * driver sorts columns by name and hash-compares values.
  */
final case class QDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QDef =
    QDef(fn, Some(sql))
  def noOracle(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(fn, None)
}

/** Central registry assembled from the per-domain query modules. */
object Registry {
  lazy val all: Map[String, QDef] = {
    val modules = Seq(
      operators.RelationalQueries.defs,
      operators.TextQueries.defs,
      operators.VectorQueries.defs,
      operators.EncoderQueries.defs,
      operators.ApproxQueries.defs,
      operators.AnalyticsQueries.defs,
      operators.CorpusQueries.defs,
      streaming.StreamGateQueries.defs,
      multimodal.MediaQueries.defs,
      cms.CmsQueries.defs)
    // Map ++ silently keeps the LAST duplicate — a colliding query name
    // would shadow an operator and shrink the driver's gate without any
    // failure. Refuse instead.
    val dups = modules.flatMap(_.keys)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names across modules: ${dups.mkString(", ")}")
    modules.reduce(_ ++ _)
  }
}
