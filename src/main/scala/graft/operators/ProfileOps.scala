package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** EDA profiling (S5 — the reference's `dataprep_report.py` HTML report,
  * re-expressed as a DataFrame you can inspect, store, or diff).
  *
  * One aggregate job computes every column's stats in a single pass
  * (all stat expressions ride in one `agg`), then the result is
  * unpivoted driver-side (the aggregate row is tiny — column count, not
  * row count). Numeric columns get min/max/mean/stddev; strings get
  * distinct estimates and length stats; everything gets null counts.
  */
object ProfileOps {

  /** Per-column profile: (column, dtype, n, nulls, distinct_approx,
    * min_v, max_v, mean_v, stddev_v) — numeric stats null for
    * non-numeric columns. `exactDistinct` switches the distinct count
    * from HLL (one pass, mergeable, the 100 TB answer) to exact
    * (adds a shuffle per column — small data only). */
  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      // MapType isn't hashable: count_distinct/approx_count_distinct
      // reject it at analysis and would fail the WHOLE one-pass agg,
      // not just this column — report distinct as 0 (no estimate)
      // instead. (Type walk shared with saltedAgg's salt derivation.)
      val distinct =
        if (RelationalOps.containsMapType(f.dataType))
          max(lit(null).cast("long"))
        else if (exactDistinct) count_distinct(c)
        else approx_count_distinct(c)
      Seq(
        count(c).as(s"${f.name}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        distinct.as(s"${f.name}__distinct")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast("double").as(s"${f.name}__min"),
            max(c).cast("double").as(s"${f.name}__max"),
            avg(c).as(s"${f.name}__mean"),
            stddev(c).as(s"${f.name}__stddev"))
          case StringType => Seq(
            min(length(c)).cast("double").as(s"${f.name}__min"),
            max(length(c)).cast("double").as(s"${f.name}__max"),
            avg(length(c)).as(s"${f.name}__mean"),
            stddev(length(c)).as(s"${f.name}__stddev"))
          case _ => Seq(
            lit(null).cast("double").as(s"${f.name}__min"),
            lit(null).cast("double").as(s"${f.name}__max"),
            lit(null).cast("double").as(s"${f.name}__mean"),
            lit(null).cast("double").as(s"${f.name}__stddev"))
        })
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = cols.map { f =>
      def g(suffix: String): Any = row.get(row.fieldIndex(
        s"${f.name}__$suffix"))
      (f.name, f.dataType.simpleString,
        g("n").asInstanceOf[Long], g("nulls").asInstanceOf[Long],
        g("distinct").asInstanceOf[Long],
        Option(g("min")).map(_.asInstanceOf[Double]),
        Option(g("max")).map(_.asInstanceOf[Double]),
        Option(g("mean")).map(_.asInstanceOf[Double]),
        Option(g("stddev")).map(_.asInstanceOf[Double]))
    }
    out.toSeq.toDF("column", "dtype", "n", "nulls", "distinct_approx",
      "min_v", "max_v", "mean_v", "stddev_v")
  }

  /** Render a [[profile]] result as the self-contained HTML report
    * artifact the reference emits (`dataprep_report.py:11,27` builds an
    * HTML profile per input frame). The profile row set is tiny (one
    * row per column), so rendering is a driver-side format of an
    * already-aggregated result — the distributed work stays in
    * [[profile]]. */
  def renderHtml(profileDf: DataFrame, title: String = "EDA report")
      : String = {
    val esc = (s: String) => s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val num = (v: Any) => v match {
      case null => ""
      // Locale.ROOT: the report must be byte-identical across JVMs —
      // a de_DE default locale would render comma decimal separators
      case d: Double =>
        String.format(java.util.Locale.ROOT, "%.4f", d)
      case x => x.toString
    }
    val rows = profileDf.collect().map { r =>
      val cells = Seq(esc(r.getAs[String]("column")),
        esc(r.getAs[String]("dtype")),
        r.getAs[Long]("n").toString, r.getAs[Long]("nulls").toString,
        r.getAs[Long]("distinct_approx").toString,
        num(r.get(r.fieldIndex("min_v"))),
        num(r.get(r.fieldIndex("max_v"))),
        num(r.get(r.fieldIndex("mean_v"))),
        num(r.get(r.fieldIndex("stddev_v"))))
      cells.mkString("<tr><td>", "</td><td>", "</td></tr>")
    }
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>body{font-family:sans-serif}table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 8px;text-align:right}
       |th{background:#eee}td:first-child{text-align:left}</style>
       |</head><body><h1>${esc(title)}</h1>
       |<table><tr><th>column</th><th>dtype</th><th>n</th><th>nulls</th>
       |<th>distinct≈</th><th>min</th><th>max</th><th>mean</th>
       |<th>stddev</th></tr>
       |${rows.mkString("\n")}
       |</table></body></html>""".stripMargin
  }

  /** Profile + render + write in one call — the `dataprep_report.py`
    * entry-point shape. */
  def writeHtmlReport(df: DataFrame, path: String,
                      title: String = "EDA report"): Unit = {
    val html = renderHtml(profile(df), title)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
