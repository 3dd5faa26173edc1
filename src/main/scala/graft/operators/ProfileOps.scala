package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Equal-width histograms for numeric columns — the report's
    * "distributions" section, computed for ALL requested columns in
    * TWO passes total regardless of column count: one tiny agg for
    * the (min, max) bounds, then one unpivot + groupBy over
    * (column, bin). Binning arithmetic is plain IEEE ops on the same
    * doubles in any engine (hash-exact under a DuckDB replay).
    * Nulls are excluded; a constant column lands entirely in bin 0.
    *
    * @return (column, bin, bin_lo, n) with bin ∈ [0, bins)
    */
  def histograms(df: DataFrame, cols: Seq[String], bins: Int = 20,
                 bounds: Option[Map[String, (Double, Double)]] = None)
      : DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(cols.nonEmpty, "histograms needs at least one column")
    // Non-finite values are EXCLUDED from both bounds and bins: a
    // single NaN makes max() return NaN (NaN sorts largest) and an
    // Infinity collapses (v-mn)/(mx-mn) to 0 — either silently
    // flattened a whole column's distribution into one bin.
    def finite(c: Column): Column = {
      val d = c.cast("double")
      when(isnan(d) || d === Double.PositiveInfinity ||
        d === Double.NegativeInfinity, lit(null).cast("double"))
        .otherwise(d)
    }
    // Per-column bound: the caller-supplied value when finite (e.g.
    // profile()'s min_v/max_v, saving a full bounds pass), else the
    // lazily-computed non-finite-excluded aggregate (run at most once,
    // and not at all when every supplied bound is usable).
    lazy val boundsRow: org.apache.spark.sql.Row = {
      val boundAggs = cols.flatMap { c =>
        Seq(min(finite(col(c))).as(s"${c}__mn"),
          max(finite(col(c))).as(s"${c}__mx"))
      }
      df.agg(boundAggs.head, boundAggs.tail.toSeq: _*).head()
    }
    def b(c: String, s: String): Option[Double] = {
      val supplied = bounds.flatMap(_.get(c))
        .map(p => if (s == "mn") p._1 else p._2)
        .filterNot(v => v.isNaN || v.isInfinite)
      supplied.orElse(
        Option(boundsRow.get(boundsRow.fieldIndex(s"${c}__$s")))
          .map(_.asInstanceOf[Double]))
    }
    // unpivot to (column, value) and bin with per-column literal
    // bounds — one scan, one shuffle on (column, bin)
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        finite(col(c)).as("v"))): _*)).as("cv"))
      .select(col("cv.column").as("column"), col("cv.v").as("v"))
      .where(col("v").isNotNull)
    // clamped on BOTH ends so the contract bin ∈ [0, bins) holds even
    // under caller-supplied bounds narrower than the data (values
    // below the min fold into bin 0, above the max into bins-1)
    val binExpr = cols.map { c =>
      (b(c, "mn"), b(c, "mx")) match {
        case (Some(mn), Some(mx)) if mx > mn =>
          (c, greatest(least(floor((col("v") - mn) / (mx - mn) * bins),
            lit(bins - 1)), lit(0)).cast("int"),
            lit(mn) + col("bin") * lit((mx - mn) / bins))
        case (Some(mn), _) => (c, lit(0), lit(mn))
        case _ => (c, lit(0), lit(null).cast("double"))
      }
    }
    val binCol = binExpr.foldLeft(lit(-1).cast("int")) {
      case (acc, (c, e, _)) => when(col("column") === c, e).otherwise(acc)
    }
    val loCol = binExpr.foldLeft(lit(null).cast("double")) {
      case (acc, (c, _, lo)) => when(col("column") === c, lo)
        .otherwise(acc)
    }
    stacked.withColumn("__bin", binCol)
      .groupBy(col("column"), col("__bin").as("bin"))
      .agg(count("*").as("n"))
      .withColumn("bin_lo", loCol.as("bin_lo"))
      .select("column", "bin", "bin_lo", "n")
  }

  /** Pairwise Pearson correlations — the report's "interactions"
    * section, ALL pairs in ONE aggregate pass: per-column and
    * per-pair moment sums ride a single `agg` (shared single-column
    * sums are computed once, not once per pair), routed through
    * exact integer arithmetic so partial-aggregation order cannot
    * perturb bits (`corr()` itself accumulates doubles
    * order-dependently and is not cross-engine-reproducible). The
    * closed form then runs on the tiny moment row. Columns must be
    * non-null numeric.
    *
    * Exact mode quantizes each value to `scale` decimals and sums
    * moments in long lanes ([[RelationalOps.q4]] family — codegen'd
    * integer sums, ~2× the whole query vs the decimal(28) BigDecimal
    * path). The lane domain (|quantized value| < 2^31.5, so per-row
    * products fit Int64) is checked with `max(abs(q))` aggregates
    * riding the SAME pass, and the row count is bounded by
    * [[RelationalOps.laneMaxRows]] = 2^31−1 in the same row (past it
    * the lane SUMS themselves would wrap Int64 even with every value
    * in-domain); on violation of either the decimal(28, scale) form
    * recomputes — slower, 28-digit domain, and it quantizes each
    * PRODUCT after multiplying where the lanes quantize each FACTOR
    * before (both deterministic, not bit-identical to each other; an
    * oracle must replay whichever form actually ran). Either way
    * values quantize to `scale`
    * decimals (micro-scale data sums to zero); for arbitrary frames
    * (writeHtmlReport) pass exact = false: plain double moments, no
    * quantization, no domain bound, merely not bit-reproducible
    * across engines.
    *
    * @return (col_a, col_b, corr) for each unordered pair, corr
    *         rounded to 6 decimals, NaN → null for constant columns
    */
  def correlations(df: DataFrame, cols: Seq[String],
                   scale: Int = 4,
                   exact: Boolean = true): DataFrame = {
    require(cols.size >= 2, "correlations needs at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))

    // shared closed form over a one-row moment frame with columns
    // __n, __s__c, __ss__c, __sp__a__b
    def closedForm(row: org.apache.spark.sql.Row)
        : Seq[(String, String, Option[Double])] = {
      def g(name: String): Double = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
      }
      val n = g("__n")
      pairs.map { case (a, b) =>
        // n == 0 (empty frame) leaves every sum NULL → NaN → null corr
        // rather than an NPE out of Row.getDouble
        val (sx, sy) = (g(s"__s__$a"), g(s"__s__$b"))
        val (sxx, syy) = (g(s"__ss__$a"), g(s"__ss__$b"))
        val sxy = g(s"__sp__${a}__$b")
        val c = (n * sxy - sx * sy) /
          math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        (a, b, if (c.isNaN) None
        else Some(math.floor(c * 1e6 + 0.5) / 1e6))
      }
    }

    def momentRow(msum: Column => Column): org.apache.spark.sql.Row = {
      val aggs = Seq(count("*").cast("double").as("__n")) ++
        cols.flatMap(c => Seq(msum(col(c)).as(s"__s__$c"),
          msum(col(c) * col(c)).as(s"__ss__$c"))) ++
        pairs.map { case (a, b) =>
          msum(col(a) * col(b)).as(s"__sp__${a}__$b")
        }
      df.agg(aggs.head, aggs.tail: _*).head()
    }

    val out: Seq[(String, String, Option[Double])] =
      if (!exact) closedForm(momentRow(c => sum(c.cast("double"))))
      else {
        // fast path: long-lane moments on quantized values. Products
        // are formed on the QUANTIZED longs (q(a)·q(b), exact), not by
        // quantizing the double product — the oracle SQL mirrors this.
        def q(c: String): Column = RelationalOps.q4(col(c), scale)
        // domain guard on signed min/max, NOT max(abs(q)):
        // abs(Long.MinValue) is itself negative, so a value that
        // clamped to Long.MinValue would never win a max-of-abs and
        // the overflow fallback would silently not fire
        val laneAggs = Seq(count("*").cast("double").as("__n")) ++
          cols.flatMap(c => Seq(
            RelationalOps.q4Sum(q(c), scale).as(s"__s__$c"),
            RelationalOps.q4ProdSum(q(c), q(c), scale).as(s"__ss__$c"),
            min(q(c)).as(s"__qmin__$c"),
            max(q(c)).as(s"__qmax__$c"))) ++
          pairs.map { case (a, b) =>
            RelationalOps.q4ProdSum(q(a), q(b), scale)
              .as(s"__sp__${a}__$b")
          }
        val row = df.agg(laneAggs.head, laneAggs.tail: _*).head()
        // row-count half of the lane domain (RelationalOps.laneMaxRows):
        // the lo lane adds up to 2^32−1 per row, so past 2^31−1 rows the
        // lane SUM wraps silently even when every value is in-domain —
        // count(*) rides the same pass, so the check is free
        val nRows = row.getDouble(row.fieldIndex("__n"))
        val inDomain = nRows <= RelationalOps.laneMaxRows.toDouble &&
          cols.forall { c =>
          val lo = row.fieldIndex(s"__qmin__$c")
          val hi = row.fieldIndex(s"__qmax__$c")
          (row.isNullAt(lo) ||
            row.getLong(lo) >= -RelationalOps.q4MaxAbs) &&
          (row.isNullAt(hi) ||
            row.getLong(hi) <= RelationalOps.q4MaxAbs)
        }
        if (inDomain) closedForm(row)
        else closedForm(momentRow(c =>
          RelationalOps.exactSum(c, scale, precision = 28)))
      }
    out.toDF("col_a", "col_b", "corr")
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

  /** Profile + distributions + interactions, rendered and written in
    * one call — the `dataprep_report.py` entry-point shape (its HTML
    * report carries per-column stats, distribution plots, and
    * correlation/interaction tables; dataprep_report.py:11,27).
    * Numeric columns are detected from the schema; histogram and
    * correlation sections are appended when any exist.
    *
    * `exactCorr = true` routes the interactions section through the
    * quantized lane-sum moments ([[correlations]] exact mode) — the
    * SAME arithmetic the oracle-gated `profile_corr` query runs, so
    * the persisted artifact's corr digits equal the gate's
    * bit-for-bit (ProfileOpsSpec pins this). Leave false for
    * arbitrary frames whose magnitudes may sit outside the lane/
    * decimal quantization domain. */
  def writeHtmlReport(df: DataFrame, path: String,
                      title: String = "EDA report",
                      exactCorr: Boolean = false): Unit = {
    val prof = profile(df)
    val numCols = df.schema.fields
      .collect { case f if f.dataType.isInstanceOf[NumericType] =>
        f.name }.toSeq
    // correlations require non-null columns (the one-pass moment sums
    // would pair count(*) with null-skipping sums); use the profile's
    // own null counts to keep nullable columns out of that section
    val nullFree = {
      val nulls = prof.select("column", "nulls").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      numCols.filter(nulls(_) == 0L)
    }
    val esc = (s: String) => s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val extra = new StringBuilder
    if (numCols.nonEmpty) {
      extra ++= s"<h2>Distributions (20 bins)</h2>\n<table><tr>" +
        "<th>column</th><th>bin</th><th>bin_lo</th><th>n</th></tr>\n"
      val profBounds = prof
        .select("column", "min_v", "max_v").collect()
        .flatMap { r =>
          (Option(r.get(1)), Option(r.get(2))) match {
            case (Some(mn: java.lang.Double), Some(mx: java.lang.Double))
              if numCols.contains(r.getString(0)) =>
              Some(r.getString(0) ->
                (mn.doubleValue, mx.doubleValue))
            case _ => None
          }
        }.toMap
      histograms(df, numCols, bounds = Some(profBounds))
        .orderBy("column", "bin").collect()
        .foreach { r =>
          extra ++= s"<tr><td>${esc(r.getString(0))}</td>" +
            s"<td>${r.getInt(1)}</td>" +
            s"<td>${Option(r.get(2)).map(v => String.format(
              java.util.Locale.ROOT, "%.4f",
              v.asInstanceOf[java.lang.Double])).getOrElse("")}</td>" +
            s"<td>${r.getLong(3)}</td></tr>\n"
        }
      extra ++= "</table>\n"
    }
    if (nullFree.size >= 2) {
      extra ++= "<h2>Interactions (Pearson)</h2>\n<table><tr>" +
        "<th>col_a</th><th>col_b</th><th>corr</th></tr>\n"
      // exactCorr=false (default): arbitrary report frames need the
      // unquantized, overflow-free double moments; the deliberate
      // trade is that the interactions section (alone) is not
      // byte-reproducible across partitioning layouts — a corr at a
      // 6th-decimal rounding boundary can flip its last digit.
      // renderHtml's byte-identity doctrine holds for the profile and
      // distribution sections either way, and for interactions too
      // under exactCorr=true (lane-sum moments, in-domain data).
      correlations(df, nullFree, exact = exactCorr).collect()
        .foreach { r =>
        extra ++= s"<tr><td>${esc(r.getString(0))}</td>" +
          s"<td>${esc(r.getString(1))}</td>" +
          s"<td>${Option(r.get(2)).map(v => String.format(
            java.util.Locale.ROOT, "%.6f",
            v.asInstanceOf[java.lang.Double])).getOrElse("")}</td>" +
          "</tr>\n"
      }
      extra ++= "</table>\n"
    }
    val html = renderHtml(prof, title)
      .replace("</body></html>", extra.toString + "</body></html>")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
