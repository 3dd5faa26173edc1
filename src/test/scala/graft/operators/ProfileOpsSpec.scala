package graft.operators

import graft.{SparkSpec, Tables}
import graft.cms.CmsPipeline
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes one row per column with type-aware stats") {
    val df = Seq(
      (1, "aa", Some(1.5)), (2, "bbb", None), (3, "aa", Some(2.5))
    ).toDF("id", "s", "v")
    val p = ProfileOps.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "v"))
    val id = p("id")
    assert(id.getLong(2) === 3 && id.getLong(3) === 0)
    assert(id.getLong(4) === 3)
    assert(id.getDouble(5) === 1.0 && id.getDouble(6) === 3.0)
    val s = p("s") // string: length stats
    assert(s.getLong(4) === 2)
    assert(s.getDouble(5) === 2.0 && s.getDouble(6) === 3.0)
    val v = p("v")
    assert(v.getLong(2) === 2 && v.getLong(3) === 1)
    assert(v.getDouble(7) === 2.0) // mean of 1.5, 2.5
  }

  test("profile is a single aggregate job over testdata lineitem") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = ProfileOps.profile(li)
    assert(p.count() === li.columns.length)
    val qty = p.where(col("column") === "l_quantity").head()
    assert(qty.getLong(2) === 6000)
  }

  test("histograms bin all requested columns in one pass: totals " +
    "preserved, bins in range, constant column collapses to bin 0") {
    val df = Seq.tabulate(100)(i =>
      (i.toDouble, 7.0, if (i % 10 == 0) None else Some(i * 2.0)))
      .toDF("a", "c", "withnulls")
    val h = ProfileOps.histograms(df, Seq("a", "c", "withnulls"),
      bins = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
    val byCol = h.groupBy(_._1)
    // totals = non-null counts
    assert(byCol("a").map(_._3).sum === 100)
    assert(byCol("c").map(_._3).sum === 100)
    assert(byCol("withnulls").map(_._3).sum === 90)
    // equal-width over 0..99 with 10 bins → 10 per bin
    assert(byCol("a").length === 10 &&
      byCol("a").forall(_._3 === 10))
    assert(h.forall(x => x._2 >= 0 && x._2 < 10))
    // constant column: everything in bin 0
    assert(byCol("c") === Array(("c", 0, 100L)))
  }

  test("correlations matches Spark's own corr() and pins the exact " +
    "perfect/anti cases") {
    val df = Seq.tabulate(50)(i =>
      (i.toDouble, i * 3.0 + 1, -2.0 * i, (i % 7).toDouble))
      .toDF("x", "lin", "neg", "noise")
    val got = ProfileOps.correlations(df,
      Seq("x", "lin", "neg", "noise")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("x", "lin")) === Some(1.0))
    assert(got(("x", "neg")) === Some(-1.0))
    val builtin = df.stat.corr("x", "noise")
    assert(math.abs(got(("x", "noise")).get - builtin) < 1e-6)
    assert(got.size === 6) // all unordered pairs, one row each
  }

  test("renderHtml emits the self-contained report artifact with one " +
    "row per column and escaped content") {
    val df = Seq((1, "a<b", Some(1.5)), (2, "ok", None))
      .toDF("id", "s<tag>", "v")
    val html = ProfileOps.renderHtml(ProfileOps.profile(df,
      exactDistinct = true), title = "t&t")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<title>t&amp;t</title>"))
    assert(html.contains("<td>s&lt;tag&gt;</td>"), "column name escaped")
    assert(html.contains("<td>id</td>"))
    assert(html.contains("<td>v</td>"))
    // one <tr> per column + header
    assert("<tr>".r.findAllIn(html).size === df.columns.length + 1)
    // end-to-end writer
    val path = java.nio.file.Files
      .createTempDirectory("graft_eda").resolve("report.html").toString
    ProfileOps.writeHtmlReport(df, path)
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    assert(written.endsWith("</body></html>"))
    // v is nullable → excluded from correlations (one numeric
    // null-free column left: no interactions section, but the
    // distribution section still renders)
    assert(written.contains("<h2>Distributions (20 bins)</h2>"))
    assert(!written.contains("<h2>Interactions"))
  }

  test("histograms exclude non-finite values instead of flattening " +
    "the column, and accept precomputed bounds") {
    val df = (1 to 100).map(_.toDouble).toDF("a")
      .union(Seq(Double.NaN, Double.PositiveInfinity).toDF("a"))
    val h = ProfileOps.histograms(df, Seq("a"), bins = 10).collect()
      .map(r => (r.getInt(1), r.getLong(3)))
    // a NaN previously made max() = NaN and collapsed everything to
    // bin 0; now 1..100 spreads over all 10 bins, non-finite dropped
    assert(h.map(_._2).sum === 100)
    assert(h.length === 10 && h.forall(_._2 === 10))
    // supplied bounds skip the bounds pass and bin identically
    val h2 = ProfileOps.histograms(df, Seq("a"), bins = 10,
      bounds = Some(Map("a" -> (1.0, 100.0)))).collect()
      .map(r => (r.getInt(1), r.getLong(3))).toSet
    assert(h2 === h.toSet)
  }

  test("correlations: empty frame yields null corr (no NPE); " +
    "exact=false handles micro-scale data the decimal path cannot") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val e = ProfileOps.correlations(empty, Seq("x", "y")).collect()
    assert(e.length === 1 && e(0).isNullAt(2))
    // micro-scale: every value AND product stays below decimal(28,4)'s
    // 0.00005 rounding threshold (max 5e-6), so exact mode quantizes
    // every moment to zero by construction — no rounding knife-edges
    val micro = (1 to 50).map(i => (i * 1e-7, i * 2e-7)).toDF("x", "y")
    val exact = ProfileOps.correlations(micro, Seq("x", "y"))
      .collect()(0)
    assert(exact.isNullAt(2)) // quantized to 0 → undefined, null
    val dbl = ProfileOps.correlations(micro, Seq("x", "y"),
      exact = false).collect()(0)
    assert(dbl.getDouble(2) === 1.0)
  }

  test("writeHtmlReport appends distribution and interaction " +
    "sections for numeric columns") {
    val df = Seq.tabulate(30)(i => (i.toDouble, i * 2.0, s"s$i"))
      .toDF("x", "y", "s")
    val out = java.nio.file.Files
      .createTempFile("graft_eda", ".html").toString
    ProfileOps.writeHtmlReport(df, out)
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8")
    assert(html.contains("<h2>Distributions (20 bins)</h2>"))
    assert(html.contains("<h2>Interactions (Pearson)</h2>"))
    assert(html.contains("1.000000")) // corr(x, y) exactly 1
    assert(html.endsWith("</body></html>"))
  }

  test("writeHtmlReport artifact numbers equal the oracle-gated " +
    "profile_summary / profile_histogram / profile_corr outputs " +
    "(S5 as an artifact, not just three result sets)") {
    // The three queries are the driver-gated truth; the report is the
    // reference's dataprep_report.py-shaped artifact. This pins that
    // the persisted file is the SAME numbers — parse the HTML tables
    // back and compare cell-for-cell against the Registry queries on
    // the same data (exactCorr=true routes the interactions section
    // through the identical lane-sum arithmetic profile_corr gates).
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val out = java.nio.file.Files
      .createTempFile("graft_eda_parity", ".html").toString
    ProfileOps.writeHtmlReport(li, out, exactCorr = true)
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8")
    def fmt(d: Double, p: String) =
      String.format(java.util.Locale.ROOT, p, Double.box(d))
    // section-split so identical cell shapes can't cross-match
    val profSec = html.substring(0, html.indexOf("<h2>"))
    val histSec = html.substring(
      html.indexOf("<h2>Distributions"),
      html.indexOf("<h2>Interactions"))
    val corrSec = html.substring(html.indexOf("<h2>Interactions"))
    val row = "<tr><td>(.*?)</td>(.*?)</tr>".r
    def cells(sec: String): Seq[Seq[String]] =
      row.findAllMatchIn(sec).map(m => m.group(1) +:
        "<td>(.*?)</td>".r.findAllMatchIn(m.group(2))
          .map(_.group(1)).toSeq).toSeq

    // 1) summary: (col, n, min, max) — the gate's exact surface
    val summary = graft.Registry.all("profile_summary")
      .fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val profRows = cells(profSec).map(c => c(0) -> c).toMap
    assert(summary.keySet.subsetOf(profRows.keySet))
    for ((cName, (n, mn, mx)) <- summary) {
      val c = profRows(cName)
      assert(c(2) === n.toString, s"$cName n: ${c(2)} vs $n")
      assert(c(5) === fmt(mn, "%.4f"), s"$cName min: ${c(5)}")
      assert(c(6) === fmt(mx, "%.4f"), s"$cName max: ${c(6)}")
    }

    // 2) histogram: (col, bin) -> n for the gate's two columns
    val gateHist = graft.Registry.all("profile_histogram")
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val reportHist = cells(histSec)
      .filter(c => gateHist.keySet.map(_._1).contains(c(0)))
      .map(c => (c(0), c(1).toInt) -> c(3).toLong).toMap
    assert(reportHist === gateHist,
      s"histogram drift: ${(reportHist.toSet diff gateHist.toSet) ++
        (gateHist.toSet diff reportHist.toSet)}")

    // 3) corr: formatted %.6f strings must be byte-equal
    val gateCorr = graft.Registry.all("profile_corr")
      .fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(v =>
          fmt(v.asInstanceOf[Double], "%.6f")).getOrElse("")).toMap
    val reportCorr = cells(corrSec)
      .map(c => (c(0), c(1)) -> c(2)).toMap
    assert(reportCorr === gateCorr,
      s"corr drift: report $reportCorr vs gate $gateCorr")
  }

  test("withPdeCounts joins prescription counts with zero-fill") {
    def res(n: String) = getClass.getResource(s"/cms/$n.csv").getPath
    val claims = CmsPipeline.arthritisPatientData(
      CmsPipeline.loadBen(spark, res("ben")),
      CmsPipeline.loadIp(spark, res("ip")), CmsPipeline.CmsConfig())
    val out = CmsPipeline.withPdeCounts(claims,
      CmsPipeline.loadPde(spark, res("pde")))
    assert(out.count() === claims.count())
    assert(out.where(col("n_rx") > 0).count() > 0)
    assert(out.where(col("n_rx").isNull).count() === 0)
  }
}
