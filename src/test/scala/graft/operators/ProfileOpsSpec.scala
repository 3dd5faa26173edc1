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
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))).contains("</table></body></html>"))
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
