package graft.cms

import graft.SparkSpec
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

/** Golden pipeline test over the committed CMS-shaped fixtures
  * (src/test/resources/cms, FIXTURES.md §A). Asserts the invariants the
  * fixtures were built to exercise plus hand-computed spot values. */
class CmsPipelineSpec extends SparkSpec {
  import CmsPipeline._
  import spark.implicits._

  private def res(name: String) =
    getClass.getResource(s"/cms/$name.csv").getPath

  private lazy val cfg = CmsConfig()
  private lazy val dxMap = crosswalkMap(loadCrosswalk(spark, res("dx")))
  private lazy val pcsMap = crosswalkMap(loadCrosswalk(spark, res("pcs")))
  private lazy val claims = withLabel(
    recodeClaims(
      arthritisPatientData(loadBen(spark, res("ben")),
        loadIp(spark, res("ip")), cfg),
      dxMap, pcsMap), cfg)

  test("crosswalk cleaning: quotes, dots, whitespace, blanks") {
    assert(dxMap("71590") === "201") // was '71590.'
    assert(dxMap("71610") === "202") // was ' 71610'
    assert(dxMap("7160") === "202")  // was '7160 '
    assert(!dxMap.contains("None")) // blank row filtered
    assert(vocabOf(dxMap) === Seq("201", "202", "203", "204", "205"))
    assert(vocabOf(pcsMap) === Seq("152", "153", "154"))
  }

  test("garbage dates are coerced to null and dropped") {
    val raw = loadIp(spark, res("ip"))
    // claims whose CLM_FROM_DT can't coerce to a yyyyMMdd number
    val badIds = raw.where(
      expr("try_cast(try_cast(CLM_FROM_DT AS DOUBLE) AS BIGINT)").isNull)
      .select("CLM_ID").as[String].collect().toSet
    assert(badIds.nonEmpty) // fixtures include blank/'garbage'/ISO dates
    val kept = claims.select("CLM_ID").as[String].collect().toSet
    assert(badIds.intersect(kept).isEmpty)
    // float-string dates ('20080101.0') DO survive the coercion
    assert(raw.where(col("CLM_FROM_DT").endsWith(".0")).count() > 0)
    assert(claims.where(col("clm_date").isNull).count() === 0)
  }

  test("enrollment keeps exactly the 15 fully-covered RA/OA patients") {
    val pats = claims.select("DESYNPUF_ID").distinct()
      .as[String].collect().sorted
    assert(pats.length === 15)
    assert(pats.head === "P0000" && pats.last === "P0014")
    // 15-17 miss a year; 18-19 out of range; 20-29 lack the RA/OA flag
    assert(!pats.contains("P0015") && !pats.contains("P0020"))
  }

  test("early-TJR claims are dropped, label-year TJR claims kept") {
    // P0000's 2008 DRG-470 claim must be gone
    assert(claims.where(col("DESYNPUF_ID") === "P0000" &&
      col("CLM_DRG_CD").isin("469", "470")).count() === 0)
    // P0001-P0003 2010 TJR claims carry label 1
    val labeled = claims.where(col("label") === 1)
      .select("DESYNPUF_ID").as[String].collect().sorted
    assert(labeled.toSeq === Seq("P0001", "P0002", "P0003"))
  }

  test("recode maps known codes into [dx ++ pcs] vocab, drops OOV") {
    val w = vocabOf(dxMap).size + vocabOf(pcsMap).size
    assert(w === 8)
    val idxs = claims.select(explode(col("code_idxs")).as("i"))
      .as[Int].collect()
    assert(idxs.forall(i => i >= 0 && i < w))
    // OOV codes 99999/88888 appear in fixtures but index nothing:
    // every dx index < 5, every pcs index in [5, 8)
    assert(idxs.exists(_ < 5) && idxs.exists(_ >= 5))
  }

  test("AOV: 15 patients × 3×(2+8) layout with correct labels") {
    val out = aov(claims, 8, cfg).cache()
    assert(out.count() === 15)
    val vecs = out.select("DESYNPUF_ID", "features", "label")
      .collect()
      .map(r => (r.getString(0), r.getAs[SparseVector](1), r.getInt(2)))
    vecs.foreach { case (_, v, _) => assert(v.size === 3 * (2 + 8)) }
    val byId = vecs.map(t => t._1 -> t).toMap
    assert(byId("P0001")._3 === 1)
    assert(byId("P0004")._3 === 0)
    // every enrolled patient has age+sex slots populated in all 3 years
    vecs.foreach { case (id, v, _) =>
      val span = 10
      Seq(0, 1, span, span + 1, 2 * span, 2 * span + 1).foreach { i =>
        assert(v(i) !== 0.0, s"$id slot $i")
      }
    }
  }

  test("MHE: grid nnz equals active codes, scattered at day-1 row") {
    val out = mhe(claims, 8, 50)
    assert(out.count() === 50)
    // labels rebalanced to the top before limit: all 3 positives kept
    assert(out.where(col("label") === 1).count() === 3)
    val sample = claims.where(col("DESYNPUF_ID") === "P0001" &&
      col("label") === 1) // P0001's 2010 TJR claim
    val clmId = sample.select("CLM_ID").as[String].head()
    val doy = sample.select(dayofyear(col("clm_date"))).as[Int].head()
    val codes = sample.select("code_idxs").as[Seq[Int]].head()
    val grid = out.where(col("CLM_ID") === clmId)
      .select("grid").head().getAs[SparseVector](0)
    assert(grid.size === 366 * 8)
    assert(grid.indices.toSeq ===
      codes.sorted.map(i => (doy - 1) * 8 + i))
  }

  test("aovPipeline end-to-end from raw paths") {
    val out = aovPipeline(spark, res("ben"), res("ip"), res("dx"),
      res("pcs"))
    assert(out.count() === 15)
    assert(out.columns.toSet === Set("DESYNPUF_ID", "features", "label"))
  }
}
