package graft.examples

import graft.cms.{CmsPipeline, CmsQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Work-dominated timing for the flagship CMS pipeline (r9 verdict
  * item 6): the 2,430-patient parity fixture proves SEMANTICS; this
  * drives `aovPipeline` (the reference's get_aov) and the MHE
  * day-grid encode end-to-end on a ~100k-patient / ~3.3M-claim
  * fixture (tools/gen_cms_fixtures.py --patients 100000) and prints
  * min-of-2 timings plus an exchange census of the AOV plan — the
  * numbers CMS_SCALE.md commits. The DuckDB side of the comparison is
  * the SAME relational-stage replay SQL the `cms_aov_e2e` gate runs
  * (CmsQueries.aovReplaySql), written next to the fixture for
  * `python3 -c "import duckdb; ..."` timing.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.CmsScale
  * /tmp/cms100k"`.
  */
object CmsScale {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/cms100k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time2[A](label: String)(f: => Unit): Double = {
      f // warm
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[cmsscale] $label: $best%.2f s")
      best
    }

    // ---- AOV end-to-end (the reference's get_aov) -------------------
    def aov() = CmsPipeline.aovPipeline(spark, s"$base/ben.csv",
      s"$base/ip.csv", s"$base/dx.csv", s"$base/pcs.csv")
    val a = aov()
    val nPatients = a.count()
    val width = a.head()
      .getAs[org.apache.spark.ml.linalg.Vector](1).size
    println(s"[cmsscale] AOV: $nPatients patients × $width slots")
    time2("aov_e2e (crosswalks + claims + AOV flatten, noop sink)") {
      aov().write.format("noop").mode("overwrite").save()
    }
    // exchange census on the STATIC plan (AQE off for the census
    // copy only). Expected 3 AT THIS TIER: the enrollment
    // covering-keys pair, plus ONE patient exchange that the
    // sort-merge LeftSemi forces and both aggregations then reuse —
    // hashpartitioning(patient) satisfies ClusteredDistribution for
    // BOTH the (patient, year) agg and the patient flatten (subset
    // rule), so neither adds an exchange. At gate scale the semi
    // join broadcasts instead and each agg pays its own exchange
    // (4 in docs/PLANS.md) — scale-dependent, both correct.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = aov().queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val nExchanges = "(?m)^(?!.*ReusedExchange).*\\bExchange hashpartitioning"
      .r.findAllIn(plan).size
    println(s"[cmsscale] AOV plan exchanges (static): $nExchanges")

    // ---- MHE (the reference's get_mhe day-grid scatter) -------------
    val cfg = CmsPipeline.CmsConfig()
    val dxMap = CmsPipeline.crosswalkMap(
      CmsPipeline.loadCrosswalk(spark, s"$base/dx.csv"))
    val pcsMap = CmsPipeline.crosswalkMap(
      CmsPipeline.loadCrosswalk(spark, s"$base/pcs.csv"))
    val w = CmsPipeline.vocabOf(dxMap).size +
      CmsPipeline.vocabOf(pcsMap).size
    def claims() = CmsPipeline.withLabel(
      CmsPipeline.recodeClaims(
        CmsPipeline.arthritisPatientData(
          CmsPipeline.loadBen(spark, s"$base/ben.csv"),
          CmsPipeline.loadIp(spark, s"$base/ip.csv"), cfg),
        dxMap, pcsMap), cfg)
    val nClaims = claims().count()
    println(s"[cmsscale] claims after relational stage: $nClaims")
    time2(s"mhe_e2e (claims + rebalance-limit 100000 + day grid)") {
      CmsPipeline.mhe(claims(), w, rows = 100000)
        .write.format("noop").mode("overwrite").save()
    }

    // the DuckDB comparison runs the cms_aov_e2e gate's replay SQL on
    // this fixture — dump it beside the data for the timing harness
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/aov_replay.sql"),
      CmsQueries.aovReplaySql(base))
    println(s"[cmsscale] replay SQL written to $base/aov_replay.sql")
    spark.stop()
  }
}
