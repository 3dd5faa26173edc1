package graft.examples

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.functions._

/** CI-scale twin of [[TextScaleStress]] (same pattern as
  * [[ScaleStressSpec]]): the harness's correctness assertions — Bloom
  * path == exact join cell-for-cell, prefilter actually prunes, the
  * filter is NOT the clamped stat.bloomFilter build — at a size
  * `sbt test` tolerates. Wall-time linearity stays the harness's job;
  * docs/TEXT_SCALE.md holds the committed 10^6-document measurement.
  */
class TextScaleStressSpec extends SparkSpec {

  private val n = 10000L

  private lazy val corpus = ScaleGen.documents(spark, n, mega = 500)._1

  test("bloom contamination path equals the exact join on a ScaleGen " +
    "corpus with planted eval docs") {
    val eval = TextQueries.plantedEval(corpus).cache()
    val exact = TextQueries.contaminationCheck(
      eval, corpus, "eval_id", "text")
    val bloom = TextQueries.contaminationCheckBloom(
      eval, corpus, "eval_id", "text", expectedItems = n * 35)
    assert(exact.exceptAll(bloom).count() === 0)
    assert(bloom.exceptAll(exact).count() === 0)
    assert(exact.count() > 0)
  }

  test("buildBloom honors the requested size instead of the " +
    "BloomFilterAggregate 2^26-bit clamp, and novel strings miss") {
    // 20M expected items at 1% fpp needs ~192M bits — far past the
    // clamp that silently saturated the first 10^6-doc harness run.
    val df = spark.range(0, 50000)
      .select(md5(col("id").cast("string")).as("h"))
    val bf = TextQueries.buildBloom(df, "h",
      expectedItems = 20000000L, fpp = 0.01)
    assert(bf.bitSize() > (1L << 26),
      s"bitSize ${bf.bitSize()} — clamped build?")
    val fp = (0 until 20000)
      .count(i => bf.mightContainString(s"novel-$i")) / 20000.0
    assert(fp < 0.01, s"empirical fpp $fp on a near-empty filter")
    val present = df.collect().map(_.getString(0))
      .count(bf.mightContainString)
    assert(present === 50000) // no false negatives, ever
  }
}
