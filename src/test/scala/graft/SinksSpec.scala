package graft

import graft.cms.CmsPipeline
import graft.ml.Models
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S2/S3/S4 (SURVEY §2.1): feature parquet round-trip (the reference's
  * npy cache) and model persistence (Keras .h5 save/load). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def res(n: String) = getClass.getResource(s"/cms/$n.csv").getPath

  test("AOV feature DataFrame round-trips through parquet with vectors " +
    "and labels intact (S3 npy-cache analog)") {
    val aov = CmsPipeline.aovPipeline(spark, res("ben"), res("ip"),
      res("dx"), res("pcs"))
    val dir = Files.createTempDirectory("graft_feat").toString + "/aov"
    aov.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === aov.count())
    val a = aov.orderBy("DESYNPUF_ID").collect()
      .map(r => (r.getString(0), r.getAs[SparseVector]("features"),
        r.getInt(2)))
    val b = back.orderBy("DESYNPUF_ID").collect()
      .map(r => (r.getString(0), r.getAs[SparseVector]("features"),
        r.getInt(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("trained model save/load round-trip (S4 h5 analog)") {
    val train = (1 to 100).map { i =>
      val label = i % 2
      (org.apache.spark.ml.linalg.Vectors.dense(
        if (label == 1) 1.0 + i * 0.01 else i * 0.01), label.toDouble)
    }.toDF("features", "label")
    val model = Models.lasso().fit(train)
    val dir = Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(dir)
    val back = LinearRegressionModel.load(dir)
    assert(back.coefficients === model.coefficients)
    assert(back.intercept === model.intercept)
    val scored = back.transform(train)
    assert(scored.columns.contains("score"))
    assert(scored.count() === 100)
  }
}
