package graft.ml

import graft.SparkSpec
import graft.cms.CmsPipeline
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  /** Separable synthetic set: label 1 iff feature 0 is high. 200 rows. */
  private lazy val separable: DataFrame = {
    val rows = (1 to 200).map { i =>
      val label = i % 2
      val f0 = if (label == 1) 2.0 + (i % 10) * 0.1 else (i % 10) * 0.1
      val f1 = (i % 7) * 0.3 // noise
      (Vectors.dense(f0, f1), label.toDouble)
    }
    rows.toDF("features", "label")
  }

  test("Lasso separates a separable set; sweep finds a threshold") {
    val model = Models.lasso().fit(separable)
    val scored = model.transform(separable).select(
      col("label").cast("int").as("label"), col("score"))
    val t = Models.bestThreshold(spark, scored)
    assert(t > 0.0 && t < 1.0)
    val ev = Models.evaluate(scored, t).head()
    assert(ev.getAs[Double]("accuracy") > 0.95)
    assert(ev.getAs[Double]("auc_binary") > 0.95)
  }

  test("RandomForest regressor scores and evaluates") {
    val model = Models.randomForest(numTrees = 20).fit(separable)
    val scored = model.transform(separable).select(
      col("label").cast("int").as("label"), col("score"))
    val t = Models.bestThreshold(spark, scored)
    val ev = Models.evaluate(scored, t).head()
    assert(ev.getAs[Double]("accuracy") > 0.95)
  }

  test("mlpScored adapts M3 output to the score contract so the " +
      "M5-M11 helpers compose") {
    val df = (0 until 40).map { i =>
      val label = i % 2
      (label.toDouble, org.apache.spark.ml.linalg.Vectors
        .dense(label.toDouble, 1.0 - label))
    }.toDF("label", "features")
    val model = Models.mlp(inputSize = 2, hidden = 4).fit(df)
    val scored = Models.mlpScored(model.transform(df))
    // continuous probabilities, not hard labels
    assert(scored.select("score").as[Double].collect()
      .forall(s => s >= 0.0 && s <= 1.0))
    // the documented M3 -> M5/M6 pipeline runs (this threw
    // 'cannot resolve score' before mlpScored existed)
    val t = Models.bestThreshold(spark, scored)
    val ev = Models.evaluate(scored, t).head()
    assert(ev.getAs[Double]("accuracy") >= 0.9)
  }

  test("precisionAtRecall is 1.0 on a perfectly ranked set") {
    val scored = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
      .toDF("label", "score")
    assert(Models.precisionAtRecall(scored, 0.9) === 1.0)
  }

  test("precisionAtRecall is deterministic under heavy score ties") {
    // A tie group is taken whole or not at all: the three 0.8-scored
    // rows (2 pos, 1 neg) collapse into one histogram row, so the
    // answer cannot depend on row order within the tie — the old
    // unpartitioned-window form was nondeterministic here.
    val rows = Seq((1, 0.8), (0, 0.8), (1, 0.8), (0, 0.2))
    val expected = 2.0 / 3 // threshold 0.8: cum_tp=2 of total 2, k=3
    (1 to 3).foreach { p =>
      val scored = rows.toDF("label", "score").repartition(p)
      assert(math.abs(Models.precisionAtRecall(scored, 0.9) -
        expected) < 1e-9, s"partitioning $p changed the answer")
    }
  }

  test("precisionAtRecall fails loudly when there are no positives " +
    "(recall at a target is undefined, not 0.0)") {
    val scored = Seq((0, 0.9), (0, 0.1)).toDF("label", "score")
    intercept[java.util.NoSuchElementException] {
      Models.precisionAtRecall(scored, 0.9)
    }
  }

  test("precisionAtRecall degrades with interleaved ranking") {
    val scored = Seq((1, 0.9), (0, 0.8), (1, 0.7), (0, 0.6))
      .toDF("label", "score")
    // recall 1.0 reached at k=3 with 2 TP → precision 2/3
    assert(math.abs(Models.precisionAtRecall(scored, 0.9) - 2.0 / 3) < 1e-9)
  }

  test("precisionAtRecall bounds threshold cardinality: continuous " +
    "scores auto-quantize, unchanged answer on a separated set") {
    // 20000 distinct doubles previously became a 20000-row driver
    // broadcast and a 4·10⁸-pair range join; the guard snaps them to
    // a 64-cell grid. Positives ([0.9, 0.92)) and negatives
    // ([0.02, 0.2)) sit far apart relative to the ~0.014 cell width,
    // so no grid cell mixes labels and the quantized read-off equals
    // the exact one.
    val scored = spark.range(20000).select(
      when(col("id") < 2000, lit(0.9) + col("id") / lit(100000.0))
        .otherwise(col("id") / lit(100000.0)).as("score"),
      when(col("id") < 2000, 1).otherwise(0).as("label"))
    val q = Models.precisionAtRecall(scored, 0.9,
      maxDistinctScores = 64)
    assert(q === 1.0)
  }

  test("kFoldMetrics reports per-fold and mean/std like the reference") {
    val withKey = separable.withColumn("k",
      monotonically_increasing_id())
    val (perFold, summary) = Models.kFoldMetrics(withKey, "k", folds = 5)
    assert(perFold.count() === 5)
    assert(perFold.select("fold").as[Int].collect().sorted.toSeq ===
      Seq(1, 2, 3, 4, 5))
    val s = summary.head()
    assert(s.getAs[Double]("acc_mean") > 0.9)
    assert(s.getAs[Double]("mse_mean") < 0.2)
    assert(s.getAs[Double]("acc_std") >= 0.0)
  }

  test("cross-validated Lasso reports a small MSE on separable data") {
    val (model, mse) = Models.crossValidateLasso(separable)
    assert(mse < 0.15)
    assert(model.coefficients.size === 2)
  }

  test("CMS AOV features train end-to-end (leakage reproduces " +
    "near-perfect fit, BASELINE.md caveat)") {
    def res(n: String) = getClass.getResource(s"/cms/$n.csv").getPath
    val aov = CmsPipeline.aovPipeline(spark, res("ben"), res("ip"),
      res("dx"), res("pcs"))
      .select(col("features"), col("label").cast("double").as("label"))
    val model = Models.lasso(regParam = 0.0001).fit(aov)
    val scored = model.transform(aov).select(
      col("label").cast("int").as("label"), col("score"))
    val t = Models.bestThreshold(spark, scored)
    val ev = Models.evaluate(scored, t).head()
    // 2010 features overlap the 2010 label year → near-perfect train fit
    assert(ev.getAs[Double]("accuracy") >= 0.9)
  }
}
