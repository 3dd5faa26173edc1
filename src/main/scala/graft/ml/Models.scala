package graft.ml

import graft.operators.MetricsOps
import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel, RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib equivalents of the reference's models (SURVEY.md §2.7).
  *
  * The reference trains *regressors* on 0/1 labels and thresholds the
  * scores (Lasso `ml_models.ipynb:106`, RF `:354`); we preserve that exact
  * shape: `LinearRegression`/`RandomForestRegressor` emit a `score`
  * column, then the weighted-F1 sweep (M5) picks the threshold and all
  * metrics (M6-M11) are DataFrame aggregations over (label, score).
  *
  * Model mapping notes:
  *  - M1 Lasso(alpha=.001) → LinearRegression(elasticNetParam=1,
  *    regParam=0.001).
  *  - M2 RF(100 trees, depth 100, sqrt features) → RandomForestRegressor;
  *    MLlib caps depth at 30 (the reference's 100 is effectively
  *    unbounded — divergence documented).
  *  - M3 CNN with kernel == input size ≡ a 100-unit dense layer →
  *    MultilayerPerceptronClassifier(layers=[in,100,2]) (sigmoid hidden
  *    vs ReLU — divergence documented).
  *  - M4 GRU has no MLlib equivalent; the pooling-first approximation
  *    pools the day axis with array aggregations before a dense head.
  */
object Models {

  /** M1: Lasso-as-classifier. */
  def lasso(regParam: Double = 0.001): LinearRegression =
    new LinearRegression()
      .setElasticNetParam(1.0)
      .setRegParam(regParam)
      .setFeaturesCol("features")
      .setLabelCol("label")
      .setPredictionCol("score")

  /** M2: Random-forest regressor on occurrence vectors. */
  def randomForest(numTrees: Int = 100): RandomForestRegressor =
    new RandomForestRegressor()
      .setNumTrees(numTrees)
      .setMaxDepth(30)
      .setMinInstancesPerNode(10)
      .setFeatureSubsetStrategy("sqrt")
      .setFeaturesCol("features")
      .setLabelCol("label")
      .setPredictionCol("score")

  /** M3: the CNN-equivalent dense head (see scaladoc). Emits the
    * classifier's own `prediction`/`probability` columns; thread the
    * output through [[mlpScored]] to get the continuous `score` column
    * the M5-M11 helpers expect (a classifier estimator can't emit it
    * directly, and its hard 0/1 prediction is the wrong thing to
    * threshold-sweep). */
  def mlp(inputSize: Int, hidden: Int = 100): MultilayerPerceptronClassifier =
    new MultilayerPerceptronClassifier()
      .setLayers(Array(inputSize, hidden, 2))
      .setFeaturesCol("features")
      .setLabelCol("label")
      .setSeed(42L)

  /** Adapt M3 output to the module's score contract: `score` =
    * P(label=1) from the probability vector, so
    * [[bestThreshold]]/[[evaluate]]/[[precisionAtRecall]] compose with
    * the MLP exactly as with M1/M2. `prediction` is left in place for
    * hard-label callers. */
  def mlpScored(transformed: DataFrame): DataFrame =
    transformed.withColumn("score",
      org.apache.spark.ml.functions
        .vector_to_array(col("probability"))(1))

  /** M5: threshold sweep — argmax weighted F1 over t ∈ {0,.01,…,.99}
    * (ml_models.ipynb:243-253). Returns the chosen threshold. */
  def bestThreshold(spark: SparkSession, scored: DataFrame): Double =
    MetricsOps.weightedF1Sweep(spark, scored)
      .select("threshold").head().getDouble(0)

  /** M6-M11 in one pass: confusion counts, accuracy, MSE, plus the
    * reference's 2-point AUC — `roc_auc_score(y, pred > t)` of the
    * *thresholded* predictions (ml_models.ipynb:274), which reduces to
    * (TPR + 1 - FPR) / 2. All driver-free aggregations. */
  def evaluate(scored: DataFrame, threshold: Double): DataFrame = {
    val pred = when(col("score") > threshold, 1).otherwise(0)
    val agg = scored.agg(
      sum(when(col("label") === 1 && pred === 1, 1L).otherwise(0L))
        .as("tp"),
      sum(when(col("label") === 0 && pred === 1, 1L).otherwise(0L))
        .as("fp"),
      sum(when(col("label") === 1 && pred === 0, 1L).otherwise(0L))
        .as("fn"),
      sum(when(col("label") === 0 && pred === 0, 1L).otherwise(0L))
        .as("tn"))
    agg.select(
      col("tp"), col("fp"), col("fn"), col("tn"),
      ((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"),
      ((col("tp") / (col("tp") + col("fn")).cast("double") +
        lit(1.0) -
        col("fp") / (col("fp") + col("tn")).cast("double")) / 2.0)
        .as("auc_binary"))
  }

  /** M8: precision at recall ≥ `targetRecall` from score-ranked
    * predictions (ml_models.ipynb:278-280).
    *
    * DOCUMENTED DIVERGENCE: the notebook reads the value off with
    * `np.interp` (linear interpolation between PR-curve points); this
    * implementation returns the curve's precision at the SMALLEST k
    * whose recall reaches the target — the conservative step-function
    * read-off. The two agree whenever the target recall is hit exactly
    * at a curve point and differ by at most the gap between adjacent
    * curve points otherwise.
    *
    * Histogram-aggregate shape (mirrors [[MetricsOps.weightedF1Sweep]]):
    * one groupBy collapses the scores to a (score → positives, count)
    * histogram, the candidate thresholds ARE the distinct scores
    * (sklearn's PR-curve convention), and the cumulative TP/K per
    * threshold comes from a broadcast range-join over the histogram —
    * no single-partition window over raw rows, no separate count()
    * action. Ties are deterministic by construction: equal scores fall
    * into one histogram row, so a threshold either takes all of a tie
    * group or none of it.
    *
    * The range-join is O(D²) pairs with a D-row broadcast where D =
    * distinct scores, so D is BOUNDED: when a continuous-score input
    * exceeds `maxDistinctScores`, scores are first snapped to the
    * lower edges of a uniform `maxDistinctScores`-cell grid over
    * [min, max] (deterministic; thresholds then have grid
    * granularity, so the step read-off can differ from the unbounded
    * curve by at most one grid cell's worth of rows — same spirit as
    * the conservative step-function divergence above). A caller who
    * needs the un-quantized curve on a high-cardinality input should
    * pre-round scores instead of raising the bound past what a
    * driver broadcast can hold. */
  def precisionAtRecall(scored: DataFrame,
                        targetRecall: Double = 0.9,
                        maxDistinctScores: Int = 4096): Double = {
    require(maxDistinctScores > 0,
      s"maxDistinctScores must be positive, got $maxDistinctScores")
    // score is normalized to double up front: the quantize branch
    // reads min/max with Row.getDouble, which would ClassCastException
    // on a float/decimal score column (the groupBy/join path coerces
    // implicitly, the Row read does not)
    val hist0 = scored.groupBy(col("score").cast("double").as("score"))
      .agg(sum(col("label")).cast("long").as("pos"),
        count("*").as("n"))
      .persist()
    try {
      // one action: cardinality + range, deciding the quantize path
      val stats = hist0.agg(count("*").as("d"),
        min(col("score")).as("mn"), max(col("score")).as("mx")).head()
      val hist = if (stats.getLong(0) <= maxDistinctScores) hist0
      else {
        val mn = stats.getDouble(1)
        val mx = stats.getDouble(2)
        val g = maxDistinctScores
        val bin =
          if (mx > mn)
            least(floor((col("score") - mn) / (mx - mn) * g), lit(g - 1))
          else lit(0)
        hist0.groupBy((lit(mn) + bin * lit((mx - mn) / g)).as("score"))
          .agg(sum("pos").as("pos"), sum("n").as("n"))
      }
      val th = hist.select(col("score").as("t"))
      val curve = hist.join(broadcast(th), col("score") >= col("t"))
        .groupBy("t")
        .agg(sum("pos").as("cum_tp"), sum("n").as("k"))
      val total = hist.agg(sum("pos").as("total"))
      // total > 0 guard: with zero positives the recall condition is
      // vacuously true at every threshold and the read-off would return
      // a fabricated 0.0 — recall@target is UNDEFINED there, so fail
      // loudly (empty result → NoSuchElementException) instead.
      curve.crossJoin(broadcast(total))
        .where(col("total") > 0 &&
          col("cum_tp") >= lit(targetRecall) * col("total"))
        .orderBy(col("k"))
        .select((col("cum_tp").cast("double") / col("k"))
          .as("precision"))
        .head().getDouble(0)
    } finally hist0.unpersist()
  }

  /** M9 exactly as the reference reports it (`ml_models.ipynb` cell 2:
    * per-fold loop, then `np.mean`/`np.std` of the fold metrics):
    * deterministic fold assignment via [[graft.operators.RelationalOps
    * .kfoldAssign]], one fit per fold, per-fold MSE and accuracy rows
    * plus a mean/stddev summary — all metric math as aggregations.
    * Returns (perFold, summary). */
  def kFoldMetrics(df: DataFrame, keyCol: String, folds: Int = 5,
                   threshold: Double = 0.5,
                   fit: DataFrame => org.apache.spark.ml.Transformer =
                     df => lasso().fit(df)): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val assigned = graft.operators.RelationalOps
      .kfoldAssign(df, keyCol, folds).cache()
    val rows = (1 to folds).map { f =>
      val train = assigned.where(col("fold") =!= f)
      val valid = assigned.where(col("fold") === f)
      val model = fit(train)
      val scored = model.transform(valid).select(
        col("label").cast("int").as("label"), col("score"))
      // Both metrics in ONE aggregation (same formulas as
      // MetricsOps.mse/accuracy): two separate .head() actions
      // re-planned and re-ran the model transform over the fold twice.
      val pred = when(col("score") > threshold, 1).otherwise(0)
      val se = ((col("label") - col("score")) *
        (col("label") - col("score")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 8))
      val r = scored.agg(
        (sum(se).cast("double") / count("*")).as("mse"),
        (sum(when(col("label") === pred, 1L).otherwise(0L))
          .cast("double") / count("*")).as("accuracy")).head()
      (f, r.getDouble(0), r.getDouble(1))
    }
    assigned.unpersist()
    val perFold = rows.toDF("fold", "mse", "accuracy")
    val summary = perFold.agg(
      avg("mse").as("mse_mean"), stddev("mse").as("mse_std"),
      avg("accuracy").as("acc_mean"), stddev("accuracy").as("acc_std"))
    (perFold, summary)
  }

  /** M9 + O5: 5-fold cross-validated MSE for the Lasso
    * (ml_models.ipynb cell 2's per-fold loop → MLlib CrossValidator). */
  def crossValidateLasso(train: DataFrame, folds: Int = 5)
      : (LinearRegressionModel, Double) = {
    val lr = lasso()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new RegressionEvaluator()
        .setLabelCol("label").setPredictionCol("score")
        .setMetricName("mse"))
      .setEstimatorParamMaps(new ParamGridBuilder()
        .addGrid(lr.regParam, Array(0.001)).build())
      .setNumFolds(folds)
      .setSeed(42L)
    val m = cv.fit(train)
    (m.bestModel.asInstanceOf[LinearRegressionModel],
      m.avgMetrics.head)
  }
}
