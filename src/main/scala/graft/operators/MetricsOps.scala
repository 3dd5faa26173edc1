package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics as DataFrame aggregations, so every number the
  * reference computes with sklearn (`ml_models.ipynb` cells 2-5) is a
  * distributed, DuckDB-verifiable query instead of a driver-side loop.
  */
object MetricsOps {

  /** Confusion matrix: reference `confusion_matrix(y, pred)`
    * (ml_models.ipynb:260) ≡ groupBy(label, pred).count. */
  def confusionMatrix(df: DataFrame, label: Column, pred: Column): DataFrame =
    df.groupBy(label.as("label"), pred.as("prediction"))
      .agg(count("*").as("n"))

  /** Accuracy as one aggregate row (reference `accuracy_score`). Integer
    * sum then a single division — bit-exact across engines. */
  def accuracy(df: DataFrame, label: Column, pred: Column): DataFrame =
    df.agg((sum(when(label === pred, 1L).otherwise(0L)).cast("double") /
      count("*")).as("accuracy"))

  /** MSE (reference `np.mean(np.square(y - pred))`, ml_models.ipynb cell 2).
    * Each squared error is rounded into decimal(18,8) so the distributed
    * sum is order-independent, then one division. */
  def mse(df: DataFrame, label: Column, score: Column): DataFrame = {
    val se = ((label - score) * (label - score))
      .cast(org.apache.spark.sql.types.DecimalType(18, 8))
    df.agg((sum(se).cast("double") / count("*")).as("mse"))
  }

  /** Threshold sweep maximizing weighted F1 (reference ml_models.ipynb
    * cells 3/5: t in {0, .01, …, .99}, argmax of sklearn
    * `f1_score(average='weighted')` of `score > t`).
    *
    * Spark plan: the 100-row threshold relation is broadcast, the cross
    * join is map-side, and the per-threshold counts partially aggregate
    * before the single shuffle — at 100 TB this is one pass over the
    * scores, not 100.
    *
    * Input needs integer 0/1 `label` and double `score` columns.
    * Returns one row: (threshold, weighted_f1 rounded to 6).
    */
  def weightedF1Sweep(spark: SparkSession, scored: DataFrame,
                      labelCol: String = "label",
                      scoreCol: String = "score"): DataFrame = {
    val th = spark.range(0, 100).select((col("id") / 100.0).as("threshold"))
    // Pre-aggregate by (label, score) before the threshold cross-join:
    // the full pass over the scores happens once, and the 100-way
    // expansion only touches the (label, distinct-score) histogram.
    // Integer sums are associative, so the result is bit-identical to
    // sweeping the raw rows.
    val hist = scored.groupBy(col(labelCol).as("__l"),
        col(scoreCol).as("__s"))
      .agg(count("*").as("__c"))
    val pred = when(col("__s") > col("threshold"), 1).otherwise(0)
    val cnt = hist.join(broadcast(th))
      .groupBy("threshold")
      .agg(
        sum(when(col("__l") === 1 && pred === 1, col("__c"))
          .otherwise(0L)).as("tp"),
        sum(when(col("__l") === 0 && pred === 1, col("__c"))
          .otherwise(0L)).as("fp"),
        sum(when(col("__l") === 1 && pred === 0, col("__c"))
          .otherwise(0L)).as("fn"),
        sum(when(col("__l") === 0 && pred === 0, col("__c"))
          .otherwise(0L)).as("tn"))
    val f1_1 = when(lit(2) * col("tp") + col("fp") + col("fn") === 0, 0.0)
      .otherwise(lit(2.0) * col("tp") /
        (lit(2) * col("tp") + col("fp") + col("fn")))
    val f1_0 = when(lit(2) * col("tn") + col("fn") + col("fp") === 0, 0.0)
      .otherwise(lit(2.0) * col("tn") /
        (lit(2) * col("tn") + col("fn") + col("fp")))
    val n1 = col("tp") + col("fn")
    val n0 = col("tn") + col("fp")
    val wf1 = (n1 * f1_1 + n0 * f1_0) / (n1 + n0)
    cnt.select(col("threshold"), wf1.as("wf1"))
      .orderBy(col("wf1").desc, col("threshold"))
      .limit(1)
      .select(col("threshold"), round(col("wf1"), 6).as("weighted_f1"))
  }
}
