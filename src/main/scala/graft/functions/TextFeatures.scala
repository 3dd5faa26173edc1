package graft.functions

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bag-of-words featurization for the text pipeline: tokenize →
  * fixed-vocabulary counts → TF-IDF, producing MLlib vectors ready for
  * any estimator. The vocabulary is learned once (a distributed
  * aggregate) and broadcast — the same frozen-vocabulary discipline the
  * CMS encoders use (Encoders.freezeVocab).
  */
object TextFeatures {

  /** Non-empty lowercase whitespace tokens — the one shared "token"
    * definition ([[TextFunctions.wsTokens]]) under a lower(). */
  private def tokensOf(textCol: String) =
    TextFunctions.wsTokens(lower(col(textCol)))

  /** Fit a count vocabulary over a text column. `minDF` drops rare
    * tokens (vocabulary size is driver/broadcast-resident — bound it at
    * corpus scale with `vocabSize`). */
  def fitVocab(docs: DataFrame, textCol: String, vocabSize: Int = 1 << 16,
               minDF: Double = 1.0): CountVectorizerModel = {
    val tokens = docs.select(tokensOf(textCol).as("tokens"))
    new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
      .setVocabSize(vocabSize).setMinDF(minDF)
      .fit(tokens)
  }

  /** Term-count vectors for `docs` under the frozen vocabulary. The
    * vocabulary model is COPIED before configuring columns — in-place
    * setters would mutate the caller's shared model object. */
  private def termCounts(docs: DataFrame, textCol: String,
                         vocab: CountVectorizerModel): DataFrame =
    vocab.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setInputCol("tokens").setOutputCol("tf")
      .transform(docs.withColumn("tokens", tokensOf(textCol)))

  /** Fit the IDF weights on a TRAINING corpus (one aggregate). Like
    * the vocabulary, the IDF is learned once and reused — refitting it
    * per-transform would weight the same token differently in train
    * and test (and degenerately on a small test frame), skewing any
    * estimator trained on the tfidf column. */
  def fitIdf(docs: DataFrame, textCol: String,
             vocab: CountVectorizerModel): org.apache.spark.ml.feature
      .IDFModel =
    new IDF().setInputCol("tf").setOutputCol("tfidf")
      .fit(termCounts(docs, textCol, vocab))

  /** Add `tf` (term counts) and `tfidf` vectors to `docs` using the
    * FROZEN vocabulary + IDF pair — pure transform, no fitting, so
    * train and test share one weighting. Two narrow passes. */
  def tfidf(docs: DataFrame, textCol: String,
            vocab: CountVectorizerModel,
            idf: org.apache.spark.ml.feature.IDFModel): DataFrame =
    idf.transform(termCounts(docs, textCol, vocab)).drop("tokens")
}
