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

  /** Non-empty lowercase whitespace tokens: the raw split keeps an
    * empty element for leading whitespace, which would otherwise claim
    * a vocabulary slot as a bogus high-DF "token". */
  private def tokensOf(textCol: String) =
    filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")

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

  /** Add `tf` (term counts) and `tfidf` vectors to `docs`. Two narrow
    * passes plus the one-time IDF aggregate. The vocabulary model is
    * COPIED before configuring columns — in-place setters would mutate
    * the caller's shared model object. */
  def tfidf(docs: DataFrame, textCol: String,
            vocab: CountVectorizerModel): DataFrame = {
    val withTokens = docs.withColumn("tokens", tokensOf(textCol))
    val tf = vocab.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setInputCol("tokens").setOutputCol("tf")
      .transform(withTokens)
    new IDF().setInputCol("tf").setOutputCol("tfidf")
      .fit(tf).transform(tf)
      .drop("tokens")
  }
}
