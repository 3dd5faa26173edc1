package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

class TextFeaturesSpec extends SparkSpec {

  test("tfidf vectors over the documents table feed a classifier") {
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = TextFeatures.fitVocab(docs, "text", vocabSize = 64)
    assert(vocab.vocabulary.length > 10)
    val idf = TextFeatures.fitIdf(docs, "text", vocab)
    val feats = TextFeatures.tfidf(docs, "text", vocab, idf)
    assert(feats.count() === docs.count())
    val v = feats.select("tfidf").head().getAs[SparseVector](0)
    assert(v.size === vocab.vocabulary.length)
    assert(v.numNonzeros > 0)
    // idf downweights ubiquitous words: a token present in every doc
    // scores ~0 while rarer tokens score higher
    val row = feats.select("tf", "tfidf").head()
    val tf = row.getAs[SparseVector](0)
    val tfidf = row.getAs[SparseVector](1)
    assert(tf.indices.toSeq === tfidf.indices.toSeq)
  }

  test("a frozen IDF weights train and test identically") {
    val docs = Tables.load(spark, sfDir, "documents")
    val train = docs.where(col("doc_id") % 2 === 0)
    val test = docs.where(col("doc_id") % 2 === 1)
    val vocab = TextFeatures.fitVocab(train, "text", vocabSize = 32)
    val idf = TextFeatures.fitIdf(train, "text", vocab)
    // The same single-token document must get the same tfidf weight
    // whether it rides in the train or the test frame.
    val word = vocab.vocabulary.head
    import spark.implicits._
    val probe = Seq(Tuple1(word)).toDF("text")
    val a = TextFeatures.tfidf(probe, "text", vocab, idf)
      .select("tfidf").head().getAs[SparseVector](0)
    val b = TextFeatures.tfidf(probe.union(test.select("text")),
        "text", vocab, idf)
      .where(col("text") === word)
      .select("tfidf").head().getAs[SparseVector](0)
    assert(a.toArray.toSeq === b.toArray.toSeq)
  }

  test("vocabulary is deterministic for a fixed corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = TextFeatures.fitVocab(docs, "text", vocabSize = 32).vocabulary
    val b = TextFeatures.fitVocab(docs, "text", vocabSize = 32).vocabulary
    assert(a.toSeq === b.toSeq)
  }
}
