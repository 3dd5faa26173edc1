package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: the trained path (bounded MLlib LR)
  * and the two corpus-scoring margin forms. The driver's DuckDB gate
  * (`quality_classifier_probe`) hash-checks the exact-order margin;
  * this spec carries training quality and the forms' agreement. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .where(col("text").isNotNull)

  /** Labeled sample: real corpus docs (label 1) vs deterministic
    * garbage token soup (label 0) — the reference-vs-raw-web framing
    * of the GPT-3 quality classifier, miniaturized. */
  private lazy val labeled = {
    val real = docs.select(col("text"), lit(1.0).as("label"))
    val garbage = docs.select(col("doc_id")).as[Long].collect()
      .map { id =>
        ((0 until 12).map(i => s"g${id}q$i").mkString(" "), 0.0)
      }.toSeq.toDF("text", "label")
    real.unionByName(garbage).cache()
  }

  test("trained LR separates real docs from token soup") {
    val vocab = QualityClassifier.vocab(docs, "text", 64)
    // sf0.001's synthetic corpus has a ~31-word vocabulary; the cap
    // binds only on bigger corpora
    assert(vocab.nonEmpty && vocab.length <= 64)
    val (w, b) = QualityClassifier.train(labeled, "text", "label", vocab)
    val scored = QualityClassifier.scoreDocs(labeled, "text",
      vocab.toSeq, w.toSeq, b)
    val acc = scored.select(
      avg((col("keep") === col("label").cast("int")).cast("double")))
      .as[Double].head()
    assert(acc >= 0.95, s"train accuracy $acc")
  }

  test("marginByTokens agrees with marginByCounts within float " +
    "re-association slack") {
    val vocab = Seq("spark", "dup", "merge", "window")
    val w = Seq(0.4, -1.2, 0.9, 0.3)
    val maxDiff = docs.select(abs(
        QualityClassifier.marginByCounts(col("text"), vocab, w, -0.5) -
        QualityClassifier.marginByTokens(col("text"), vocab, w, -0.5))
      .as("d")).agg(max("d")).as[Double].head()
    assert(maxDiff < 1e-9, s"forms diverged by $maxDiff")
  }

  test("both margin forms null-propagate on null text (no silent " +
    "bias-minus-sum(w) margin from legacy size(null) = -1)") {
    val vocab = Seq("spark", "dup")
    val w = Seq(0.4, -1.2)
    val in = Seq((1L, "spark dup"), (2L, null)).toDF("doc_id", "text")
    val r = in.select(
      QualityClassifier.marginByCounts(col("text"), vocab, w, -0.5)
        .as("mc"),
      QualityClassifier.marginByTokens(col("text"), vocab, w, -0.5)
        .as("mt"))
      .orderBy(col("mc").asc_nulls_last)
      .collect()
    assert(!r(0).isNullAt(0) && !r(0).isNullAt(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("scoreDocs keep flag is exactly margin > 0, and both margin " +
    "forms produce a mixed keep/drop split on the corpus") {
    val vocab = Seq("spark", "dup", "merge", "window")
    val w = Seq(0.4, -1.2, 0.9, 0.3)
    Seq(true, false).foreach { exact =>
      val scored = QualityClassifier.scoreDocs(docs, "text", vocab, w,
        bias = -0.5, exactOrder = exact).cache()
      val bad = scored.where((col("margin") > 0).cast("int") =!=
        col("keep")).count()
      assert(bad === 0)
      val kept = scored.where(col("keep") === 1).count()
      assert(kept > 0 && kept < scored.count(),
        s"degenerate keep split: $kept of ${scored.count()}")
    }
  }
}
