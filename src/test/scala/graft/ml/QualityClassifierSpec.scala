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

  test("model save/load round trip: the loaded artifact scores " +
    "bit-identical margins (order preserved via explicit ordinals)") {
    val vocab = QualityClassifier.vocab(docs, "text", 32)
    val (w, b) = QualityClassifier.train(labeled, "text", "label", vocab)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qc_model").toString
    try {
      QualityClassifier.saveModel(spark, dir, vocab.toSeq, w.toSeq, b)
      val (v2, w2, b2) = QualityClassifier.loadModel(spark, dir)
      // the artifact IS the model: exact equality, including order
      assert(v2.toSeq === vocab.toSeq)
      assert(w2.toSeq === w.toSeq)
      assert(b2 === b)
      // and the deploy loop end-to-end: margins from the loaded model
      // are bit-identical to margins from the in-memory one, both forms
      Seq(true, false).foreach { exact =>
        val diff = docs.select(
          QualityClassifier.marginByCounts(col("text"), vocab.toSeq,
            w.toSeq, b).as("m0"),
          (if (exact)
            QualityClassifier.marginByCounts(col("text"), v2.toSeq,
              w2.toSeq, b2)
          else
            QualityClassifier.marginByTokens(col("text"), v2.toSeq,
              w2.toSeq, b2)).as("m1"))
        if (exact)
          assert(diff.where(col("m0") =!= col("m1")).count() === 0,
            "loaded-model exact-order margins must be bit-identical")
        else {
          val dmax = diff.select(max(abs(col("m0") - col("m1"))))
            .head().getDouble(0)
          assert(dmax < 1e-9, s"token-order form diverged by $dmax")
        }
      }
    } finally
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
  }

  test("loadModel rejects a corrupt artifact loudly (missing bias, " +
    "gapped ordinals)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qc_bad").toString
    try {
      // gapped ordinals: 0 then 2
      Seq((-1, null: String, 0.5), (0, "a", 1.0), (2, "b", 2.0))
        .toDF("ord", "term", "weight").write.mode("overwrite").parquet(dir)
      val e1 = intercept[IllegalArgumentException] {
        QualityClassifier.loadModel(spark, dir)
      }
      assert(e1.getMessage.contains("non-contiguous"))
      // no bias row
      Seq((0, "a", 1.0)).toDF("ord", "term", "weight")
        .write.mode("overwrite").parquet(dir)
      val e2 = intercept[IllegalArgumentException] {
        QualityClassifier.loadModel(spark, dir)
      }
      assert(e2.getMessage.contains("bias"))
    } finally
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
  }
}
