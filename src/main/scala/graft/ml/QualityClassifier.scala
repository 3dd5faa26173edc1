package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the modern
  * pretraining pipeline (GPT-3 §2.2's LR filter, CCNet, LLaMA/DCLM's
  * fasttext classifier): train a linear classifier to separate a
  * high-quality reference corpus from raw web text, then score every
  * document and keep the high-margin ones.
  *
  * Scale shape: training runs ONCE on a bounded labeled sample (MLlib
  * LogisticRegression over fixed-vocab count features); the corpus-wide
  * SCORING pass — the part that touches 100 TB — is a map-only
  * DataFrame expression over the exported (term → weight) table, no
  * MLlib at inference, no shuffle, no UDF. Two scorer forms with an
  * explicit trade:
  *
  *  - [[marginByCounts]]: bias + Σᵢ wᵢ·countᵢ in FIXED vocab order —
  *    O(|vocab|) array scans per row, but the floating-point sum order
  *    is deterministic and engine-replayable, so the driver's DuckDB
  *    gate (`quality_classifier_probe`) hash-checks it bit-for-bit.
  *  - [[marginByTokens]]: one pass over the document's tokens with a
  *    broadcast literal term→weight map (`element_at` + `aggregate`,
  *    all codegen'd) — O(|doc|) regardless of vocab size, the form to
  *    deploy with a large vocabulary. Accumulation follows token order,
  *    so it is NOT bit-identical to the counts form (same value within
  *    ~1e-12; QualityClassifierSpec pins the agreement bound).
  */
object QualityClassifier {

  /** Deterministic training vocabulary: the `vocabSize` most frequent
    * corpus words, ties broken lexicographically (same ordering
    * doctrine as Bpe.train's histogram cap). Bounded collect — the
    * vocab IS the model's feature axis, sized by the caller. */
  def vocab(docs: DataFrame, textCol: String,
            vocabSize: Int): Array[String] =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabSize)
      .select("w").collect().map(_.getString(0))

  /** Train LR on fixed-vocab token counts; returns (weights, bias)
    * aligned with `vocab` — the exported model the scoring pass
    * broadcasts. Deterministic given the input sample (LBFGS on a
    * fixed feature space; no random init). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            vocab: Array[String], regParam: Double = 1e-4)
      : (Array[Double], Double) = {
    val idx = vocab.zipWithIndex.toMap
    val dim = vocab.length
    val featUdf = udf { (t: String) =>
      val counts = new Array[Double](dim)
      if (t != null) t.split("\\s+").foreach { w =>
        idx.get(w).foreach(i => counts(i) += 1.0)
      }
      Vectors.dense(counts)
    }
    val fit = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam)
      .fit(labeled.withColumn("features", featUdf(col(textCol))))
    (fit.coefficients.toArray, fit.intercept)
  }

  /** Exact-order linear margin: bias + Σᵢ wᵢ·countᵢ(term i) with the
    * sum written out in ascending vocab order — every operand and
    * operation identical in the DuckDB replay, so bit-exact
    * cross-engine (the transcendental-free doctrine: no sigmoid; the
    * keep decision margin > 0 is monotone in the probability anyway).
    * Documents tokenize on single spaces to match the oracle's
    * `string_split(text, ' ')`. Null text yields null margin — without
    * the explicit guard, `size(null)` is -1 under non-ANSI legacy
    * semantics and a textless row would get the definite (and wrong)
    * margin bias − Σwᵢ, silently disagreeing with [[marginByTokens]]
    * (which null-propagates naturally). */
  def marginByCounts(text: Column, vocab: Seq[String],
                     weights: Seq[Double], bias: Double): Column = {
    require(vocab.length == weights.length, "vocab/weights misaligned")
    val toks = split(text, " ")
    val m = vocab.zip(weights).foldLeft(lit(bias): Column) {
      case (acc, (t, w)) =>
        acc + lit(w) * size(filter(toks, x => x === t)).cast("double")
    }
    when(text.isNotNull, m)
  }

  /** Token-order linear margin: one `aggregate` pass over the token
    * array against a literal term→weight map — the O(|doc|) deployment
    * form for production vocab sizes. Same mathematical value as
    * [[marginByCounts]] up to float re-association (sum follows token
    * order, not vocab order). */
  def marginByTokens(text: Column, vocab: Seq[String],
                     weights: Seq[Double], bias: Double): Column = {
    require(vocab.length == weights.length, "vocab/weights misaligned")
    val wmap = map_from_arrays(
      array(vocab.map(lit): _*),
      array(weights.map(lit): _*))
    aggregate(split(text, " "),
      lit(bias),
      (acc, t) => acc + coalesce(element_at(wmap, t), lit(0.0)))
  }

  /** Corpus-wide scoring pass: (id columns…, margin, keep). Map-only —
    * this is the full-corpus stage, so it must not shuffle and must
    * stay inside whole-stage codegen; both margins qualify. */
  def scoreDocs(docs: DataFrame, textCol: String, vocab: Seq[String],
                weights: Seq[Double], bias: Double,
                exactOrder: Boolean = false): DataFrame = {
    val m = if (exactOrder) marginByCounts(col(textCol), vocab, weights, bias)
            else marginByTokens(col(textCol), vocab, weights, bias)
    docs.withColumn("margin", m)
      .withColumn("keep", (col("margin") > 0).cast("int"))
  }
}
