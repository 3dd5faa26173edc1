package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * Tokenization contract: EVERY phase — [[vocab]], [[train]]'s
  * features, both margin forms, and the DuckDB oracle's
  * `string_split(text, ' ')` — splits on a SINGLE ASCII space. One
  * tokenizer end to end, or a document with tabs or runs of spaces
  * would yield different token counts at scoring than the model was
  * trained on, silently skewing margins. Empty tokens (from repeated
  * spaces) never enter the vocabulary and carry no weight at scoring,
  * so they cancel out of both phases identically.
  */
object QualityClassifier {

  /** Deterministic training vocabulary: the `vocabSize` most frequent
    * corpus words, ties broken lexicographically (same ordering
    * doctrine as Bpe.train's histogram cap). Bounded collect — the
    * vocab IS the model's feature axis, sized by the caller.
    * Single-space tokenization (the object-level contract). */
  def vocab(docs: DataFrame, textCol: String,
            vocabSize: Int): Array[String] =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(vocabSize)
      .select("w").collect().map(_.getString(0))

  /** Train LR on fixed-vocab token counts; returns (weights, bias)
    * aligned with `vocab` — the exported model the scoring pass
    * broadcasts. Deterministic given the input sample (LBFGS on a
    * fixed feature space; no random init). Features tokenize on a
    * single space — the SAME tokenizer the scoring margins use (the
    * object-level contract; empty tokens are never in-vocab, so runs
    * of spaces contribute nothing in either phase). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            vocab: Array[String], regParam: Double = 1e-4)
      : (Array[Double], Double) = {
    val idx = vocab.zipWithIndex.toMap
    val dim = vocab.length
    val featUdf = udf { (t: String) =>
      val counts = new Array[Double](dim)
      if (t != null) t.split(" ").foreach { w =>
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

  /** Persist the exported model as its deployable artifact: one
    * parquet row per term (`ord`, `term`, `weight`) plus the bias as
    * `ord = -1` with a null term. ORDER IS PART OF THE MODEL:
    * [[marginByCounts]]' sum follows ascending vocab order, so the
    * artifact carries an explicit ordinal rather than trusting file
    * or row order — a loaded model replays margins bit-identically
    * (QualityClassifierSpec pins the round trip). Tiny table
    * (|vocab|+1 rows), coalesced to one file. */
  def saveModel(spark: SparkSession, path: String, vocab: Seq[String],
                weights: Seq[Double], bias: Double): Unit = {
    require(vocab.length == weights.length, "vocab/weights misaligned")
    import spark.implicits._
    val rows = (-1, null: String, bias) +:
      vocab.indices.map(i => (i, vocab(i), weights(i)))
    rows.toDF("ord", "term", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]] artifact back into (vocab, weights, bias),
    * validating shape loudly: exactly one bias row and contiguous
    * term ordinals 0..n-1 — a truncated or doubled write fails here,
    * not as a silently re-ordered (= silently different) model. */
  def loadModel(spark: SparkSession, path: String)
      : (Array[String], Array[Double], Double) = {
    val rows = spark.read.parquet(path)
      .select("ord", "term", "weight").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2)))
      .sortBy(_._1)
    require(rows.nonEmpty && rows.head._1 == -1,
      s"model at $path has no bias row (ord = -1)")
    val bias = rows.head._3
    val terms = rows.tail
    require(terms.map(_._1).toSeq == terms.indices.toSeq,
      s"model at $path has non-contiguous term ordinals — " +
        "corrupt or partially written artifact")
    (terms.map(_._2), terms.map(_._3), bias)
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
