package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for the dedup/ANN scale-stress
  * harness (round-3 verdict #1): ~10^6 documents and ~10^5 embeddings
  * with PLANTED structure — known dup clusters, a mega-cluster, a
  * stop-shingle, embedding twins — so recall is measurable against
  * ground truth at sizes where all-pairs verification is infeasible.
  *
  * Generation is Spark expressions over `spark.range` (seeded xxhash64
  * everywhere): distributed, no driver loop, reproducible on any
  * partitioning — the same shape corpus synthesis takes at 100 TB.
  * `tools/gen_scale.py` writes the same layout driver-side for
  * workflows outside sbt.
  *
  * Layout (all planted ids are offsets of the base id, so ground truth
  * is closed-form):
  *  - base docs:   ids [0, n)            ~30 zipf-ish words from a 50k
  *                                       vocab; ids ≡0 mod 3 carry a
  *                                       fixed 5-word STOP-SHINGLE
  *                                       prefix (inverted-index skew)
  *  - near twins:  n + b  for b ≡0 (10)  base text + one appended word
  *                                       → 3-gram jaccard ≥ ~0.95
  *  - exact twins: 2n + b for b ≡7 (100) identical text (hamming 0)
  *  - mega:        3n + [0, mega)        ONE identical template text —
  *                                       the adversarial near-dup blob
  *                                       (only in the "adv" corpus)
  *  - embeddings:  base ids [0, m) in 2000 gaussian-ish blobs (blob =
  *                 id mod 2000 — the `label` column is an UNRELATED
  *                 partition key, NOT blob ground truth); twins
  *                 m + b for b ≡0 (10) at cosine ≥ 0.999
  */
object ScaleGen {

  val StopShingle = "the quick brown fox jumps"

  /** ~30 zipf-ish words for the given seed column. */
  private def textExpr(seed: org.apache.spark.sql.Column) = {
    val words = (0 until 30).map { p =>
      val u = pmod(xxhash64(seed, lit(p), lit(17L)), lit(1000000L))
        .cast("double") / 1000000.0
      // u^3 inverse-CDF: dense head, long tail — zipf-ish
      format_string("w%05d", (pow(u, 3.0) * 50000).cast("int"))
    }
    val body = concat_ws(" ", words: _*)
    when(seed % 3 === 0, concat(lit(StopShingle + " "), body))
      .otherwise(body)
  }

  private def shape(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"),
      element_at(typedlit(Seq("en", "fr", "de")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("lang"),
      length(col("text")).as("n_chars"))

  /** (clean corpus, adversarial corpus = clean ∪ mega, ground-truth
    * pairs (a_id, b_id, kind ∈ near|exact)). */
  def documents(spark: SparkSession, n: Long, mega: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = spark.range(0, n).select(col("id").as("doc_id"),
      textExpr(col("id")).as("text"))
    val nearTwins = spark.range(0, n, 10).select(
      (col("id") + n).as("doc_id"),
      concat(textExpr(col("id")), lit(" zz"),
        col("id").cast("string")).as("text"))
    val exactTwins = spark.range(7, n, 100).select(
      (col("id") + 2 * n).as("doc_id"), textExpr(col("id")).as("text"))
    val megaDf = spark.range(0, mega.toLong).select(
      (col("id") + 3 * n).as("doc_id"),
      textExpr(lit(1234567L)).as("text"))
    val clean = shape(base.unionByName(nearTwins).unionByName(exactTwins))
    val pairs = spark.range(0, n, 10)
      .select(col("id").as("a_id"), (col("id") + n).as("b_id"),
        lit("near").as("kind"))
      .unionByName(spark.range(7, n, 100)
        .select(col("id").as("a_id"), (col("id") + 2 * n).as("b_id"),
          lit("exact").as("kind")))
    (clean, clean.unionByName(shape(megaDf)), pairs)
  }

  /** (embeddings(vec_id, label, embedding float[dim]), twin pairs
    * (a_id, b_id) at cosine ≥ 0.999). */
  def embeddings(spark: SparkSession, m: Long, dim: Int = 64)
      : (DataFrame, DataFrame) = {
    def noise(seed: org.apache.spark.sql.Column, j: Int, salt: Long) =
      (pmod(xxhash64(seed, lit(j), lit(salt)), lit(2001L))
        .cast("double") - 1000.0) / 1000.0
    // 2000 blobs (~m/2000 members each): clustered like a real corpus
    // but without thousands of near-identical vectors per cluster —
    // THAT density is dup spam, which is what the planted twins model.
    def vec(seed: org.apache.spark.sql.Column, jitter: Double,
            salt: Long) = {
      val blob = pmod(seed, lit(2000L))
      array((0 until dim).map { j =>
        (sin(pmod(xxhash64(blob, lit(j), lit(7L)), lit(1000L))
          .cast("double")) + noise(seed, j, 23L) * 0.25 +
          noise(seed, j, salt) * jitter).cast("float")
      }: _*)
    }
    val base = spark.range(0, m).select(col("id").as("vec_id"),
      pmod(col("id"), lit(50L)).cast("int").as("label"),
      vec(col("id"), 0.0, 23L).as("embedding"))
    // twin = base + tiny independent jitter → cosine ≥ 0.999
    val twins = spark.range(0, m, 10).select(
      (col("id") + m).as("vec_id"),
      pmod(col("id"), lit(50L)).cast("int").as("label"),
      vec(col("id"), 0.004, 41L).as("embedding"))
    val pairs = spark.range(0, m, 10)
      .select(col("id").as("a_id"), (col("id") + m).as("b_id"))
    (base.unionByName(twins), pairs)
  }
}
