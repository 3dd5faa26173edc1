package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Probabilistic/approximate operators as driver queries. Their hash
  * functions (xxhash64, murmur, seeded hyperplanes) are engine-specific,
  * so there is no DuckDB oracle — the driver records rows-only and the
  * real verification is the recall/precision assertions in
  * DedupSimilaritySpec (precision is always exact-verified in-pipeline;
  * recall bounds are the banding guarantees documented on each op).
  */
object ApproxQueries {

  val defs: Map[String, QDef] = Map(

    "dedup_minhash_lsh" -> QDef.noOracle(
      (s, d) => Dedup.minhashDedup(
        Tables.load(s, d, "documents"), "doc_id", "text",
        threshold = 0.6)
        .select(col("a_id"), col("b_id"),
          round(col("jaccard"), 6).as("jaccard"))),

    // h=3 with block-permuted tables (d=5 → 10 tables of 24-bit keys):
    // recall is guaranteed at the registered budget (SimhashBandingSpec
    // proves it per distance) AND the bucket keys stay selective at
    // corpus scale — the r2 h=10 registration used 5-6-bit chunk keys
    // whose buckets went quadratic (and overflowed the cap) as the
    // corpus grew. Budgets beyond ~6 need a wider signature, not a
    // 64-bit one with more tables.
    "dedup_simhash" -> QDef.noOracle(
      (s, d) => Dedup.simhashDedup(
        Tables.load(s, d, "documents"), "doc_id", "text",
        maxHamming = 3)),

    "ann_ivf" -> QDef.noOracle(
      (s, d) => {
        val (centroids, indexed) = Similarity.ivfIndex(
          Tables.load(s, d, "embeddings"), nlist = 8)
        val queries = indexed.where(col("id") % 50 === 0)
        Similarity.ivfTopK(centroids, indexed, queries, k = 10, nprobe = 3)
          .select(col("q_id"), col("neighbor_id"), col("nn_rank"),
            round(col("cos"), 6).as("cosine"))
      }),

    "ann_lsh" -> QDef.noOracle(
      (s, d) => {
        val indexed = Similarity.index(
          Tables.load(s, d, "embeddings"), nBits = 6, dim = 64,
          tables = 4)
        val queries = indexed.where(col("id") % 50 === 0)
        Similarity.annTopK(indexed, queries, k = 10, nBits = 6)
          .select(col("q_id"), col("neighbor_id"), col("nn_rank"),
            round(col("cos"), 6).as("cosine"))
      })
  )
}
