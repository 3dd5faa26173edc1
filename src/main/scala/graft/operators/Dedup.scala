package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale.
  *
  * The all-pairs Jaccard join is quadratic; these operators use the two
  * standard sub-quadratic shapes:
  *  - MinHash + LSH banding: signature → band buckets → join only within
  *    buckets → exact-verify candidates (one narrow signature pass, one
  *    bucket-join shuffle keyed by (band, bucket) — no pair explosion for
  *    non-dup docs).
  *  - SimHash: 64-bit signature whose hamming distance tracks cosine/
  *    Jaccard similarity; block-permuted tables (Manku WWW'07) key each
  *    signature on every (d-h)-block combination, guaranteeing recall at
  *    hamming ≤ h with selective (≥24-bit) bucket keys.
  *
  * Hash functions are Spark's codegen'd xxhash64 — engine-specific, hence
  * these are scalatest-verified (driver rows-only check), while the exact
  * blocked-Jaccard query (`dedup_ngram_jaccard`) carries the DuckDB
  * oracle.
  */
object Dedup {

  /** Per-row byte estimate for exploded-shingle exchanges (the
    * [[Similarity.sizedByBytes]] input): 8 B id + 8 B n + a word-3-gram
    * UTF8 string (~26 B typical English) + UnsafeRow field offsets and
    * shuffle serialization overhead. Deliberately round and slightly
    * generous — the sizing rule only needs the right order of
    * magnitude to keep per-task state near 64 MB. */
  private[graft] val ShingleRowBytes = 96L

  /** Hot-bucket guard shared by every banding/bucketing pipeline
    * (minhash bands, simhash tables, hyperplane-LSH buckets): drop
    * `keys` groups holding more than `maxBucket` rows BEFORE a bucket
    * self-join — an m-row bucket emits ~m²/2 candidate pairs, so a
    * mega-cluster of identical signatures would blow the join up; its
    * pairs belong to exact-dup handling, and each pipeline's
    * `*OversizedBuckets` function makes the dropped set observable.
    *
    * Count-over-window, not broadcast anti-join: the anti-join form
    * evaluates the upstream pipeline TWICE (the two subtrees prune
    * differently, so exchange reuse never fires — measured 24 stages /
    * 6.1 MB shuffle vs 19 / 3.7 MB at sf0.1 in minhashDedup), while
    * the window folds the count into the SAME shuffle the self-join
    * partitions by, so upstream rows cross the wire once. Window
    * state is bounded by the largest bucket — which is what the guard
    * bounds anyway. */
  private[graft] def pruneOversized(df: DataFrame, keys: Seq[String],
                                    maxBucket: Int): DataFrame =
    df.withColumn("__bn", count("*").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)))
      .where(col("__bn") <= maxBucket).drop("__bn")

  /** Exact pairwise intersection sizes via the inverted-index shape:
    * explode the (distinct) shingle arrays, self-join on the shingle
    * (plus optional block columns), count matches per (a, b) pair. All
    * codegen'd joins/aggregates — no per-pair set operations, which are
    * interpreted and 10× slower. Pairs sharing nothing never materialize.
    *
    * Skew note for 100 TB: a shingle occurring in f docs contributes
    * f²/2 join rows; corpora with stop-shingles need the MinHash path
    * (or prefix filtering) instead — this is the exact-verification
    * engine, not the candidate generator.
    *
    * Exchange self-sizing (r10 verdict item 2, the GROWTH_SF10
    * lesson): the exploded relation ships one (id, n, blocks,
    * shingle-string) row per shingle INSTANCE, so its per-task
    * shuffle state at the session partition count outgrows execution
    * memory two decades above the gate tier exactly like the vector
    * exchanges did. `sizeHint` = estimated shingle instances (docs ×
    * avg shingles/doc; callers at scale already count docs) routes
    * the self-join's one exchange through the shared ~64 MB/task rule
    * ([[Similarity.sizedByBytes]]) — never repartitioning a wider
    * session down.
    *
    * @param base DataFrame(id, sh: array<string> DISTINCT, n: int, block...)
    * @return (a_id, b_id, a_n, b_n, i) for co-occurring pairs
    */
  def pairIntersectionCounts(base: DataFrame,
                             blockCols: Seq[String],
                             sizeHint: Option[Long] = None): DataFrame = {
    val ex0 = base.select(
      (Seq(col("id"), col("n")) ++ blockCols.map(col) :+
        explode(col("sh")).as("shingle")): _*)
    // sized on the JOIN keys: the explicit repartition becomes the
    // self-join's one shared exchange (both sides reuse it), so the
    // hint changes the partition COUNT, not the plan shape
    val ex = Similarity.sizedByBytes(ex0, sizeHint, rowsPerItem = 1L,
      rowBytes = ShingleRowBytes, keys = blockCols :+ "shingle")
    val joinCond = (col("a.shingle") === col("b.shingle") &&
      col("a.id") < col("b.id")) +: blockCols.map(c =>
      col(s"a.$c") === col(s"b.$c"))
    // shuffle_hash, not broadcast: the exploded relation is large (one
    // row per shingle instance), and as a self-join both sides hash into
    // the SAME exchange (ReuseExchange) — one scan, no driver-side
    // broadcast build.
    ex.as("a").hint("shuffle_hash")
      .join(ex.as("b"), joinCond.reduce(_ && _))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.n").as("a_n"), col("b.n").as("b_n"))
      .agg(count("*").as("i"))
  }

  /** MinHash signature: k independent permutation-min hashes of a shingle
    * array, as one array column.
    *
    * NOTE: avoid applying this over a derived shingle column in the same
    * projection — CollapseProject inlines the shingle expression into all
    * k transforms, recomputing the shingling k times per row. Prefer
    * [[minhashSignatures]], which aggregates exploded shingles with k
    * codegen'd `min`s (one shingle pass, partial-aggregated map-side).
    *
    * NOT signature-compatible with [[minhashSignatures]]: the two
    * forms use different hash families (per-permutation `xxhash64(j,
    * s)` here vs affine transforms of one `xxhash64(s)` there), so
    * their signatures never collide with each other. Sign an entire
    * index — including later incremental batches — with ONE form;
    * mixing them silently drops banding recall to zero. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingles, s => xxhash64(lit(j), s)))
    }: _*)

  /** Universal-hash family over a precomputed 64-bit shingle hash:
    * h_j(x) = a_j·x + b_j with odd multipliers (mod 2^64 by natural
    * overflow). One string hash per shingle total; the k permutations
    * are two ALU ops each. WrapArith pins legacy wraparound so the family
    * survives ANSI-on sessions (Spark 4.x caller default) — `try_multiply`
    * would NULL the signatures instead. */
  private def permHash(h: Column, j: Int): Column =
    org.apache.spark.sql.graftx.WrapArith.add(
      org.apache.spark.sql.graftx.WrapArith.mul(
        h, lit(0x9E3779B97F4A7C15L * (2 * j + 1))),
      lit(j * 0xBF58476D1CE4E5B9L))

  /** MinHash signatures from exploded shingles:
    * ex(id, shingle) → (id, sig: array<long>[k]). The k hash functions
    * are k codegen'd `min` aggregates over one xxhash64 per shingle —
    * map-side partial aggregation, one shuffle keyed by id. This is the
    * scale form; [[minhashSignature]] (array HOF) exists for per-row use
    * but recomputes derived shingle columns k× (see its note). */
  def minhashSignatures(ex: DataFrame, k: Int): DataFrame = {
    val hashed = ex.withColumn("__h", xxhash64(col("shingle")))
    val mins = (0 until k).map(j =>
      min(permHash(col("__h"), j)).as(s"__m$j"))
    hashed.groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until k).map(j => col(s"__m$j")): _*).as("sig"))
  }

  /** LSH banding: explode the signature into `bands` buckets of `rowsPer`
    * signature slots; rows sharing any (band, bucket-hash) become join
    * candidates. */
  def lshBuckets(sig: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(sig, b * rowsPer + 1, rowsPer)).as("bucket"))
    }: _*)

  /** Full MinHash-LSH near-dup pipeline: docs(idCol, textCol) →
    * (a_id, b_id, jaccard) pairs with exact word-3-gram Jaccard ≥
    * `threshold`, candidates generated by LSH (k = bands·rowsPer).
    *
    * Probabilistic recall: P(candidate) = 1-(1-j^rowsPer)^bands — with
    * 8 bands × 4 rows, j=0.8 docs are caught with p≈0.996.
    *
    * `maxBucket` is the same hot-bucket guard simhashPairs and
    * lshDedupPairs carry: a (band, bucket) holding m docs emits ~m²/2
    * candidate pairs, so one template-spam cluster of near-identical
    * texts (identical signatures → every band collides) would turn the
    * candidate join quadratic at corpus scale. Buckets above the cap
    * are dropped whole — such clusters are exact-dup territory
    * ([[graft.operators.TextQueries]] `dedup_exact`) — and the dropped
    * set is observable via [[minhashOversizedBuckets]]. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.6, bands: Int = 8,
                   rowsPer: Int = 4, maxBucket: Int = 100000,
                   sizeHint: Option[Long] = None): DataFrame =
    // Unmanaged convenience form: the persisted shingle relation stays
    // cached until the session LRU-evicts it (fine for one-shot driver
    // runs). A long-lived session looping over corpora should use
    // [[minhashDedupManaged]] and release() after its terminal action.
    minhashDedupManaged(docs, idCol, textCol, threshold, bands, rowsPer,
      maxBucket, sizeHint).df

  /** [[minhashDedup]] with an explicit cache-lifecycle handle — see
    * [[ManagedResult]].
    *
    * `sizeHint` (r10 verdict item 2) = estimated shingle INSTANCES
    * (docs × avg shingles/doc — scale callers already count docs):
    * the exact-verify joins ship the exploded (id, shingle-string)
    * relation twice, and like the vector exchanges GROWTH_SF10
    * measured, their per-task shuffle state at the session partition
    * count is the knob that decides spill-vs-fit two decades up. The
    * hint routes both verify-join exchanges through the shared
    * ~64 MB/task rule ([[Similarity.sizedByBytes]]); None (the gate
    * tiers) leaves the plan untouched. */
  def minhashDedupManaged(docs: DataFrame, idCol: String,
                          textCol: String, threshold: Double = 0.6,
                          bands: Int = 8, rowsPer: Int = 4,
                          maxBucket: Int = 100000,
                          sizeHint: Option[Long] = None): ManagedResult = {
    // The pipeline is genuinely multi-pass over the shingles (signature,
    // sizes, exact verify), so the exploded shingle relation is persisted
    // — computed once, reused by every pass within the job; ownership of
    // the cached blocks is the returned handle's. Everything that
    // shuffles from here on is ids + 8-byte hashes, never text.
    val ex = docs
      .where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("id"),
        explode(TextQueries.shingles3(col(textCol))).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = ex.groupBy("id").agg(count("*").as("n"))
    val allBuckets = minhashSignatures(ex, bands * rowsPer)
      .withColumn("bkt", explode(lshBuckets(col("sig"), bands, rowsPer)))
      .select(col("id"), col("bkt.band"), col("bkt.bucket"))
    // Hot-bucket guard — see [[pruneOversized]] for the
    // window-vs-anti-join rationale; dropped set observable via
    // [[minhashOversizedBuckets]].
    val buckets = pruneOversized(allBuckets, Seq("band", "bucket"),
      maxBucket)
    // Candidates as bare id pairs: the bucket self-join and the
    // dropDuplicates shuffle move 16-byte pairs only.
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    // Exact-verify with the codegen-friendly inverted shape: size
    // prefilter, then count shared shingles per pair via join+groupBy
    // (no interpreted set ops), then Jaccard = i / (na + nb - i).
    val sized = cands
      .join(sizes.select(col("id").as("a_id"), col("n").as("a_n")),
        Seq("a_id"))
      .join(sizes.select(col("id").as("b_id"), col("n").as("b_n")),
        Seq("b_id"))
      .where(least(col("a_n"), col("b_n")) >=
        lit(threshold) * greatest(col("a_n"), col("b_n")))
    // Self-sized verify exchanges (see the managed form's scaladoc):
    // each projection is keyed exactly like its join, so the explicit
    // repartition IS the join's exchange — count changes, shape not.
    val exA = Similarity.sizedByBytes(
      ex.select(col("id").as("a_id"), col("shingle")), sizeHint,
      rowsPerItem = 1L, rowBytes = ShingleRowBytes, keys = Seq("a_id"))
    val exB = Similarity.sizedByBytes(
      ex.select(col("id").as("b_id"), col("shingle")), sizeHint,
      rowsPerItem = 1L, rowBytes = ShingleRowBytes,
      keys = Seq("b_id", "shingle"))
    val pairs = sized
      .join(exA, Seq("a_id"))
      .join(exB, Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id", "a_n", "b_n")
      .agg(count("*").as("i"))
      .select(col("a_id"), col("b_id"),
        (col("i") / (col("a_n") + col("b_n") - col("i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
    ManagedResult(pairs, Seq(ex))
  }

  /** Cross-relation MinHash-LSH matching — the FUZZY form of train/
    * eval decontamination ([[graft.operators.TextQueries]]
    * `contamination_check` is the exact n-gram form): for each eval
    * doc, the training docs whose word-3-gram Jaccard ≥ `threshold`,
    * candidates from LSH band-bucket equi-joins ACROSS the two
    * relations, then exact-verified — the same
    * candidates-then-verify shape as [[minhashDedup]], so the output
    * is the exact cross-pair answer wherever LSH recall holds (16
    * bands × 2 rows: a θ=0.8 pair is missed with p=(1−0.8²)^16 ≈
    * 9·10⁻⁸).
    *
    * Both sides are signed with [[minhashSignatures]] — ONE hash
    * family, which is what makes the cross-join meaningful (see the
    * compatibility warning on [[minhashSignature]]). Both bucket
    * relations carry the hot-bucket guard: a template-spam cluster
    * on EITHER side would otherwise turn the band join quadratic.
    * Shuffles carry ids and 8-byte hashes, never text; at 100 TB
    * the eval side is typically tiny, and Spark broadcasts its
    * bucket relation under AQE automatically.
    *
    * @return (eval_id, train_id, jaccard) for matched cross pairs
    */
  def crossMinhashMatches(evalDocs: DataFrame, trainDocs: DataFrame,
                          evalIdCol: String, trainIdCol: String,
                          textCol: String,
                          threshold: Double = 0.8, bands: Int = 16,
                          rowsPer: Int = 2,
                          maxBucket: Int = 100000): DataFrame =
    // Unmanaged convenience form — same caller-owned-or-LRU cache
    // lifecycle note as [[minhashDedup]]; long-lived sessions should
    // use the managed form and release() after the terminal action.
    crossMinhashMatchesManaged(evalDocs, trainDocs, evalIdCol,
      trainIdCol, textCol, threshold, bands, rowsPer, maxBucket).df

  /** [[crossMinhashMatches]] with an explicit cache-lifecycle handle —
    * see [[ManagedResult]]. Both exploded shingle relations (eval and
    * train) are persisted for the pipeline's internal passes and
    * released together. */
  def crossMinhashMatchesManaged(
      evalDocs: DataFrame, trainDocs: DataFrame,
      evalIdCol: String, trainIdCol: String, textCol: String,
      threshold: Double = 0.8, bands: Int = 16, rowsPer: Int = 2,
      maxBucket: Int = 100000): ManagedResult = {
    def exploded(df: DataFrame, idCol: String) = df
      .where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("id"),
        explode(TextQueries.shingles3(col(textCol))).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exE = exploded(evalDocs, evalIdCol)
    val exT = exploded(trainDocs, trainIdCol)
    def buckets(ex: DataFrame) = pruneOversized(
      minhashSignatures(ex, bands * rowsPer)
        .withColumn("bkt",
          explode(lshBuckets(col("sig"), bands, rowsPer)))
        .select(col("id"), col("bkt.band"), col("bkt.bucket")),
      Seq("band", "bucket"), maxBucket)
    val cands = buckets(exE).as("e")
      .join(buckets(exT).as("t"),
        col("e.band") === col("t.band") &&
          col("e.bucket") === col("t.bucket"))
      .select(col("e.id").as("eval_id"), col("t.id").as("train_id"))
      .dropDuplicates("eval_id", "train_id")
    def sizes(ex: DataFrame, side: String) = ex.groupBy("id")
      .agg(count("*").as(s"${side}_n"))
      .withColumnRenamed("id", s"${side}_id")
    val sized = cands
      .join(sizes(exE, "eval"), Seq("eval_id"))
      .join(sizes(exT, "train"), Seq("train_id"))
      .where(least(col("eval_n"), col("train_n")) >=
        lit(threshold) * greatest(col("eval_n"), col("train_n")))
    val matches = sized
      .join(exE.select(col("id").as("eval_id"), col("shingle")),
        Seq("eval_id"))
      .join(exT.select(col("id").as("train_id"), col("shingle")),
        Seq("train_id", "shingle"))
      .groupBy("eval_id", "train_id", "eval_n", "train_n")
      .agg(count("*").as("i"))
      .select(col("eval_id"), col("train_id"),
        (col("i") / (col("eval_n") + col("train_n") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
    ManagedResult(matches, Seq(exE, exT))
  }

  /** (band, bucket, bucket_n) groups above `maxBucket` for this corpus/
    * banding — the exact set [[minhashDedup]] drops; count()==0 means no
    * candidate was lost to the hot-bucket guard (same observability
    * contract as [[simhashOversizedBuckets]]). */
  def minhashOversizedBuckets(docs: DataFrame, idCol: String,
                              textCol: String, bands: Int = 8,
                              rowsPer: Int = 4,
                              maxBucket: Int = 100000): DataFrame = {
    val ex = docs
      .where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("id"),
        explode(TextQueries.shingles3(col(textCol))).as("shingle"))
    minhashSignatures(ex, bands * rowsPer)
      .withColumn("bkt", explode(lshBuckets(col("sig"), bands, rowsPer)))
      .groupBy(col("bkt.band").as("band"), col("bkt.bucket").as("bucket"))
      .agg(count("*").as("bucket_n")).where(col("bucket_n") > maxBucket)
  }

  /** 64-bit SimHash of a token array. Two 32-bit murmur hashes (seeded)
    * are combined per token; per-bit ±1 votes are summed and the sign
    * taken. Applied as a UDF on the already-split token array — narrow,
    * one pass per row. */
  private[operators] def simhash64(tokens: Seq[String]): Long = {
    import scala.util.hashing.MurmurHash3
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc
    }
  }

  private val simhashUdf = udf(simhash64 _)

  /** SimHash signatures for a corpus: docs(idCol, textCol) →
    * (id, simhash). Null texts are excluded (they cannot carry a
    * signature; without the filter the UDF received a null token
    * array and killed the job with an opaque task NPE — the same
    * ingest-with-nullable-columns input every other dedup entry
    * filters). */
  def simhashSignatures(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        simhashUdf(split(col(textCol), " ")).as("simhash"))

  /** SimHash near-dup candidate pairs from precomputed signatures, with
    * a recall GUARANTEE at `maxHamming` via block-permuted tables (Manku
    * et al., WWW'07 §3): the 64 bits are split into `blocks` = d disjoint
    * blocks (d > h); a pair within the hamming budget differs in at most
    * h blocks, so it agrees exactly on some (d-h)-subset of blocks —
    * keying every signature on ALL C(d, h) such subsets (each key = the
    * concatenated block values, hashed) guarantees a shared bucket.
    *
    * Unlike the naive h+1-chunk pigeonhole (whose keys shrink to
    * 64/(h+1) bits and stop being selective), the table keys here carry
    * (d-h)·(64/d) bits of signature — ≥ 24 bits for the default d — so
    * buckets stay near-singleton at corpus scale and candidate fan-in is
    * linear, not quadratic. The price is C(d, h) table replicas per row
    * (h=3, d=5 → 10 rows of 24-byte keys — cheaper than the old 11).
    *
    * `maxBucket` caps residual fan-in: with ≥24-bit keys a bucket only
    * exceeds the cap when >maxBucket docs share identical block values,
    * i.e. a mega-cluster of (near-)identical signatures — those are
    * exact-dup territory (route through [[TextQueries]] exact dedup, or
    * raise the cap); the dropped set is observable via
    * [[simhashOversizedBuckets]], and the guarantee is exact whenever
    * that set is empty. Budgets where 64-bit keys can't reach 24-bit
    * selectivity (h ≳ 6) degrade gracefully to the widest feasible keys;
    * genuinely large budgets need a wider signature, not more tables.
    *
    * @param sigs   (id, simhash: long)
    * @param blocks number of blocks d (0 → smallest d with ≥24-bit keys
    *               and ≤64 tables, see [[defaultBlocks]])
    * @return (a_id, b_id, hamming) with hamming ≤ maxHamming, exact-verified
    */
  def simhashPairs(sigs: DataFrame, maxHamming: Int,
                   maxBucket: Int = 10000, blocks: Int = 0): DataFrame = {
    val keyed = keyedSigs(sigs, maxHamming, resolveBlocks(maxHamming, blocks))
    // Skew guard — see [[pruneOversized]]; dropped set observable via
    // [[simhashOversizedBuckets]].
    val pruned = pruneOversized(keyed, Seq("c", "v"), maxBucket)
    val cands = pruned.as("a").join(pruned.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.simhash").as("a_sig"), col("b.simhash").as("b_sig"))
      .dropDuplicates("a_id", "b_id")
    cands.select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Smallest block count d > h whose table keys carry ≥ 24 bits of
    * signature ((d-h)·⌊64/d⌋) within ≤ 64 tables (C(d, h)); if no d
    * qualifies (large budgets on a 64-bit signature), the feasible d
    * with the widest keys. h=3 → 5 (10 tables, 24-bit keys); h=10 → 11
    * (11 tables — the degenerate single-block keys, documented above). */
  private[operators] def defaultBlocks(maxHamming: Int): Int = {
    val h = maxHamming
    def tables(d: Int): Long = { // C(d, h), capped to avoid overflow
      var n = 1L
      var i = 0
      while (i < math.min(h, d - h) && n <= 10000) {
        n = n * (d - i) / (i + 1); i += 1
      }
      n
    }
    def keyBits(d: Int): Int = (d - h) * (64 / d)
    // d ranges to 64 so every legal budget has a feasible layout:
    // d = h+1 always has C(h+1, h) = h+1 ≤ 64 tables.
    val feasible = ((h + 1) to 64).filter(tables(_) <= 64)
    feasible.find(keyBits(_) >= 24)
      .getOrElse(feasible.maxBy(keyBits))
  }

  private def resolveBlocks(maxHamming: Int, blocks: Int): Int = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in 0..63, got $maxHamming")
    val d = if (blocks > 0) blocks else defaultBlocks(maxHamming)
    require(d > maxHamming && d <= 64,
      s"blocks must be in ${maxHamming + 1}..64, got $d")
    d
  }

  /** (id, simhash, c, v): one row per (d-h)-block combination; c is the
    * combination index, v the xxhash64 of that combination's block
    * values. Hash collisions only add spurious candidates (removed by
    * the exact hamming verify), never lose recall. */
  private def keyedSigs(sigs: DataFrame, maxHamming: Int,
                        d: Int): DataFrame = {
    val widths = Array.tabulate(d)(i => 64 / d + (if (i < 64 % d) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val blockVal = (i: Int) => {
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      shiftright(col("simhash"), offsets(i)).bitwiseAND(lit(mask))
    }
    val combos = (0 until d).combinations(d - maxHamming).toSeq
    val keyExprs = combos.zipWithIndex.map { case (combo, ci) =>
      struct(lit(ci).as("c"),
        xxhash64((lit(ci) +: combo.map(blockVal)): _*).as("v"))
    }
    sigs.withColumn("k", explode(array(keyExprs: _*)))
      .select(col("id"), col("simhash"),
        col("k.c").as("c"), col("k.v").as("v"))
  }

  /** Buckets above `maxBucket` for the given corpus/budget — the exact
    * set [[simhashPairs]] drops; count()==0 means the recall guarantee
    * held with no exception. */
  def simhashOversizedBuckets(sigs: DataFrame, maxHamming: Int,
                              maxBucket: Int = 10000,
                              blocks: Int = 0): DataFrame =
    keyedSigs(sigs, maxHamming, resolveBlocks(maxHamming, blocks))
      .groupBy("c", "v")
      .agg(count("*").as("bucket_n")).where(col("bucket_n") > maxBucket)

  /** SimHash near-dup pairs over documents: signatures + guaranteed-recall
    * block-permuted banding (see [[simhashPairs]]). */
  def simhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucket: Int = 10000): DataFrame =
    simhashPairs(simhashSignatures(docs, idCol, textCol), maxHamming,
      maxBucket)

  /** Duplicate-cluster resolution: dup PAIRS → one canonical doc per
    * connected component — the step every dedup pipeline needs after
    * candidate generation ("keep canonical, drop the rest"). Pairwise
    * output alone under-deletes: {(a,b), (b,c)} must collapse to ONE
    * survivor, not two independent drops.
    *
    * Algorithm: alternating large-star / small-star edge contraction
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond" — the GraphFrames CC shape). Each round, large-star
    * connects every strictly-larger neighbor of a node to the node's
    * neighborhood minimum, small-star does the same for the
    * smaller-or-equal neighbors keyed from the larger endpoint; the
    * fixpoint is a forest of stars rooted at component minima. Pure
    * join+groupBy rounds (no driver-side graph), provably
    * O(log²) rounds with the edge set SHRINKING as stars collapse —
    * the r9 replacement for min-label propagation + label jumping,
    * whose "jump" is the identity at every local minimum, degrading
    * to ONE HOP PER ROUND on chain-shaped dup graphs (observed at
    * the 200k-vector sf1 tier: √n-sized semantic-dedup cells produced
    * chains that blew the 20-round cap; a C4-style doc chain at
    * 100 TB would do the same at any cap). Dup clusters from banding
    * are near-cliques, so 2-3 rounds typical. The edge relation is
    * |pairs|, orders of magnitude smaller than the corpus — at
    * 100 TB this runs on the dedup OUTPUT, never the documents.
    *
    * Size-gated routing (the broadcast-threshold idea applied to an
    * iterative algorithm): after the canonical edge dedup, the edge
    * COUNT — already needed as the fixpoint baseline — picks the
    * route. At or under [[driverComponentsEdgeLimit]] edges the graph
    * is union-found on the driver in one pass (≤4M (long, long) rows
    * — a bounded collect of a few hundred MB transient on the driver,
    * the same order as a broadcast-join build side) because the
    * distributed rounds cost
    * ~1 s of serial exchange/job latency EACH regardless of data
    * size: the sf1 semantic-dedup graph (118k edges, 7 rounds) spent
    * 7.2 of its 11 s in the loop. Above the limit — any real 100-TB
    * dedup run, where pair sets are billions — the alternating-star
    * rounds run exactly as before. Both routes emit identical rows
    * (min-id canonical, every paired node exactly once;
    * DedupSimilaritySpec pins route equality on random graphs).
    *
    * @param pairs (a_id, b_id) dup pairs (undirected)
    * @param driverEdgeLimit route bound override; defaults to
    *        [[driverComponentsEdgeLimit]] (negative = use the
    *        default). Pass 0 to force the distributed rounds,
    *        Long.MaxValue to force the driver union-find.
    * @return (id, canonical_id) for every id in a pair; docs to drop
    *         are the rows with id != canonical_id
    */
  def dupComponents(pairs: DataFrame, maxIter: Int = 30,
                    driverEdgeLimit: Long = -1L): DataFrame = {
    val spark = pairs.sparkSession
    // Canonical (hi > lo) undirected edge set, self-loops dropped.
    // localCheckpoint: materialize the (possibly expensive) candidate
    // pipeline once, and per round below, TRUNCATE lineage so the
    // optimizer never re-analyzes a nested iterative plan (the driver
    // OOMs on a few dozen rounds' depth otherwise).
    var e = pairs
      .select(greatest(col("a_id"), col("b_id")).as("hi"),
        least(col("a_id"), col("b_id")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .dropDuplicates("hi", "lo")
      .localCheckpoint(true)
    val nEdges = e.count()
    val limit = if (driverEdgeLimit >= 0L) driverEdgeLimit
                else driverComponentsEdgeLimit
    val longIds = e.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    if (nEdges > 0 && nEdges <= limit && longIds)
      return driverComponents(e)
    // One large-star + small-star alternation, built LAZILY (the
    // round loop checkpoints its output).
    def alternate(cur: DataFrame): DataFrame = {
      // large-star: from the symmetric view of each node u, connect
      // every neighbor v > u to m(u) = min(Γ(u) ∪ {u}). Emitted edges
      // keep hi=v, lo=m (v > u ≥ m).
      val sym = cur.select(col("hi").as("s"), col("lo").as("d"))
        .union(cur.select(col("lo").as("s"), col("hi").as("d")))
      val mins = sym.groupBy("s").agg(min("d").as("mn"))
        .select(col("s"), least(col("s"), col("mn")).as("m"))
      // no dedup here: small-star's groupBy-min is duplicate-
      // insensitive and the round's closing dedup catches the rest —
      // one fewer exchange per round (measured 0.8 s on the sf0.1
      // gate-scale queries across ~3 rounds)
      val ls = sym.join(mins, "s")
        .where(col("d") > col("s"))
        .select(col("d").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
      // small-star: key each edge by its LARGER endpoint u; with
      // Γ⁻(u) its smaller neighbors and m = min(Γ⁻(u)), connect u and
      // every v ∈ Γ⁻(u)\{m} to m. Both emissions keep hi > lo.
      val sm = ls.groupBy("hi").agg(min("lo").as("m"))
      ls.join(sm, "hi")
        .select(col("lo").as("hi2"), col("m").as("lo2"))
        .where(col("hi2") =!= col("lo2"))
        .union(sm.select(col("hi").as("hi2"), col("m").as("lo2")))
        .select(col("hi2").as("hi"), col("lo2").as("lo"))
        .dropDuplicates("hi", "lo")
    }
    var it = 0
    var curCnt = nEdges
    var converged = curCnt == 0
    while (!converged && it < maxIter) {
      // ONE alternation per materialization. Chaining two lazily was
      // tried and REVERTED: an unmaterialized alternation is
      // self-referenced several times by the next one (sym twice, sym
      // again under mins and ls), and exchange reuse does not catch
      // every copy — the sf0.1 component queries slowed 2x
      // (dedup_components 1.95 -> 4.29 s) for a 7 -> 4 round count.
      val ss = alternate(e).localCheckpoint(true)
      // fixpoint check: counts first — carried from the previous
      // round, so one count job per round — then an anti-join only
      // when counts agree
      val after = ss.count()
      converged = curCnt == after &&
        ss.join(e, Seq("hi", "lo"), "left_anti").isEmpty
      if (sys.env.contains("GRAFT_DEBUG_COMPONENTS"))
        System.err.println(
          s"[components] round $it edges $curCnt -> $after" +
            (if (converged) " (fixpoint)" else ""))
      e = ss
      curCnt = after
      it += 1
    }
    // Loud, not silent: returning unconverged labels would split real
    // clusters. Alternating stars need O(log²) rounds, so the default
    // cap covers any realistic graph; hitting it means the input
    // isn't a dedup pair set — fail rather than under-delete.
    require(converged,
      s"dupComponents did not converge in $maxIter rounds — " +
        "raise maxIter for graphs of this diameter")
    // Final e is a union of flat stars rooted at component minima, and
    // EVERY input node is in it: both star ops re-emit each node they
    // touch (a neighbor v > u survives as hi of (v, m(u)); a
    // neighborhood minimum survives as its emissions' lo), so nothing
    // ever collapses away — no separate node-set snapshot needed (the
    // union-find property test pins this on random graphs). At the
    // fixpoint hi's and lo's are disjoint and each hi appears once,
    // so members label to their root and roots to themselves.
    e.select(col("hi").as("id"), col("lo").as("canonical_id"))
      .union(e.select(col("lo").as("id"), col("lo").as("canonical_id"))
        .distinct())
  }

  /** Default edge-count bound for [[dupComponents]]' driver
    * union-find route: 4M edges (two longs each — a collect on the
    * order of a broadcast build side). Direct callers override with
    * the `driverEdgeLimit` parameter; REGISTRY-path forcing (plan
    * pins, route A/Bs driven through query names) goes through the
    * `graft.components.driverEdgeLimit` system property, which this
    * default reads per call. The property is JVM-global: scope it
    * with a save/restore around query CONSTRUCTION only (the route
    * runs eagerly inside dupComponents), and prefer the parameter
    * everywhere a Dedup call is in hand. A malformed value fails
    * loudly here rather than as a bare NumberFormatException. */
  private[graft] def driverComponentsEdgeLimit: Long =
    sys.props.get("graft.components.driverEdgeLimit").map { v =>
      require(v.forall(_.isDigit) && v.nonEmpty,
        s"graft.components.driverEdgeLimit must be a non-negative " +
          s"integer, got '$v'")
      v.toLong
    }.getOrElse(4L << 20)

  /** Driver union-find over a canonical (hi > lo) deduped edge set
    * that fits [[driverComponentsEdgeLimit]] — same output contract as
    * the distributed fixpoint: (id, component-min canonical_id), one
    * row per node that appears in an edge. Union by id order (greater
    * root attaches under smaller) makes every root its component's
    * minimum; iterative find with path-halving keeps the walk
    * stack-free at the 4M-edge bound. */
  private def driverComponents(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val edges = e.select(col("hi"), col("lo")).collect()
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { r =>
      val ra = find(r.getLong(0))
      val rb = find(r.getLong(1))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    // every endpoint exactly once; roots label to themselves
    val seen = new java.util.HashSet[Long](edges.length * 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    edges.foreach { r =>
      var i = 0
      while (i < 2) {
        val id = r.getLong(i)
        if (seen.add(id)) out += ((id, find(id)))
        i += 1
      }
    }
    import spark.implicits._
    val slices = math.max(1, out.length / 500000)
    spark.createDataset(
      spark.sparkContext.parallelize(out.toSeq, slices))
      .toDF("id", "canonical_id")
  }
}
