package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over embedding columns.
  *
  * `knn_cosine` (VectorQueries) is the exact brute-force baseline —
  * broadcast the queries, stream the corpus. That is O(|corpus|·|queries|)
  * and the right answer up to ~10^4 queries; beyond that, bucket the
  * corpus so each query only scans slivers:
  *
  * Random-hyperplane LSH (Charikar): `nBits` signed projections give a
  * bucket id; cosine-similar vectors collide per-bit with probability
  * 1-θ/π. A single table's recall decays as p^nBits, so we use the
  * standard L-tables construction — `tables` independent hyperplane sets,
  * a candidate needs to collide in any one — plus multi-probe (each query
  * also probes every 1-bit-flip of its bucket) to recover quantization
  * loss without more tables.
  *
  * Scale shape: the index is one narrow pass (row → L bucket ids); search
  * broadcasts the query DESCRIPTORS (vector + probed keys, ~1 KB per
  * query) and STREAMS the keyed corpus through per-partition bounded
  * heaps — zero corpus exchange, zero candidate materialization. Past
  * ~50k queries the route flips to a bucket-keyed shuffle join whose
  * candidate stream pipelines into the same heap reduction.
  */
object Similarity {

  /** Re-split a compute-dense vector relation to the session's shuffle
    * width before a heavy per-row kernel. Scan split counts are sized
    * by BYTES (`maxPartitionBytes`) — right for I/O-bound relational
    * scans, catastrophically coarse for CPU-dense kernels: a 31 MB
    * embeddings file plans 2 splits, and the O(cells·dim)-per-row
    * quantizer assignment that follows then runs on 2 of 32 cores
    * (measured at the 200k-vector tier: one 770 s straggler task while
    * 30 cores idled). One round-robin exchange of the narrow
    * (id, vector) relation (~100 MB at 200k×64 doubles) buys
    * full-width execution of the multi-B-FLOP map downstream. On a
    * many-file cluster deployment the scan already yields enough
    * splits and the exchange is a cheap rebalance — never wrong, just
    * occasionally redundant; same doctrine as
    * [[VectorQueries.streamedTopK]]'s corpus repartition. */
  private[operators] def cpuRebalance(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val n = math.max(s.sessionState.conf.numShufflePartitions,
      s.sparkContext.defaultParallelism)
    df.repartition(n)
  }

  /** Hyperplane count for an LSH index over `n` vectors, targeting
    * ~`targetBucket` rows per bucket: 2^nBits buckets per table track
    * corpus size, keeping within-bucket candidate generation
    * sub-quadratic. The r8 gates ran a fixed nBits=6 everywhere — fine
    * at the 2k-vector gate, but 64 buckets over 220k vectors means
    * ~3.4k-row buckets and ~3×10⁹ candidate pairs (observed: the sf1
    * bench never finished). The floor pins gate-scale behavior (n ≤
    * ~8k yields exactly the old 6), so sf0.01 oracle hashes are
    * untouched; the cap bounds per-row projection cost at 100-TB
    * corpus sizes where tables×nBits dots/row is the indexing cost. */
  def adaptiveNBits(n: Long, targetBucket: Int = 128,
                    floor: Int = 6, cap: Int = 20): Int = {
    val want = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt
    math.min(cap, math.max(floor, want))
  }

  /** Coarse-quantizer cell count for `n` vectors — the standard
    * nlist ≈ √n (bounds assignment at n·√n·dim and per-probe scan at
    * √n·dim, the balanced point). Floor pins the tiny-gate behavior. */
  def adaptiveNlist(n: Long, floor: Int = 8, cap: Int = 65536): Int =
    math.min(cap,
      math.max(floor, math.ceil(math.sqrt(n.toDouble)).toInt))

  private def planes(nBits: Int, dim: Int, seed: Long)
      : Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The row → L-buckets indexing pass as a TYPED mapPartitions
    * kernel: one up-front cast of the vector, then tight primitive
    * loops over the closure-held hyperplanes — tables·nBits
    * projections per row, each the same left-to-right
    * min(len)-bounded fold as [[graftx.DoubleDotProduct]], so buckets
    * (and the flip targets below) are bit-identical to the previous
    * expression form.
    *
    * History of this shape (each step measured): v1 was per-bit UDF
    * columns (interpreted, slow); v2 scalar when/least expression
    * chains over the codegen'd dot — fine at the gate's nBits=6
    * (24 dots/row), but at the adaptive nBits=11 the 44-instance
    * expression tree blows whole-stage codegen's method budget and
    * the ENTIRE stage falls back to interpreted eval: ~25 µs per
    * 64-dim dot, 216 executor-seconds to index 200k vectors (the
    * sf1 tier found it; sf0.1's 2k vectors hid it). v3 (this): the
    * [[ivfPqIndex]] lesson — an object-boundary kernel evaluates
    * exactly once per row at ~2 ns/multiply regardless of how many
    * planes the corpus size demands, and rides [[cpuRebalance]] so
    * the dense pass gets cluster width, not scan-byte width.
    *
    * `withFlip` additionally emits each (row, table)'s multi-probe
    * target — the home bucket with its least-|margin| bit flipped
    * (the bit a true near-duplicate most plausibly disagrees on) —
    * as a second row with kind=1; argmin ties resolve to the lowest
    * bit (first strict minimum), deterministically. */
  private def lshIndexKernel(emb: DataFrame, nBits: Int, dim: Int,
                             tables: Int, seed: Long,
                             withFlip: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val allPlanes = Array.tabulate(tables)(t => planes(nBits, dim, seed + t))
    val baseFields = Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType), nullable = true),
      StructField("nrm", DoubleType, nullable = false),
      StructField("tbl", IntegerType, nullable = false),
      StructField("bucket", IntegerType, nullable = false))
    val outSchema = StructType(
      if (withFlip)
        baseFields :+ StructField("kind", IntegerType, nullable = false)
      else baseFields)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val base = cpuRebalance(emb.select(
      col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<double>").as("v")))
    base.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val seq = r.getSeq[Double](1)
        val v = seq.toArray
        var sq = 0.0
        var i = 0
        while (i < v.length) { sq += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(sq)
        (0 until tables).iterator.flatMap { t =>
          val ps = allPlanes(t)
          var bucket = 0
          var minAbs = Double.MaxValue
          var minBit = 0
          var b = 0
          while (b < nBits) {
            val p = ps(b)
            val n = math.min(v.length, p.length)
            var d = 0.0
            var j = 0
            while (j < n) { d += v(j) * p(j); j += 1 }
            if (d > 0.0) bucket |= 1 << b
            val a = math.abs(d)
            if (a < minAbs) { minAbs = a; minBit = b }
            b += 1
          }
          if (withFlip)
            Iterator(
              org.apache.spark.sql.Row(id, seq, nrm, t, bucket, 0),
              org.apache.spark.sql.Row(id, seq, nrm, t,
                bucket ^ (1 << minBit), 1))
          else
            Iterator(org.apache.spark.sql.Row(id, seq, nrm, t, bucket))
        }
      }
    }(enc)
  }

  /** Corpus prepared for bucketed search: one row per (vector, table)
    * with columns id, v, nrm, tbl, bucket. */
  def index(emb: DataFrame, nBits: Int, dim: Int, tables: Int = 4,
            seed: Long = 42L): DataFrame =
    lshIndexKernel(emb, nBits, dim, tables, seed, withFlip = false)

  /** Hot-bucket guard for the HOME/PROBE (kind 0/1) bucket layout —
    * same single-shuffle window shape as [[Dedup.pruneOversized]] (the
    * stakes are higher here because an anti-join form would duplicate
    * the vector-carrying subtree), but the bucket-death decision counts
    * HOME rows only: a combined count could kill a bucket whose home
    * population is under the cap purely on probe inflow, making p=2
    * LOSE pairs p=1 found (r7 ADVICE №2) — multi-probe must only ADD
    * candidates. Probe inflow is capped separately, dropping only the
    * probe rows of a flooded bucket (never its home rows), so pair
    * volume per bucket stays ≤ maxBucket·home + home²/2 while every
    * p=1 home pair survives. Both counts fold into ONE window over the
    * same partitioning the self-join shuffles by. */
  /** The returned frame keeps `__bn` — the EXACT per-bucket count of
    * the rows that survive this filter (home + probes-if-kept),
    * folded into the SAME window as the prune counts — so
    * [[chunkForPairJoin]] can size its chunks without a second
    * WindowExec: at the 2M-vector tier the duplicate count window was
    * a full extra sort of the vector-carrying exchange and alone
    * priced dedup_embed_lsh at 2.3× (52.4 vs 22.6 s, DevLshChunkAB).
    * Callers that don't chunk drop it. */
  private[graft] def pruneHomeProbe(df: DataFrame, keys: Seq[String],
                                    maxBucket: Int): DataFrame = {
    val gw = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn("__hn",
        count(when(col("kind") === 0, lit(1))).over(gw))
      .withColumn("__pn",
        count(when(col("kind") === 1, lit(1))).over(gw))
      .withColumn("__bn", col("__hn") +
        when(col("__pn") <= maxBucket, col("__pn")).otherwise(lit(0L)))
      .where(col("__hn") <= maxBucket &&
        (col("kind") === 0 || col("__pn") <= maxBucket))
      .drop("__hn", "__pn")
  }

  /** Size a payload-carrying exchange from a caller-known item count:
    * the within-bucket/cell verify joins ship `dim`-double vectors so
    * candidates check inline (shuffling pair ids and re-joining the
    * corpus would shuffle it twice more) — the right shape, but one
    * whose per-task sort state outgrows its execution-memory share at
    * session-default partition counts two decades above the bench
    * tier: the heap × partitions matrix in docs/GROWTH_SF10.md
    * measured 3.3-6.6× pure spill tax and an OOM at 60g/32. ~64 MB
    * targets keep every task's slice cache- and memory-friendly; the
    * explicit repartition applies ONLY when the session count would
    * put per-task state in spill territory (the two-condition gate in
    * [[sizedByBytes]] — below the session default the count is a
    * no-op that still costs AQE its runtime freedoms (+0.1-0.15 s at
    * sf0.1), and below ~256 MB/task the forced exchange can only
    * lose, measurably so when a join would otherwise broadcast). The
    * window guards and the self-join both consume the produced
    * HashPartitioning, so this picks the COUNT of the one existing
    * exchange rather than adding one (plan-pinned in
    * DedupSimilaritySpec). */
  /** Triangle sub-blocking for quadratic within-bucket pair self-joins
    * (r11, the CORES_SCALE/DevJobProfile compute-skew lesson): a pair
    * join keyed on the bucket does |bucket|²/2 per-pair evaluations in
    * ONE task per bucket, so a hot bucket is a straggler AQE's
    * skew-split can never fix — its meter is shuffle bytes, the skew
    * is flops (measured: one 3.1 s task was the wall of
    * dedup_embed_lsh's verify join at any core count; semanticDedup's
    * pair join had a 0.9 s twin). Each row in a bucket of
    * m = ⌈count/blockRows⌉ chunks (chunk = hash of the id) is
    * replicated once per unordered chunk pair it belongs to —
    * (i, j) = (min(c, k), max(c, k)) for k < m — and the join adds
    * (__i, __j) to its equi-keys, spreading the bucket over (m²+m)/2
    * tasks of ≤ blockRows² pair evaluations. Replica keys alone are
    * NOT enough for exactly-once: a pair with distinct chunks
    * (cx ≠ cy) meets only where the key multiset {cx, k} = {cy, k'}
    * resolves — the (min, max) task — but a SAME-chunk pair (cx = cy)
    * carries identical replica sets and would meet in all m tasks
    * (and an off-diagonal (i, j) task holds both chunks' full row
    * sets, so it would also evaluate their within-chunk pairs —
    * ~2 × blockRows² per task, erasing half the decomposition's
    * benefit; r11 ADVICE). The frame therefore keeps `__c`, and every
    * consumer must AND [[chunkCanonical]] into its join condition —
    * the task must BE the pair's (min(ca, cb), max(ca, cb)) — which
    * pins each pair to exactly one task before the expensive
    * verify expression runs; the caller's `a.id < b.id` kills the
    * mirror. The pair set is then bit-identical to the unchunked
    * join, exactly once (spec-pinned, including an exactly-once
    * count; the `semantic_dedup_chunked` registry sibling holds the
    * helper to the full DuckDB oracle through semanticDedup).
    * Buckets at or under blockRows get m = 1: a single (0, 0)
    * replica, the original join with constant key columns. Works for
    * asymmetric sides (e.g. a home-rows-only b-side) as long as both
    * sides are filters of the SAME chunked frame: the chunk count is
    * a per-bucket window over the unfiltered rows.
    *
    * **The WINDOWED engage was turned off by default in r12**
    * (callers then defaulted blockRows = Int.MaxValue, the windowless
    * short-circuit): the chunk columns
    * are born ABOVE the caller's sized (bucket-keyed) exchange, so a
    * join that includes (__i, __j) in its equi-keys no longer finds
    * its required distribution satisfied — the planner inserts a
    * SECOND full shuffle of the payload-carrying rows at the SESSION
    * partition count, precisely the spill-territory exchange shape
    * [[sizedByBytes]] exists to prevent. Measured at the 2M-vector
    * tier (DevLshChunkAB, per-stage listener): the chunked plan runs
    * an extra 16M-row payload shuffle + a 32-task join stage of
    * 1,400-1,700 core-seconds, pricing the whole query at 2.3-4.6×
    * its unchunked twin — while every bucket sits under blockRows
    * (census max 1,287 < 2,048), so all of it buys m = 1. Adaptive
    * nBits keeps real corpora in that regime by construction (mean
    * ≤ 128/bucket at every measured tier through 20M vectors), the
    * maxBucket cap guard bounds the pathological single task, and
    * the straggler chunking fixed was 3.1 s at the 200k tier — three
    * orders smaller than the tax. The machinery stays available
    * per-call for data whose bucket distribution genuinely exceeds
    * blockRows; a caller engaging it through THIS (windowed) route
    * should expect the second exchange and size the session
    * accordingly.
    *
    * **Census-gated auto-engagement since r13** (the r12 verdict's
    * top item): the default callers no longer choose between "always
    * chunk" (the r12-measured double-shuffle tax) and "never chunk"
    * (a >blockRows bucket runs as one guarded task of up to
    * ~maxBucket²/2 pair evaluations). [[hotCensus]] runs ONE narrow
    * eager aggregation over the keyed rows — per-group counts, tiny
    * shuffle, only groups past the ENGAGE threshold collected (a
    * straggler-tolerance bound looser than the chunk size; see the
    * engageRows note in [[lshDedupPairs]]) — and the DRIVER
    * picks the plan: no hot group ⇒ the exact windowless
    * short-circuit plan (this branch, zero extra exchange, and the
    * prune window is provably a no-op so it is dropped too); hot
    * groups exist ⇒ their exact counts ride back as a broadcast
    * literal, prune + per-group chunk keys evaluate MAP-SIDE below
    * the payload's single exchange, and that one exchange is keyed
    * on the FULL (group, __i, __j) join keys — so the
    * all-cluster-keys co-partition requirement is met without a
    * second payload shuffle, which is exactly what this windowed
    * route cannot do (its chunk keys are born above the
    * group-keyed exchange). `semantic_dedup_chunked` forces the
    * census route's engaged branch at the gate tier and holds it to
    * the full DuckDB oracle.
    */
  private[graft] def chunkForPairJoin(df: DataFrame, keys: Seq[String],
                                      idCol: String,
                                      blockRows: Int,
                                      cntCol: Option[String] = None)
      : DataFrame = {
    // blockRows = Int.MaxValue ⇒ m = 1 for every group by definition:
    // emit the constant chunk columns WITHOUT the count window — the
    // window is a full extra sort of the (payload-carrying) exchange,
    // which is pure tax when the caller already knows chunking cannot
    // engage. Semantically identical to the windowed m=1 path
    // (spec-pinned: the chunking specs' reference runs use exactly
    // this branch).
    if (blockRows == Int.MaxValue)
      return df.drop(cntCol.toSeq: _*).withColumn("__c", lit(0L))
        .withColumn("__i", lit(0L)).withColumn("__j", lit(0L))
    // Per-group row count: from the caller's already-materialized
    // count column when it has one (pruneHomeProbe's __bn,
    // semanticDedup's __cnt — their guard windows run over the same
    // partitioning anyway, so a separate count window here was a
    // DUPLICATE full sort of the payload exchange: 2.3× the whole
    // query at the 2M tier, DevLshChunkAB), else computed.
    val cnt = cntCol.map(c => col(c).cast("double")).getOrElse(
      count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)).cast("double"))
    val m = greatest(lit(1L), ceil(cnt / blockRows).cast("long"))
    df.withColumn("__m", m)
      .withColumn("__c", pmod(xxhash64(col(idCol), lit(7L)), col("__m")))
      .withColumn("__k", explode(sequence(lit(0L), col("__m") - 1)))
      .withColumn("__i", least(col("__c"), col("__k")))
      .withColumn("__j", greatest(col("__c"), col("__k")))
      .drop("__m" +: "__k" +: cntCol.toSeq: _*)
  }

  /** The exactly-once predicate every [[chunkForPairJoin]] consumer
    * ANDs into its join: of the replica tasks a pair's members share,
    * keep only the one that IS (min(ca, cb), max(ca, cb)). Without it
    * a same-chunk pair matches in all m tasks (see the scaladoc
    * above). Evaluates on the already-matched equi-key rows, so it
    * filters BEFORE the expensive verify expression in the caller's
    * select. */
  private[graft] def chunkCanonical(a: String, b: String): Column =
    least(col(s"$a.__c"), col(s"$b.__c")) === col(s"$a.__i") &&
      greatest(col(s"$a.__c"), col(s"$b.__c")) === col(s"$a.__j")

  private[graft] def sizedByHint(df: DataFrame, sizeHint: Option[Long],
                          rowsPerItem: Long, dim: Int,
                          keys: Seq[String]): DataFrame =
    // doubles + id/nrm/keys/overhead
    sizedByBytes(df, sizeHint, rowsPerItem, 8L * dim + 128L, keys)

  /** [[sizedByHint]] with the per-row byte estimate passed directly —
    * the same ~64 MB/task sizing rule for payload exchanges whose rows
    * are not dim-double vectors (r10 verdict item 2 extends it to the
    * minhash/ngram-jaccard shingle-keyed verify joins, whose rows are
    * id + shingle string). Shared so every self-sizing operator
    * applies the one gate: repartition only past the session's
    * shuffle-partition count, never down. */
  private[graft] def sizedByBytes(df: DataFrame, sizeHint: Option[Long],
                          rowsPerItem: Long, rowBytes: Long,
                          keys: Seq[String]): DataFrame =
    sizeHint match {
      case Some(n) =>
        val parts =
          (n * rowsPerItem * rowBytes / (64L << 20)).toInt + 1
        // TWO-condition engage gate (r11, measured):
        //  - the session default is numShufflePartitions — what this
        //    exchange would get anyway — NOT core count: a session
        //    already sized wider (e.g. a cluster at thousands of
        //    partitions) must never be repartitioned DOWN;
        //  - AND the estimated per-task state at the session count
        //    must actually be in spill territory (> ~256 MB/task ⇔
        //    parts > 4× session at the 64 MB target). An explicit
        //    repartition is not free: when the downstream join would
        //    otherwise broadcast its small side, the forced exchange
        //    ships the WHOLE relation once for nothing (minhash
        //    verify at 2.2M docs: 116 MB/task, engaged-at-89-parts
        //    24.9 s vs stock-32 22.9 s, manual-256 40.3 s —
        //    MinhashSizeScale interleaved A/B), while every measured
        //    win sits past the bar (embed-LSH 2M: 320 MB/task,
        //    71.2 → 24.1 s; the 200k negative control at 32 MB/task
        //    measured no gain, GROWTH_SF10.md).
        val sessionParts = df.sparkSession.sessionState.conf
          .numShufflePartitions
        if (parts > 4 * sessionParts)
          df.repartition(parts, keys.map(col): _*)
        else df
      case None => df
    }

  /** The eager half of census-gated auto-chunking (see the
    * [[chunkForPairJoin]] scaladoc): per-group counts as ONE narrow
    * aggregation job — partial counts fold map-side, the shuffle
    * ships only (keys, counts) rows, and the collect is filtered to
    * groups matching `hotPred` (over-blockRows or over-cap), so the
    * driver holds exact counts for exactly the groups whose plan
    * treatment differs from the default. Returns None when no group
    * qualifies — the caller keeps its zero-extra-exchange
    * short-circuit plan, now provably safe rather than assumed.
    * `guard` bounds the collect (2²¹ groups ≈ tens of MB of driver
    * heap); past it the data has ≥ guard·blockRows rows in hot
    * groups alone and the caller must re-bucket (more tables/bits/
    * cells), so this fails loudly instead of silently OOM-ing the
    * driver. The census costs one extra narrow pass over the keyed
    * rows at every tier — the price of an exact engage decision; the
    * r12 lesson was that SKIPPING that check (chunk always) cost
    * 2.3-4.6× of the whole query at tiers where no group was hot. */
  private[graft] def hotCensus(df: DataFrame, keys: Seq[String],
                               aggs: Seq[Column], hotPred: Column,
                               guard: Int = 1 << 21)
      : Option[DataFrame] = {
    val census = df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*).where(hotPred)
    val rows = census.limit(guard + 1).collect()
    require(rows.length <= guard,
      s"hotCensus: > $guard groups exceed the chunk/prune thresholds " +
        s"on keys ${keys.mkString(",")} — the bucketing is too coarse " +
        "for this corpus; raise nBits/tables/cells instead of " +
        "collecting an unbounded census")
    if (rows.isEmpty) None
    else {
      val s = df.sparkSession
      Some(s.createDataFrame(
        s.sparkContext.parallelize(rows.toSeq, 1),
        census.schema))
    }
  }

  /** The census-route payload exchange, placed explicitly BELOW the
    * caller's (possibly asymmetric — lshDedupPairs filters kind=0 on
    * its b-side) self-join inputs so ReuseExchange computes the
    * indexing subtree ONCE; left implicit, EnsureRequirements would
    * insert one exchange per side above the asymmetric filters —
    * non-identical subtrees, no reuse, the whole scan+kernel pass
    * twice. Sizing is [[sizedByBytes]]'s two-condition gate verbatim;
    * under the spill bar the count is OMITTED (`repartition(cols*)`)
    * so AQE keeps its coalescing freedom over this exchange, same as
    * it has over an implicit one. */
  private[graft] def lowExchange(df: DataFrame, sizeHint: Option[Long],
                                 rowsPerItem: Long, rowBytes: Long,
                                 keys: Seq[String]): DataFrame = {
    val cols = keys.map(col)
    val sessionParts = df.sparkSession.sessionState.conf
      .numShufflePartitions
    sizeHint match {
      case Some(n)
          if (n * rowsPerItem * rowBytes / (64L << 20)).toInt + 1 >
            4 * sessionParts =>
        df.repartition(
          (n * rowsPerItem * rowBytes / (64L << 20)).toInt + 1,
          cols: _*)
      case _ => df.repartition(cols: _*)
    }
  }

  /** Embedding near-dup pairs via LSH-bucketed candidate generation —
    * the scale-safe replacement for blocked all-pairs cosine: the corpus
    * is indexed once (L hyperplane tables), candidates are the
    * within-bucket pairs, and every candidate is exact-cosine-verified,
    * so precision is exact and only recall is probabilistic (a cos≥t
    * pair collides per table with p = (1-θ/π)^nBits; near-dup pairs at
    * cos ≈ 0.99 are caught with p ≈ 0.997 at nBits=6, L=4).
    *
    * Scale shape: candidate fan-in is per-bucket quadratic, but buckets
    * are 2^nBits per table and hyperplane bits split densest directions
    * first, so bucket occupancy tracks corpus clustering, not corpus
    * size; the cosine is computed map-side in the join and the
    * dropDuplicates shuffle carries 24-byte (a, b, cos) rows — vectors
    * never re-shuffle. The label-blocked exact form
    * (`dedup_embed_cosine`) stays as the oracle-checked verifier.
    *
    * Multi-probe (`probes = 2`, the [[semanticDedup]] p=2 trick applied
    * to the hyperplane path): each (vector, table) row ADDITIONALLY
    * probes the bucket with its least-|margin| bit flipped — the bit a
    * true near-duplicate most plausibly disagrees on. The probe join is
    * ASYMMETRIC twice over: only the probe side fans out (2× rows, home
    * buckets stay single), and probes keep the same `a.id < b.id`
    * predicate as home pairs — ONE direction, not both. One direction
    * is nearly free recall-wise: a near-dup pair's projections nearly
    * coincide (chord ≤ √(2−2t) per unit plane norm), so when exactly
    * one bit separates their buckets it is the least-|margin| bit of
    * BOTH members and either direction finds the pair; the residue
    * (min-margin bit of only the higher-id member) is the tail of a
    * tail, while probing both directions would re-verify every
    * correlated pair twice — measured 2× the whole query's cost for
    * no oracle-visible recall at sf0.1. Precision is unchanged (every
    * candidate is exact-verified); candidate volume is ~2× p=1 (home
    * pairs + one-directional flip pairs). */
  def lshDedupPairs(emb: DataFrame, threshold: Double, nBits: Int = 6,
                    dim: Int = 64, tables: Int = 4,
                    seed: Long = 42L,
                    maxBucket: Int = 100000,
                    probes: Int = 1,
                    sizeHint: Option[Long] = None,
                    blockRows: Int = 2048,
                    engageRows: Int = 4096,
                    autoChunk: Boolean = true): DataFrame = {
    require(probes == 1 || probes == 2,
      s"probes must be 1 (home bucket only) or 2 (+least-margin flip), " +
        s"got $probes")
    val indexed =
      if (probes == 2)
        lshIndexKernel(emb, nBits, dim, tables, seed, withFlip = true)
      else
        lshIndexKernel(emb, nBits, dim, tables, seed, withFlip = false)
          .withColumn("kind", lit(0))
    // The shared within-bucket exact-cosine verify: the b-side home
    // filter keeps probe pairs one-directional; chunkCanonical pins
    // chunked pairs to exactly one task; at m = 1 the constant chunk
    // keys fold out of the equi-keys so the join runs on
    // (tbl, bucket) alone.
    def verifyJoin(chunked: DataFrame): DataFrame =
      chunked.as("a").join(chunked.where(col("kind") === 0).as("b"),
          col("a.tbl") === col("b.tbl") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.__i") === col("b.__i") &&
            col("a.__j") === col("b.__j") &&
            chunkCanonical("a", "b") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          (VectorQueries.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .where(col("cos") >= threshold)
        .dropDuplicates("a_id", "b_id")
    // Legacy window route (autoChunk = false): per-bucket counts from
    // a window over the bucket-keyed exchange. At finite blockRows the
    // chunk keys are born ABOVE that exchange, so the 4-key join
    // re-shuffles the payload at session width — the r12-measured
    // 2.3-4.6× tax; kept for A/B attribution (DevLshChunkAB) and as
    // the fallback where an eager census job is unacceptable.
    def windowRoute(block: Int): DataFrame = {
      val sized = sizedByHint(indexed, sizeHint,
        rowsPerItem = tables.toLong * probes, dim = dim,
        keys = Seq("tbl", "bucket"))
      val pruned = pruneHomeProbe(sized, Seq("tbl", "bucket"), maxBucket)
      verifyJoin(chunkForPairJoin(pruned, Seq("tbl", "bucket"), "id",
        block, cntCol = Some("__bn")))
    }
    // The engage threshold is deliberately LOOSER than the chunk
    // size: blockRows bounds a chunk task's pair evaluations
    // (2048² ≈ 4M ≈ 4 s at the measured ~1 µs/SMJ-row eval), while
    // engageRows is the straggler-tolerance bound — a bucket at or
    // under it runs unchunked because the hot route's fixed overhead
    // (the b-side's own exchange, the kernel once per side, m-fold
    // payload replicas) costs more than the straggler it removes.
    // Measured at the 2M tier (DevLshChunkAB r13): hottest bucket
    // 2,574 rows = a 3.3 s straggler, vs +8 s for the engaged route —
    // engage-at-blockRows was a net loss there, while a bucket past
    // 4096 (≥ 8 s, growing quadratically toward the ~85-minute
    // 10⁵-row guard case) pays for the route.
    if (!autoChunk) windowRoute(blockRows)
    else hotCensus(indexed, Seq("tbl", "bucket"),
      Seq(count(when(col("kind") === 0, lit(1))).as("__hn"),
        count(when(col("kind") === 1, lit(1))).as("__pn")),
      col("__hn") > maxBucket || col("__pn") > maxBucket ||
        col("__hn") + col("__pn") >
          math.max(blockRows.toLong, engageRows.toLong)) match {
      case None =>
        // Census-clean: the r12 windowless-chunk plan VERBATIM — the
        // census bought the proof that no bucket needs chunking, not
        // a plan change. The prune window stays even though the
        // census proves it a no-op: it is ALSO the plan's reuse
        // anchor — without it, Catalyst pushes the b-side kind=0
        // filter below the bucket exchange, splitting it into two
        // non-reusable exchanges (full + home rows: 1.5× the payload
        // shuffled and the index kernel computed twice), while the
        // window blocks that pushdown and both sides reuse ONE
        // exchange (plan-pinned at 3 shuffles in PlanShapeSpec).
        windowRoute(Int.MaxValue)
      case Some(hotDf) =>
        // Hot buckets exist: their exact census counts ride back as a
        // broadcast literal (no plan subtree — the census already
        // ran), prune + per-bucket chunk keys evaluate map-side, and
        // the payload exchanges are keyed directly on the full 4-key
        // join keys — no windowed count, so the r12 double-shuffle
        // shape (bucket-keyed exchange THEN a second full session-
        // width exchange for the chunk keys) cannot arise. Catalyst
        // pushes the b-side kind=0 filter below its repartition, so
        // the sides don't reuse one exchange: the a-side ships all
        // rows, the b-side ships HOME rows only (~half at probes=2,
        // pre-filtered before the shuffle) — ~1.5× the rows of a
        // shared exchange written, but each read once, with the
        // index kernel computed once per side over the reused
        // round-robin. Unlisted buckets are ≤ blockRows ≤ the caps
        // by census, so they pass the prune and get m = 1 (__bn = 1
        // is only ever divided by blockRows).
        val joined = indexed.join(broadcast(hotDf),
          Seq("tbl", "bucket"), "left")
        val pruned = joined
          .where(coalesce(col("__hn") <= maxBucket, lit(true)) &&
            (col("kind") === 0 ||
              coalesce(col("__pn") <= maxBucket, lit(true))))
          .withColumn("__bn", coalesce(col("__hn") +
            when(col("__pn") <= maxBucket, col("__pn"))
              .otherwise(lit(0L)), lit(1L)))
          .drop("__hn", "__pn")
        val chunked = chunkForPairJoin(pruned, Seq("tbl", "bucket"),
          "id", blockRows, cntCol = Some("__bn"))
        verifyJoin(lowExchange(chunked, sizeHint,
          rowsPerItem = tables.toLong * probes,
          rowBytes = 8L * dim + 128L,
          keys = Seq("tbl", "bucket", "__i", "__j")))
    }
  }

  /** IVF (inverted-file) index: a k-means coarse quantizer partitions
    * the corpus into `nlist` cells; queries scan only the `nprobe`
    * nearest cells. The other standard ANN shape next to LSH — better
    * recall/cost on clustered data.
    *
    * The quantizer is trained on a driver-collected SAMPLE of
    * ~`trainPoints` rows (a few MB): centroid placement needs O(nlist)
    * representative points, not the corpus — at 100 TB a full-corpus
    * distributed k-means would dwarf the search itself, and even a
    * sampled MLlib fit costs ~20 distributed jobs of Lloyd iterations.
    * Local seeded Lloyd's on the sample costs milliseconds and zero
    * jobs (the FAISS IVF-training shape); the centroids then ride the
    * task closure and cells are assigned in ONE narrow pass over the
    * corpus. Deterministic under the seed. Reuse the returned centroids
    * across queries instead of refitting. At scale,
    * `.repartition(col("cell"))` + parquet partitioning by cell turns a
    * probe into a partition-pruned scan.
    *
    * Sampling never counts the corpus: with a `sizeHint` (caller knows
    * the approximate row count — a catalog stat, a previous count) the
    * sample is a deterministic hash-threshold filter
    * (`xxhash64(id, seed) mod 2^32 < frac·2^32`) — one narrow filtered
    * scan; without a hint it is a seeded-hash-ordered
    * `limit(trainPoints)` — a per-partition top-k heap + driver merge,
    * still ONE narrow pass and an unbiased pseudorandom sample. The
    * r3-flagged `count()` pre-pass (an extra full corpus scan that
    * roughly doubled index-build cost) is gone on both paths. */
  def ivfIndex(emb: DataFrame, nlist: Int, seed: Long = 42L,
               trainPoints: Int = 4096,
               sizeHint: Option[Long] = None)
      : (Array[Array[Double]], DataFrame) = {
    val base = VectorQueries.withNorm(emb)
      .withColumnRenamed("vec_id", "id")
    val centroids = trainQuantizer(base, nlist, seed, trainPoints,
      sizeHint)
    // train on `base` (the sample TakeOrdered must not pay a corpus
    // shuffle); assign via the typed kernel below — the previous
    // `udf(v => nearestCell(...))` consumed the NATIVE-cast array,
    // the exact native-cast-into-Scala-UDF path [[pqEncode]]'s
    // scaladoc measured ~10× slow (observed again here: 2.2 s for a
    // 200k×448-cell pass that the kernel does in ~0.3 s)
    (centroids, assignCells(emb, centroids))
  }

  /** The norm + cell-assignment pass of [[ivfIndex]] as one typed
    * mapPartitions kernel over the rebalanced corpus (the
    * [[lshIndexKernel]] shape): a single unbox per row, then
    * primitive loops for the norm (left-to-right, same order as
    * [[VectorQueries.withNorm]]'s dot expression) and
    * [[nearestCell]] — output columns/values identical to the old
    * withNorm + UDF form. */
  private def assignCells(emb: DataFrame,
                          centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.types._
    val labelType = emb.schema("label").dataType
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("label", labelType, nullable = true),
      StructField("v", ArrayType(DoubleType), nullable = true),
      StructField("nrm", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val s = emb.sparkSession
    val bc = s.sparkContext.broadcast(centroids)
    cpuRebalance(emb.select(col("vec_id").cast("long").as("id"),
        col("label"),
        col("embedding").cast("array<double>").as("v")))
      .mapPartitions { rows =>
        val cents = bc.value
        rows.map { r =>
          val seq = r.getSeq[Double](2)
          val v = seq.toArray
          var sq = 0.0
          var i = 0
          while (i < v.length) { sq += v(i) * v(i); i += 1 }
          org.apache.spark.sql.Row(r.getLong(0), r.get(1), seq,
            math.sqrt(sq), nearestCell(cents, v))
        }
      }(enc)
  }

  /** Index of the closest centroid to `v` by squared L2 — the coarse
    * quantizer's assignment function, shared by [[ivfIndex]]'s UDF,
    * [[ivfPqIndex]]'s typed pass, and [[semanticDedup]]'s p=1 kernel
    * (private[graft] so graft.DevSemTime's phase timer measures THIS
    * assignment, not a copy that could drift). */
  private[graft] def nearestCell(centroids: Array[Array[Double]],
                                 v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var d = 0.0; var j = 0
      while (j < ct.length && j < v.length) {
        val t = v(j) - ct(j); d += t * t; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The one-pass deterministic sample + local Lloyd's training that
    * backs [[ivfIndex]] and [[ivfPqIndex]] — see [[ivfIndex]]'s
    * scaladoc for the sampling rationale. */
  private def trainQuantizer(base: DataFrame, nlist: Int, seed: Long,
                             trainPoints: Int,
                             sizeHint: Option[Long])
      : Array[Array[Double]] = {
    val sampled = sizeHint match {
      case Some(n) if n > trainPoints =>
        val frac = math.min(1.0, 1.2 * trainPoints.toDouble / n)
        val bound = (frac * (1L << 32)).toLong
        // orderBy before the bounding limit: a bare limit+collect
        // returns rows in partition-layout order, so the seeded
        // k-means would pick different points under different
        // partitioning/AQE decisions — the nondeterminism the no-hint
        // path's orderBy was added to prevent. The sort runs on the
        // already-filtered sample (~1.2×trainPoints rows), not the
        // corpus.
        base.where(pmod(xxhash64(col("id"), lit(seed)), lit(1L << 32))
            < bound)
          .select(xxhash64(col("id"), lit(seed)).as("__h"), col("v"))
          .orderBy("__h")
          .limit(4 * trainPoints) // bound collect vs bad hints
          .select("v")
      case _ =>
        base.select(xxhash64(col("id"), lit(seed)).as("__h"), col("v"))
          .orderBy("__h").limit(trainPoints).select("v")
    }
    val pts = sampled.collect()
      .map(_.getSeq[Double](0).toArray)
    trainCentroids(pts, nlist, seed)
  }

  /** Seeded Lloyd's k-means over an in-memory sample — the quantizer
    * trainer for [[ivfIndex]]. Deterministic: seeded distinct-point
    * init, fixed iteration order; empty clusters keep their previous
    * centroid. */
  private[operators] def trainCentroids(points: Array[Array[Double]],
                                        k: Int, seed: Long,
                                        iters: Int = 15)
      : Array[Array[Double]] = {
    require(points.nonEmpty, "cannot train a quantizer on zero points")
    val kk = math.min(k, points.length)
    val rnd = new java.util.Random(seed)
    val init = rnd.ints(0, points.length).distinct().limit(kk)
      .toArray.map(points(_).clone())
    val cents = init
    val dim = points(0).length
    var it = 0
    while (it < iters) {
      // phase 1 (parallel, order-free): the nearest centroid of each
      // point is pure per-point math, so thread scheduling cannot
      // affect values — at nlist≈√200k this phase is ~2 G mult-adds
      // per iteration and was 2.5 s of every ivf query single-threaded
      val assign = new Array[Int](points.length)
      java.util.stream.IntStream.range(0, points.length).parallel()
        .forEach { p =>
          val pt = points(p)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kk) {
            var d = 0.0; var j = 0
            while (j < dim) {
              val t = pt(j) - cents(c)(j); d += t * t; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(p) = best
        }
      // phase 2 (sequential, point order): accumulate exactly as the
      // old fused loop did — bit-identical centroids
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var pi = 0
      while (pi < points.length) {
        val p = points(pi)
        val best = assign(pi)
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
        pi += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** The `nprobe` closest cells to `v` by squared centroid L2 — ties
    * keep centroid-index order, identically on the UDF and driver
    * paths since both call THIS. Allocation-free selection (strict `<`
    * insertion over ascending indices = the stable sortBy-by-distance
    * it replaces: equal distances keep the earlier index first) — the
    * tuple-array + sortBy form cost the driver 5.4 s for 20k queries
    * × 448 centroids at the sf1 tier, ~4× the distance math itself. */
  private def closestCells(centroids: Array[Array[Double]],
                           v: Array[Double], nprobe: Int): Array[Int] = {
    val np = math.min(nprobe, centroids.length)
    val ds = new Array[Double](np)
    val cs = new Array[Int](np)
    var size = 0
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var d = 0.0
      var j = 0
      while (j < ct.length && j < v.length) {
        val t = v(j) - ct(j); d += t * t; j += 1
      }
      var pos = size
      while (pos > 0 && d < ds(pos - 1)) pos -= 1
      if (pos < np) {
        var m = math.min(size, np - 1)
        while (m > pos) { ds(m) = ds(m - 1); cs(m) = cs(m - 1); m -= 1 }
        ds(pos) = d
        cs(pos) = c
        if (size < np) size += 1
      }
      c += 1
    }
    java.util.Arrays.copyOfRange(cs, 0, size)
  }

  /** [[closestCells]] as a UDF — the probe selector for the
    * shuffle-route joins here and in [[ivfPqTopK]] (centroid table
    * rides the closure: nlist·dim doubles). */
  private def probeCellsUdf(centroids: Array[Array[Double]],
                            nprobe: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Double]) => closestCells(centroids, v.toArray, nprobe) }

  // ---- streamed keyed-probe search (the r9 search path) --------------
  //
  // The r8 searches ranked their candidate pairs with
  // dropDuplicates + a row_number window: at the 200k-vector tier that
  // meant exchanging the ~10^8-row candidate relation TWICE (once
  // hash-partitioned for the dedupe, once sorted for the window) — 25
  // of ann_lsh_probe's 30.7 s. Candidates now reduce through
  // per-partition bounded heaps in the SAME stage that produces them
  // (the [[VectorQueries.streamedTopK]] shape), and only the
  // ≤ partitions·k-per-query winners are exchanged.

  /** k-slot insertion heap under the (cos desc, id asc) total order —
    * the per-query state of the streamed search kernels. Same
    * insertion loop as [[VectorQueries.streamedTopK]], plus duplicate
    * suppression in O(1): the only duplicates the bucket routes
    * produce are exact (id, cos) copies (the dot is a pure function of
    * the pair, reached via different tables/cells), and under the
    * total order a live copy sits exactly at the duplicate's insertion
    * point, so one equality check detects it; a copy that was evicted
    * ranks below the full heap's floor, so its duplicate fails
    * `pos < k` and is dropped too. Assumes non-NaN cos (nonzero norms
    * — same contract as the window form, whose NaN ordering differed
    * from IEEE comparisons anyway). */
  private[operators] final class TopKHeap(k: Int) {
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    def insert(id: Long, cz: Double): Unit = {
      var pos = size
      while (pos > 0 && (cz > cs(pos - 1) ||
          (cz == cs(pos - 1) && id < ids(pos - 1)))) pos -= 1
      val dup = pos > 0 && ids(pos - 1) == id && cs(pos - 1) == cz
      if (!dup && pos < k) {
        var m = math.min(size, k - 1)
        while (m > pos) { ids(m) = ids(m - 1); cs(m) = cs(m - 1); m -= 1 }
        ids(pos) = id
        cs(pos) = cz
        if (size < k) size += 1
      }
    }
  }

  private def pairEncoder
      : org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      StructType(Seq(
        StructField("q_id", LongType, nullable = false),
        StructField("neighbor_id", LongType, nullable = false),
        StructField("cos", DoubleType, nullable = false))))
  }

  /** Shared finisher: global top-k over the union of per-partition
    * winners. dropDuplicates first — the same (q, neighbor) pair can
    * surface from SEVERAL partitions (its corpus row appears once per
    * table / probed cell, and those rows land wherever the rebalance
    * put them) with identical cos, and duplicate rows would shift
    * row_number ranks. Per-partition top-k under a total order with
    * in-partition dup suppression is a lossless pre-filter of global
    * distinct top-k, so output equals the r8 dedupe-then-window form
    * row for row. Both exchanges here move only the bounded survivor
    * set, never candidates. */
  private def rankPairs(local: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    local.dropDuplicates("q_id", "neighbor_id")
      .withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= k)
  }

  /** Per-partition top-k reduction of a (q_id, neighbor_id, cos)
    * candidate stream — pipelines onto the producing join in the same
    * stage, so the candidate relation is never exchanged. */
  private def pairsTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs.mapPartitions { rows =>
      val heaps = new java.util.HashMap[java.lang.Long, TopKHeap]()
      rows.foreach { r =>
        val q = java.lang.Long.valueOf(r.getLong(0))
        var h = heaps.get(q)
        if (h == null) { h = new TopKHeap(k); heaps.put(q, h) }
        h.insert(r.getLong(1), r.getDouble(2))
      }
      import scala.jdk.CollectionConverters._
      heaps.entrySet().iterator().asScala.flatMap { e =>
        val q = e.getKey.longValue()
        val h = e.getValue
        (0 until h.size).iterator.map(p =>
          org.apache.spark.sql.Row(q, h.ids(p), h.cs(p)))
      }
    }(pairEncoder)

  /** The zero-exchange search route: query descriptors (vector, norm)
    * plus a key→queries probe map broadcast; the keyed corpus STREAMS
    * in place. Each partition consults the probe map once per corpus
    * row and dots only against the queries that probed that row's key
    * — the same candidate set the shuffle join builds, with no corpus
    * exchange and no candidate materialization. The dot replays
    * [[graft.functions.VectorExpressions.dot]]'s exact IEEE order
    * (left-to-right, min-length) and cos = dot/(qn·nrm) in the same
    * association, so results are bit-identical to the join route
    * (DedupSimilaritySpec pins route equality).
    *
    * @param corpus (id: long, v: array<double>, nrm: double, key: long)
    */
  private def kernelProbeTopK(corpus: DataFrame,
      qVecs: Array[(Long, Array[Double], Double)],
      probeMap: java.util.HashMap[java.lang.Long, Array[Int]],
      k: Int): DataFrame = {
    val s = corpus.sparkSession
    val bcQ = s.sparkContext.broadcast(qVecs)
    val bcM = s.sparkContext.broadcast(probeMap)
    corpus.mapPartitions { rows =>
      val qs = bcQ.value
      val pm = bcM.value
      val heaps = new Array[TopKHeap](qs.length)
      rows.foreach { r =>
        val cands = pm.get(java.lang.Long.valueOf(r.getLong(3)))
        if (cands != null) {
          val id = r.getLong(0)
          val seq = r.getSeq[Double](1)
          val v = new Array[Double](seq.length)
          var c = 0
          while (c < v.length) { v(c) = seq(c); c += 1 }
          val dn = r.getDouble(2)
          var ci = 0
          while (ci < cands.length) {
            val qi = cands(ci)
            val (qid, qv, qn) = qs(qi)
            if (qid != id) {
              val n = math.min(qv.length, v.length)
              var d = 0.0
              var j = 0
              while (j < n) { d += qv(j) * v(j); j += 1 }
              var h = heaps(qi)
              if (h == null) { h = new TopKHeap(k); heaps(qi) = h }
              h.insert(id, d / (qn * dn))
            }
            ci += 1
          }
        }
      }
      qs.indices.iterator.filter(heaps(_) != null).flatMap { qi =>
        val h = heaps(qi)
        (0 until h.size).iterator.map(p =>
          org.apache.spark.sql.Row(qs(qi)._1, h.ids(p), h.cs(p)))
      }
    }(pairEncoder)
  }

  /** Query-set ceiling for the kernel route: ~50k query IDS. The
    * driver collect is ~nq rows for [[ivfTopK]] and `tables`·nq rows
    * for [[annTopK]] (the bucket layout rides one row per table,
    * vector duplicated — ~120 MB worst-case at the ceiling with 4
    * tables, deliberately one job instead of a narrow-buckets +
    * distinct-vectors pair); the broadcast after dedup is ~nq
    * descriptors (~30 MB). Beyond the ceiling, the shuffle-join route
    * bounds driver/executor memory at the cost of exchanging both
    * sides once. Callers pass the query-ID count they already know
    * from their own query-set construction (n/50, n/10, …) — no extra
    * counting job. None keeps the kernel route: it is the caller's
    * assertion that the query set is bounded (the same contract as
    * r8's broadcast-join default, which also materialized the probe
    * relation driver-side) — pass a real hint for any query relation
    * whose size is data-dependent. */
  private val KernelQueryRows = 50000L

  /** True iff the collected batch's distinct ids (column 0, long) fit
    * `ceiling` — the no-hint kernel routes' documented per-ID
    * contract, enforced post-collect where counting is free
    * (advisory r10: the annTopK row cap alone admits up to
    * tables× the id ceiling when the layout is narrower than the
    * 4-table worst case it was sized for). Short-circuits at
    * ceiling+1. */
  private[graft] def distinctIdsWithin(
      rows: Array[org.apache.spark.sql.Row], ceiling: Long): Boolean = {
    val ids = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < rows.length) {
      ids.add(java.lang.Long.valueOf(rows(i).getLong(0)))
      if (ids.size() > ceiling) return false
      i += 1
    }
    true
  }

  /** IVF search: each query ranks the `nprobe` closest cells by
    * centroid distance and exact-cosine-ranks only those cells'
    * vectors — kernel route for bounded query sets (zero corpus
    * exchange), cell-keyed shuffle join + the same heap reduction past
    * [[KernelQueryRows]]. */
  def ivfTopK(centroids: Array[Array[Double]], indexed: DataFrame,
              queries: DataFrame, k: Int, nprobe: Int,
              queryRowsHint: Option[Long] = None): DataFrame = {
    // No-hint collects are LIMIT-bounded (r10, advisory): a caller
    // with a data-dependent query relation and no hint used to
    // silently collect it whole (driver OOM at scale); now the
    // collect caps at ceiling+1 rows and an overflow falls back to
    // the shuffle route — same rows either way (the routes are
    // spec-pinned identical), bounded memory always. An explicit
    // hint keeps the uncapped collect: it is the caller's assertion.
    val kernelQs: Option[Array[org.apache.spark.sql.Row]] =
      queryRowsHint match {
        case Some(h) if h <= KernelQueryRows =>
          Some(queries.select(col("id"), col("v"), col("nrm"))
            .collect())
        case Some(_) => None
        case None =>
          val r = queries.select(col("id"), col("v"), col("nrm"))
            .limit(KernelQueryRows.toInt + 1).collect()
          if (r.length <= KernelQueryRows) Some(r) else None
      }
    if (kernelQs.isDefined) {
      val qRows = kernelQs.get
      val vecs = qRows.map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getDouble(2)))
      // probe-cell selection in parallel (pure per-query math — thread
      // scheduling cannot affect values); map assembly sequential in
      // query order, though kernel results are insertion-order-free
      // anyway (total-order heaps, exact-duplicate suppression)
      val perQ = new Array[Array[Int]](vecs.length)
      java.util.stream.IntStream.range(0, vecs.length).parallel()
        .forEach(qi => perQ(qi) = closestCells(centroids, vecs(qi)._2,
          nprobe))
      val pm = new java.util.HashMap[java.lang.Long, Array[Int]]()
      val tmp = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Int]]()
      var qi = 0
      while (qi < perQ.length) {
        perQ(qi).foreach { cell =>
          val key = java.lang.Long.valueOf(cell.toLong)
          var lst = tmp.get(key)
          if (lst == null) {
            lst = scala.collection.mutable.ArrayBuffer.empty[Int]
            tmp.put(key, lst)
          }
          lst += qi
        }
        qi += 1
      }
      tmp.forEach((key, lst) => pm.put(key, lst.toArray))
      val corpus = indexed.select(col("id"), col("v"), col("nrm"),
        col("cell").cast("long").as("key"))
      rankPairs(kernelProbeTopK(corpus, vecs, pm, k), k)
    } else {
      val probeCells = probeCellsUdf(centroids, nprobe)
      val probes = queries
        .withColumn("probe", explode(probeCells(col("v"))))
        .select(col("probe"), col("id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val pairs = indexed.alias("i")
        .join(probes.alias("p"),
          col("i.cell") === col("p.probe") &&
            col("i.id") =!= col("p.q_id"))
        .select(col("p.q_id").as("q_id"), col("i.id").as("neighbor_id"),
          (VectorQueries.dot(col("p.qv"), col("i.v")) /
            (col("p.qn") * col("i.nrm"))).as("cos"))
      rankPairs(pairsTopK(pairs, k), k)
    }
  }

  /** Approximate top-k for `queries` (rows of the same indexed shape):
    * each query probes its bucket and all 1-bit neighbors in every
    * table, exact cosine ranks the probed union — kernel route for
    * bounded query sets, (tbl, bucket)-keyed shuffle join + the same
    * heap reduction past [[KernelQueryRows]]. */
  def annTopK(indexed: DataFrame, queries: DataFrame, k: Int,
              nBits: Int,
              queryRowsHint: Option[Long] = None): DataFrame = {
    require(nBits < 31, s"annTopK: nBits $nBits overflows bucket ints")
    // No-hint collects are LIMIT-bounded (r10, advisory; see ivfTopK):
    // this relation carries `tables` rows per query id, so the ROW
    // cap is 4× the id ceiling (the scaladoc's 4-table worst case).
    // The documented contract is the per-ID ceiling, though, and a
    // layout with fewer tables could fit 4×KernelQueryRows ids under
    // the row cap alone (advisory r10) — so the collected batch is
    // ALSO checked against the distinct-id ceiling (free: the rows
    // are already on the driver) and overflow falls back to the
    // shuffle route. Memory stays bounded by the row cap either way.
    val annRowCap = 4L * KernelQueryRows
    val kernelQs: Option[Array[org.apache.spark.sql.Row]] =
      queryRowsHint match {
        case Some(h) if h <= KernelQueryRows =>
          Some(queries.select(col("id"), col("tbl"), col("bucket"),
            col("v"), col("nrm")).collect())
        case Some(_) => None
        case None =>
          val r = queries.select(col("id"), col("tbl"), col("bucket"),
            col("v"), col("nrm")).limit(annRowCap.toInt + 1).collect()
          if (r.length <= annRowCap &&
              distinctIdsWithin(r, KernelQueryRows)) Some(r)
          else None
      }
    if (kernelQs.isDefined) {
      // ONE collect job for both the vectors and the bucket layout:
      // queries carry `tables` rows per id (vector duplicated per
      // table) — bounded by the route ceiling
      val qRows = kernelQs.get
      val qIdx = new java.util.HashMap[java.lang.Long, Integer]()
      val vecs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Double], Double)]
      val tmp = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Int]]()
      qRows.foreach { r =>
        val id = r.getLong(0)
        var qi = qIdx.get(java.lang.Long.valueOf(id))
        if (qi == null) {
          qi = Integer.valueOf(vecs.length)
          qIdx.put(id, qi)
          vecs += ((id, r.getSeq[Double](3).toArray, r.getDouble(4)))
        }
        val tbl = r.getInt(1)
        val bucket = r.getInt(2)
        var b = -1 // -1 = the home bucket, then each 1-bit flip
        while (b < nBits) {
          val probe = if (b < 0) bucket else bucket ^ (1 << b)
          // buckets are built from bits 0..nBits-1, so non-negative
          // and the packed key needs no masking (matches the column
          // form below)
          val key = java.lang.Long.valueOf((tbl.toLong << 32) + probe)
          var lst = tmp.get(key)
          if (lst == null) {
            lst = scala.collection.mutable.ArrayBuffer.empty[Int]
            tmp.put(key, lst)
          }
          lst += qi.intValue()
          b += 1
        }
      }
      val pm = new java.util.HashMap[java.lang.Long, Array[Int]]()
      tmp.forEach((key, lst) => pm.put(key, lst.toArray))
      val corpus = indexed.select(col("id"), col("v"), col("nrm"),
        (shiftleft(col("tbl").cast("long"), 32) +
          col("bucket").cast("long")).as("key"))
      rankPairs(kernelProbeTopK(corpus, vecs.toArray, pm, k), k)
    } else {
      val probes = queries.withColumn("probe", explode(array(
          col("bucket") +:
            (0 until nBits).map(b =>
              col("bucket").bitwiseXOR(lit(1 << b))): _*)))
        .select(col("tbl"), col("probe"), col("id").as("q_id"),
          col("v").as("qv"), col("nrm").as("qn"))
      val pairs = indexed.alias("i")
        .join(probes.alias("p"),
          col("i.tbl") === col("p.tbl") &&
            col("i.bucket") === col("p.probe") &&
            col("i.id") =!= col("p.q_id"))
        .select(col("p.q_id").as("q_id"), col("i.id").as("neighbor_id"),
          (VectorQueries.dot(col("p.qv"), col("i.v")) /
            (col("p.qn") * col("i.nrm"))).as("cos"))
      rankPairs(pairsTopK(pairs, k), k)
    }
  }

  // ---- product quantization (the third standard ANN family) ----------

  /** PQ codebooks: `m` subspaces of `dim/m` dims, `ksub` centroids
    * each, trained per-subspace on the same one-pass deterministic
    * sample [[ivfIndex]] uses (the FAISS PQ-trainer shape: codebook
    * placement needs O(m·ksub) representative points, not the corpus).
    * Returned as codebooks(subspace)(code) = centroid vector. */
  def pqTrain(emb: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
              seed: Long = 42L, trainPoints: Int = 4096)
      : Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val subDim = dim / m
    val pts = emb
      .select(xxhash64(col("vec_id"), lit(seed)).as("__h"),
        col("embedding").cast("array<double>").as("v"))
      .orderBy("__h").limit(trainPoints).select("v")
      .collect().map(_.getSeq[Double](0).toArray)
    Array.tabulate(m) { i =>
      trainCentroids(pts.map(_.slice(i * subDim, (i + 1) * subDim)),
        ksub, seed + i)
    }
  }

  /** Uniform scalar grid codebooks (subDim = 1, one subspace per
    * dimension): centroid c of every subspace is `lo + step·c`.
    * Quantization and distances over quarter-spaced grids are exactly
    * representable in binary floating point, which is what makes the
    * `ann_pq_probe` driver gate hash-exact against DuckDB. */
  def gridCodebooks(dim: Int, lo: Double = -2.0, step: Double = 0.25,
                    ksub: Int = 16): Array[Array[Array[Double]]] =
    Array.fill(dim)(Array.tabulate(ksub)(c => Array(lo + step * c)))

  /** Encode vectors to PQ codes — ONE narrow pass, the index is
    * m bytes-ish per vector instead of 4·dim: at 10⁹ vectors the whole
    * code table fits where the raw vectors cannot, which is the point
    * of PQ (the ADC scan cost matches exact search at these dims; the
    * win is index size, memory residency, and shuffle width).
    * Ties take the FIRST minimal code (strict `<`), matching the
    * oracle's argmin convention. */
  def pqEncode(emb: DataFrame,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    // transform(cast) here, NOT the native array cast used by the
    // codegen consumers (withNorm etc.): feeding this UDF a native
    // cast(array<float> AS array<double>) measured ~10× slower on the
    // ann_pq queries (7.1 s vs 0.65 s at sf0.1, tight [min,max] so not
    // noise — r7, LshProbeBench methodology). Rule of thumb from that
    // measurement: native casts for codegen consumers, transform for
    // Scala-UDF inputs.
    cpuRebalance(emb).select(col("vec_id").as("id"),
      encodeUdf(codebooks)(
        transform(col("embedding"), x => x.cast("double")))
        .as("code"))
  }

  /** The per-vector PQ encoder shared by [[pqEncode]]'s UDF and
    * [[ivfPqIndex]]'s typed pass. Ties take the FIRST minimal code
    * (strict `<`), matching the oracle's argmin convention. */
  private def encodeVec(codebooks: Array[Array[Array[Double]]],
                        v: Array[Double]): Array[Int] = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    require(v != null && v.length >= m * subDim,
      s"pqEncode: vector null or shorter than m*subDim = ${m * subDim}")
    val code = new Array[Int](m)
    var i = 0
    while (i < m) {
      val cb = codebooks(i)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = v(i * subDim + j) - cb(c)(j); d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(i) = best
      i += 1
    }
    code
  }

  private def encodeUdf(codebooks: Array[Array[Array[Double]]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Double]) => encodeVec(codebooks, v.toArray))

  /** Decode codes back to their centroid vectors (the reconstruction;
    * feeding a decoded query to [[pqTopK]] gives symmetric-distance
    * PQ search, the mode the hash-exact probe gate uses). */
  def pqDecode(codes: DataFrame,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val dec = udf { (code: Seq[Int]) =>
      codebooks.indices.flatMap(i => codebooks(i)(code(i))).toArray
    }
    codes.select(col("id"), dec(col("code")).as("v"))
  }

  /** Per-query ADC lookup table: m·ksub per-subspace partial squared
    * distances, computed ONCE per query on the tiny broadcast side —
    * shared by [[pqTopK]] and [[ivfPqTopK]]. Per-subspace partials
    * sum in the same order as the direct form — bit-identical on the
    * exactly-representable grid codebooks the probe gates use. */
  private def lutFor(codebooks: Array[Array[Array[Double]]],
                     qv: Array[Double]): Array[Double] = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val ksub = codebooks(0).length
    require(qv != null && qv.length >= m * subDim,
      s"pqTopK: query null or shorter than m*subDim = ${m * subDim}")
    val lut = new Array[Double](m * ksub)
    var i = 0
    while (i < m) {
      val cb = codebooks(i)
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val t = qv(i * subDim + j) - cb(c)(j); d += t * t; j += 1
        }
        lut(i * ksub + c) = d
        c += 1
      }
      i += 1
    }
    lut
  }

  /** Streamed ADC top-k: the code table flows once through
    * per-partition bounded insertion heaps (one k-slot heap per query,
    * ordered by (adc asc, id asc)) and only local winners reach the
    * final ranking window — the [[VectorQueries.streamedTopK]] shape
    * applied to PQ search. The r8 form materialized the full
    * (query × code) pair relation into a ranking window: correct, and
    * fine at the 2k-vector gate, but the relation is |Q|·|corpus| rows
    * (≈2·10⁹ at the 200k-vector tier's probe gate) and the map-side
    * rank sort became the whole query. Here nothing quadratic is ever
    * materialized: per pair the kernel does m array adds (the same
    * ascending-subspace sum as the AdcLookup expression — bit-identical
    * distances) plus an O(1) reject against the current k-th best.
    *
    * `queries` is driver-prepared (id, lut, cellMask) — bounded by the
    * same contract as every broadcast-queries search here; mask null
    * means scan all codes (dense PQ), else only rows whose `cell` the
    * mask admits (IVF-PQ). */
  private def adcStreamedTopK(codes: DataFrame,
      queries: Array[(Long, Array[Double], Array[Boolean])],
      k: Int, ksub: Int, hasCell: Boolean): DataFrame = {
    import org.apache.spark.sql.types._
    val s = codes.sparkSession
    val bc = s.sparkContext.broadcast(queries)
    val outSchema = StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("adc", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val cols =
      if (hasCell) Seq(col("id"), col("code"), col("cell"))
      else Seq(col("id"), col("code"))
    // no cpuRebalance here: both code producers (pqEncode, ivfPqIndex)
    // already rebalance before their encode kernels, and
    // CollapseRepartition cannot fuse across the typed mapPartitions —
    // a second round-robin would re-exchange the whole code table per
    // search (review finding; it cost ann_pq an exchange)
    // Loop order is QUERY-major over a partition-buffered flat code
    // block, not row-major over the live iterator (r9.6). The row-major
    // form walked every query's 8 KB LUT (plus its Tuple3 spine) for
    // EVERY corpus row — at the 8000-query / 200k-code probe tier that
    // is ~64 MB of DRAM-resident LUT traffic per row, and the kernel
    // measured ~450 ns/pair, ~30× its arithmetic: cache-miss-bound,
    // not compute-bound. Buffering the partition's codes once (flat
    // int array — bounded by the partition, i.e. by
    // maxPartitionBytes on a scan or the shuffle partition sizing,
    // the same residency the index already assumes) and iterating
    // queries outermost keeps the current LUT in L1 across the whole
    // block and streams codes linearly from L2; DRAM then sees each
    // LUT once per partition. Same pairs, same insertion logic, same
    // (adc asc, id asc) heaps — the k-best set is iteration-order
    // independent, so output rows are identical.
    val local = codes.select(cols: _*).mapPartitions { rows =>
      val qs = bc.value
      val nq = qs.length
      // flatten the broadcast tuples once per task: the per-pair
      // Tuple3 loads were 3-4 dependent cache lines each
      val qids = new Array[Long](nq)
      val luts = new Array[Array[Double]](nq)
      val masks = new Array[Array[Boolean]](nq)
      var qi = 0
      while (qi < nq) {
        val q = qs(qi)
        qids(qi) = q._1; luts(qi) = q._2; masks(qi) = q._3
        qi += 1
      }
      // buffer the partition: ids, cells, and codes unboxed ONCE into
      // a flat row-major int block (same per-row-unbox doctrine as
      // [[VectorQueries.streamedTopK]], hoisted out of the query loop)
      val idB = scala.collection.mutable.ArrayBuilder.make[Long]
      val cellB = scala.collection.mutable.ArrayBuilder.make[Int]
      val codeB = scala.collection.mutable.ArrayBuilder.make[Int]
      var m = 0
      rows.foreach { r =>
        val seqCode = r.getSeq[Int](1)
        // the code width is the FIRST row's length; an empty or
        // ragged code column must fail here, loudly — with m left 0
        // every candidate would silently score adc = 0.0 (advisory
        // r10), and a ragged block would misalign every row after it
        require(seqCode.nonEmpty,
          "adcStreamedTopK: empty PQ code array — the code column " +
            "must carry m subquantizer codes per row")
        if (m == 0) m = seqCode.length
        require(seqCode.length == m,
          s"adcStreamedTopK: ragged PQ codes (saw ${seqCode.length}," +
            s" expected $m) — all rows must share one code width")
        idB += r.getLong(0)
        if (hasCell) cellB += r.getInt(2)
        var ci = 0
        while (ci < seqCode.length) { codeB += seqCode(ci); ci += 1 }
      }
      val rowIds = idB.result()
      val cells = cellB.result()
      val codeBlk = codeB.result()
      val nRows = rowIds.length
      val ids = Array.ofDim[Long](nq, k)
      val adcs = Array.ofDim[Double](nq, k)
      val sizes = new Array[Int](nq)
      qi = 0
      while (qi < nq) {
        val qid = qids(qi)
        val lut = luts(qi)
        val mask = masks(qi)
        val hIds = ids(qi)
        val hAdc = adcs(qi)
        var sz = 0
        var ri = 0
        var off = 0
        while (ri < nRows) {
          val id = rowIds(ri)
          if (id != qid && (mask == null || mask(cells(ri)))) {
            // early-abort bound: LUT partials are squared distances
            // (≥ 0), so the running sum only grows — once it strictly
            // exceeds the current k-th best with a FULL heap, the
            // candidate provably cannot place (ties stay eligible for
            // the id tie-break, hence strict >). Lossless.
            val bound = if (sz == k) hAdc(k - 1)
                        else Double.PositiveInfinity
            var d = 0.0
            var i = 0
            while (i < m && d <= bound) {
              d += lut(i * ksub + codeBlk(off + i)); i += 1
            }
            var pos = sz
            while (pos > 0 && (d < hAdc(pos - 1) ||
                (d == hAdc(pos - 1) && id < hIds(pos - 1))))
              pos -= 1
            if (pos < k) {
              var mv = math.min(sz, k - 1)
              while (mv > pos) {
                hIds(mv) = hIds(mv - 1)
                hAdc(mv) = hAdc(mv - 1)
                mv -= 1
              }
              hIds(pos) = id
              hAdc(pos) = d
              if (sz < k) sz += 1
            }
          }
          ri += 1
          off += m
        }
        sizes(qi) = sz
        qi += 1
      }
      (0 until nq).iterator.flatMap { qi =>
        (0 until sizes(qi)).iterator.map(p =>
          org.apache.spark.sql.Row(qids(qi), ids(qi)(p), adcs(qi)(p)))
      }
    }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc"), col("neighbor_id"))
    local.withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= k)
  }

  /** Asymmetric-distance top-k over the code table: queries stay raw,
    * every corpus vector is represented by its code's centroids, and
    * the scan touches ONLY (id, code) rows — the corpus vectors never
    * load. Queries collect to the driver (bounded probe-set contract)
    * and broadcast as precomputed LUTs; squared-L2 distance; ties rank
    * by neighbor id. Search itself is [[adcStreamedTopK]]. */
  def pqTopK(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
             queries: DataFrame, k: Int): DataFrame = {
    val ksub = codebooks(0).length
    val qs = queries.select(col("id"), col("v")).collect().map { r =>
      (r.getLong(0), lutFor(codebooks, r.getSeq[Double](1).toArray),
        null: Array[Boolean])
    }
    adcStreamedTopK(codes, qs, k, ksub, hasCell = false)
  }

  // ---- IVF-PQ: the composed index a 100-TB corpus actually runs ------

  /** One-pass IVF-PQ index build: the coarse quantizer assigns each
    * vector a cell AND the PQ encoder compresses it to m codes in the
    * SAME narrow scan (both are map-side functions of `v`), so the
    * corpus is read once and the materialized index is (id, code,
    * cell) — m small ints + a cell id per vector, ~32 bytes where the
    * raw 64-dim vector is 512. At 10⁹ vectors the index fits in
    * cluster memory (or a cell-partitioned parquet whose probes are
    * partition-pruned scans) while the vectors themselves never load
    * at search time.
    *
    * The pass is a TYPED mapPartitions, not UDF columns, and that is
    * load-bearing: an object boundary forces code/cell to evaluate
    * exactly once per row. As UDF projections they inline into
    * [[ivfPqTopK]]'s codegen'd broadcast join, which re-evaluates the
    * full O(m·ksub) encode PER JOIN MATCH — measured 7× slower on the
    * `ann_ivf_pq_probe` gate (7.7 s → 1.1 s at sf0.1).
    */
  def ivfPqIndex(emb: DataFrame, nlist: Int,
                 codebooks: Array[Array[Array[Double]]],
                 seed: Long = 42L, trainPoints: Int = 4096,
                 sizeHint: Option[Long] = None)
      : (Array[Array[Double]], DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = VectorQueries.withNorm(emb)
      .withColumnRenamed("vec_id", "id")
    val centroids = trainQuantizer(base, nlist, seed, trainPoints,
      sizeHint)
    // cpuRebalance before the dense encode+assign pass: the cell
    // assignment alone is n·nlist·dim mult-adds (5.7 G at the
    // 200k-vector tier) and a byte-split scan of the compact vector
    // file would run it on 2 of 32 cores
    val codes = cpuRebalance(base.select(col("id"), col("v")))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val arr = v.toArray
          (id, encodeVec(codebooks, arr), nearestCell(centroids, arr))
        }
      }.toDF("id", "code", "cell")
    (centroids, codes)
  }

  /** IVF-PQ search (FAISS `IndexIVFPQ` shape): each query ranks the
    * `nprobe` closest cells by centroid distance, then ADC-ranks ONLY
    * those cells' codes via its precomputed lookup table — the
    * candidate set shrinks by ~nlist/nprobe AND each candidate costs
    * O(m) adds instead of O(dim) float ops. The scan side is the
    * narrow (id, code, cell) table streamed through
    * [[adcStreamedTopK]] with a per-query probed-cell mask; queries
    * (with their LUTs) ride the broadcast. A (query, neighbor) pair
    * appears in at most one cell, so the mask admits it once (no
    * post-dedup, unlike the L-table LSH union). `codes` is
    * [[ivfPqIndex]]'s table; `queries` carries (id, v). */
  def ivfPqTopK(centroids: Array[Array[Double]], codes: DataFrame,
                codebooks: Array[Array[Array[Double]]],
                queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val ksub = codebooks(0).length
    val nlist = centroids.length
    val qs = queries.select(col("id"), col("v")).collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val mask = new Array[Boolean](nlist)
      closestCells(centroids, v, nprobe).foreach(c => mask(c) = true)
      (r.getLong(0), lutFor(codebooks, v), mask)
    }
    adcStreamedTopK(codes, qs, k, ksub, hasCell = true)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster-block the corpus with a coarse
    * quantizer, generate within-cell cosine pairs at `threshold`,
    * close them into duplicate clusters ([[Dedup.dupComponents]]),
    * and emit a per-row verdict. Cluster blocking is what makes
    * embedding dedup tractable at 100 TB: pair generation is
    * O(Σ cell²) instead of O(n²), the self-join shuffles on `cell`
    * (vectors move once, at the exchange), and [[Dedup.pruneOversized]]
    * bounds any degenerate mega-cell exactly like the LSH hot-bucket
    * guard. Keep policy diverges from the paper deliberately: min-id
    * per cluster (the whole dedup family's deterministic canonical
    * choice) instead of farthest-from-centroid.
    *
    * `centroids` are (cellId, vector) pairs — pass [[ivfIndex]]'s
    * trained quantizer zipped with indices for the production path, or
    * a deterministic row subset when a replayable assignment is needed
    * (the `semantic_dedup` oracle does this). Assignment is first-min
    * squared-L2 over centroids in ascending cellId order; ascending-j
    * accumulation keeps the distance bit-comparable with DuckDB's
    * `list_dot_product` replay.
    *
    * Like the paper's algorithm, at `probes = 1` a near-dup pair split
    * across two cells is missed — the accepted recall trade of cluster
    * blocking. `probes = 2` applies the IVF nprobe idea to INDEXING:
    * each vector enters its two nearest cells, so a boundary pair
    * whose members straddle adjacent cells still meets in whichever of
    * the two cells they share — most of the lost boundary recall back
    * for ~probes× pair-generation cost (DedupSimilaritySpec plants
    * such straddling twins and shows p=1 provably misses them;
    * [[lshDedupPairs]] remains the multi-table alternative when full
    * cross-cell recall matters). The reported `cell` and the oracle
    * contract stay primary-cell (nearest); duplicate meetings of a
    * pair sharing BOTH probe cells collapse via dropDuplicates on the
    * 16-byte pair ids before components run.
    *
    * Cap interaction: [[Dedup.pruneOversized]] here counts primary AND
    * probe rows per cell — correct for THIS join, which is symmetric
    * (probe rows join both sides, so the combined count is the pair-
    * volume bound) — but it means a cell sitting near `maxCell` can be
    * pruned at p=2 that survived at p=1. Callers running close to the
    * cap should scale `maxCell` by `probes`. ([[lshDedupPairs]] is
    * different: its b-side is home-only, so it prunes on home counts.)
    *
    * Engage-policy defaults (r14, closing the r13 ADVICE note):
    * `blockRows = Int.MaxValue` keeps default callers on the
    * windowless short-circuit plan — the r12 shape every example
    * driver measured — so turning chunking on is an explicit opt-in
    * (the registry gate passes `blockRows = 2048`, the value its
    * committed numbers were measured at). `autoChunk = false` keeps
    * the WINDOWED engage; the census route (autoChunk = true) now
    * persists the celled frame so its count job materializes the
    * assignment kernel instead of re-running it — the r14 A/B
    * (DevSemTime ab): census-cached 54.4 s vs window 56.6 s at sf10
    * (2M vectors, ratio 0.96 — a tie within round noise) and 1.84 s
    * vs 1.76 s at sf1 (1.05× — the extra eager job is visible where
    * the query is small). A tie doesn't pay for an extra eager job
    * plus a corpus-sized cache at every tier, so the window stays
    * the default and the census stays the documented alternative
    * for callers that want lshDedupPairs' exact-counts policy.
    *
    * @return (vec_id, cell, canonical_id, keep) — keep=1 iff the row
    *         is its cluster's canonical (or a singleton)
    */
  def semanticDedup(emb: DataFrame,
                    centroids: Array[(Long, Array[Double])],
                    threshold: Double,
                    maxCell: Int = 100000,
                    probes: Int = 1,
                    sizeHint: Option[Long] = None,
                    blockRows: Int = Int.MaxValue,
                    autoChunk: Boolean = false): DataFrame = {
    require(centroids.nonEmpty, "semanticDedup needs >= 1 centroid")
    require(probes >= 1 && probes <= centroids.length,
      s"probes must be in 1..${centroids.length}, got $probes")
    val sorted = centroids.sortBy(_._1)
    val cellIds = sorted.map(_._1)
    val cts = sorted.map(_._2)
    val base = cpuRebalance(VectorQueries.withNorm(emb))
      .select(col("vec_id").as("id"), col("v"), col("nrm"))
    // The assignment UDF column is a join key below; the shuffle
    // exchange materializes it per row on each side, so the per-match
    // re-evaluation trap (broadcast-join inlining) doesn't bite here —
    // the assignment runs ~3 narrow passes total (pairs ×2, verdict).
    // `celled` carries the PRIMARY (nearest) cell for the verdict;
    // `pairSource` carries one row per (vector, probed cell).
    val (celled, pairSource) =
      if (probes == 1) {
        // ascending-cellId scan + strict < keeps first-min ties on the
        // LOWEST cell id — mirrored by the oracle's (dist, c_id) order.
        // Typed kernel, not a UDF: the assignment is the dominant
        // dense pass (n·ncells·dim mult-adds), and the old
        // `udf(v => ...)` consumed the NATIVE-cast array — the
        // ~10×-slow path [[pqEncode]]'s scaladoc measured (re-observed
        // here: 15.8 s → ~5 s at the 200k-vector tier)
        import org.apache.spark.sql.types._
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
          .encoderFor(StructType(Seq(
            StructField("id", LongType, nullable = false),
            StructField("v", ArrayType(DoubleType), nullable = true),
            StructField("nrm", DoubleType, nullable = true),
            StructField("cell", LongType, nullable = false))))
        val s = base.sparkSession
        val bcCts = s.sparkContext.broadcast(cts)
        val bcIds = s.sparkContext.broadcast(cellIds)
        val c = base.mapPartitions { rows =>
          val cc = bcCts.value
          val ids = bcIds.value
          rows.map { r =>
            val v = r.getSeq[Double](1)
            org.apache.spark.sql.Row(r.getLong(0), v, r.get(2),
              ids(nearestCell(cc, v.toArray)))
          }
        }(enc)
        (c, c)
      } else {
        // p nearest cells, ascending (distance, cellId) — element 0
        // equals the strict-< first-min primary cell
        val p = probes
        val assignP = udf { (v: Seq[Double]) =>
          val arr = v.toArray
          val ds = new Array[Double](cts.length)
          var c = 0
          while (c < cts.length) {
            val ct = cts(c); var d = 0.0; var j = 0
            while (j < ct.length && j < arr.length) {
              val t = arr(j) - ct(j); d += t * t; j += 1
            }
            ds(c) = d; c += 1
          }
          ds.indices.sortBy(i => (ds(i), i)).take(p)
            .map(cellIds(_)): Seq[Long]
        }
        val c = base.withColumn("cells", assignP(col("v")))
        (c.withColumn("cell", col("cells")(0)).drop("cells"),
          c.withColumn("cell", explode(col("cells"))).drop("cells"))
      }
    // [[chunkForPairJoin]]: a hot cell's |cell|²/2 dot products
    // otherwise run as ONE task — flop skew AQE's byte meter cannot
    // split (one ~0.9 s task held 25% of this query's wall at the
    // 200k-vector tier at ANY core count). Unlike [[lshDedupPairs]],
    // the DEFAULT here is the WINDOWED per-cell engage (autoChunk =
    // false, blockRows = 2048 — the shape every committed
    // semantic_dedup number was measured on): the window's count
    // auto-sizes m per cell on the same exchange, and the chunk-key
    // join's extra exchange re-ships only the 1× n-row cell payload —
    // cheap next to the n·√n·dim assignment kernel that dominates
    // this operator — whereas an eager census (autoChunk = true,
    // available and spec-pinned) must re-run that assignment kernel
    // to see the cells at all: ~20 s of the 56.5 s sf10 reading for
    // a decision the window makes in-plan. The asymmetry is the
    // measured payload-vs-kernel ratio, deliberately opposite to
    // lshDedupPairs' census default (tables×probes = 8× payload
    // amplification there, kernel a few percent).
    // `semantic_dedup_chunked` (blockRows = 64) forces the engaged
    // windowed route at the gate tier and holds it to the full
    // DuckDB oracle.
    val chunked: DataFrame =
      if (!autoChunk) {
        // same cell-keyed vector exchange as lshDedupPairs' — the
        // gate prune window and the pair self-join ride one
        // HashPartitioning
        val sizedSource = sizedByHint(pairSource, sizeHint,
          rowsPerItem = probes.toLong, dim = cts(0).length,
          keys = Seq("cell"))
        val counted = sizedSource
          .withColumn("__cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("cell")))
          .where(col("__cnt") <= maxCell)
        chunkForPairJoin(counted,
          Seq("cell"), "id", blockRows, cntCol = Some("__cnt"))
      } else {
        // Census route, CACHED (r14, r13 verdict item 4): unlike
        // lshDedupPairs — whose index kernel is a few percent of the
        // query — this operator's cell assignment IS the dominant
        // pass (n·√n·dim mult-adds, ~20 s of 56.5 s at sf10), so an
        // eager census that re-derived the cells from scratch paid
        // the kernel twice. Persisting the celled pair source makes
        // the census's one count job MATERIALIZE the kernel's output;
        // the self-join sides (and, at probes = 1, the verdict join,
        // which shares this exact plan) then read cached cells. At
        // 100-TB widths the cache is n·(8·dim+overhead) bytes,
        // MEMORY_AND_DISK so overflow spills instead of OOM-ing, and
        // lineage is kept (an executor loss recomputes, it doesn't
        // kill the query — the reason this is persist, not
        // localCheckpoint). The entry stays in the CacheManager until
        // the plan is GC'd (ContextCleaner) — acceptable for a
        // terminal operator; callers looping semanticDedup per epoch
        // should spark.catalog.clearCache() between rounds.
        val src = pairSource
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        hotCensus(src, Seq("cell"),
          Seq(count(lit(1)).as("__cnt")),
          col("__cnt") > maxCell || col("__cnt") > blockRows) match {
          case None =>
            chunkForPairJoin(lowExchange(src, sizeHint,
              rowsPerItem = probes.toLong,
              rowBytes = 8L * cts(0).length + 128L, keys = Seq("cell")),
              Seq("cell"), "id", Int.MaxValue)
          case Some(hotDf) =>
            val pruned = src
              .join(broadcast(hotDf), Seq("cell"), "left")
              .where(coalesce(col("__cnt") <= maxCell, lit(true)))
              .withColumn("__cnt", coalesce(col("__cnt"), lit(1L)))
            lowExchange(chunkForPairJoin(pruned,
              Seq("cell"), "id", blockRows, cntCol = Some("__cnt")),
              sizeHint, rowsPerItem = probes.toLong,
              rowBytes = 8L * cts(0).length + 128L,
              keys = Seq("cell", "__i", "__j"))
        }
      }
    val rawPairs = chunked.as("a").join(chunked.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.__i") === col("b.__i") &&
          col("a.__j") === col("b.__j") &&
          chunkCanonical("a", "b") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (VectorQueries.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= threshold)
      .select("a_id", "b_id")
    // a pair sharing BOTH probed cells meets twice — its cos is
    // computed identically both times, so the dedup is on bare ids
    val pairs = if (probes == 1) rawPairs
                else rawPairs.dropDuplicates("a_id", "b_id")
    val comp = Dedup.dupComponents(pairs)
      .withColumnRenamed("id", "vec_id")
    celled.select(col("id").as("vec_id"), col("cell"))
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("canonical_id"), col("vec_id")).as("canonical_id"))
      .withColumn("keep",
        (col("vec_id") === col("canonical_id")).cast("int"))
  }
}
