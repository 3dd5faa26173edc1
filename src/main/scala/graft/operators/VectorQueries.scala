package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over the `embeddings` table
  * (`Array[Float]`, 64-dim): brute-force cosine top-k as the exact
  * baseline and blocked near-dup pairing. The LSH-bucketed approximate
  * variants live in [[Similarity]] (not SQL-expressible → scalatest).
  */
object VectorQueries {

  /** Dot product of two double arrays via the native codegen'd
    * expression ([[graft.functions.DoubleDotProduct]]). Left-to-right
    * summation — same order as DuckDB's `list_dot_product`, so oracle
    * comparison is bit-exact. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Corpus-row bound under which `dedup_embed_cosine` emits the FULL
    * quadratic pair set; past it the A side samples vec_id % mod == 0
    * with mod = ceil(n/limit). The oracle SQL embeds THIS default
    * (its mod comes from its own COUNT(*)), so the sys-prop force is
    * for specs and dev A/Bs only — running Verify with it set desyncs
    * the oracle by construction. */
  private[graft] val EmbedCosDefaultMaxExactRows = 20000L

  /** [[EmbedCosDefaultMaxExactRows]] with the registry-path override:
    * `graft.embedcos.maxExactRows` (≥ 1; a huge value forces the full
    * quadratic form at any corpus size, a tiny one forces sampling on
    * gate-scale data so the sampled route itself stays spec-testable).
    * Malformed values fail loudly, the house sys-prop contract. */
  private[graft] def embedCosMaxExactRows: Long =
    sys.props.get("graft.embedcos.maxExactRows").map { v =>
      require(v.nonEmpty && v.forall(_.isDigit) && v.toLong >= 1L,
        s"graft.embedcos.maxExactRows must be a positive integer, " +
          s"got '$v'")
      v.toLong
    }.getOrElse(EmbedCosDefaultMaxExactRows)

  /** SQ8 quantization codes of a double array under a max-abs scale,
    * as `array<int>`: code_i = floor(127·x_i/maxabs + 0.5) — explicit
    * floor(+0.5) so Spark and DuckDB round identically (their ROUND
    * tie rules differ); a zero vector (maxabs = 0) codes to zeros.
    * The ONE definition of the codec expression — `embed_quantize`,
    * `knn_sq8`, and the specs all build on it, so the quantize and
    * search paths cannot drift. */
  def sq8CodeInts(v: Column, maxabs: Column): Column =
    transform(v, x =>
      when(maxabs === 0d, lit(0))
        .otherwise(floor(x * lit(127.0) / maxabs + lit(0.5))
          .cast("int")))

  /** [[sq8CodeInts]] comma-joined for hash-comparable output (the
    * array type itself isn't SQL-comparable). */
  def sq8Codes(v: Column, maxabs: Column): Column =
    concat_ws(",",
      transform(sq8CodeInts(v, maxabs), c => c.cast("string")))

  /** Embeddings with a cast-to-double vector and precomputed L2 norm.
    * Norms are computed once per row (narrow), not per pair. */
  def withNorm(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    emb.select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Exact cosine top-k via broadcast-queries + per-partition bounded
    * heaps — the r9 replacement for the join-then-window form, whose
    * per-(query, corpus) pair relation shuffled n_q·n_corpus rows into
    * the ranking window (≈800M pairs / 20 GB at the 200k-vector sf1
    * tier: the benchmark never finished). Here the corpus STREAMS:
    * each partition keeps one k-slot insertion heap per query ordered
    * by (cos desc, id asc), emits only its ≤ n_q·k local winners, and
    * a final window over the n_partitions·n_q·k survivors (thousands,
    * not millions) picks the global top-k — the same two-phase exact
    * top-k every distributed KNN baseline uses. Output EQUALS the old
    * form row-for-row: the kernel's left-to-right dot and
    * dot/(qn·dn) division replay [[DoubleDotProduct]]'s exact IEEE
    * op order, and per-partition top-k under a total order is a
    * lossless pre-filter of global top-k.
    *
    * The query side is collected and broadcast — bounded by contract
    * (the gate's %50 probe subset stands in for a user-supplied fixed
    * probe set, exactly as the old broadcast join already assumed).
    * The corpus is repartition()ed first: the kernel is compute-dense
    * (n_q·dim mults per row), and a byte-split scan of a compact
    * vector file would hand 32 cores only 3-4 splits.
    *
    * @param corpus (id: Long, vector: Seq[Double], norm: Double) rows
    * @param queries (id, vector, norm) triples; self-matches skipped
    */
  private[graft] def streamedTopK(corpus: DataFrame,
      queries: Array[(Long, Array[Double], Double)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val s = corpus.sparkSession
    val bc = s.sparkContext.broadcast(queries)
    val outSchema = StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    // Loop order is QUERY-major over a partition-buffered corpus
    // block, not row-major over the live iterator (r9.6, same rework
    // as [[Similarity.adcStreamedTopK]] — measured 4.4× there): the
    // row-major form chased every query's Tuple3 spine and ~512 B
    // vector from DRAM for EVERY corpus row (~2 MB of query traffic
    // per row at the 4000-query tier). Buffering the partition's
    // vectors once into a flat double block (bounded by the partition
    // sizing) and iterating queries outermost keeps the live query
    // vector in L1 and streams the corpus block linearly from
    // L2/L3; DRAM sees each query once per partition. Same pairs,
    // same insertion logic, same (cos desc, id asc) heaps — the
    // k-best set is iteration-order independent, so output rows are
    // identical.
    val nPart = s.sessionState.conf.numShufflePartitions
    val local = corpus.repartition(nPart).mapPartitions { rows =>
      val qs = bc.value
      val nq = qs.length
      val qids = new Array[Long](nq)
      val qvs = new Array[Array[Double]](nq)
      val qns = new Array[Double](nq)
      var qi = 0
      while (qi < nq) {
        val q = qs(qi)
        qids(qi) = q._1; qvs(qi) = q._2; qns(qi) = q._3
        qi += 1
      }
      // buffer the partition: ids, norms, and vectors unboxed ONCE
      // into a flat row-major double block. Corpus rows may be ragged
      // (min-length dot contract, matching DoubleDotProduct), so row
      // offsets are tracked explicitly rather than assuming a fixed
      // dim.
      val idB = scala.collection.mutable.ArrayBuilder.make[Long]
      val nrmB = scala.collection.mutable.ArrayBuilder.make[Double]
      val offB = scala.collection.mutable.ArrayBuilder.make[Int]
      val vecB = scala.collection.mutable.ArrayBuilder.make[Double]
      var off = 0
      rows.foreach { r =>
        val seq = r.getSeq[Double](1)
        idB += r.getLong(0)
        nrmB += r.getDouble(2)
        offB += off
        var c = 0
        while (c < seq.length) { vecB += seq(c); c += 1 }
        off += seq.length
      }
      offB += off // sentinel: row i spans [offs(i), offs(i+1))
      val rowIds = idB.result()
      val nrms = nrmB.result()
      val offs = offB.result()
      val vecBlk = vecB.result()
      val nRows = rowIds.length
      val ids = Array.ofDim[Long](nq, k)
      val cos = Array.ofDim[Double](nq, k)
      val sizes = new Array[Int](nq)
      qi = 0
      while (qi < nq) {
        val qid = qids(qi)
        val qv = qvs(qi)
        val qn = qns(qi)
        val hIds = ids(qi)
        val hCos = cos(qi)
        var sz = 0
        var ri = 0
        while (ri < nRows) {
          val id = rowIds(ri)
          if (id != qid) {
            val base = offs(ri)
            // min-length bound, matching DoubleDotProduct exactly (a
            // ragged corpus row must truncate, not throw)
            val n = math.min(qv.length, offs(ri + 1) - base)
            var d = 0.0
            var j = 0
            while (j < n) { d += qv(j) * vecBlk(base + j); j += 1 }
            val cz = d / (qn * nrms(ri))
            var pos = sz
            while (pos > 0 && (cz > hCos(pos - 1) ||
                (cz == hCos(pos - 1) && id < hIds(pos - 1))))
              pos -= 1
            if (pos < k) {
              var m = math.min(sz, k - 1)
              while (m > pos) {
                hIds(m) = hIds(m - 1)
                hCos(m) = hCos(m - 1)
                m -= 1
              }
              hIds(pos) = id
              hCos(pos) = cz
              if (sz < k) sz += 1
            }
          }
          ri += 1
        }
        sizes(qi) = sz
        qi += 1
      }
      (0 until nq).iterator.flatMap { qi =>
        (0 until sizes(qi)).iterator.map(p =>
          org.apache.spark.sql.Row(qids(qi), ids(qi)(p), cos(qi)(p)))
      }
    }(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    local.withColumn("nn_rank", row_number().over(w))
      .where(col("nn_rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("nn_rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Collect a bounded (id, vector, norm) probe set for
    * [[streamedTopK]] from a (id, v, nrm) DataFrame. */
  private def collectQueries(q: DataFrame)
      : Array[(Long, Array[Double], Double)] =
    q.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1).toArray, r.getDouble(2)))

  /** Probe-set stride for the exact KNN baselines: every `step`-th
    * vec_id, step = max(50, ceil(n/4000)) — a FIXED ~4000-probe
    * workload at any corpus size. The old fixed `% 50` made the probe
    * COUNT grow with the corpus, so total exact-scan work was
    * (n/50)·n — quadratic by construction, and the r10 sf10 growth
    * check would have read 100× for a row whose per-probe cost is
    * honestly linear (a query workload does not grow because the
    * corpus did). The floor pins the sf0.01 gate (n=500 ⇒ 50) AND the
    * sf1 tier (n=200k ⇒ ceil(200k/4000)=50) — hashes and committed
    * bench numbers are untouched; only larger corpora change, where
    * the old form was the wrong benchmark. Oracles replay the same
    * stride from their own COUNT(*). */
  private[graft] def knnProbeStep(n: Long): Long =
    math.max(50L, math.ceil(n.toDouble / 4000).toLong)

  /** [[knnProbeStep]] as DuckDB SQL over the same table. */
  private val KnnProbeStepSql =
    "(SELECT GREATEST(50, CAST(CEIL(COUNT(*) / 4000.0) AS BIGINT)) " +
      "FROM embeddings)"

  /** The semantic_dedup gate body, parameterized on the pair-join
    * chunking block so the forced-engaged registry sibling runs the
    * IDENTICAL workload with the census-gated auto-chunking tripped
    * (the output is pair-for-pair the same, so both entries share
    * one oracle SQL). */
  private def semanticDedupFn(blockRows: Int)
      : (org.apache.spark.sql.SparkSession, String) => DataFrame =
    (s, d) => {
      val e = Tables.load(s, d, "embeddings")
      val n = e.count()
      val step = math.max(101L,
        math.ceil(math.sqrt(n.toDouble)).toLong)
      val plants = e.where(col("vec_id") % 100 === 0)
        .select((-col("vec_id") - 1).as("vec_id"), col("label"),
          col("embedding"))
      // bounded collect: centroid probe set, ~√n rows (5 at the
      // sf0.01 gate) — the production path passes ivfIndex's trained
      // quantizer here instead
      val cents = e.where(col("vec_id") % step === 0)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      Similarity.semanticDedup(e.unionByName(plants), cents,
        threshold = 0.44, sizeHint = Some(n + n / 100 + 1),
        blockRows = blockRows)
    }

  /** The shared DuckDB replay for both semantic_dedup entries —
    * cells, within-cell pairs, AND the transitive closure (recursive
    * CTE), so the hash gate checks blocking, pairing, and clustering
    * at once, for the default and the forced-chunked route alike.
    */
  private val SemanticDedupSql: String =
    "WITH RECURSIVE " +
      "base AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
      "FROM embeddings), " +
      "e AS (SELECT vec_id, v FROM base UNION ALL " +
      "SELECT -vec_id - 1, v FROM base WHERE vec_id % 100 = 0), " +
      "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm " +
      "FROM e), " +
      "c AS (SELECT vec_id AS c_id, v AS cv FROM base " +
      "WHERE vec_id % (SELECT GREATEST(101, " +
      "CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) FROM base) = 0), " +
      "d AS (SELECT n.vec_id, c.c_id, list_dot_product(" +
      "[n.v[i] - c.cv[i] FOR i IN range(1, len(n.v) + 1)], " +
      "[n.v[i] - c.cv[i] FOR i IN range(1, len(n.v) + 1)]) AS dist " +
      "FROM n, c), " +
      "cells AS (SELECT vec_id, c_id AS cell FROM " +
      "(SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id " +
      "ORDER BY dist, c_id) AS rn FROM d) WHERE rn = 1), " +
      "m AS (SELECT n.vec_id, n.v, n.nrm, cells.cell FROM n " +
      "JOIN cells USING (vec_id)), " +
      "p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM m a " +
      "JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
      "WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.44), " +
      "edges AS (SELECT a_id AS src, b_id AS dst FROM p " +
      "UNION ALL SELECT b_id, a_id FROM p), " +
      "reach AS (SELECT src AS id, dst AS r FROM edges " +
      "UNION SELECT reach.id, e2.dst FROM reach " +
      "JOIN edges e2 ON reach.r = e2.src), " +
      "comp AS (SELECT id, MIN(r) AS canonical_id FROM reach " +
      "GROUP BY id) " +
      "SELECT m.vec_id, m.cell, " +
      "COALESCE(comp.canonical_id, m.vec_id) AS canonical_id, " +
      "CAST(m.vec_id = COALESCE(comp.canonical_id, m.vec_id) AS INT) " +
      "AS keep FROM m LEFT JOIN comp ON m.vec_id = comp.id"

  val defs: Map[String, QDef] = Map(

    // Exact ANN baseline: brute-force cosine top-10 for a fixed query
    // subset, via [[streamedTopK]] — broadcast the queries, stream
    // the corpus through per-partition bounded heaps, rank only the
    // local winners. (The r8 join-then-window form materialized and
    // SHUFFLED the full n_q·n_corpus pair relation; at the sf1 tier's
    // 4000 probes × 200k vectors that is an ~800M-row / 20 GB
    // exchange, and the query never finished a bench run.)
    "knn_cosine" -> QDef(
      (s, d) => {
        val raw = Tables.load(s, d, "embeddings")
        val step = knnProbeStep(raw.count())
        val e = withNorm(raw)
        val q = e.where(pmod(col("vec_id"), lit(step)) === 0)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        streamedTopK(e.select(col("vec_id"), col("v"), col("nrm")),
          collectQueries(q), k = 10)
      },
      "WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm " +
        "FROM e), " +
        "q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n " +
        s"WHERE vec_id % $KnnProbeStepSql = 0), " +
        "p AS (SELECT q_id, vec_id AS neighbor_id, " +
        "list_dot_product(qv, v) / (qn * nrm) AS cos " +
        "FROM q CROSS JOIN n WHERE vec_id <> q_id), " +
        "r AS (SELECT q_id, neighbor_id, cos, row_number() OVER (" +
        "PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk FROM p) " +
        "SELECT q_id, neighbor_id, CAST(rnk AS INT) AS nn_rank, " +
        "ROUND(cos, 6) AS cosine FROM r WHERE rnk <= 10"),

    // Embedding-cosine near-dup pairs with label blocking (the blocked
    // pair-generation shape; swap the block key for an LSH bucket at
    // scale — see Similarity.annLsh).
    //
    // COUNT-ADAPTIVE A-side sampling (r10, verdict item 3): this
    // query is the quadratic exact VERIFIER for the LSH scale route
    // (`dedup_embed_lsh`), and by-design-quadratic still means 27 s —
    // 24% of the sf1 engine total — and 100× that at the next tier.
    // Past [[embedCosMaxExactRows]] corpus rows the A side keeps only
    // vec_id % mod == 0, mod = ceil(n/limit): every emitted pair's
    // SMALLER id is in a deterministic uniform stratum, so the output
    // is an exact ~1/mod sample of the full pair set — precisely what
    // a recall audit consumes. The oracle replays mod from its own
    // COUNT(*) (the semantic_dedup doctrine); at the sf0.01 gate
    // mod = 1 and the hashes are untouched. The full quadratic form
    // stays reachable via the sys-prop force, and
    // EmbedCosSampleSpec pins sampled ≡ full ∩ (a_id % mod = 0).
    //
    // Plan shape (r10, replacing the r9.6 salted shuffle join): with
    // the A side bounded at ≤ maxExactRows it BROADCASTS (~10 MB of
    // vectors at the default bound), and the B side carries the
    // parallelism — cpuRebalance'd first, because a compute-dense
    // map inherits the SCAN's byte-sized splits (the 31 MB embeddings
    // file plans 2-3 splits, and 200M broadcast-join dots on 2 cores
    // measured 15.7 s; rebalanced to 32 it's ~2 s). No salt: a
    // broadcast hash join's parallelism is its streamed side's
    // partitioning, so the r9.6 salt-cell machinery (which existed to
    // spread a SHUFFLE join's 10 label cells across cores) deletes
    // outright, along with its S× explode of the B side. The forced
    // full form at sf1 broadcasts ~120 MB — heavy but functional,
    // and that route exists for audits, not production.
    "dedup_embed_cosine" -> QDef(
      (s, d) => {
        val raw = Tables.load(s, d, "embeddings")
        val mod = math.max(1L, math.ceil(
          raw.count().toDouble / embedCosMaxExactRows).toLong)
        val e = withNorm(raw)
        val a = e.where(pmod(col("vec_id"), lit(mod)) === 0)
          .select(col("label"), col("vec_id").as("a_id"),
            col("v").as("av"), col("nrm").as("an"))
        val b = Similarity.cpuRebalance(e)
          .select(col("label"), col("vec_id").as("b_id"),
            col("v").as("bv"), col("nrm").as("bn"))
        broadcast(a).join(b, Seq("label"))
          .where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            (dot(col("av"), col("bv")) / (col("an") * col("bn")))
              .as("cos"))
          .where(col("cos") >= 0.44)
          .select(col("a_id"), col("b_id"),
            round(col("cos"), 6).as("cosine"))
      },
      "WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        "m AS (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / " +
        s"$EmbedCosDefaultMaxExactRows.0) AS BIGINT)) AS md " +
        "FROM embeddings), " +
        "n AS (SELECT vec_id, label, v, " +
        "sqrt(list_dot_product(v, v)) AS nrm FROM e), " +
        "p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos " +
        "FROM n a JOIN n b ON a.label = b.label " +
        "AND a.vec_id < b.vec_id " +
        "WHERE a.vec_id % (SELECT md FROM m) = 0) " +
        "SELECT a_id, b_id, ROUND(cos, 6) AS cosine FROM p " +
        "WHERE cos >= 0.44"),

    // SemDeDup-style semantic dedup ([[Similarity.semanticDedup]]):
    // cluster-block → within-cell cosine pairs → connected components
    // → per-row keep verdict. The gate uses a DETERMINISTIC centroid
    // probe set (every step-th row's own embedding) instead of the
    // trained quantizer so DuckDB can replay the assignment exactly:
    // first-min squared-L2, distances accumulated ascending-j on both
    // engines (list_dot_product of the difference vector), ties to the
    // lowest centroid id. The step is scale-adaptive —
    // max(101, ceil(√n)) — because a FIXED step makes the centroid
    // count (and so the n·ncells·dim assignment pass) grow linearly
    // with the corpus while cell size stays constant: quadratic total
    // work. √n centroids of ~√n rows balance assignment and
    // within-cell pair generation at n^1.5 (the same sizing as
    // adaptiveNlist); at the sf0.01 gate √2020 < 101 so the floor
    // pins the old behavior and oracle hashes are untouched, and the
    // oracle SQL computes the SAME step from its own COUNT(*).
    // Planted exact copies (negative-id pattern, every 100th row)
    // guarantee same-cell cos=1 dup clusters so the components path is
    // never vacuously empty; natural near-dup pairs exercise the
    // threshold boundary. The oracle recomputes cells, pairs, AND the
    // transitive closure (recursive CTE), so the hash gate checks
    // blocking, pairing, and clustering at once.
    // blockRows = 2048 through the WINDOWED per-cell engage, passed
    // EXPLICITLY (r13 ADVICE: the function default is back to the
    // windowless Int.MaxValue so example drivers keep the plan they
    // measured; this registry gate is the call site the 2048 numbers
    // were measured at): the chunk-key join's extra exchange
    // re-ships only the 1× n-row cell payload, cheap next to the
    // n·√n·dim assignment kernel that dominates this operator. The
    // census alternative (lshDedupPairs' default) now caches the
    // celled frame instead of re-running that kernel, which brings
    // it to a TIE at sf10 (54.4 vs 56.6 s, DevSemTime ab r14) — not
    // a win, so the in-plan window keeps the default; see the
    // semanticDedup scaladoc for the full A/B.
    "semantic_dedup" -> QDef(
      semanticDedupFn(blockRows = 2048), SemanticDedupSql),
    // Forced-ENGAGED sibling (the percentile_scale_dist /
    // dedup_components_dist pattern): blockRows = 64 puts every
    // sf0.01 cell (~400 rows) over the block, so the triangle-
    // decomposed pair join (m ≥ 7, dormant at the gate tier under
    // the 2048 default) is itself held to the full DuckDB oracle.
    // Same fn, same SQL: chunking must be invisible in the output.
    // (The census-engaged route earns the same treatment through
    // dedup_embed_lsh_chunked.)
    "semantic_dedup_chunked" -> QDef(
      semanticDedupFn(blockRows = 64), SemanticDedupSql),

    // Int8 scalar quantization (the SQ8 codec of the standard vector
    // stores: 4× smaller than float32, 8× smaller than the double
    // form): per-vector max-abs scale, code_i = floor(127·x_i/maxabs
    // + 0.5). floor(+0.5) instead of round() so Spark and DuckDB
    // round identically (their ROUND tie rules differ); codes are
    // integers → hash-exact. Emitted comma-joined (the array type
    // itself isn't SQL-comparable — same trade as aov_vector's cell
    // dump). One narrow projection, no shuffle, scan-fused.
    "embed_quantize" -> QDef(
      (s, d) => {
        val v = col("embedding").cast("array<double>")
        Tables.load(s, d, "embeddings")
          .select(col("vec_id"), v.as("v"))
          .withColumn("maxabs",
            array_max(transform(col("v"), x => abs(x))))
          .select(col("vec_id"), round(col("maxabs"), 6).as("scale"),
            sq8Codes(col("v"), col("maxabs")).as("codes"))
      },
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        "m AS (SELECT vec_id, v, " +
        "list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e) " +
        "SELECT vec_id, ROUND(maxabs, 6) AS scale, " +
        "array_to_string(list_transform(v, x -> CASE WHEN maxabs = 0 " +
        "THEN 0 ELSE CAST(floor(x * 127.0 / maxabs + 0.5) AS INT) " +
        "END), ',') AS codes FROM m"),

    // Top-k search over the SQ8-quantized corpus — the end-to-end
    // composition embed_quantize exists for: the scan side holds int8
    // codes + one scale (≈1/4 the float32 footprint, ≈1/8 of double),
    // dequantizes on the fly (code·maxabs/127, a narrow codegen'd
    // projection), and ranks by exact cosine against raw broadcast
    // queries. Dequantization is deterministic arithmetic on integers
    // → the whole path is SQL-expressible and hash-checked, unlike
    // the probabilistic ANN families. Quantized recall vs the exact
    // top-10 is pinned in DedupSimilaritySpec territory by the oracle
    // itself being the quantized ground truth.
    "knn_sq8" -> QDef(
      (s, d) => {
        val raw = Tables.load(s, d, "embeddings")
        val step = knnProbeStep(raw.count())
        val e = raw
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("maxabs",
            array_max(transform(col("v"), x => abs(x))))
          .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        // corpus side: int codes + scale only (what an SQ8 index
        // stores); the codec expression is the shared [[sq8CodeInts]]
        val codes = e.select(col("vec_id"),
          (col("maxabs") / 127.0).as("step"),
          sq8CodeInts(col("v"), col("maxabs")).as("q"))
        val deq = codes.select(col("vec_id"),
          transform(col("q"), c => c * col("step")).as("dv"))
          .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
        val queries = e.where(pmod(col("vec_id"), lit(step)) === 0)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        // same streamed bounded-heap search as knn_cosine, over the
        // dequantized corpus — the raw-query-vs-SQ8-index asymmetry
        // is in the inputs, not the search shape
        streamedTopK(
          deq.select(col("vec_id"), col("dv"), col("dn")),
          collectQueries(queries), k = 10)
      },
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        "m AS (SELECT vec_id, v, " +
        "list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e), " +
        "c AS (SELECT vec_id, maxabs / 127.0 AS step, " +
        "list_transform(v, x -> CASE WHEN maxabs = 0 THEN 0 ELSE " +
        "CAST(floor(x * 127.0 / maxabs + 0.5) AS INT) END) AS q " +
        "FROM m), " +
        "dq AS (SELECT vec_id, list_transform(q, x -> x * step) " +
        "AS dv FROM c), " +
        "dn AS (SELECT vec_id, dv, " +
        "sqrt(list_dot_product(dv, dv)) AS dnrm FROM dq), " +
        "qs AS (SELECT vec_id AS q_id, v AS qv, " +
        "sqrt(list_dot_product(v, v)) AS qn FROM e " +
        s"WHERE vec_id % $KnnProbeStepSql = 0), " +
        "p AS (SELECT q_id, vec_id AS neighbor_id, " +
        "list_dot_product(qv, dv) / (qn * dnrm) AS cos " +
        "FROM qs CROSS JOIN dn WHERE vec_id <> q_id), " +
        "r AS (SELECT q_id, neighbor_id, cos, row_number() OVER (" +
        "PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk " +
        "FROM p) " +
        "SELECT q_id, neighbor_id, CAST(rnk AS INT) AS nn_rank, " +
        "ROUND(cos, 6) AS cosine FROM r WHERE rnk <= 10"),

    // LSH-bucketed near-dup dedup — the scale-safe candidate generator
    // ([[Similarity.lshDedupPairs]]): corpus indexed into L hyperplane
    // tables, pairs generated within buckets only, exact-cosine verify.
    // The synthetic embeddings have no natural pairs in the near-dup
    // regime (max cos ≈ 0.6), so the query plants deterministic
    // duplicate probes — every 10th vector re-appears scaled ×2 (same
    // direction ⇒ same hyperplane signs ⇒ same bucket in EVERY table,
    // so LSH recall on the probes is structurally 1.0, not
    // probabilistic) — and returns all pairs at cos ≥ 0.95. Because
    // recall is exactly 1.0, the output equals the exact all-pairs
    // pipeline and DuckDB recomputes it as a full hash oracle: the
    // driver-checkable recall gate the r2 verdict asked for.
    // Probe ids are NEGATIVE (-vec_id - 1): disjoint from any real
    // non-negative id space at any corpus size, unlike an additive
    // offset which aliases once ids pass it.
    // probes = 2 (r7): each row also probes its least-margin 1-bit-flip
    // bucket, catching boundary pairs that land one bit apart in every
    // table. The oracle is unchanged — multi-probe only ADDS candidates
    // and every candidate is exact-cosine-verified, so the output still
    // equals the exact all-pairs answer the SQL recomputes.
    // r13: the default blockRows=2048 census-gated auto-chunk applies —
    // the planted ×2 probes share direction with their originals, so no
    // bucket exceeds the block at any tier (census max 1,287 at 2M
    // vectors) and the plan stays the r12 windowed short-circuit
    // (3 shuffles, PlanShapeSpec-pinned); a genuinely hot bucket now
    // chunks (see dedup_embed_lsh_chunked) instead of running as one
    // guarded task.
    "dedup_embed_lsh" -> QDef(
      embedLshFn(blockRows = 2048), EmbedLshSql),
    // Forced census-ENGAGED sibling (the oracle gate the r12 verdict's
    // item 1 asked the auto-chunk machinery to earn, mirroring how
    // semantic_dedup_chunked gates the windowed route): blockRows = 64
    // puts the sf0.01 mean bucket (~70 home+probe rows at nBits 6)
    // over the block, so the eager census collects the hot buckets and
    // the auto-chunk route — broadcast literal counts, map-side chunk
    // keys, payload exchanges keyed directly on (tbl, bucket, __i,
    // __j), no window — is itself held to the full DuckDB oracle.
    // Same fn, same SQL: the census engage must be invisible in the
    // output. The m-fold replica exchange is the forced-witness cost;
    // the DEFAULT never pays it on a clean census.
    "dedup_embed_lsh_chunked" -> QDef(
      embedLshFn(blockRows = 64, engageRows = 64), EmbedLshSql)
  )

  /** The dedup_embed_lsh gate body, parameterized on blockRows so the
    * forced census-engaged sibling runs the IDENTICAL workload with
    * auto-chunking tripped (the pair set is the same, so both entries
    * share one oracle SQL). */
  private def embedLshFn(blockRows: Int, engageRows: Int = 4096)
      : (org.apache.spark.sql.SparkSession, String) => DataFrame =
    (s, d) => {
      val e = Tables.load(s, d, "embeddings")
      val probes = e.where(col("vec_id") % 10 === 0)
        .select((-col("vec_id") - 1).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(2.0f))
            .as("embedding"))
      // adaptive nBits (floor 6 = the old constant at gate scale):
      // buckets track corpus size so within-bucket pair generation
      // stays sub-quadratic at the 200k-vector tier and beyond. The
      // ×2-scaled planted probes sit at cosine exactly 1.0 — they
      // collide with their originals in EVERY table at any nBits, so
      // the oracle's planted-pair rows are parameter-independent.
      // one count serves both adaptive nBits and the self-sized
      // verify exchange (~1.1n rows after the planted-probe union)
      val n = e.count()
      Similarity.lshDedupPairs(e.unionByName(probes),
          threshold = 0.95,
          nBits = Similarity.adaptiveNBits(n), probes = 2,
          sizeHint = Some(n + n / 10 + 1), blockRows = blockRows,
          engageRows = engageRows)
        .select(col("a_id"), col("b_id"),
          round(col("cos"), 6).as("cosine"))
    }

  /** The shared DuckDB replay for both dedup_embed_lsh entries — the
    * exact all-pairs answer (recall is structurally 1.0 on the
    * planted probes), for the clean-census default and the forced
    * census-engaged route alike. (A `def`, not a `val`: it sits
    * below the registry map in source order, and a forward `val`
    * reference is null at map construction.) */
  private def EmbedLshSql: String =
    "WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v " +
      "FROM embeddings), " +
      "probes AS (SELECT -vec_id - 1 AS vec_id, label, " +
      "list_transform(v, x -> x * 2.0) AS v FROM e " +
      "WHERE vec_id % 10 = 0), " +
      "u AS (SELECT vec_id, v FROM e " +
      "UNION ALL SELECT vec_id, v FROM probes), " +
      "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm " +
      "FROM u), " +
      "p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
      "list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos " +
      "FROM n a JOIN n b ON a.vec_id < b.vec_id) " +
      "SELECT a_id, b_id, ROUND(cos, 6) AS cosine FROM p " +
      "WHERE cos >= 0.95"
}
