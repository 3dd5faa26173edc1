package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  /** Ground truth: exact blocked 3-gram Jaccard pairs ≥ 0.8. */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val base = docs.select(col("doc_id"),
      TextQueries.shingles3(col("text")).as("sh"))
    base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))) /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .where(col("j") >= 0.8)
      .select("a.doc_id", "b.doc_id").as[(Long, Long)].collect().toSet
  }

  test("minhashDedup finds high-similarity pairs with high recall " +
    "and exact-verified precision") {
    val found = Dedup.minhashDedup(docs, "doc_id", "text",
      threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty) // testdata contains near-dups
    // precision is exact (candidates are verified with true Jaccard)
    assert(found.subsetOf(exactPairs))
    // recall: 8 bands × 4 rows at j≥0.8 → p(miss) ≤ (1-.8^4)^8 ≈ 0.9%/pair
    val recall = found.size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall over ${exactPairs.size} pairs")
  }

  test("managed pipelines: no cached relation outlives its query " +
    "once released (two sequential queries, storage drained after " +
    "each)") {
    def cachedBlocks: Int = spark.sparkContext.getRDDStorageInfo.length
    // a corpus unique to this test: CacheManager dedupes identical
    // plans, so reusing `docs` would hit (and then release!) cache
    // entries other tests legitimately left behind
    val corpus = (1 to 60).map { i =>
      val base = s"sentence $i about topic ${i % 7} with shared words"
      (i.toLong, if (i % 2 == 0) base else base + " tail")
    }.toDF("doc_id", "text")
    val baseline = cachedBlocks
    // query 1: minhash near-dup
    val m1 = Dedup.minhashDedupManaged(corpus, "doc_id", "text",
      threshold = 0.8)
    assert(m1.df.count() >= 0)
    assert(cachedBlocks > baseline,
      "shingle relation should be cached while the query runs")
    m1.release(blocking = true)
    assert(cachedBlocks === baseline,
      "released pipeline must leave no cached blocks behind")
    // query 2: cross-relation decontamination in the same session —
    // the accumulation scenario the unmanaged form is prone to
    val ev = corpus.limit(20)
      .select(col("doc_id").as("eval_id"), col("text"))
    val m2 = Dedup.crossMinhashMatchesManaged(ev, corpus, "eval_id",
      "doc_id", "text", threshold = 0.8)
    assert(m2.df.count() >= 0)
    m2.release(blocking = true)
    assert(cachedBlocks === baseline,
      "second query's blocks must drain too — no accumulation")
    // and the Bloom-prefiltered contamination path
    val m3 = TextQueries.contaminationCheckBloomManaged(ev, corpus,
      "eval_id", "text", expectedItems = 100000)
    assert(m3.df.count() >= 0)
    m3.release(blocking = true)
    assert(cachedBlocks === baseline)
  }

  test("simhash64 is deterministic and order-insensitive enough " +
    "for identical token multisets") {
    val a = Dedup.simhash64(Seq("x", "y", "z"))
    assert(a === Dedup.simhash64(Seq("x", "y", "z")))
    assert(a === Dedup.simhash64(Seq("z", "x", "y"))) // bag semantics
    assert(a !== Dedup.simhash64(Seq("completely", "different", "words")))
  }

  test("simhashDedup flags permuted near-identical docs") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 word off
      (3L, "totally unrelated content about something else entirely x")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashDedup(d, "doc_id", "text", maxHamming = 12)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("annTopK approximates brute-force knn with decent recall@10") {
    val indexed = Similarity.index(emb, 6, 64, tables = 4).cache()
    val queries = indexed.where(col("id") % 50 === 0)
    val approx = Similarity.annTopK(indexed, queries, 10, 6)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = {
      val e = VectorQueries.withNorm(emb)
      val q = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          (VectorQueries.dot(col("qv"), col("v")) /
            (col("qn") * col("nrm"))).as("cos"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // multi-probe over 8-bit buckets on 500 vectors: modest but real
    assert(mean >= 0.3, s"mean recall@10 = $mean")
    assert(exact.keySet === approx.keySet)
  }

  test("annTopK/ivfTopK probe-route equality: shuffle join (large " +
    "queryRowsHint) returns exactly the kernel route's rows") {
    // the sf0.01 gate only ever takes the kernel route (its query
    // hints sit under the 50k threshold), so the shuffle route —
    // the one a 100-TB probe set actually uses — needs its own
    // equality pin on the same inputs
    val indexed = Similarity.index(emb, 6, 64, tables = 4).cache()
    val queries = indexed.where(col("id") % 50 === 0)
    // collect-and-compare, not exceptAll: Spark 4.1's exceptAll
    // rewrite trips an INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on these
    // window-limit plans; the result sets are tiny by construction
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("q_id"), col("neighbor_id"), col("nn_rank"))
        .as[(Long, Long, Int)].collect().toSet
    val bcast = rows(Similarity.annTopK(indexed, queries, 10, 6,
      queryRowsHint = None))
    val shuf = rows(Similarity.annTopK(indexed, queries, 10, 6,
      queryRowsHint = Some(Long.MaxValue)))
    assert(bcast === shuf && bcast.nonEmpty)
    val (cents, ivfIdx) = Similarity.ivfIndex(emb, nlist = 8)
    val q2 = ivfIdx.where(col("id") % 50 === 0)
    val b2 = rows(Similarity.ivfTopK(cents, ivfIdx, q2, 10, 3,
      queryRowsHint = None))
    val s2 = rows(Similarity.ivfTopK(cents, ivfIdx, q2, 10, 3,
      queryRowsHint = Some(Long.MaxValue)))
    assert(b2 === s2 && b2.nonEmpty)
  }

  test("PQ: encode is partition-stable; ADC recall vs exact L2; " +
    "decoded query ranks an identical-code vector first at adc 0") {
    val cbs = Similarity.pqTrain(emb, dim = 64, m = 16, ksub = 16)
    val codes = Similarity.pqEncode(emb, cbs).cache()
    // determinism: the code table is a pure per-row function
    val a = codes.as[(Long, Seq[Int])].collect().toMap
    val b = Similarity.pqEncode(emb.repartition(7), cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a === b)
    // ADC recall@10 vs exact L2 (PQ ranks by squared L2, so the truth
    // set must too — cosine truth would punish the metric, not the op)
    val queries = VectorQueries.withNorm(emb)
      .where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("v"))
    val approx = Similarity.pqTopK(codes, cbs, queries, k = 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = {
      val e = VectorQueries.withNorm(emb)
      val q = e.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val l2 = {
        val d = VectorQueries.dot(col("qv"), col("v"))
        val qq = VectorQueries.dot(col("qv"), col("qv"))
        val vv = VectorQueries.dot(col("v"), col("v"))
        qq + vv - lit(2.0) * d
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("l2"), col("neighbor_id"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          l2.as("l2"))
        .withColumn("r", row_number().over(w)).where(col("r") <= 10)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // 16 centroids × 16 subspaces on clustered 64-dim data: coarse but
    // must stay far above chance (10/500 ≈ 0.02)
    assert(mean >= 0.3, s"mean ADC recall@10 = $mean")
    // symmetric-distance sanity: a query decoded from vector x's own
    // code is at squared-L2 exactly 0 from x's reconstruction, so x
    // (or an identical-code vector) must rank first with adc 0.0
    val grid = Similarity.gridCodebooks(dim = 64)
    val gcodes = Similarity.pqEncode(emb, grid)
    val q0 = Similarity.pqDecode(gcodes.where(col("id") === 0), grid)
    val top = Similarity.pqTopK(gcodes, grid, q0, k = 1)
      .select("neighbor_id", "adc").as[(Long, Double)].collect()
    val codeOf0 = gcodes.where(col("id") === 0)
      .as[(Long, Seq[Int])].collect()(0)._2
    val sameCode = gcodes.where(col("id") =!= 0)
      .as[(Long, Seq[Int])].collect().filter(_._2 == codeOf0)
      .map(_._1)
    if (sameCode.nonEmpty) {
      assert(top(0)._2 === 0.0)
      assert(top(0)._1 === sameCode.min)
    } else {
      assert(top(0)._2 > 0.0) // unique code: nearest is a real neighbor
    }
  }

  test("IVF-PQ composition: ADC within probed cells only, recall " +
    "tracks the cell-restricted truth") {
    // the composition the pqTopK scaladoc claims: assign cells with
    // the IVF quantizer, PQ-encode the corpus, and ADC-rank ONLY the
    // codes in each query's nprobe closest cells — the scan then
    // touches a cell-pruned code table (IVF-PQ, the FAISS default).
    val (centroids, indexed) = Similarity.ivfIndex(emb, nlist = 8)
    val cbs = Similarity.pqTrain(emb, dim = 64, m = 16, ksub = 16)
    val codes = Similarity.pqEncode(emb, cbs)
      .join(indexed.select("id", "cell"), Seq("id"))
    val queries = indexed.where(col("id") % 50 === 0)
    val nprobe = 4
    val probeCells = {
      val qc = queries.select("id", "v").as[(Long, Seq[Double])]
        .collect()
      qc.map { case (qid, v) =>
        qid -> centroids.zipWithIndex.map { case (c, i) =>
          (i, c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.sortBy(_._2).take(nprobe).map(_._1).toSet
      }.toMap
    }
    val results = probeCells.map { case (qid, cells) =>
      val q = Similarity.pqDecode(
        Similarity.pqEncode(emb.where(col("vec_id") === qid), cbs),
        cbs)
      val cellCodes = codes.where(col("cell")
        .isin(cells.toSeq.map(_.asInstanceOf[Any]): _*))
      val top = Similarity.pqTopK(cellCodes, cbs, q, k = 5)
        .select("neighbor_id").as[Long].collect().toSet
      // every returned neighbor must come from a probed cell
      val fromCells = indexed
        .where(col("id").isin(top.toSeq.map(_.asInstanceOf[Any]): _*))
        .select("cell").as[Int].collect().toSet
      assert(fromCells.subsetOf(cells), s"q$qid leaked cells")
      qid -> top
    }
    assert(results.nonEmpty && results.values.forall(_.nonEmpty))
  }

  test("ivfPqTopK: one-pass index matches join-built codes, and at " +
    "nprobe = nlist equals plain pqTopK over the full code table") {
    val cbs = Similarity.pqTrain(emb, dim = 64, m = 16, ksub = 16)
    val (centroids, codes) = Similarity.ivfPqIndex(emb, nlist = 8, cbs)
    // the one-pass (id, code, cell) table must equal the two-pass
    // join of pqEncode with ivfIndex's cell assignment
    val (c2, indexed) = Similarity.ivfIndex(emb, nlist = 8)
    assert(centroids.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val joined = Similarity.pqEncode(emb, cbs)
      .join(indexed.select("id", "cell"), Seq("id"))
      .select("id", "code", "cell").as[(Long, Seq[Int], Int)]
      .collect().toSet
    val onePass = codes.select("id", "code", "cell")
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(onePass === joined)
    // probing EVERY cell removes the IVF restriction: ivfPqTopK must
    // then return exactly what pqTopK returns on the full table
    val queries = indexed.where(col("id") % 50 === 0)
      .select("id", "v")
    val full = Similarity.pqTopK(codes.select("id", "code"), cbs,
      queries, k = 10)
      .select("q_id", "neighbor_id", "nn_rank")
      .as[(Long, Long, Int)].collect().toSet
    val composed = Similarity.ivfPqTopK(centroids, codes, cbs,
      queries, k = 10, nprobe = 8)
      .select("q_id", "neighbor_id", "nn_rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(composed === full)
    // and with a restrictive probe, every neighbor comes from one of
    // the query's nprobe closest cells
    val cellOf = codes.select("id", "cell").as[(Long, Int)]
      .collect().toMap
    val probed = Similarity.ivfPqTopK(centroids, codes, cbs,
      queries, k = 10, nprobe = 2)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect()
    val qVecs = queries.as[(Long, Seq[Double])].collect().toMap
    probed.foreach { case (qid, nid) =>
      val cells = centroids.zipWithIndex.map { case (c, i) =>
        (i, c.zip(qVecs(qid)).map { case (a, b) =>
          (a - b) * (a - b) }.sum)
      }.sortBy(_._2).take(2).map(_._1).toSet
      assert(cells.contains(cellOf(nid)), s"q$qid leaked cell")
    }
  }

  test("IVF top-k recall improves with nprobe, hits 1.0 at full probe") {
    val (model, indexed) = Similarity.ivfIndex(emb, nlist = 8)
    val cached = indexed.cache()
    val queries = cached.where(col("id") % 50 === 0)
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(model, cached, queries, 10, nprobe)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = {
        val e = VectorQueries.withNorm(emb)
        val q = e.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id")
          .orderBy(col("cos").desc, col("neighbor_id"))
        e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            (VectorQueries.dot(col("qv"), col("v")) /
              (col("qn") * col("nrm"))).as("cos"))
          .withColumn("r", row_number().over(w)).where(col("r") <= 10)
          .select("q_id", "neighbor_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      }
      val rs = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size / 10.0
      }
      rs.sum / rs.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8) // all cells probed → exhaustive → exact
    assert(r8 === 1.0, s"full-probe recall $r8")
    assert(r2 > 0.2 && r2 <= r8, s"recall@nprobe=2 $r2")
  }

  test("dupComponents collapses transitive chains to one canonical id " +
    "and leaves unrelated clusters apart — on BOTH routes") {
    // 1-2-3-4 is a CHAIN (pairwise dedup alone would under-delete);
    // 7-8 is separate; 9 appears in no pair and must not appear.
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (7L, 8L))
      .toDF("a_id", "b_id")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L)
    // default route: 4 edges → driver union-find
    val comp = Dedup.dupComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp === want)
    // forced distributed route: identical rows
    val compD = Dedup.dupComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(compD === want)
    // survivors = canonical ids; everything else drops
    val drops = comp.filter { case (id, c) => id != c }.keySet
    assert(drops === Set(2L, 3L, 4L, 8L))
  }

  test("dupComponents converges on a long chain (alternating stars)") {
    val n = 64
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = Dedup.dupComponents(pairs, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect()
    assert(comp.length === n)
    assert(comp.forall(_._2 === 1L), "all chain nodes label to the min")
  }

  test("dupComponents converges fast on a DESCENDING-id chain — the " +
    "shape that degraded min-propagation + label-jump to 1 hop/round") {
    // ids fall along the chain (min at the far end), so every interior
    // node is a local min of its suffix: the old label-jump was the
    // identity there and the 512-link chain needed >500 rounds; the
    // alternating-star contraction halves chains per round
    val n = 512L
    val pairs = (1L until n).map(i => (n - i + 1, n - i))
      .toDF("a_id", "b_id")
    val comp = Dedup.dupComponents(pairs, maxIter = 15,
      driverEdgeLimit = 0L).as[(Long, Long)].collect()
    assert(comp.length === n)
    assert(comp.forall(_._2 === 1L), "all chain nodes label to the min")
  }

  test("dupComponents equals brute-force union-find on random graphs " +
    "— BOTH routes") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val nNodes = 200
      // sparse random ids (not 1..n) so component minima are arbitrary
      val ids = Array.fill(nNodes)(rnd.nextLong(1000000L)).distinct
      val es = (1 to 260).map { _ =>
        val a = ids(rnd.nextInt(ids.length))
        val b = ids(rnd.nextInt(ids.length))
        (a, b)
      }.filter(p => p._1 != p._2)
      // default route (driver union-find at this size)
      val got = Dedup.dupComponents(es.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      // forced distributed alternating-star route
      val gotD = Dedup.dupComponents(es.toDF("a_id", "b_id"),
          driverEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = es.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(got === want, s"trial $trial (driver route)")
      assert(gotD === want, s"trial $trial (distributed route)")
    }
  }

  test("lshDedupPairs: full recall on planted scaled duplicates, " +
    "exact precision vs brute force") {
    // Scaled copies keep the direction, hence every hyperplane sign,
    // hence the bucket in EVERY table — recall on them is structural,
    // not probabilistic (the dedup_embed_lsh oracle relies on this).
    val probes = emb.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val u = emb.unionByName(probes)
    val found = Similarity.lshDedupPairs(u, threshold = 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val n = VectorQueries.withNorm(u)
    val exact = n.as("a").join(n.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (VectorQueries.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(found === exact,
      s"LSH dedup must equal brute force: missed ${exact -- found}, " +
        s"spurious ${found -- exact}")
  }

  test("lshDedupPairs multi-probe (probes=2) recovers boundary twins " +
    "p=1 misses, is a superset of p=1, and stays exact vs brute force") {
    // Noisy twins at cos ≈ 0.96 sit near hyperplane boundaries: unlike
    // the scaled copies above (same direction ⇒ same bucket in EVERY
    // table, structural recall 1.0), a twin's least-margin bit flips
    // with real probability, so with fixed seeds some planted pairs
    // land one bit apart in ALL 4 tables and p=1 deterministically
    // misses them. p=2 probes exactly that least-margin flip and must
    // (a) find a strict superset of p=1's pairs, (b) recover at least
    // one planted pair p=1 missed, (c) still equal a subset of the
    // brute-force truth (precision exact — every candidate is
    // exact-cosine-verified).
    val rnd = new scala.util.Random(7)
    val base = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val twins = base.map { case (id, v) =>
      val g = Array.fill(v.length)(rnd.nextGaussian())
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      val gn = math.sqrt(g.map(x => x * x).sum)
      // twin = v/|v| + 0.27·g/|g| → cos ≈ 1/sqrt(1+0.27²) ≈ 0.965
      // (± the |v|-component of g), straddling the 0.95 threshold
      val tw = v.indices.map(i =>
        (v(i) / vn + 0.27 * g(i) / gn).toFloat)
      (-id - 1, tw)
    }
    val u = base.toSeq.toDF("vec_id", "embedding")
      .unionByName(twins.toSeq.toDF("vec_id", "embedding"))
    def run(p: Int) = Similarity.lshDedupPairs(
        u.withColumn("label", lit(0)), threshold = 0.95, probes = p)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val found1 = run(1)
    val found2 = run(2)
    // exact ground truth (brute force over the 1000-vector union)
    val n = VectorQueries.withNorm(
      u.withColumn("label", lit(0)))
    val exact = n.as("a").join(n.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (VectorQueries.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = exact.filter { case (a, b) => a == -b - 1 || b == -a - 1 }
    assert(planted.size > 100, s"planted in-threshold twins: ${planted.size}")
    assert(found1.subsetOf(exact) && found2.subsetOf(exact),
      "multi-probe must not break exact precision")
    assert(found1.subsetOf(found2),
      s"p=2 lost pairs p=1 had: ${found1 -- found2}")
    val missed1 = planted -- found1
    val recovered = missed1.intersect(found2)
    assert(missed1.nonEmpty,
      "seed no longer plants a cross-bucket twin; re-tune noise/seed")
    assert(recovered.nonEmpty,
      s"p=2 recovered none of the ${missed1.size} twins p=1 missed")
  }

  test("lshDedupPairs sizeHint: self-sized verify exchange changes " +
    "the partition COUNT only — rows identical, count per the " +
    "64 MB/task formula, no added exchange") {
    val u = emb.limit(500)
    def run(hint: Option[Long]) = Similarity.lshDedupPairs(
      u, threshold = 0.95, probes = 2, sizeHint = hint)
    val base = run(None)
    // hint sized so the formula exceeds defaultParallelism:
    // 2e6 rows x 4 tables x 2 probes x (8*64+128) B / 64 MiB + 1 = 153
    // (the index shuffles vectors as array<double> — 8 B/element)
    val hinted = run(Some(2000000L))
    val expected = (2000000L * 4 * 2 * (8L * 64 + 128) /
      (64L << 20)).toInt + 1
    assert(expected > spark.sparkContext.defaultParallelism)
    val baseRows = base.collect().map(_.toSeq).toSet
    val hintedPlan = hinted.queryExecution.executedPlan
    val hintedRows = hinted.collect().map(_.toSeq).toSet
    assert(hintedRows === baseRows, "partitioning must not change rows")
    val planStr = hintedPlan.toString
    assert(planStr.contains(s"hashpartitioning(tbl") &&
      planStr.contains(s", $expected)"),
      s"sized exchange hashpartitioning(tbl, bucket, $expected) " +
        s"missing from plan:\n$planStr")
    // the explicit repartition must REPLACE the session-default
    // exchange under the window+join, not add one: exchange count
    // matches the unhinted plan's (both plans are final here — each
    // side was collected above, so AQE has materialized them)
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Int =
      "Exchange ".r.findAllIn(p.toString).length
    val basePlan = base.queryExecution.executedPlan
    assert(exchanges(hintedPlan) == exchanges(basePlan),
      "sizeHint added an exchange instead of sizing the existing one")
  }

  test("semanticDedup sizeHint: sized route returns identical rows; " +
    "sizedByHint picks the formula count past the session default " +
    "and stays out below it") {
    // integration: the sized cell exchange feeds the pairs stage,
    // which dupComponents' driver gate materializes internally, so
    // the pin here is row equality (the LSH sizeHint test pins the
    // plan shape of the shared sizedByHint wiring end-to-end)
    val u = emb.limit(300)
    val cents = u.where(col("vec_id") % 60 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def run(hint: Option[Long]) = Similarity.semanticDedup(
      u, cents, threshold = 0.44, sizeHint = hint)
    val baseRows = run(None).collect().map(_.toSeq).toSet
    val hintedRows = run(Some(1000000L)).collect().map(_.toSeq).toSet
    assert(hintedRows === baseRows, "partitioning must not change rows")
    // unit: the rule itself — formula count when the estimate is past
    // the spill bar (>4× session ⇔ >256 MB/task at the session
    // count), untouched plan otherwise
    val df = emb.limit(50).select(col("vec_id"),
      lit(0L).as("cell"))
    // 1e7 items x 1 row x (8*64+128) B / 64 MiB + 1 = 96 parts > 16
    val expected = (10000000L * (8L * 64 + 128) / (64L << 20)).toInt + 1
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    assert(expected > 4 * sessionParts)
    val sized = Similarity.sizedByHint(df, Some(10000000L),
      rowsPerItem = 1L, dim = 64, keys = Seq("cell"))
    assert(sized.rdd.getNumPartitions === expected,
      "sized route must repartition to the formula count")
    val small = Similarity.sizedByHint(df, Some(100L),
      rowsPerItem = 1L, dim = 64, keys = Seq("cell"))
    assert(small.queryExecution.logical ===
      df.queryExecution.logical,
      "a hint under the session default must leave the plan untouched")
    // BETWEEN the session default and the spill bar (1e6 → 10 parts,
    // 4 < 10 ≤ 16): the r11 engage gate must stay out — a forced
    // exchange below ~256 MB/task only loses (the MinhashSizeScale
    // measurement in sizedByBytes's scaladoc)
    val mid = Similarity.sizedByHint(df, Some(1000000L),
      rowsPerItem = 1L, dim = 64, keys = Seq("cell"))
    assert(mid.queryExecution.logical === df.queryExecution.logical,
      "a hint under the spill bar must leave the plan untouched")
    val none = Similarity.sizedByHint(df, None,
      rowsPerItem = 1L, dim = 64, keys = Seq("cell"))
    assert(none.queryExecution.logical === df.queryExecution.logical)
  }

  test("semanticDedup pair-join chunking: a hot cell split into m " +
    "chunks yields the identical verdict set (r11 compute-skew fix)") {
    // ONE centroid → every row in one cell: the worst hot-cell case
    // the triangle decomposition exists for (a cell-hashed pair join
    // puts the whole cell's |c|²/2 dot products in one task; AQE
    // cannot split it because the skew is flops, not bytes —
    // DevJobProfile measured a 0.9 s single-task straggler at the
    // 200k-vector tier). blockRows=32 over ~330 rows forces m ≥ 11
    // (55+ chunk-pair tasks). The pin is pair LOSS: a pair whose
    // chunk replicas never share a (cell, i, j) key would drop its
    // edge and split a duplicate cluster. (Pair DUPLICATION is
    // output-invisible here — dupComponents is set-based — but NOT
    // free: same-chunk pairs share every replica task, so the joins
    // carry the chunkCanonical predicate; the exactly-once test
    // below pins that each pair is evaluated in precisely one task.)
    val u = emb.limit(300)
    val plants = u.where(col("vec_id") % 10 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        col("embedding"))
    val all = u.unionByName(plants)
    val cents = u.limit(1)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def run(blockRows: Int, auto: Boolean) = Similarity.semanticDedup(
      all, cents, threshold = 0.44, blockRows = blockRows,
      autoChunk = auto)
      .collect().map(_.toSeq).toSet
    val reference = run(Int.MaxValue, auto = false) // m = 1 everywhere
    val chunked = run(32, auto = false) // legacy window route
    val auto = run(32, auto = true) // census route, engaged (330 > 32)
    assert(chunked === reference,
      "chunking must be invisible in the verdicts")
    assert(auto === reference,
      "census auto-chunking must be invisible in the verdicts")
    assert(reference.exists(r => r(3) == 0),
      "the planted copies must produce at least one dropped row — " +
        "otherwise the equality is vacuous")
  }

  test("lshDedupPairs pair-join chunking: hot-bucket triangle " +
    "decomposition yields the identical pair set, including the " +
    "asymmetric home-only b-side at probes=2") {
    // nBits=2 → 4 buckets/table: ~75-row buckets on a 300-row corpus,
    // so blockRows=16 forces m ≥ 5 everywhere. probes=2 exercises the
    // asymmetry (a-side home+probe rows, b-side home-only) — both
    // sides must share the per-bucket chunk count computed BEFORE the
    // kind filter.
    val u = emb.limit(300)
    val plants = u.where(col("vec_id") % 10 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        col("embedding"))
    val all = u.unionByName(plants) // exact copies → cos = 1 pairs
    def run(blockRows: Int, auto: Boolean) = Similarity.lshDedupPairs(
      all, threshold = 0.999, nBits = 2, probes = 2,
      blockRows = blockRows, engageRows = blockRows, autoChunk = auto)
      .collect().map(_.toSeq).toSet
    val reference = run(Int.MaxValue, auto = false)
    val chunked = run(16, auto = false) // legacy window route
    val auto = run(16, auto = true) // census route, every bucket hot
    assert(chunked === reference,
      "chunking must be invisible in the pair set")
    assert(auto === reference,
      "census auto-chunking must be invisible in the pair set")
    assert(reference.nonEmpty,
      "the fixture must produce pairs — otherwise the equality is " +
        "vacuous")
  }

  test("chunkForPairJoin + chunkCanonical: every pair matches in " +
    "EXACTLY one chunk task, and no pair is lost (r11 ADVICE — " +
    "same-chunk pairs carry identical replica sets, so without the " +
    "canonicity predicate they match in all m tasks)") {
    // one key group of 100 ids, blockRows=8 → m = 13 (91 chunk-pair
    // tasks); with ~8 rows/chunk every chunk holds same-chunk pairs
    val n = 100
    val df = spark.range(n).select(lit(0).as("grp"), col("id"))
    val chunked = Similarity.chunkForPairJoin(df, Seq("grp"), "id", 8)
    val perPair = chunked.as("a").join(chunked.as("b"),
        col("a.grp") === col("b.grp") &&
          col("a.__i") === col("b.__i") &&
          col("a.__j") === col("b.__j") &&
          Similarity.chunkCanonical("a", "b") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id"), col("b.id")).count()
      .select(col("count")).as[Long].collect()
    assert(perPair.length === n * (n - 1) / 2,
      "the chunked join must produce every unordered pair")
    assert(perPair.forall(_ == 1L),
      s"each pair must match exactly once, max=${perPair.max}")
    // the control: WITHOUT the predicate, duplication exists — pins
    // that the test (and the predicate) are non-vacuous
    val dup = chunked.as("a").join(chunked.as("b"),
        col("a.grp") === col("b.grp") &&
          col("a.__i") === col("b.__i") &&
          col("a.__j") === col("b.__j") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id"), col("b.id")).count()
      .where(col("count") > 1).count()
    assert(dup > 0,
      "fixture must contain same-chunk pairs the predicate deduplicates")
    // the census feed: the same exactly-once property when the count
    // arrives as a pre-materialized column (the broadcast-literal
    // census in the operators) instead of the window
    val fed = Similarity.chunkForPairJoin(
      df.withColumn("__bn", lit(100L)), Seq("grp"), "id", 8,
      cntCol = Some("__bn"))
    val perPairFed = fed.as("a").join(fed.as("b"),
        col("a.grp") === col("b.grp") &&
          col("a.__i") === col("b.__i") &&
          col("a.__j") === col("b.__j") &&
          Similarity.chunkCanonical("a", "b") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id"), col("b.id")).count()
      .select(col("count")).as[Long].collect()
    assert(perPairFed.length === n * (n - 1) / 2,
      "the census-fed chunked join must produce every unordered pair")
    assert(perPairFed.forall(_ == 1L),
      s"census-fed: each pair exactly once, max=${perPairFed.max}")
  }

  test("lshDedupPairs census auto-chunk: a planted over-blockRows " +
    "bucket engages map-side chunking — pair set identical to both " +
    "references, exactly ONE payload exchange keyed on the chunk " +
    "keys, and no count window (r12 verdict item 1)") {
    // 64 positive-scaled copies of one direction land in ONE bucket
    // per table (identical hyperplane signs at any nBits), so with
    // blockRows = 32 the census finds exactly those 4 (tbl, bucket)
    // groups hot (~65 rows, m ≥ 3) while the ~5-row natural buckets
    // stay on the m = 1 path — the mixed hot/cold case the auto
    // default exists for.
    val base = emb.limit(300)
    val one = base.limit(1).select(col("label"), col("embedding"))
    val plant = spark.range(64).crossJoin(one)
      .select((lit(1000000L) + col("id")).as("vec_id"), col("label"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + col("id").cast("float") * lit(0.001f)))
          .as("embedding"))
    val all = base.unionByName(plant)
    def run(blockRows: Int, auto: Boolean) = Similarity.lshDedupPairs(
      all, threshold = 0.999, blockRows = blockRows,
      engageRows = blockRows, autoChunk = auto)
    val reference =
      run(Int.MaxValue, auto = false).collect().map(_.toSeq).toSet
    val legacy = run(32, auto = false).collect().map(_.toSeq).toSet
    val autoDf = run(32, auto = true)
    val autoRows = autoDf.collect().map(_.toSeq).toSet
    assert(reference.size >= 64 * 63 / 2,
      "the planted copies must pair up — otherwise the test is vacuous")
    assert(legacy === reference,
      "legacy window chunking must be invisible in the pair set")
    assert(autoRows === reference,
      "census auto-chunking must be invisible in the pair set")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case qs: QueryStageExec => qs +: nodes(qs.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    // the verify-join payload exchange is the one shipping the vectors
    // ALREADY keyed by bucket — the narrow pre-kernel cpuRebalance
    // (round-robin, no bucket column) and the tiny census aggregation
    // (no vector column) don't count
    def payloadShuffles(df: org.apache.spark.sql.DataFrame) =
      nodes(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike
            if s.output.exists(_.name == "v") &&
              s.output.exists(_.name == "bucket") => s
      }
    def hasWindow(df: org.apache.spark.sql.DataFrame) =
      nodes(df.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    val hotShuffles = payloadShuffles(autoDf)
    // the r12 regression shape was SERIAL: a session-width chunk-key
    // exchange stacked ON TOP of the bucket-keyed payload exchange.
    // The census route keys its payload exchanges on the chunk keys
    // DIRECTLY (at most two SIBLING exchanges — Catalyst pushes the
    // b-side kind filter below its repartition, so the b-side ships
    // home rows only instead of reusing the a-side's full exchange);
    // a payload exchange nested inside another is the regression.
    assert(hotShuffles.nonEmpty && hotShuffles.size <= 2,
      s"census route: expected 1-2 sibling payload exchanges, got " +
        s"${hotShuffles.size}:\n${autoDf.queryExecution.executedPlan}")
    assert(hotShuffles.forall(
      _.outputPartitioning.toString.contains("__i")),
      "every payload exchange must be keyed on the chunk join keys")
    assert(hotShuffles.forall(s =>
      s.children.flatMap(nodes).forall {
        case c: ShuffleExchangeLike =>
          !(c.output.exists(_.name == "v") &&
            c.output.exists(_.name == "bucket"))
        case _ => true
      }),
      "a payload exchange is stacked on another payload exchange — " +
        "the r12 serial double-shuffle is back:\n" +
        autoDf.queryExecution.executedPlan)
    assert(!hasWindow(autoDf),
      "census route must not compute a count window")
    // the clean-census default (blockRows = 2048, nothing hot): the
    // census buys the PROOF, not a plan change — the r12 windowed
    // short-circuit plan verbatim (the prune window doubles as the
    // reuse anchor and pushdown barrier; PlanShapeSpec pins its 3
    // shuffles), so exactly one bucket-keyed payload exchange and no
    // chunk keys anywhere
    val clean = run(2048, auto = true)
    clean.collect()
    val cleanShuffles = payloadShuffles(clean)
    assert(cleanShuffles.size === 1,
      "clean census must keep the single shared bucket-keyed " +
        s"exchange:\n${clean.queryExecution.executedPlan}")
    assert(
      !cleanShuffles.head.outputPartitioning.toString.contains("__i"),
      "clean census must not pay chunk keys in the exchange")
    assert(hasWindow(clean),
      "clean census must keep the r12 windowed plan (the window is " +
        "the exchange-reuse anchor)")
  }

  test("pruneHomeProbe: probe inflow never kills a bucket's home rows " +
    "(r7 ADVICE №2 — multi-probe only ADDS candidates)") {
    // (tbl=0, bucket b) populations; cap = 4
    //   b=1: 3 home + 5 probe — home under cap: home KEPT (a combined
    //        count, 8 > 4, would have dropped everything — the
    //        pre-fix regression); probe inflow 5 > cap: probes dropped
    //   b=2: 3 home + 2 probe — both under cap: all 5 kept
    //   b=3: 5 home — over cap: dropped entirely (p=1 semantics)
    val rows =
      (1 to 3).map(i => (0, 1, 0, i.toLong)) ++
        (4 to 8).map(i => (0, 1, 1, i.toLong)) ++
        (11 to 13).map(i => (0, 2, 0, i.toLong)) ++
        (14 to 15).map(i => (0, 2, 1, i.toLong)) ++
        (21 to 25).map(i => (0, 3, 0, i.toLong))
    val df = rows.toDF("tbl", "bucket", "kind", "id")
    val kept = Similarity.pruneHomeProbe(df, Seq("tbl", "bucket"), 4)
      .select("bucket", "kind", "id").as[(Int, Int, Long)]
      .collect().toSet
    assert(kept.filter(_._1 == 1) ===
      (1 to 3).map(i => (1, 0, i.toLong)).toSet,
      "home rows of an under-cap bucket must survive probe flooding")
    assert(kept.filter(_._1 == 2).size === 5)
    assert(kept.filter(_._1 == 3).isEmpty,
      "a home population over the cap still drops the bucket")
  }

  test("crossMinhashMatches: edited eval docs match their source, " +
    "clean evals never match, precision is exact-verified") {
    // Eval side: every 10th doc with its last two words removed
    // (Jaccard (W-4)/(W-2) vs source) + planted never-matching docs.
    val base = docs.where(col("text").isNotNull)
    val w = split(col("text"), " ")
    val edited = base.where(col("doc_id") % 10 === 0)
      .select((-col("doc_id") - 1).as("eval_id"),
        concat_ws(" ",
          slice(w, lit(1), greatest(size(w) - 2, lit(0)))).as("text"))
    val clean = base.where(col("doc_id") % 10 === 3).limit(20)
      .select((-col("doc_id") - 1).as("eval_id"),
        concat_ws(" ", (0 until 8).map(i =>
          concat(lit("zz"), col("doc_id").cast("string"),
            lit(s"q$i"))): _*).as("text"))
    val ev = edited.unionByName(clean).cache()
    val found = Dedup.crossMinhashMatches(ev, base, "eval_id", "doc_id",
      "text", threshold = 0.8)
      .select("eval_id", "train_id").as[(Long, Long)].collect().toSet
    // exact cross ground truth on the same shingle sets
    val evSh = ev.select(col("eval_id"),
      TextQueries.shingles3(col("text")).as("sh"))
    val trSh = base.select(col("doc_id"),
      TextQueries.shingles3(col("text")).as("sh"))
    val exact = evSh.as("e").join(trSh.as("t"))
      .select(col("eval_id"), col("doc_id"),
        (size(array_intersect(col("e.sh"), col("t.sh"))) /
          size(array_union(col("e.sh"), col("t.sh")))).as("j"))
      .where(col("j") >= 0.8)
      .select("eval_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // long docs survive the 2-word clip
    assert(found.subsetOf(exact), s"spurious ${found -- exact}")
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall over ${exact.size} pairs")
    // clean plants (ids derived from docs ≡3 mod 10) never match
    val cleanIds = clean.select("eval_id").as[Long].collect().toSet
    assert(found.forall { case (e, _) => !cleanIds.contains(e) })
  }

  test("semanticDedup with a trained quantizer: planted copies cluster " +
    "with their source, canonical is the min id, verdict is total") {
    val plants = emb.where(col("vec_id") % 100 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        col("embedding"))
    val all = emb.unionByName(plants).cache()
    val (cents, _) = Similarity.ivfIndex(all, nlist = 6)
    val verdict = Similarity.semanticDedup(all,
      cents.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      threshold = 0.95).cache()
    assert(verdict.count() === all.count()) // one verdict per row
    val byId = verdict.select("vec_id", "canonical_id")
      .as[(Long, Long)].collect().toMap
    // an exact copy always lands in its source's cell (identical
    // distances, same tie-break), cos = 1 ≥ 0.95 → clustered; the
    // min-id canonical is the NEGATIVE plant id on both members
    plants.select("vec_id").as[Long].collect().foreach { p =>
      val src = -p - 1
      assert(byId(p) === p, s"plant $p not canonical")
      assert(byId(src) === p, s"source $src not clustered with $p")
    }
    // keep ⟺ vec_id == canonical_id, no exceptions
    val bad = verdict.where((col("vec_id") === col("canonical_id")) =!=
      (col("keep") === 1)).count()
    assert(bad === 0)
  }

  test("semanticDedup multi-probe (p=2) recovers cross-cell boundary " +
    "twins that p=1 provably misses, and agrees with p=1 elsewhere") {
    // two well-separated cells at x=0 and x=10; a twin pair straddles
    // the midpoint (cos = 1, but nearest cells differ), plus normal
    // in-cell members and an in-cell duplicate pair as the control
    val rows = Seq(
      (1L, 0, Seq(0.1, 1.0, 0.0)),   // cell A interior
      (2L, 0, Seq(0.2, 0.9, 0.1)),   // cell A interior
      (3L, 0, Seq(10.0, 1.0, 0.0)),  // cell B interior
      (4L, 0, Seq(10.0, 1.0, 0.0)),  // exact dup of 3 — same cell
      // boundary twins: cosine ≈ 1 to each other, but pointing away
      // from both interiors' directions (cos < 0.8 to every other
      // vector), straddling the A/B midplane by ±0.001 in x
      (5L, 0, Seq(4.999, -3.0, 1.0)),  // nearest = A
      (6L, 0, Seq(5.001, -3.001, 1.0)) // nearest = B
    ).toDF("vec_id", "label", "embedding")
    val cents = Array(
      (0L, Array(0.0, 0.0, 0.0)), (1L, Array(10.0, 0.0, 0.0)))
    // sanity: 5 and 6 are cosine-identical up to ~1e-8 but straddle
    val p1 = Similarity.semanticDedup(rows, cents, threshold = 0.999)
      .select("vec_id", "canonical_id").as[(Long, Long)]
      .collect().toMap
    assert(p1(5L) === 5L && p1(6L) === 6L,
      "p=1 must miss the straddling pair (that is the documented trade)")
    assert(p1(4L) === 3L, "in-cell dup must still cluster at p=1")
    val p2 = Similarity.semanticDedup(rows, cents, threshold = 0.999,
      probes = 2)
      .select("vec_id", "canonical_id").as[(Long, Long)]
      .collect().toMap
    assert(p2(5L) === 5L && p2(6L) === 5L,
      s"p=2 must recover the straddling pair, got $p2")
    assert(p2(4L) === 3L)
    // non-boundary verdicts unchanged
    assert(p2(1L) === p1(1L) && p2(2L) === p1(2L) && p2(3L) === p1(3L))
    // primary-cell reporting: the verdict's cell is the NEAREST cell
    // under both settings
    val cells1 = Similarity.semanticDedup(rows, cents, 0.999)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val cells2 = Similarity.semanticDedup(rows, cents, 0.999, probes = 2)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(cells1 === cells2)
    assert(cells2(5L) === 0L && cells2(6L) === 1L)
  }

  test("rollingHash fingerprints are deterministic and prefix-sensitive") {
    val df = Seq("hello world", "hello world", "hello worlds")
      .toDF("text")
    val h = df.select(TextFunctions.rollingHash(col("text")).as("h"))
      .as[Long].collect()
    assert(h(0) === h(1))
    assert(h(0) !== h(2))
  }

  test("charNgrams produce the sliding window") {
    val out = Seq("Ab c").toDF("t")
      .select(TextFunctions.charNgrams(col("t"), 2).as("g"))
      .as[Seq[String]].head()
    assert(out === Seq("ab", "b ", " c"))
  }

  test("charNgrams of strings shorter than n are empty, not " +
      "truncated duplicates") {
    // Regression: sequence(1, 0) steps DOWN in Spark, so the old form
    // emitted ["ab","ab"] for a 2-char string at n=3 (and ["",""] for
    // empty docs) — spurious duplicate grams in every short document.
    val out = Seq("ab", "", " ").toDF("t")
      .select(TextFunctions.charNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(out.forall(_.isEmpty), out.mkString("; "))
  }

  test("salted dedup_embed_cosine equals the unsalted blocked join " +
      "(negative ids, odd corpus vs salt count)") {
    // The r9.6 salting claims each unordered same-label pair meets in
    // EXACTLY one (label, salt) cell — a duplicated pair or a dropped
    // one (e.g. pmod mishandling negative ids) would silently corrupt
    // the dedup verdicts. Pin the registered query against the plain
    // label self-join on a corpus with negative ids and a row count
    // not divisible by the session's salt count.
    val rnd = new scala.util.Random(7)
    val rows = (-61 until 60).map { id =>
      (id.toLong, math.floorMod(id, 3),
        Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("salted_cos_").toString
    df.coalesce(2).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val salted = graft.SparkEntry
      .queries("dedup_embed_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val e = VectorQueries.withNorm(
      Tables.load(spark, dir, "embeddings"))
    val a = e.select(col("label"), col("vec_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("label"), col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    val plain = a.join(b, Seq("label"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (VectorQueries.dot(col("av"), col("bv")) /
          (col("an") * col("bn"))).as("cos"))
      .where(col("cos") >= 0.44)
      .select(col("a_id"), col("b_id"),
        round(col("cos"), 6).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.length === salted.distinct.length,
      "salted route emitted a duplicate pair")
    assert(plain.nonEmpty, "degenerate fixture: no pair cleared 0.44")
    assert(salted.toSet === plain.toSet)
  }

  test("minhashDedup sizeHint: self-sized verify exchanges change " +
    "partition COUNT only — rows identical, both join keys sized per " +
    "the 64 MB/task formula, no added exchange") {
    val corpus = docs.limit(200)
    def mh(hint: Option[Long]) = Dedup.minhashDedup(corpus, "doc_id",
      "text", threshold = 0.6, sizeHint = hint)
    // A real hinted run is at a scale where the verify joins are
    // shuffle joins — the fixture's tiny pair relation would broadcast
    // and make the exchange-count pin vacuous, so pin the SMJ shape
    // the hint exists for. (Save/restore: shared session.)
    val bcKeys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = bcKeys.map(k => k -> spark.conf.getOption(k))
    try {
      bcKeys.foreach(spark.conf.set(_, "-1"))
      val base = mh(None)
      // 20e6 shingle rows × 96 B / 64 MiB + 1 = 29 parts > 4×4 — past
      // the spill-bar engage gate (>4× session ⇔ >256 MB/task)
      val hint = 20000000L
      val expected = (hint * 96L / (64L << 20)).toInt + 1
      assert(expected >
        4 * spark.sessionState.conf.numShufflePartitions)
      val hinted = mh(Some(hint))
      val baseRows = base.collect().map(_.toSeq).toSet
      val hintedRows = hinted.collect().map(_.toSeq).toSet
      assert(baseRows.nonEmpty, "vacuous fixture: no pairs found")
      assert(hintedRows === baseRows,
        "partitioning must not change rows")
      val planStr = hinted.queryExecution.executedPlan.toString
      assert(planStr.contains("hashpartitioning(a_id") &&
        planStr.contains(s", $expected)"),
        s"sized a_id verify exchange missing:\n$planStr")
      assert(("hashpartitioning\\(b_id#\\d+L, shingle#\\d+, " +
        s"$expected\\)").r.findFirstIn(planStr).isDefined,
        s"sized (b_id, shingle) verify exchange missing:\n$planStr")
      // and the unhinted plan must NOT carry the formula count — the
      // hint is the only thing that sizes these exchanges. (No raw
      // exchange-count equality here: this pipeline's adaptive plan
      // string prints materialized stages' subtrees repeatedly, so a
      // naive "Exchange " count is printing-artifact noise; the
      // count-neutrality of the shared sizedByBytes wiring is pinned
      // by the lshDedupPairs sizeHint test above.)
      assert(!base.queryExecution.executedPlan.toString
        .contains(s", $expected)"),
        "unhinted plan unexpectedly carries the formula partition count")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("pairIntersectionCounts sizeHint: sized self-join exchange, " +
    "rows identical") {
    val base = docs.limit(200)
      .where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id").as("id"),
        TextQueries.shingles3(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    def run(hint: Option[Long]) =
      Dedup.pairIntersectionCounts(base, Seq.empty, hint)
    val hint = 20000000L // past the >4×session spill-bar at 4 parts
    val expected = (hint * 96L / (64L << 20)).toInt + 1
    val plain = run(None).collect().map(_.toSeq).toSet
    val hinted = run(Some(hint))
    val hintedRows = hinted.collect().map(_.toSeq).toSet
    assert(plain.nonEmpty, "vacuous fixture: no co-occurring pairs")
    assert(hintedRows === plain, "partitioning must not change rows")
    val planStr = hinted.queryExecution.executedPlan.toString
    assert(planStr.contains("hashpartitioning(shingle") &&
      planStr.contains(s", $expected)"),
      s"sized shingle self-join exchange missing:\n$planStr")
  }

  test("distinctIdsWithin enforces the kernel routes' per-ID ceiling " +
    "(advisory r10: the annTopK row cap alone admits tables× the id " +
    "contract on narrow layouts)") {
    import org.apache.spark.sql.Row
    def rows(ids: Long*): Array[Row] = ids.map(Row(_)).toArray
    assert(Similarity.distinctIdsWithin(rows(), 0L))
    assert(Similarity.distinctIdsWithin(rows(1L, 2L, 3L), 3L))
    // duplicates (the per-table replication annTopK sees) don't count
    // against the ceiling
    assert(Similarity.distinctIdsWithin(
      rows(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L), 2L))
    // one id past the ceiling fails — this is the case the bare row
    // cap (4× ceiling) used to admit when tables < 4
    assert(!Similarity.distinctIdsWithin(rows(1L, 2L, 3L, 4L), 3L))
    assert(!Similarity.distinctIdsWithin(
      rows(1L, 1L, 2L, 2L, 3L, 3L), 2L))
  }

  test("minhashDedup survives ANSI mode with identical pairs (the " +
    "universal-hash family wraps mod 2^64 via WrapArith, not session " +
    "conf)") {
    // r11 ANSI sweep: under Spark 4.x's caller-default ansi=true, the
    // permHash multiply threw ARITHMETIC_OVERFLOW and took down the
    // whole minhash family (dedup_minhash_lsh, contamination_minhash,
    // dedup_components/_dist, dedup_prune). The hash SEMANTICS is
    // two's-complement wraparound, so the fix pins EvalMode.LEGACY at
    // expression construction; this asserts both no-throw and
    // value-equality across modes.
    // docs 2k and 2k+1 share a base and differ by one trailing word →
    // planted near-dup pairs well above the 0.5 threshold
    val corpus = (1 to 40).map { i =>
      val base = s"ansi fixture sentence ${i / 2} on topic ${(i / 2) % 5} " +
        "with many shared words repeated across the whole pair of texts"
      (i.toLong, if (i % 2 == 0) base else base + " tail")
    }.toDF("doc_id", "text")
    def pairs(): Set[(Long, Long)] =
      Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saved = spark.conf.get("spark.sql.ansi.enabled", "false")
    val off = pairs()
    val on = try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      pairs()
    } finally spark.conf.set("spark.sql.ansi.enabled", saved)
    assert(off.nonEmpty, "fixture should produce near-dup pairs")
    assert(on === off, "ANSI mode changed the minhash candidate set")
  }
}
