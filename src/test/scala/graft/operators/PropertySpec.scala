package graft.operators

import graft.SparkSpec
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5): encoder invariants, split
  * fractions, and hash determinism over generated inputs. Uses raw
  * scalacheck generators with fixed seeds (scalatestplus bridge isn't in
  * the offline dependency set). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("mixKey is collision-free on generated key sets") {
    samples(Gen.listOfN(200, Gen.chooseNum(0L, 1000000006L)), 20)
      .foreach { keys =>
        val distinct = keys.distinct
        val mixed = distinct.map(k => (k * 2654435761L) % 1000000007L)
        assert(mixed.distinct.size === distinct.size)
      }
  }

  test("distributedNtile equals window NTILE over generated sizes, " +
    "tile counts, and duplicate-value densities (property)") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      k <- Gen.chooseNum(1, 17)
      dupMod <- Gen.chooseNum(1, 50) // 1 = all-equal, 50 = mostly unique
    } yield (n, k, dupMod)
    samples(gen, 12).foreach { case (n, k, dupMod) =>
      val df = (1 to n).map(i => (i.toLong, (i % dupMod).toDouble))
        .toDF("id", "v")
      val expected = df.withColumn("tile",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      val got = RelationalOps.distributedNtile(df, "v", "id", k)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got === expected, s"n=$n k=$k dupMod=$dupMod")
    }
  }

  test("simhash is order-insensitive and self-distance zero") {
    samples(Gen.listOfN(12, Gen.alphaStr.suchThat(_.nonEmpty)), 25)
      .foreach { tokens =>
        val h = Dedup.simhash64(tokens)
        assert(java.lang.Long.bitCount(h ^ h) === 0)
        assert(Dedup.simhash64(scala.util.Random.shuffle(tokens)) === h)
      }
  }

  test("multiHot nnz equals distinct in-vocab indices (sampled)") {
    val cases = samples(Gen.listOfN(20, Gen.chooseNum(-2, 9)), 10)
    val df = cases.zipWithIndex.map { case (l, i) => (i, l) }
      .toDF("case_id", "idxs")
      .select(col("case_id"), Encoders.multiHot(col("idxs"), 8).as("v"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[SparseVector]("v")).toMap
    cases.zipWithIndex.foreach { case (idxs, i) =>
      val expected = idxs.filter(x => x >= 0 && x < 8).distinct.size
      assert(df(i).indices.length === expected, s"case $idxs")
    }
  }

  test("pairIntersectionCounts equals the naive set-op Jaccard on " +
    "random corpora") {
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = samples(docGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val base = docs.select(col("doc_id").as("id"),
        TextQueries.shingles3(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    val fast = Dedup.pairIntersectionCounts(base, Seq.empty)
      .select(col("a_id"), col("b_id"),
        (col("i") / (col("a_n") + col("b_n") - col("i"))).as("j"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val naive = base.as("a").join(base.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))) /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // fast form omits zero-intersection pairs; all others must agree
    naive.foreach { case (pair, j) =>
      if (j > 0.0) assert(fast.get(pair).contains(j), s"pair $pair")
      else assert(!fast.contains(pair), s"zero pair $pair present")
    }
  }

  test("stratifiedSplit allocates n - ceil((1-f)*n) train rows per " +
    "stratum (sklearn's test-side round-up) for sampled sizes") {
    samples(Gen.zip(Gen.chooseNum(1, 40), Gen.chooseNum(1, 40)), 5)
      .foreach { case (n0, n1) =>
        val rows = (1 to n0).map(i => (i.toLong, 0)) ++
          ((n0 + 1) to (n0 + n1)).map(i => (i.toLong, 1))
        val out = RelationalOps.stratifiedSplit(
          rows.toDF("k", "label"), "label", "k", 0.8)
        val train = out.where(col("is_train") === 1)
          .groupBy("label").count().as[(Int, Long)].collect().toMap
        def expected(n: Int): Long =
          n - math.ceil((1.0 - 0.8) * n).toLong
        assert(train.getOrElse(0, 0L) === expected(n0))
        assert(train.getOrElse(1, 0L) === expected(n1))
        // sklearn's guarantee: every stratum with >1 row keeps at
        // least one row on each side
        if (n0 > 1) assert(train(0) >= 1 && train(0) < n0)
        if (n1 > 1) assert(train(1) >= 1 && train(1) < n1)
      }
  }

  test("correlation lane moments are exact vs BigInt reference over " +
    "generated adversarial magnitudes (property)") {
    // The corr_agg doctrine: per-row products in Int64, lane-split
    // sums exact, recombination hi·2^32 + lo in double. This drives
    // the CROSS-product lanes (qx·qy, not just squares) with values
    // spanning the whole q4 domain — mixed signs (negative products
    // exercise the arithmetic-shift sign extension) up to near
    // ±q4MaxAbs/1e4 — and checks the engine's q4ProdSum against
    // BigInt-exact moments pushed through the SAME recombination.
    val magGen = Gen.chooseNum(0L, RelationalOps.q4MaxAbs - 1)
    val rowGen = Gen.zip(magGen, magGen, Gen.oneOf(-1, 1),
      Gen.oneOf(-1, 1))
    samples(Gen.listOfN(60, rowGen), 8).foreach { rows =>
      val data = rows.zipWithIndex.map { case ((ax, ay, sx, sy), i) =>
        (i.toLong, sx * ax / 1e4, sy * ay / 1e4)
      }
      val df = data.toDF("id", "x", "y")
      val (qx, qy) = (RelationalOps.q4(col("x")),
        RelationalOps.q4(col("y")))
      val got = df.agg(RelationalOps.q4ProdSum(qx, qy).as("sxy"))
        .select("sxy").as[Double].head()
      // reference: exact quantization + exact lane sums in BigInt,
      // then the identical double recombination text
      def q(v: Double): Long = math.floor(v * 1e4 + 0.5).toLong
      val prods = data.map { case (_, x, y) => BigInt(q(x)) * q(y) }
      prods.foreach(p => assert(p.isValidLong,
        "per-row product must fit Int64 inside the q4 value domain"))
      val hi = prods.map(p => p >> 32).sum
      val lo = prods.map(p => p & 4294967295L).sum
      assert(hi.isValidLong && lo.isValidLong,
        "lane sums must fit Int64 at property-test row counts")
      val expected = (hi.toLong.toDouble * 4294967296.0 +
        lo.toLong.toDouble) / 1e8
      assert(got === expected,
        s"lane recombination drifted from the exact reference")
      // within double's exact-integer range the recombination IS the
      // true sum — pin that too where the generated data qualifies
      val trueSum = prods.sum
      if (trueSum.abs < BigInt(2).pow(53))
        assert(got === trueSum.toDouble / 1e8)
    }
  }

  test("corr_agg's aggregate shape raises loudly past the 2^31-row " +
    "lane domain (END-TO-END)") {
    // RelationalOpsSpec proves the wrap + guard for the zscore shape;
    // this drives corr_agg's OWN six-aggregate closed form (both
    // squared and cross lanes live) over laneMaxRows+5 real rows, so
    // the gated correlation query's over-domain behavior is a loud
    // named error from its actual count(*), not a wrapped moment.
    val df = spark.range(RelationalOps.laneMaxRows + 5)
      .select(col("id"),
        ((col("id") % 7) - lit(3)).cast("double").as("x"),
        ((col("id") % 5) - lit(2)).cast("double").as("y"))
    val (qx, qy) = (RelationalOps.q4(col("x")),
      RelationalOps.q4(col("y")))
    val agg = df.agg(
      count("*").cast("double").as("n"),
      RelationalOps.q4Sum(qx).as("sx"),
      RelationalOps.q4Sum(qy).as("sy"),
      RelationalOps.q4ProdSum(qx, qx).as("sxx"),
      RelationalOps.q4ProdSum(qy, qy).as("syy"),
      RelationalOps.q4ProdSum(qx, qy).as("sxy"))
      .withColumn("n", RelationalOps.laneRowGuard(col("n"), "corr_agg"))
    val e = intercept[Exception] {
      agg.select(
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"))
        .collect()
    }
    val msgs = causeChain(e)
    assert(msgs.contains("corr_agg") &&
      msgs.contains("lane-sum domain"),
      s"guard must name corr_agg and the domain, got: $msgs")
  }

  test("groupQuantileValues equals the in-memory interpolated quantile " +
    "on generated data with negatives, -0.0, and heavy ties (property)") {
    // the r9.2 IEEE-total-order bucketing's negative branch
    // (bits < 0 → ~bits) and the -0.0/0.0 cell boundary are invisible
    // to the price-valued oracle gates — generate values on both
    // sides of zero with dense ties and compare against a driver-side
    // replay of the exact lo/hi interpolation
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val groups = 1 + rnd.nextInt(3)
      val rows = (0 until 300 + rnd.nextInt(200)).map { i =>
        val g = s"g${rnd.nextInt(groups)}"
        // mixed magnitudes and signs; ~1/8 exact zeros split between
        // -0.0 and 0.0, plus tie-heavy small-int values
        val v = rnd.nextInt(8) match {
          case 0 => if (rnd.nextBoolean()) 0.0 else -0.0
          case 1 | 2 => (rnd.nextInt(7) - 3).toDouble
          case 3 => -math.exp(rnd.nextInt(20) - 10) * rnd.nextDouble()
          case _ => math.exp(rnd.nextInt(20) - 10) * rnd.nextDouble()
        }
        (g, v, i)
      }
      val df = rows.toDF("g", "v", "i")
      val probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
      // output columns: (g, __n, p25, p50, p90)
      val got = RelationalOps.groupQuantileValues(df, "g", "v", probs)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), probs.indices.map(k => r.getDouble(k + 2))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val vs = rs.map(_._2).sorted
        val n = vs.length
        val want = probs.map { case (_, p) =>
          val h = (n - 1).toDouble * p
          val lo = math.floor(h).toInt
          val frac = h - lo
          if (frac == 0.0) vs(lo)
          else vs(lo) + (vs(lo + 1) - vs(lo)) * frac
        }
        val (_, gotVals) = got(g)
        assert(gotVals.size === want.size)
        gotVals.zip(want).zipWithIndex.foreach { case ((a, b), k) =>
          assert(a === b,
            s"trial $trial group $g prob ${probs(k)._1}: $a != $b")
        }
      }
    }
  }

  test("TopKHeap equals sort-based distinct top-k under any insertion " +
    "order, with exact-duplicate streams and evictions (property)") {
    // the r9 search kernels' per-query state: insertion under
    // (cos desc, id asc), O(1) suppression of exact (id, cos)
    // duplicates — the only duplicate shape the bucket routes produce.
    // Reference: sort the DISTINCT candidate set and take k.
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(10)
      val nIds = 1 + rnd.nextInt(40)
      // small id/value domains force cos ties between DIFFERENT ids
      // (legal) while each id keeps ONE cos (the kernel invariant)
      val cosOf = (0 until nIds).map(i =>
        i.toLong -> (rnd.nextInt(8) / 7.0)).toMap
      // stream with duplicates, shuffled
      val stream = rnd.shuffle(
        (0 until nIds).flatMap(i =>
          Seq.fill(1 + rnd.nextInt(3))(i.toLong)).toList)
      val h = new Similarity.TopKHeap(k)
      stream.foreach(id => h.insert(id, cosOf(id)))
      val got = (0 until h.size).map(p => (h.ids(p), h.cs(p)))
      val want = cosOf.toSeq.map { case (id, c) => (id, c) }
        .sortBy { case (id, c) => (-c, id) }.take(k)
      assert(got === want, s"trial $trial k=$k stream=$stream")
    }
  }

  // generated corpus for the r9.3 byte/char kernels: stopwords, ascii
  // and multi-byte tokens (2-, 3-, and 4-byte UTF-8 incl. a surrogate
  // pair), '.'-bearing tokens, and raw space runs (empty tokens,
  // leading/trailing separators) — the shapes where a hand-rolled
  // boundary scan diverges from split() if it is off by one anywhere
  private def genDocs(n: Int): Seq[(Long, String)] = {
    val toks = Seq("the", "a", "of", "and", "to", "in", "x", "deux",
      "héllo", "héllo", "世界", "👍ok", "dot.", ".", "a.b", "..",
      "end. start", "", " ", "  ")
    val gen = for {
      k <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(k, Gen.oneOf(toks))
    } yield ws.mkString(" ")
    samples(gen, n).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("tokenStats kernel equals the split/filter/array_distinct " +
    "expression route on generated unicode corpora (property)") {
    val stops = Seq("the", "a", "of", "and", "to", "in")
    val df = genDocs(300).toDF("id", "text")
    val kernel = graft.functions.TokenCountKernel.tokenStats(
      df, "text", stops, "nw", "sc", "nd")
      .select(col("id"), col("nw"), col("sc"), col("nd"))
    val w = split(col("text"), " ")
    val expr = df.select(col("id"),
      size(w).cast("long").as("nw"),
      size(filter(w, x => x.isin(stops.map(_.asInstanceOf[Any]): _*)))
        .cast("long").as("sc"),
      size(array_distinct(w)).cast("long").as("nd"))
    val diff = kernel.exceptAll(expr).count() +
      expr.exceptAll(kernel).count()
    assert(diff === 0L, "kernel/expression token stats diverged")
  }

  test("lineHashPairs byte kernel equals md5(explode(split)) with the " +
    "length filter on generated unicode corpora (property)") {
    for (minCp <- Seq(0, 1, 3, 20)) {
      val df = genDocs(300).toDF("id", "text")
      val kernel = TextQueries.lineHashPairs(df, "id", "text", minCp)
      val expr = df.select(col("id"),
          explode(split(col("text"), "\\. ")).as("line"))
        .where(length(col("line")) >= minCp)
        .select(col("id"), md5(col("line")).as("line_hash"))
      val diff = kernel.exceptAll(expr).count() +
        expr.exceptAll(kernel).count()
      assert(diff === 0L, s"minCp=$minCp kernel/expression diverged")
    }
  }
}
