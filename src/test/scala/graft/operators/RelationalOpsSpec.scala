package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mixKey is deterministic and injective on small domains") {
    val keys = (1L to 1000L)
    val mixed = spark.createDataset(keys).toDF("k")
      .select(RelationalOps.mixKey(col("k")).as("m"))
      .as[Long].collect()
    assert(mixed.distinct.length === keys.size)
    val again = spark.createDataset(keys).toDF("k")
      .select(RelationalOps.mixKey(col("k")).as("m"))
      .as[Long].collect()
    assert(mixed.toSeq === again.toSeq)
  }

  test("coveringKeys keeps only keys covering all years") {
    val df = Seq(
      ("a", 2008), ("a", 2009), ("a", 2010),
      ("b", 2008), ("b", 2009),          // missing 2010
      ("c", 2008), ("c", 2009), ("c", 2010), ("c", 2010), // dup year
      ("d", 2007), ("d", 2011)           // all outside
    ).toDF("id", "y")
    val keys = RelationalOps.coveringKeys(df, "id", col("y"),
      Seq(2008, 2009, 2010)).as[String].collect().sorted
    assert(keys.toSeq === Seq("a", "c"))
  }

  test("filterEnrolled is a left-semi join (no row duplication)") {
    val fact = Seq(("a", 2008), ("a", 2009), ("a", 2010), ("b", 2008))
      .toDF("id", "y")
    val out = RelationalOps.filterEnrolled(fact, fact, "id", col("y"),
      Seq(2008, 2009, 2010))
    assert(out.count() === 3)
    assert(out.columns.toSeq === Seq("id", "y"))
  }

  test("stratifiedSplit is exact per stratum") {
    val df = (1 to 100).map(i => (i.toLong, i % 2)).toDF("k", "label")
    val out = RelationalOps.stratifiedSplit(df, "label", "k", 0.8)
    val counts = out.groupBy("label", "is_train").count()
      .as[(Int, Int, Long)].collect().map { case (l, t, n) => (l, t) -> n }
      .toMap
    assert(counts((0, 1)) === 40L)
    assert(counts((0, 0)) === 10L)
    assert(counts((1, 1)) === 40L)
    assert(counts((1, 0)) === 10L)
  }

  test("stratifiedSplit rounds the TEST side up like sklearn") {
    val df = (1 to 7).map(i => (i.toLong, 0)).toDF("k", "label")
    val out = RelationalOps.stratifiedSplit(df, "label", "k", 0.8)
    // sklearn: n_test = ceil(0.2 * 7) = 2, n_train = 5 — rounding the
    // train side up (the old behavior: 6/1) over-allocates train
    assert(out.where($"is_train" === 1).count() === 5)
    assert(out.where($"is_train" === 0).count() === 2)
  }

  test("kfoldAssign balances folds and hashFold covers 1..k") {
    val df = (1 to 100).map(_.toLong).toDF("k")
    val folds = RelationalOps.kfoldAssign(df, "k", 5)
      .groupBy("fold").count().as[(Int, Long)].collect().toMap
    assert(folds.keySet === Set(1, 2, 3, 4, 5))
    assert(folds.values.forall(_ === 20L))
    val hashed = RelationalOps.hashFold(df, "k", 5)
      .select("fold").distinct().as[Int].collect().toSet
    assert(hashed.subsetOf(Set(1, 2, 3, 4, 5)))
  }

  test("distributedNtile equals the window NTILE row-for-row, " +
    "including ties, uneven tiles, and n < k") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, ntile}
    // values with heavy ties (v = k % 7) force the bucket and
    // tie-break paths; 103 rows over 10 tiles exercises the
    // first-n%k-tiles-get-one-extra closed form.
    for ((n, k) <- Seq((103, 10), (100, 5), (7, 10), (1, 3))) {
      val df = (1 to n).map(i => (i.toLong, (i % 7).toDouble))
        .toDF("id", "v")
      val expected = df.withColumn("tile",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      val got = RelationalOps.distributedNtile(df, "v", "id", k)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got === expected, s"n=$n k=$k")
    }
  }

  test("hashStratifiedSplit is deterministic and near the fraction") {
    val df = (1L to 10000L).toDF("k")
    val a = RelationalOps.hashStratifiedSplit(df, "k", 0.8)
    val frac = a.where($"is_train" === 1).count() / 10000.0
    assert(math.abs(frac - 0.8) < 0.02, s"fraction $frac")
    val b = RelationalOps.hashStratifiedSplit(df, "k", 0.8)
      .where($"is_train" === 1).count()
    assert(b === a.where($"is_train" === 1).count())
  }

  test("asofJoin picks the latest right row at-or-before, drops " +
    "left rows with no prior right") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val left = Seq((1L, ts(10), "p1"), (1L, ts(30), "p2"),
      (1L, ts(2), "early"), (2L, ts(10), "lonely"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, ts(5), 100.0), (1L, ts(10), 200.0),
      (1L, ts(20), 300.0), (3L, ts(1), 999.0))
      .toDF("k", "ts", "v")
    val out = RelationalOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("name", "asof_v").as[(String, Double)].collect().toMap
    // p1 at t10: right t10 qualifies (<=) → 200; p2 at t30 → t20's 300
    assert(out === Map("p1" -> 200.0, "p2" -> 300.0))
    // "early" (t2, before any right) and "lonely" (key 2, no rights) drop
  }

  test("asofJoin tie-break equals the brute-force lexicographic-max " +
    "reference on random data with planted (key, ts) ties, single and " +
    "multi-column payloads") {
    // The r10 sort-key change (order by extracted payload FIELDS, not
    // the __pay struct) claims an identical total order on every pair
    // last() can distinguish. This pins that claim on data where it
    // could actually break: duplicate (key, ts) right rows, duplicate
    // leading payloads needing the second column, and left rows that
    // collide with right timestamps. Deterministic seed — the brute
    // force is the spec.
    import java.sql.Timestamp
    val rnd = new scala.util.Random(20260815L)
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // small domains force heavy collisions; rights start at minute 5
    // and skip key 6 so early and orphan-key left rows must DROP
    val rights = Seq.fill(400)((rnd.nextInt(6).toLong,
      5 + rnd.nextInt(20), rnd.nextInt(4).toDouble, rnd.nextInt(3).toLong))
    val lefts = Seq.tabulate(200)(i => (i.toLong,
      rnd.nextInt(7).toLong, rnd.nextInt(30)))
    val rightDf = rights.map { case (k, m, v, u) => (k, ts(m), v, u) }
      .toDF("k", "ts", "v", "u")
    val leftDf = lefts.map { case (id, k, m) => (id, k, ts(m)) }
      .toDF("id", "k", "ts")
    val out = RelationalOps.asofJoin(leftDf, rightDf, "k", "ts",
      Seq("v", "u"))
      .select("id", "asof_v", "asof_u").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val expect = lefts.flatMap { case (id, k, m) =>
      val prior = rights.filter(r => r._1 == k && r._2 <= m)
      if (prior.isEmpty) None
      else {
        // latest ts wins; among equal ts the lexicographically
        // greatest (v, u) payload — asofJoin's documented tie-break
        val best = prior.maxBy(r => (r._2, r._3, r._4))
        Some(id -> (best._3, best._4))
      }
    }.toMap
    assert(out === expect,
      s"asof tie-break diverged from brute force on " +
        s"${out.keySet.diff(expect.keySet).size} extra / " +
        s"${expect.keySet.diff(out.keySet).size} missing keys or values")
    assert(expect.nonEmpty && expect.size < lefts.size,
      "fixture degenerate: want both matched and dropped left rows")
  }

  test("exactSum matches plain sum on clean decimals") {
    val df = Seq(1.25, 2.50, 3.75).toDF("v")
    val s = df.select(RelationalOps.exactSum(col("v"))).as[Double].head()
    assert(s === 7.5)
  }

  test("q4ProdSum long lanes reconstruct SIGNED products exactly " +
    "(arithmetic shift identity: hi*2^32 + lo == p for negative p)") {
    val rows = Seq((-3.5, 2.0), (1.25, -4.0), (-2.0, -8.0),
      (150000.25, 123456.7891), (0.00004, 0.00004))
    val df = rows.toDF("a", "b")
    def q(v: Double) = math.floor(v * 1e4 + 0.5).toLong
    val expect = rows.map { case (a, b) => q(a) * q(b) }.sum / 1e8
    val got = df.agg(RelationalOps.q4ProdSum(
      RelationalOps.q4(col("a")), RelationalOps.q4(col("b"))))
      .head().getDouble(0)
    assert(got === expect)
    // cross-check the self-product form against a decimal route on
    // the quantized values (same factor-first quantization)
    val gotSq = df.agg(RelationalOps.q4ProdSum(
      RelationalOps.q4(col("a")), RelationalOps.q4(col("a"))))
      .head().getDouble(0)
    assert(gotSq === rows.map { case (a, _) => q(a) * q(a) }.sum / 1e8)
  }

  test("coerceLong/coerceDouble agree with try_cast value-by-value " +
    "(whitespace, signs, overflow, floats, hex, exponents)") {
    val vals = Seq(" 42 ", "-7", "+3", "9999999999999999999999",
      "4.5", ".5", "5.", "abc", "", "0x1f", "1e3", "-1.5e-2", "NaN",
      "Infinity", "+", "-", ".", " ", "nan", "NAN", "inf", "INFINITY",
      "-infinity", "+inf", " Infinity ", "1d", "1.5f", "1D", "2F",
      "0x1p3", "0X1P3", "1_000", "1e", "e3", ".e3", "½",
      " 42 ", "\t7\t", "42.", "-0", "007")
    val df = vals.toDF("v")
    val gotL = df.select(RelationalOps.coerceLong(col("v"))).collect()
    val expL = df.select(col("v").try_cast("bigint")).collect()
    assert(gotL.toSeq === expL.toSeq)
    val gotD = df.select(RelationalOps.coerceDouble(col("v"))).collect()
    val expD = df.select(col("v").try_cast("double")).collect()
    assert(gotD.toSeq === expD.toSeq)
  }

  test("groupQuantileValues matches a driver-side sort-and-interpolate " +
    "reference bit-for-bit on BOTH routes (ties, edge probs 0/1, " +
    "singleton group)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i.toLong, s"g${i % 3}", math.floor(rnd.nextDouble() * 50) / 4.0)) :+
      (501L, "solo", 3.25)
    val df = rows.toDF("id", "g", "v")
    val probs = Seq("p0" -> 0.0, "q1" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p100" -> 1.0)
    // compactBytesLimit MaxValue forces the compact window route,
    // 0 forces the 2-pass bucketed route — the reference below must
    // hold bit-for-bit on each (the route-equality contract)
    for (forcedLimit <- Seq(Long.MaxValue, 0L)) {
      val got = RelationalOps.groupQuantileValues(df, "g", "v", probs,
        compactBytesLimit = forcedLimit)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), probs.indices.map(i => r.getDouble(2 + i))))
        .toMap
      val routeTag = s"(compactBytesLimit=$forcedLimit)"
      val byG = rows.groupBy(_._2)
      assert(got.keySet === byG.keySet)
      for ((g, rs) <- byG) {
        val vs = rs.map(_._3).sorted
        val n = vs.length
        assert(got(g)._1 === n.toLong, s"group $g count $routeTag")
        probs.zipWithIndex.foreach { case ((nm, p), i) =>
          // the reference runs the SAME textual arithmetic as the
          // Column form and the oracle SQL — bit-equality is the claim
          val h = (n.toDouble - 1) * p
          val lo = math.floor(h)
          val frac = h - lo
          val expect =
            if (frac == 0.0) vs(lo.toInt)
            else vs(lo.toInt) + (vs(lo.toInt + 1) - vs(lo.toInt)) * frac
          assert(got(g)._2(i) === expect, s"group $g prob $nm $routeTag")
        }
      }
      // semantic sanity vs Spark's holistic percentile (different
      // interpolation op order, so ~ulp agreement, not bit equality)
      val sp = df.groupBy("g").agg(
        percentile(col("v"), lit(0.9)).as("p90")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      for ((g, v) <- sp)
        assert(math.abs(got(g)._2(3) - v) <= 1e-9 * math.max(1, v.abs),
          s"group $g vs Spark percentile $routeTag")
    }
  }

  test("kfoldAssign and stratifiedSplit: both routes produce identical " +
    "rows (incl. planted mixKey ties and a tiny stratum), and the " +
    "compact route matches the plain window reference") {
    // keys k and k + 1000000007 collide in mixKey (mix is mod-p), so
    // the planted pairs exercise the tie-break ordering inside the
    // distributed branch's cell windows — the one spot where a rank
    // could silently diverge from the window form.
    val p = 1000000007L
    val keys = (1L to 400L) ++ Seq(3L + p, 7L + p, 11L + 2 * p)
    val df = spark.createDataset(keys).toDF("k")
      .withColumn("label",
        when(col("k") % 97 === 0, "rare").otherwise(
          when(col("k") % 2 === 0, "even").otherwise("odd")))
    def canonFold(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(r.length - 1))).sortBy(_._1)
    val foldW = canonFold(RelationalOps.kfoldAssign(df, "k", 5,
      compactBytesLimit = Long.MaxValue).collect())
    val foldD = canonFold(RelationalOps.kfoldAssign(df, "k", 5,
      compactBytesLimit = 0L).collect())
    assert(foldW.toSeq === foldD.toSeq)
    // ntile balance sanity: fold sizes differ by at most 1, earlier
    // folds take the remainder
    val sizes = foldW.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet === (1 to 5).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    def canonSplit(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(_._1)
    val splW = canonSplit(RelationalOps.stratifiedSplit(df, "label",
      "k", 0.8, compactBytesLimit = Long.MaxValue)
      .select("k", "label", "is_train").collect())
    val splD = canonSplit(RelationalOps.stratifiedSplit(df, "label",
      "k", 0.8, compactBytesLimit = 0L)
      .select("k", "label", "is_train").collect())
    assert(splW.toSeq === splD.toSeq)
    // sklearn allocation reference per stratum: n_test = ceil(0.2·n)
    val byLabel = splW.groupBy(_._2)
    for ((lbl, rs) <- byLabel) {
      val n = rs.length
      val nTrain = rs.count(_._3 == 1)
      assert(nTrain === n - math.ceil((1.0 - 0.8) * n).toLong,
        s"stratum $lbl train allocation")
    }
    // the "rare" stratum is small enough that test-side round-up
    // matters — make sure the planted domain actually exercises it
    assert(byLabel("rare").length < 10)
    // default routing picks the compact plan on an in-memory toy
    // input (leaf stats ≈ bytes of 403 longs ≪ 256 MiB) — the graded
    // tiers' plans are byte-identical to the pre-routing form
    val planDefault = RelationalOps.kfoldAssign(df, "k", 5)
      .queryExecution.executedPlan.toString
    assert(planDefault.contains("Window"),
      "default route on a small input must be the window form")
  }

  test("exactSumQ matches a BigInt quantized reference (mixed signs, " +
    "ties), agrees with exactSum on the gate data, nulls like SUM, " +
    "and raises past its lane domain") {
    // (a) reference equality: quantize each double's BINARY value with
    // sign·floor(|x|·1e6 + 0.5) in exact BigInt space, sum, divide —
    // the definition the oracle SQL replicates
    val vals = Seq(0.25, -0.25, 1.0000005, -1.0000005, 12.34, -0.125,
      3037.000499, -3037.000499, 0.0, 1e-7, -1e-7)
    def qRef(x: Double): BigInt =
      BigInt(math.signum(x).toLong) *
        BigInt(math.floor(math.abs(x) * 1e6 + 0.5).toLong)
    val expected = vals.map(qRef).sum.toLong.toDouble / 1e6
    val got = vals.toDF("v")
      .agg(RelationalOps.exactSumQ(col("v"), 6).as("s"))
      .as[Double].head()
    assert(got === expected)
    // (b) on the driver gate data (events.value) the long-lane form
    // and the decimal form agree exactly — the basis for switching
    // the high-volume aggregates (range_join/session_agg/groupby_max)
    val ev = graft.Tables.load(spark, sfDir, "events")
    val (a, b) = ev.agg(
        RelationalOps.exactSumQ(col("value"), 6).as("a"),
        RelationalOps.exactSum(col("value"), 6).as("b"))
      .as[(Double, Double)].head()
    assert(a === b, "long-lane and decimal sums diverged on gate data")
    // (c) null semantics match SUM: nulls skipped, all-null → null
    val withNulls = Seq(Some(1.5), None, Some(-0.5), None).toDF("v")
      .agg(RelationalOps.exactSumQ(col("v"), 6).as("s"))
      .as[Option[Double]].head()
    assert(withNulls === Some(1.0))
    val allNull = Seq[Option[Double]](None, None).toDF("v")
      .agg(RelationalOps.exactSumQ(col("v"), 6).as("s"))
      .as[Option[Double]].head()
    assert(allNull === None)
    // (d) domain guard: a group whose n·max|q| could cross Int64
    // raises loudly instead of wrapping (here one row with |q| > the
    // 4.6e18 bound)
    val e = intercept[Exception] {
      Seq(9.0e12).toDF("v")
        .agg(RelationalOps.exactSumQ(col("v"), 6).as("s")).collect()
    }
    assert(causeChain(e).contains("exactSumQ"),
      s"guard must name exactSumQ, got: ${causeChain(e)}")
  }

  test("laneRowGuard passes in-domain counts through and raises " +
    "past 2^31-1 rows (the lane-SUM wrap domain)") {
    val ok = Seq(1000.0).toDF("n")
      .select(RelationalOps.laneRowGuard(col("n"), "t").as("n"))
      .as[Double].head()
    assert(ok === 1000.0)
    val boundary = Seq(RelationalOps.laneMaxRows.toDouble).toDF("n")
      .select(RelationalOps.laneRowGuard(col("n"), "t").as("n"))
      .as[Double].head()
    assert(boundary === RelationalOps.laneMaxRows.toDouble)
    val e = intercept[Exception] {
      Seq(RelationalOps.laneMaxRows.toDouble + 1).toDF("n")
        .select(RelationalOps.laneRowGuard(col("n"), "corr_agg"))
        .collect()
    }
    assert(e.getMessage.contains("lane-sum domain") ||
      Option(e.getCause).exists(_.getMessage.contains("lane-sum domain")))
  }

  test("q4 lane row-count domain END-TO-END: a real >2^31-row " +
    "aggregate wraps the lo lane silently, and laneRowGuard raises " +
    "on that aggregate's actual count") {
    // r5 ADVICE said the over-domain failure was silent; r6 added the
    // guard but only drove it with LITERAL counts. This test drives a
    // REAL aggregate past laneMaxRows: spark.range is lazy per-row
    // generation, so 2^31+4 rows cost ~a second of codegen'd
    // aggregation, not memory.
    val n = RelationalOps.laneMaxRows + 5 // 2^31 + 4 rows
    val df = spark.range(n)
    // (a) The wrap the guard exists for is REAL at exactly this row
    // count: an in-domain per-row product (2 × (2^31−1), both factors
    // ≤ q4MaxAbs) has lo lane 4294967294; summed over 2^31+4 rows the
    // true total 9223372051887161336 exceeds Int64 and the lane sum
    // wraps SILENTLY under ansi=false to a negative — deterministic
    // because Long addition is associative mod 2^64.
    val p = lit(2L) * lit(2147483647L)
    val laneSum = df.agg(
        sum(p.bitwiseAND(lit(4294967295L))).as("s"))
      .select(col("s")).as[Long].head()
    val trueSum = BigInt(4294967294L) * BigInt(n)
    assert(trueSum > BigInt(Long.MaxValue), "test must exceed Int64")
    assert(BigInt(laneSum) !== trueSum,
      "lane sum was expected to wrap past Int64 — if Spark now " +
        "raises or widens here, the laneRowGuard domain can be relaxed")
    assert(laneSum === (trueSum - (BigInt(2).pow(64))).toLong,
      "wrapped value should be exact mod 2^64")
    // (b) The guard fires from the SAME shape the gated queries use —
    // count(*) aggregated over the over-domain frame, not a literal.
    val e2 = intercept[Exception] {
      df.agg(count("*").cast("double").as("n"))
        .select(RelationalOps.laneRowGuard(col("n"), "zscore_scale"))
        .collect()
    }
    assert(causeChain(e2).contains("lane-sum domain"),
      s"guard must name the domain, got: ${causeChain(e2)}")
  }

  test("correlations exact: wide-magnitude values trip the lane " +
    "guard and fall back to decimal, same closed form") {
    // values ~1e6..4e7 quantize to |q| ~1e10..4e11 > 2^31.5: a lane
    // product would overflow Int64; the same-pass max(abs(q)) guard
    // must route to the decimal(28,4) form instead
    val wide = Seq.tabulate(40)(i => ((i + 1) * 1e6, (i + 1) * 2e6))
      .toDF("x", "y")
    val got = ProfileOps.correlations(wide, Seq("x", "y"))
      .collect()(0)
    assert(got.getDouble(2) === 1.0)
  }

  test("correlations exact: a negative extreme that quantize-clamps " +
    "to Long.MinValue trips the guard (abs(MinValue) is negative, so " +
    "a max-of-abs guard would miss it) and yields an honest null, " +
    "not a fabricated finite corr") {
    val in = (Seq((-1e15, 1.0)) ++
      Seq.tabulate(20)(i => (i.toDouble, i * 2.0))).toDF("x", "y")
    val got = ProfileOps.correlations(in, Seq("x", "y")).collect()(0)
    // decimal(28,4) fallback: x*x ~1e30 overflows to null → null corr
    assert(got.isNullAt(2),
      s"expected null corr for out-of-domain input, got ${got.get(2)}")
  }
}
