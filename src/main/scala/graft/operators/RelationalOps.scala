package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational building blocks mirroring the reference pipeline's
  * operators (SURVEY.md §2), re-expressed Spark-first.
  *
  * Determinism note: the reference seeds every random op (`random_state=42`,
  * cms_preprocess.py:346,364). Spark's `rand(seed)` is seeded but its values
  * are partition-dependent and unreproducible in an external oracle, so all
  * "random" orderings here use a Knuth-style multiplicative mix of a unique
  * key — deterministic, engine-independent, and uniformly scrambling. At
  * cluster scale this is also friendlier than `rand`: the key is computed
  * from row data, so retries/speculative tasks produce identical output.
  */
object RelationalOps {

  /** Scan-pushable year-range predicate: `year(ts) BETWEEN y0 AND y1`
    * rewritten as a raw timestamp range. `year(col)` is a function of the
    * column, so parquet row-group stats and partition pruning can't use
    * it; the range form shows up in PushedFilters and prunes — the
    * difference between scanning 3 years and scanning 100 TB. */
  def yearRange(ts: Column, y0: Int, y1: Int): Column =
    ts >= lit(s"$y0-01-01") && ts < lit(s"${y1 + 1}-01-01")

  /** Deterministic pseudo-random permutation key from a unique integer key.
    * 2654435761 = floor(2^32/phi) (Knuth multiplicative hashing); modulus is
    * a large prime. Same arithmetic runs unchanged in any SQL engine.
    *
    * The key reduces mod p BEFORE the multiply: (k % p) < 2^30 keeps the
    * product under 2^62, so the expression never overflows Int64 — a raw
    * k * 2654435761 overflows for keys ≥ ~3.5e9 (billion-row surrogate
    * keys), where Spark (ANSI off) would wrap silently and an external
    * engine would raise, breaking cross-engine determinism. Values are
    * mathematically unchanged ((k·c) mod p ≡ ((k mod p)·c) mod p). */
  def mixKey(key: Column): Column =
    ((key % lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L)

  /** [[mixKey]] as a plain Scala function — same arithmetic, for
    * driver-side checks against the column form. */
  def mixKeyLong(key: Long): Long =
    ((key % 1000000007L) * 2654435761L) % 1000000007L

  /** Keys of `df` rows whose `yearCol` values cover all of `years` —
    * the reference's full-enrollment predicate (`cms_preprocess.py:92-93`,
    * `set(x) >= full_years`). Implemented as a pre-aggregated distinct
    * count (map-side partial agg, one shuffle) rather than a window over the
    * fact table: at 100 TB the window form shuffles the whole fact, this
    * form shuffles one row per (key, year).
    */
  def coveringKeys(df: DataFrame, keyCol: String, yearCol: Column,
                   years: Seq[Int]): DataFrame = {
    val y = yearCol.as("__y")
    df.select(col(keyCol), y)
      .where(col("__y").isin(years.map(Integer.valueOf): _*))
      .distinct()
      .groupBy(keyCol)
      .agg(count("*").as("__ny"))
      .where(col("__ny") === years.size)
      .select(keyCol)
  }

  /** Left-semi join `df` against the keys that cover `years` — the
    * enrollment filter as a single composable op. */
  def filterEnrolled(df: DataFrame, keyDf: DataFrame, keyCol: String,
                     yearCol: Column, years: Seq[Int]): DataFrame =
    df.join(coveringKeys(keyDf, keyCol, yearCol, years), Seq(keyCol),
      "left_semi")

  /** Exact stratified split (reference: sklearn `train_test_split(...,
    * stratify=y)`, `cms_preprocess.py:364`). sklearn is exact per stratum,
    * so the result is the window row_number form's, not the
    * approximate `sampleBy`. SIZE-ROUTED (r14, the groupQuantileValues
    * doctrine): at or under [[splitCompactBytesLimit]] input leaf
    * bytes the plan IS the per-label window (one reducer per label —
    * measured faster below the bound); above it the same rows come
    * from the [[rangeBucketRank]] prefix-sum machinery, parallel
    * across label×bucket cells. Route equality is exact by
    * construction (same rank, same counts, same threshold
    * arithmetic) — spec-pinned and oracle-gated via
    * `stratified_split_dist`. Adds `is_train` (1/0). `keyCol` must be
    * unique (tie-break + mix seed); `labelCol` non-null.
    *
    * Allocation matches sklearn's: the TEST side is rounded up
    * (n_test = ceil((1-frac)·n), n_train = n − n_test) — rounding the
    * train side up instead would let a 3-row stratum at frac 0.8 put all
    * 3 rows in train and starve test, where sklearn reserves 1. */
  def stratifiedSplit(df: DataFrame, labelCol: String, keyCol: String,
                      trainFrac: Double,
                      compactBytesLimit: Long = -1L): DataFrame = {
    val limit = if (compactBytesLimit >= 0L) compactBytesLimit
                else splitCompactBytesLimit(16L << 20)
    if (leafInputBytes(df) <= BigInt(limit)) {
      val w = Window.partitionBy(labelCol).orderBy(mixKey(col(keyCol)),
        col(keyCol))
      val wAll = Window.partitionBy(labelCol)
      val n = count("*").over(wAll)
      df.withColumn("is_train",
        when(row_number().over(w) <=
          n - ceil(lit(1.0 - trainFrac) * n), 1).otherwise(0))
    } else {
      // Distributed branch (r14): rank-within-label via the shared
      // prefix-sum core — parallel across label×bucket cells instead
      // of one reducer per label. __rk EQUALS row_number() OVER
      // (PARTITION BY label ORDER BY mixKey(key), key) row for row
      // (rangeBucketRank's contract; ties in the mix share a bucket
      // and break on the key inside the cell window), and the
      // per-label totals joined back are the same counts the window
      // form reads — so the is_train expression below is the SAME
      // textual arithmetic on the SAME longs: identical output,
      // oracle-checked by `stratified_split_dist`. Per-label counts
      // ride a broadcast (few-large-strata contract, like the group
      // quantile family); label must be non-null (distributedGroupRank
      // doctrine — a case-when label satisfies it).
      val (ranked, _) = rangeBucketRank(
        df.withColumn("__mix", mixKey(col(keyCol))),
        Seq(labelCol), "__mix", Seq(keyCol), "__rk", "stratifiedSplit")
      val totals = df.groupBy(labelCol).agg(count(lit(1)).as("__ln"))
      ranked.join(broadcast(totals), Seq(labelCol))
        .withColumn("is_train",
          when(col("__rk") <=
            col("__ln") - ceil(lit(1.0 - trainFrac) * col("__ln")), 1)
            .otherwise(0))
        .select(df.columns.map(col) :+ col("is_train"): _*)
    }
  }

  /** Scale-path stratified split: deterministic, shuffle-free, and
    * approximate (fraction holds in expectation per stratum, not
    * exactly). [[stratifiedSplit]] is sklearn-exact but needs a
    * per-stratum global sort — two tasks for a binary label no matter
    * the cluster size. This form is a pure map: a row trains iff its
    * mixed key lands under the fraction. Use exact for model-training
    * sets (≤ millions), this for corpus-scale splits. */
  def hashStratifiedSplit(df: DataFrame, keyCol: String,
                          trainFrac: Double): DataFrame =
    df.withColumn("is_train",
      (mixKey(col(keyCol)) < lit((trainFrac * 1000000007L).toLong))
        .cast("int"))

  /** Deterministic k-fold assignment (reference: `KFold(n_splits=5,
    * shuffle=True, random_state=42)`, ml_models.ipynb cell 2). Adds `fold`
    * in 1..k via ntile over the mixed key.
    *
    * SIZE-ROUTED (r14): at or under [[splitCompactBytesLimit]] input
    * leaf bytes the plan is the global-window ntile (a
    * single-partition sort — measured faster below the bound); above
    * it [[distributedNtile]] computes the SAME tiles row for row
    * without the single reducer. For billions of rows where
    * approximate fold balance suffices, `pmod(mixKey, k)`
    * ([[hashFold]]) is shuffle-free; the oracle checks the exact form
    * on both routes (`kfold_assign`, `kfold_assign_dist`).
    */
  def kfoldAssign(df: DataFrame, keyCol: String, k: Int,
                  compactBytesLimit: Long = -1L): DataFrame = {
    val limit = if (compactBytesLimit >= 0L) compactBytesLimit
                else splitCompactBytesLimit(256L << 20)
    if (leafInputBytes(df) <= BigInt(limit))
      df.withColumn("fold",
        ntile(k).over(Window.orderBy(mixKey(col(keyCol)), col(keyCol))))
    else
      // Distributed branch (r14): NTILE over the mixed order via
      // [[distributedNtile]] (valueCol = the mix, tie-break = the key
      // — the exact window order), whose output EQUALS
      // ntile(k) OVER (ORDER BY mixKey(key), key) row for row; mix
      // values are < 2^30, inside the machinery's lossless-double
      // domain. Oracle-checked by `kfold_assign_dist`.
      distributedNtile(df.withColumn("__mix", mixKey(col(keyCol))),
        "__mix", keyCol, k, "fold").drop("__mix")
  }

  /** Shuffle-free fold assignment for very large inputs. */
  def hashFold(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("fold", (pmod(mixKey(col(keyCol)), lit(k)) + 1)
      .cast("int"))

  /** Exact integer division of non-negative columns, built from ops
    * both engines define identically: `a - pmod(a,b)` is an exact
    * multiple of `b`, and dividing an exact multiple (≤ 2^53) in
    * double is exact — no reliance on engine-specific `div`
    * semantics and no truncation surprises. */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Shared prefix-sum core of [[distributedNtile]] and
    * [[distributedGroupRank]] (one implementation, so a bucketing or
    * guard fix cannot land in one and not the other):
    *
    *  1. one approx-quantile sketch pass over `valueCol` yields GLOBAL
    *     range boundaries — boundary quality affects only bucket
    *     BALANCE, never results (buckets are order-consistent by
    *     construction, and equal values always share a bucket);
    *  2. per-(group, bucket) row counts are collected — capped BEFORE
    *     materialization via limit(maxCells+1), so a high-cardinality
    *     group column is a loud require failure, not a driver OOM —
    *     and per-group exclusive prefixes are broadcast-joined back;
    *  3. rank = group's prefix at the bucket + row_number within the
    *     (group, bucket) window — parallel across groups×buckets
    *     instead of one reducer per group (or ONE reducer total for
    *     the ungrouped NTILE shape).
    *
    * Cross-job determinism guards (the packTokens doctrine — ranks
    * are only global if the ranking pass sees what the collect pass
    * saw; a sample()/rand()-derived input would silently gap or
    * overlap the rank space): (a) a row landing in a cell ABSENT at
    * planning time hits the left-join null check; (b) a cell whose
    * row count CHANGED hits the count-over-window check, which shares
    * the window partition already being built (free). Residual,
    * deliberately undetectable: a cell whose rows ALL vanish between
    * the two jobs leaves no surviving row to raise the error — the
    * rank space gaps. Only a nondeterministic input can do any of
    * this; deterministic inputs are the documented contract.
    *
    * The bucket id is a pure function of (value, boundaries) — never
    * a physical partition id; AQE coalesces partitions differently
    * across jobs (see PackingOps' AQE note).
    *
    * Returns the input plus a long `rankCol` (rank within each
    * `groupCols` combination ordered by `valueCol` then `tieBreak`),
    * and the total row count (for NTILE's closed form). */
  private def rangeBucketRank(df: DataFrame, groupCols: Seq[String],
                              valueCol: String, tieBreak: Seq[String],
                              rankCol: String, caller: String)
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    val nBuckets = spark.sessionState.conf.numShufflePartitions * 4
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bnds: Array[Double] =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(valueCol, probs, 0.01).distinct.sorted
    val bucketOf = udf { v: Double =>
      val i = java.util.Arrays.binarySearch(bnds, v)
      if (i >= 0) i else -i - 1
    }
    val withG = df.withColumn("__g",
      bucketOf(col(valueCol).cast("double")))
    val cellCols = groupCols :+ "__g"
    // maxCells bounds both driver memory and the broadcast; the
    // ungrouped caller occupies ≤ 4×shuffle-partitions cells, the
    // grouped caller |groups| × that — the few-large-groups domain.
    // limit() caps the rows BEFORE they reach the driver, so the
    // guard itself cannot cause the incident it prevents.
    val maxCells = 100000
    val cells = withG.groupBy(cellCols.map(col): _*).count()
      .limit(maxCells + 1).collect()
    require(cells.length <= maxCells,
      s"$caller: more than $maxCells (group, bucket) cells — the " +
        "group domain is too large for the collect-and-broadcast " +
        "prefix; use the plain window form or a coarser group key")
    val total = cells.iterator
      .map(_.getLong(groupCols.size + 1)).sum
    val prefix = cells
      .map(r => (Seq.tabulate(groupCols.size)(r.get),
        r.getInt(groupCols.size), r.getLong(groupCols.size + 1)))
      .groupBy(_._1).valuesIterator.flatMap { grp =>
        var acc = 0L
        grp.sortBy(_._2).map { case (key, b, c) =>
          // Seq[Any], NOT Seq(b, acc, c): with an inferred element
          // type, Scala's numeric widening unifies (Int, Long, Long)
          // to Seq[Long] and silently widens the Int bucket id — the
          // row-encoder then rejects a Long where the schema says INT
          val e = org.apache.spark.sql.Row
            .fromSeq(key ++ Seq[Any](b, acc, c))
          acc += c; e
        }
      }.toSeq
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(g => df.schema(g).copy(nullable = false)) ++ Seq(
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__exp",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(prefix, 1), schema)
    val w = Window.partitionBy(cellCols.map(col): _*)
      .orderBy((valueCol +: tieBreak).map(col): _*)
    val sameCount = count(lit(1))
      .over(Window.partitionBy(cellCols.map(col): _*))
    val guarded = when(col("__off").isNull, raise_error(lit(
      s"$caller: row landed in a (group, bucket) cell absent when " +
        "offsets were planned — is the input deterministic?")))
      .when(sameCount =!= col("__exp"), raise_error(concat(
        lit(s"$caller: cell row count drifted between jobs (saw "),
        sameCount.cast("string"), lit(", collected "),
        col("__exp").cast("string"),
        lit(") — is the input deterministic?"))))
      .otherwise(col("__off") + row_number().over(w))
    val ranked = withG
      .join(broadcast(offsets), cellCols, "left")
      .withColumn(rankCol, guarded.cast("long"))
      .drop("__g", "__off", "__exp")
    (ranked, total)
  }

  /** Exact NTILE(n) without the single-reducer global sort — the scale
    * path for equal-frequency binning ([[kfoldAssign]] /
    * `quantile_bin`'s shape, whose unpartitioned window funnels every
    * row through ONE reducer at any cluster size). The prefix-sum
    * machinery is [[rangeBucketRank]] with no group axis; the tile is
    * then the closed-form function of (rank, total) that NTILE
    * defines (first n%k tiles get one extra row), so the output
    * EQUALS `ntile(k) OVER (ORDER BY valueCol, keyCol)` row for row —
    * exact, not approximate, and DuckDB-oracle-able with the plain
    * window SQL. Requires non-null `valueCol` and a unique `keyCol`
    * (the deterministic tie-break, same doctrine as [[mixKey]]).
    */
  def distributedNtile(df: DataFrame, valueCol: String, keyCol: String,
                       k: Int, tileCol: String = "tile"): DataFrame = {
    require(k > 0, s"ntile k must be positive, got $k")
    val (ranked, n) = rangeBucketRank(df, Nil, valueCol, Seq(keyCol),
      "__rank", "distributedNtile")
    val rank = col("__rank")
    val size = n / k
    val rem = n % k
    val cut = (size + 1) * rem
    // CaseWhen evaluates only the taken branch, so the size=0 edge
    // (n < k: every rank ≤ cut) never reaches the /size division.
    val tile = when(rank <= cut, intDiv(rank - 1, lit(size + 1)) + 1)
      .otherwise(lit(rem) + intDiv(rank - cut - 1, lit(size)) + 1)
    ranked.withColumn(tileCol, tile.cast("int")).drop("__rank")
  }

  /** Exact within-group rank without a per-group global sort — the
    * scale path for `ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    * value)` when groups are FEW and LARGE (data sources, languages,
    * labels): the naive window funnels each group through one reducer,
    * so 20 sources = 20 reducers at any cluster size.
    * [[rangeBucketRank]] with the bucket axis crossed against the
    * group axis — parallel across groups×buckets.
    *
    * Output EQUALS the naive window row for row. Requires non-null
    * `groupCol`/`valueCol` and `valueCol` unique within each group (the
    * caller's deterministic-order contract; doc_id/orderkey qualify).
    * Values must survive a cast to double losslessly (ids < 2^53). */
  def distributedGroupRank(df: DataFrame, groupCol: String,
                           valueCol: String,
                           rankCol: String = "grp_rank"): DataFrame =
    rangeBucketRank(df, Seq(groupCol), valueCol, Nil, rankCol,
      "distributedGroupRank")._1

  /** Exact per-group interpolated quantile VALUES without buffering any
    * group — the scale path for Spark's `percentile`, which is a
    * HOLISTIC aggregate: each group's full value multiset accumulates
    * in one aggregation buffer, so a 100-TB fact table grouped by a
    * 3-5-key column (status, segment) concentrates terabytes per
    * buffer and OOMs an executor. Few huge groups are exactly the
    * failure mode; many small groups are the easy case.
    *
    * This form never holds more than one (group, bucket) cell's rows
    * in any task, and (since r9) never exchanges more than the TARGET
    * cells' rows: approx-quantile buckets + a per-(group, bucket)
    * count collect put exact prefix sums on the driver, which then
    * knows both each group's size AND which cells contain the
    * interpolation ranks — the scan side broadcast-inner-joins those
    * target cells (map-side filter), only their rows are window-ranked
    * (≈ |probs|·bucketWidth rows per group, not the group), and a
    * final tiny aggregation interpolates
    *
    *   h = (n−1)·p;  q = v(⌊h⌋+1) + (v(⌊h⌋+2) − v(⌊h⌋+1))·(h − ⌊h⌋)
    *
    * — the same linear interpolation `percentile`/`quantile_cont`
    * define, with every IEEE op in a fixed textual order so a DuckDB
    * window-function replay is bit-exact (the oracle doctrine; no
    * reliance on either engine's internal interpolation order).
    *
    * Ties in `valueCol` are fine: equal values always share a bucket
    * and any rank permutation among ties yields the same value at each
    * rank, so no tie-break column is needed (unlike
    * [[distributedGroupRank]]'s unique-value contract).
    *
    * SIZE-ROUTED since r10 (the components-gate doctrine,
    * [[graft.operators.Dedup.dupComponents]]): the 2-pass pruned form
    * above is the 100-TB shape, but each pass pays the ~0.3 s scan
    * floor + a driver cells round-trip, so on inputs where even a
    * whole-relation per-group sort is cheap it loses to a single
    * exchange. At or under [[quantileCompactBytesLimit]] input bytes —
    * read from the optimizer's LEAF statistics (file sizes; free, no
    * job, the same signal Spark's own broadcast planning uses) — the
    * routing picks a compact 1-exchange form: a grouped sorted-array
    * aggregate with endpoints read by array index, then THE SAME
    * interpolation fold ([[interpolateEndpoints]]) both routes share,
    * so route equality is bit-exact by construction, not by trusting
    * two interpolation codepaths to round identically. The compact
    * form buffers each group's full value array in one aggregation
    * buffer — exactly the holistic-percentile memory shape — which is
    * why the gate is on bytes: below the limit one in-memory array
    * sort beats two full passes; above it the pruned route keeps
    * every task bounded AND parallel. Leaf stats ignore column
    * pruning and join selectivity, which only overestimates — the
    * safe direction (routes to the distributed form).
    *
    * Measured floor (sf1 tier, percentile_scale, quiet host): compact
    * route 0.97 s vs DuckDB 0.27 s, of which the bare
    * scan+broadcast-join+noop of the SAME input — before any quantile
    * work — costs 0.60 s under the bench's 16 MB splits (0.41 s at
    * 2 MB splits; pyspark pass-level A/B r10). The single-node
    * baseline finishes the whole query before this engine finishes
    * scanning and joining, so the residual ~0.2 s of actual quantile
    * machinery (partial collect → exchange → array sort →
    * interpolate) is not the gap, and no quantile-side rewrite can
    * close it — it is the JVM scan/launch constant every sub-second
    * query in BENCH_SF1.md pays. Proven at ×10 (sf10-equivalent tier,
    * 15M-row orders⋈customer, CPUS=32, r10): the constant amortizes
    * and the ratio FLIPS — compact route 2.51 s vs DuckDB 3.40 s
    * (0.74×, an outright win, from 3.2× at sf1), the forced bucketed
    * route 3.96 s (1.17×, parity), and the sibling winsorize_scale
    * 2.90 s vs 9.90 s (0.29×). Growth table: docs/GROWTH_SF10.md.
    *
    * @param probs (outputColumn, p) pairs, p in [0, 1]
    * @param compactBytesLimit route bound override; defaults to
    *        [[quantileCompactBytesLimit]] (negative = use the
    *        default). Pass 0 to force the 2-pass bucketed route,
    *        Long.MaxValue to force the compact window route.
    * @return one row per group: groupCol, `__n` (group row count,
    *         long), and one double column per requested prob
    */
  def groupQuantileValues(df: DataFrame, groupCol: String,
                          valueCol: String,
                          probs: Seq[(String, Double)],
                          compactBytesLimit: Long = -1L): DataFrame = {
    require(probs.nonEmpty, "groupQuantileValues needs >= 1 prob")
    probs.foreach { case (nm, p) =>
      require(p >= 0.0 && p <= 1.0, s"prob $nm=$p outside [0,1]") }
    val limit = if (compactBytesLimit >= 0L) compactBytesLimit
                else quantileCompactBytesLimit
    val slimIn = df.select(col(groupCol),
      col(valueCol).cast("double").as(valueCol))
    val leafBytes = slimIn.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (leafBytes <= BigInt(limit))
      compactGroupQuantiles(slimIn, groupCol, valueCol, probs)
    else bucketedGroupQuantiles(slimIn, groupCol, valueCol, probs)
  }

  /** Route bound for [[groupQuantileValues]]' compact form, in input
    * LEAF bytes. Registry-path forcing (plan pins, route A/Bs driven
    * through query names) goes through the
    * `graft.quantile.compactBytesLimit` system property; prefer the
    * parameter when a call is in hand. Default 256 MiB: a one-task
    * external sort of 256 MB is ~1-2 s, under the 2-pass route's two
    * scan floors + cells round-trip; past that the pruned route both
    * parallelizes and bounds memory. */
  /** Optimizer leaf statistics of `df`'s input, in bytes — the size
    * signal the split/fold route bounds read (file sizes: free, no
    * job, the same signal Spark's broadcast planning uses). Ignores
    * column pruning, which only OVERestimates — the safe direction
    * (routes to the distributed form). */
  private def leafInputBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum

  /** Route bound for [[stratifiedSplit]]/[[kfoldAssign]]'s compact
    * window forms, in input LEAF bytes — the quantile routing doctrine
    * applied to the exact split family, with its own knob
    * (`graft.split.compactBytesLimit` system property, one override
    * for both ops) because the compact form here is more serial than
    * the quantile one: a global NTILE is ONE reducer sorting the
    * whole input, a per-label row_number is one reducer PER LABEL
    * (2 for a binary label) at any cluster size.
    *
    * The built-in DEFAULTS differ per op because the measured
    * crossovers differ (min-over-3-JVMs at the orders table):
    * kfoldAssign's single global sort still beats the distributed
    * form at 29 MB (1.54 vs 1.64 s) and loses decisively at 287 MB
    * (15.4 vs 4.6 s) → default 256 MiB; stratifiedSplit's TWO
    * windows over per-label reducers already lose at 29 MB (1.95 vs
    * 1.47 s) → default 16 MiB. Mis-routing is asymmetric — routing
    * distributed too early costs a bounded fixed overhead (sketch
    * pass + cells round-trip, ~0.4 s), routing compact too late is
    * an unbounded serial sort — so each default sits at the LOW end
    * of its measured crossover window (the scale-safe direction);
    * both sit ≥6× above the sf0.1 graded tier's 2.7 MB leaf, whose
    * window plan stays byte-identical. */
  private[graft] def splitCompactBytesLimit(defaultBytes: Long): Long =
    sys.props.get("graft.split.compactBytesLimit").map { v =>
      require(v.nonEmpty && v.forall(_.isDigit),
        s"graft.split.compactBytesLimit must be a non-negative " +
          s"integer, got '$v'")
      v.toLong
    }.getOrElse(defaultBytes)

  private[graft] def quantileCompactBytesLimit: Long =
    sys.props.get("graft.quantile.compactBytesLimit").map { v =>
      require(v.nonEmpty && v.forall(_.isDigit),
        s"graft.quantile.compactBytesLimit must be a non-negative " +
          s"integer, got '$v'")
      v.toLong
    }.getOrElse(256L << 20)

  /** The small-input route: ONE hash exchange on the group column
    * into a grouped sorted array, endpoints by array index — then the
    * shared interpolation fold. Shape A/B at the sf1 tier (1.5M-row
    * orders⋈customer, measured before committing): sorted-array agg
    * 0.79 s, window row_number 1.61 s (the window exec's row-at-a-time
    * processing over the FULL relation costs more than sorting the
    * same doubles as a primitive array), Spark's holistic `percentile`
    * 1.06 s — and the holistic form is also semantically disqualified:
    * its interpolation is `(hi−pos)·lo + (pos−lo)·hi`, a different
    * IEEE op order than the oracle replay, so it can drift in the last
    * ulp. Null group keys and null values fail loudly at execution
    * (raise_error inside the projection: zero extra passes; without
    * the value guard collect_list would silently SKIP nulls),
    * mirroring the bucketed route's driver-side requires. */
  private def compactGroupQuantiles(slim: DataFrame, groupCol: String,
                                    valueCol: String,
                                    probs: Seq[(String, Double)])
      : DataFrame = {
    val guarded = slim
      .withColumn(groupCol,
        when(col(groupCol).isNull, raise_error(lit(
          "groupQuantileValues: null group key — filter or coalesce " +
            "the group column first"))).otherwise(col(groupCol)))
      .withColumn(valueCol,
        when(col(valueCol).isNull, raise_error(lit(
          "groupQuantileValues: null value column — nulls have no " +
            "rank; filter them or impute first")))
          .otherwise(col(valueCol)))
    val g = guarded.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col(valueCol))).as("__vs"))
      .withColumn("__n", size(col("__vs")).cast("long"))
    // endpoint extraction: the sorted array's (lo+1)/(lo+2) elements
    // ARE the rank-filtered values the bucketed route extracts. The
    // hi index is CLAMPED to __n (advisory r10, medium): lo+2 can
    // exceed the array length exactly when frac = 0 at the top rank
    // (p = 1.0, or any singleton group), where the shared fold's
    // CaseWhen never reads the hi value — but under Spark 4.x ANSI
    // (default TRUE for library callers) an out-of-bounds element_at
    // throws INVALID_ARRAY_INDEX at extraction, before the CaseWhen
    // can skip it. least(lo+2, __n) is value-neutral: whenever
    // frac ≠ 0, h < n-1 forces lo ≤ n-2, so the clamp only rewrites
    // indices the interpolation never evaluates.
    val withEnds = probs.foldLeft(g) { case (acc, (nm, p)) =>
      val lo = floor((col("__n").cast("double") - 1) * lit(p))
      acc
        .withColumn(s"__lo_$nm",
          element_at(col("__vs"), (lo + 1).cast("int")))
        .withColumn(s"__hi_$nm",
          element_at(col("__vs"),
            least(lo + 2, col("__n").cast("double")).cast("int")))
    }
    interpolateEndpoints(withEnds, groupCol, probs)
  }

  /** The 100-TB route (see [[groupQuantileValues]] scaladoc for the
    * full design narrative): exact per-(group, bucket) counts +
    * driver prefix sums locate the interpolation ranks; only the
    * target cells' rows are exchanged and window-ranked. */
  private def bucketedGroupQuantiles(slimIn: DataFrame,
                                     groupCol: String, valueCol: String,
                                     probs: Seq[(String, Double)])
      : DataFrame = {
    val df = slimIn
    val spark = df.sparkSession
    // Measured floor (sf1 tier, 1.5M-row orders⋈customer): an EXACT
    // bounded-memory distributed quantile needs one full counting
    // pass (target ranks cannot be known without counts) plus one
    // pruned selection pass, and each pass pays the ~0.3 s scan floor
    // + ~1 s join — the r9.2 boundary-free bucketing below removed
    // the third (approxQuantile boundary) pass. A localCheckpoint of
    // this slim relation was tried and REVERTED: materializing 1.5M
    // rows cost as much as the re-scans it saved (2.9 -> 3.3 s).
    // DuckDB wins this shape at single-node scale by sorting in
    // memory; this form is the one that still answers when the group
    // doesn't fit.
    // df is already the slim (group, double value) projection — the
    // router built it once for the stats probe and both routes.
    val slim = df
    // r9 target-cell pruning (the sf1 12.7× fix): the quantile needs
    // only the ≤ 2·|probs| rows per group at the interpolation ranks,
    // and once the per-(group, bucket) cell counts are on the driver
    // we KNOW which cells hold those ranks — so instead of ranking
    // every row (rangeBucketRank's full-data window: a 100%-of-rows
    // exchange) the scan keeps only the target cells (a broadcast
    // inner join, map-side) and windows ~|probs|·(n/buckets) rows per
    // group. The per-group counts ALSO fall out of the cells collect,
    // deleting the separate count shuffle. ONE full-data pass remains
    // (cells) plus one map-filtered pass — no full-data exchange at
    // all.
    // r9.2: boundary-FREE bucketing — the top 20 bits of the value's
    // IEEE-754 total-order key (sign+exponent+8 mantissa bits). The
    // previous approxQuantile boundary pass existed only to place
    // bucket edges, but exactness never depended on edge placement
    // (the exact per-cell counts carry it; buckets only set PRUNING
    // granularity) — and a monotone function of the value needs no
    // edges at all, so the sketch pass and its full scan+join are
    // deleted outright: 3 full-data passes -> 2. Granularity: 256
    // cells per octave (~n/256 rows per target cell for
    // exponent-concentrated data, finer when values span octaves);
    // ties of equal values can split across the -0.0/0.0 cell
    // boundary, which concatenates equal values in a valid sorted
    // order, exactly like ties inside one cell.
    // r9.5: codegen'd total-order key (TotalOrderBucket) — the former
    // Scala UDF broke whole-stage codegen on BOTH full-data passes
    // (cells and the pruned scan share this projection) and paid
    // per-row boxing for three integer ops. Same bit arithmetic:
    // flip negatives entirely, set the sign bit on positives (the
    // standard total-order key whose UNSIGNED order is value order),
    // >>> 44 keeps the top 20 bits as a monotone non-negative Int.
    val withG = slim.withColumn("__g",
      org.apache.spark.sql.graftx.TotalOrderBucket.asColumn(
        col(valueCol).cast("double"), 44))
    val maxCells = 100000
    val cells = withG.groupBy(col(groupCol), col("__g")).count()
      .limit(maxCells + 1).collect()
    require(cells.length <= maxCells,
      "groupQuantileValues: more than " + maxCells + " (group, " +
        "bucket) cells — the group domain is too large for the " +
        "collect-and-broadcast prefix; use the plain window form or " +
        "a coarser group key")
    require(cells.forall(!_.isNullAt(0)),
      "groupQuantileValues: null group key — the pruning join would " +
        "silently drop those rows; filter or coalesce the group " +
        "column first")
    // null VALUE → null __g bucket: without this the prefix-sum
    // builder below would die in a bare NullPointerException on
    // getInt(1) — name the cause instead (the compact route raises
    // the same contract at execution time)
    require(cells.forall(!_.isNullAt(1)),
      "groupQuantileValues: null value column — nulls have no rank; " +
        "filter them or impute first")
    // driver-side per-group prefix sums → group sizes and the cells
    // containing each target rank lo+1 / lo+2, lo = floor((n−1)·p)
    // (same double expression the interpolation below uses)
    val byGroup = cells.groupBy(_.get(0)).map { case (g, rows) =>
      val sorted = rows.map(r => (r.getInt(1), r.getLong(2)))
        .sortBy(_._1)
      var acc = 0L
      val cs = sorted.map { case (b, c) =>
        val e = (b, acc, c); acc += c; e }
      g -> (acc, cs)
    }
    val targetRows = byGroup.iterator.flatMap { case (g, (n, cs)) =>
      val ranks = probs.flatMap { case (_, p) =>
        val lo = math.floor((n - 1).toDouble * p).toLong
        (lo + 1) +: (if (lo + 2 <= n) Seq(lo + 2) else Nil)
      }.distinct
      ranks.map { r =>
        cs.find { case (_, off, c) => off < r && r <= off + c }.get
      }.distinct.map { case (b, off, c) =>
        org.apache.spark.sql.Row.fromSeq(Seq[Any](g, b, off, c)) }
    }.toSeq
    val it = org.apache.spark.sql.types.IntegerType
    val lt = org.apache.spark.sql.types.LongType
    val tSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(groupCol).copy(nullable = false),
      org.apache.spark.sql.types.StructField("__g", it, false),
      org.apache.spark.sql.types.StructField("__off", lt, false),
      org.apache.spark.sql.types.StructField("__exp", lt, false)))
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1), tSchema)
    val cSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(groupCol).copy(nullable = false),
      org.apache.spark.sql.types.StructField("__n", lt, false)))
    val counts = spark.createDataFrame(
      spark.sparkContext.parallelize(byGroup.iterator.map {
        case (g, (n, _)) =>
          org.apache.spark.sql.Row.fromSeq(Seq[Any](g, n))
      }.toSeq, 1), cSchema)
    // inner broadcast join = the map-side cell filter. Guard residual
    // (weaker than rangeBucketRank's left-join form, by design): a
    // nondeterministic input whose rows move into a NON-target cell
    // between the two jobs escapes detection — rows moving into a
    // target cell still trip the count-drift raise below. Same
    // deterministic-input contract as every rank consumer.
    // r9.6: the target BUCKET set (few hundred ints, known on the
    // driver) also goes in as an isin predicate on __g alone. The
    // (group, __g) join can only run ABOVE whatever join produced the
    // group column, but __g is a deterministic function of the value
    // column only — so Catalyst pushes this filter below the caller's
    // join to the value-side scan, and pass 2 joins ~|targets| cells'
    // worth of rows instead of re-running the full-width join first.
    val targetBuckets = targetRows.map(_.getInt(1)).distinct
    val kept = withG.where(col("__g").isInCollection(targetBuckets))
      .join(broadcast(targets), Seq(groupCol, "__g"))
    val w = Window.partitionBy(col(groupCol), col("__g"))
      .orderBy(col(valueCol))
    val sameCount = count(lit(1))
      .over(Window.partitionBy(col(groupCol), col("__g")))
    val ranked = kept.withColumn("__r",
      when(sameCount =!= col("__exp"), raise_error(concat(
        lit("groupQuantileValues: cell row count drifted between " +
          "jobs (saw "), sameCount.cast("string"),
        lit(", collected "), col("__exp").cast("string"),
        lit(") — is the input deterministic?"))))
        .otherwise(col("__off") + row_number().over(w)).cast("long"))
    val j = ranked.join(broadcast(counts), Seq(groupCol))
    interpolateAtRanks(j, groupCol, valueCol, probs)
  }

  /** Rank-row endpoint extraction for the bucketed route: from rows
    * carrying `__r` (1-based rank of `valueCol` within its group) and
    * `__n` (group row count, long), keep the lo/hi rank rows per prob
    * and pivot them into a one-row-per-group aggregate, then hand to
    * the shared fold. */
  private def interpolateAtRanks(j: DataFrame, groupCol: String,
                                 valueCol: String,
                                 probs: Seq[(String, Double)])
      : DataFrame = {
    def loRank(p: Double): Column =
      floor((col("__n").cast("double") - 1) * lit(p))
    val keep = probs.map { case (_, p) =>
      col("__r") === loRank(p) + 1 || col("__r") === loRank(p) + 2
    }.reduce(_ || _)
    val aggs = probs.flatMap { case (nm, p) => Seq(
      max(when(col("__r") === loRank(p) + 1, col(valueCol)))
        .as(s"__lo_$nm"),
      max(when(col("__r") === loRank(p) + 2, col(valueCol)))
        .as(s"__hi_$nm")) }
    val g = j.where(keep).groupBy(col(groupCol))
      .agg(max(col("__n")).as("__n"), aggs: _*)
    interpolateEndpoints(g, groupCol, probs)
  }

  /** Shared interpolation fold of both [[groupQuantileValues]] routes:
    * from one row per group carrying `__n` and `__lo_nm`/`__hi_nm`
    * endpoint columns, interpolate with every IEEE op in the fixed
    * textual order the oracle SQL replays. Living in ONE place is
    * what makes the compact/bucketed route equality bit-exact by
    * construction — the routes differ only in how they EXTRACT the
    * two endpoint values per prob, never in arithmetic. */
  private def interpolateEndpoints(g: DataFrame, groupCol: String,
                                   probs: Seq[(String, Double)])
      : DataFrame = {
    val out = probs.foldLeft(g) { case (acc, (nm, p)) =>
      val h = (col("__n").cast("double") - 1) * lit(p)
      val frac = h - floor(h)
      // frac = 0 ⇒ the lo rank IS the quantile (and the hi rank may
      // not exist when lo+1 = n); CaseWhen never evaluates the
      // interpolation branch there, so the null hi can't propagate
      acc.withColumn(nm,
        when(frac === 0.0, col(s"__lo_$nm"))
          .otherwise(col(s"__lo_$nm") +
            (col(s"__hi_$nm") - col(s"__lo_$nm")) * frac))
    }
    out.select((col(groupCol) +: col("__n") +:
      probs.map { case (nm, _) => col(nm) }): _*)
  }

  /** Point-in-interval range join without an equi key — "which events
    * fall inside which time windows" when the windows overlap and
    * belong to no shared partition key, the case plain equi-joins
    * can't express and a naive theta-join turns into a broadcast
    * nested-loop cross product.
    *
    * Grain-bucketed form (the standard distributed range-join
    * rewrite): points land in exactly one `grainSec` bucket;
    * intervals are exploded to every bucket they touch; an EQUI-join
    * on the bucket pairs each point with only the intervals sharing
    * its grain, and the residual `lo ≤ pt ≤ hi` filter (inclusive
    * both ends) exactifies. Each (point, interval) pair can meet in
    * at most one bucket — the point's — so no post-join dedup is
    * needed. Shuffles both sides by bucket: parallelism follows time,
    * the join key Spark would otherwise not have.
    *
    * Sizing: replication factor per interval is len/grainSec + 1 —
    * pick the grain at or above the typical interval length (one
    * extra copy), never far below it (len/grain copies). Time skew
    * (a hot hour) concentrates buckets exactly like a hot groupBy
    * key; AQE skew-join handles it, or shrink the grain.
    *
    * Inputs: `ptCol`/`loCol`/`hiCol` are non-null timestamps with
    * `lo ≤ hi`; point and interval column names must be disjoint
    * (the join returns both sides' columns). */
  def pointInIntervalJoin(points: DataFrame, ptCol: String,
                          intervals: DataFrame, loCol: String,
                          hiCol: String, grainSec: Long): DataFrame = {
    require(grainSec > 0, s"grainSec must be positive, got $grainSec")
    // floor(epochSec / grain): timestamp→long cast truncates to whole
    // seconds; the division is exact in double for any epoch < 2^53.
    def grain(c: Column): Column =
      floor(c.cast("long") / lit(grainSec)).cast("long")
    val p = points.withColumn("__pg", grain(col(ptCol)))
    val i = intervals.withColumn("__ig",
      explode(sequence(grain(col(loCol)), grain(col(hiCol)))))
    p.join(i, col("__pg") === col("__ig") &&
        col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__pg", "__ig")
  }

  /** Order-independent exact sum of a double column: route through
    * decimal(precision, scale) so partial-aggregate order cannot
    * perturb the result (needed for bit-exact cross-engine
    * verification), then back to double. The single definition of the
    * sum-through-decimal doctrine — moment-sum callers
    * ([[ProfileOps.correlations]], `corr_agg`) widen the precision for
    * squared terms. Domain: |values| must fit the decimal (overflow
    * nulls out under ansi=false and the sum silently drops the row)
    * and are quantized to `scale` decimals. */
  def exactSum(c: Column, scale: Int = 2, precision: Int = 18): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(precision, scale)))
      .cast("double")

  /** [[exactSum]]-style order-independent exact summation at long-lane
    * speed: quantize each value to `scale` decimals with HALF-UP-away-
    * from-zero rounding — `sign(x)·floor(|x|·10^s + 0.5)` evaluated on
    * the double's BINARY value — sum the resulting longs (exact,
    * order-independent integer math), and divide back once in double.
    * The formula, not a decimal cast, defines the quantization for the
    * same reason [[q4]] does: cast rounding is engine-specific (Spark's
    * double→decimal goes through Double.toString's shortest
    * representation and can disagree with a binary-value round at
    * representation ties; DuckDB rounds the binary value), while
    * sign/abs/floor/× on identical IEEE operands are bit-identical
    * everywhere.
    *
    * Why it exists: Spark's decimal sum runs ~1 µs/row on the
    * non-codegen Decimal update path — measured 16 s of `range_join`'s
    * 20 s at 46M joined rows — while the long sum stays inside
    * whole-stage codegen at ~0.03 µs/row (4.3 s total, 4.7×). Same
    * trade the q4 moment family made against decimal(28,4)
    * (profile_corr), now available to the plain-sum callers feeding
    * tens of millions of rows into one aggregate.
    *
    * Domain guard (same doctrine as [[laneRowGuard]]): the long sum
    * wraps silently under ansi=false, so the aggregate rides
    * count+max(|q|) along and RAISES when n·max|q| could reach the
    * Int64 edge (conservative 4.6e18 bound — double-rounding-proof,
    * still > 4.6e9 rows of million-scaled values per group). The
    * decimal path's failure mode (silent null on precision overflow)
    * is strictly worse; this one is loud.
    *
    * Oracle form (DuckDB sums BIGINT into exact HUGEINT — equal to the
    * guarded long sum whenever the guard passes):
    * `CAST(SUM(CAST(SIGN(x)*FLOOR(ABS(x)*1e6+0.5) AS BIGINT)) AS
    * DOUBLE) / 1e6` */
  def exactSumQ(c: Column, scale: Int = 6): Column = {
    val f = math.pow(10, scale)
    // NaN → null, NOT Spark's non-ANSI NaN→0L cast: the decimal
    // exactSum path nulls a NaN out (row skipped by SUM) and DuckDB
    // errors on CAST('nan' AS BIGINT) — counting a NaN row as +0
    // would silently diverge engine from oracle if a value column
    // ever gains NaNs. ±Inf quantizes to ±Long.MaxValue-ish and
    // trips the lane guard below, which is already loud.
    val q = when(isnan(c), lit(null).cast("long"))
      .otherwise((signum(c) * floor(abs(c) * lit(f) + lit(0.5)))
        .cast("long"))
    val n = count(q)
    val mx = max(abs(q))
    when(n.cast("double") * mx.cast("double") > lit(4.6e18),
      raise_error(lit(s"exactSumQ(scale=$scale): group sum may " +
        "exceed the Int64 lane domain - use the decimal exactSum " +
        "path for this aggregate")))
      .otherwise(sum(q).cast("double") / lit(f))
  }

  /** Scale-4 quantization and exact moment sums in LONG lanes — the
    * codegen-speed replacement for decimal(28,4) moment sums, whose
    * precision > 18 forces Spark onto the per-row BigDecimal path
    * (profile_corr benched 2.5 s at sf0.1, ~half of it decimal
    * arithmetic). Doctrine: every step is either exact integer math
    * or an IEEE op both engines execute on identical operands in
    * identical order, so the results are bit-identical cross-engine.
    *
    *  - [[q4]]: `floor(x·1e4 + 0.5)` in double, cast long — the
    *    engine-neutral quantization (NOT a decimal cast, whose
    *    rounding is engine-specific);
    *  - [[q4Sum]]: first moments — one long sum, back to the value
    *    domain by one division;
    *  - [[q4ProdSum]]: second moments — the per-row product p = q·q
    *    fits a long (|q| < 2^31.5), but its SUM does not, so each
    *    product is split into hi = p >> 32 and lo = p & (2^32−1)
    *    lanes. Both shifts are ARITHMETIC (Spark `shiftright` = JVM
    *    `>>`; DuckDB `>>` on BIGINT, verified), so
    *    hi·2^32 + lo == p holds exactly for NEGATIVE products too:
    *    hi = floor(p/2^32) sign-extends and lo is always in
    *    [0, 2^32). Lane sums are exact Int64 arithmetic; the
    *    recombination `hi·2^32 + lo` runs in double IN THE SAME
    *    ORDER in the oracle SQL (`(CAST(SUM(p >> 32) AS DOUBLE) *
    *    4294967296.0 + CAST(SUM(p & 4294967295) AS DOUBLE)) / 1e8`),
    *    so even where the true sum exceeds 2^53 both engines round
    *    identically.
    *
    * Domain — TWO bounds, both enforced by callers in the same
    * aggregate pass (count(*) and min/max(q) ride along free):
    *
    *  - per VALUE: |q| must stay below [[q4MaxAbs]] = floor(2^31.5)
    *    so the per-row product fits Int64 — at scale 4 that is values
    *    up to ~3×10^5 in magnitude squared, or ~3×10^9 crossed with
    *    ~1; TPC-H quantities and prices qualify with orders of
    *    magnitude to spare. Checked with signed min/max(q) (see
    *    ProfileOps.correlations).
    *  - per ROW COUNT: n ≤ [[laneMaxRows]] = 2^31−1. The lo lane adds
    *    a value in [0, 2^32) per row, so its SUM itself wraps Int64
    *    silently (ansi=false) past ~2^31 rows — well inside a 100-TB
    *    fact table even though every per-row product is in-domain.
    *    The value bound never constrains n; this one does.
    *
    * On violation callers fall back to [[exactSum]] (decimal, slower,
    * 28-digit domain — ProfileOps.correlations) or raise loudly via
    * [[laneRowGuard]] (the oracle-gated moment queries). */
  def q4(c: Column, scale: Int = 4): Column =
    floor(c * lit(math.pow(10, scale)) + lit(0.5)).cast("long")

  /** Largest |q| for which q·q fits Int64: floor(2^31.5). */
  val q4MaxAbs: Long = 3037000499L

  /** Largest row count for which [[q4ProdSum]]'s lane SUMS stay inside
    * Int64: the lo lane contributes up to 2^32−1 per row, and
    * (2^31−1)·(2^32−1) < 2^63−1 while 2^31·(2^32−1) overflows. The hi
    * lane (|hi| ≤ 2^31 per row) is safe under the same bound. */
  val laneMaxRows: Long = Int.MaxValue.toLong

  /** Inline row-count guard for q4 lane-moment queries: passes `n`
    * (a double count) through unchanged inside [[laneMaxRows]], raises
    * loudly beyond it — a silently-wrapped moment sum would produce a
    * confidently wrong corr/stddev with no witness. CaseWhen evaluates
    * the raise only on the violating row, so the guard costs one
    * comparison on the (tiny) aggregate relation. */
  def laneRowGuard(n: Column, caller: String): Column =
    when(n > lit(laneMaxRows.toDouble), raise_error(lit(
      s"$caller: row count exceeds the q4 lane-sum domain " +
        s"(2^31-1 rows) — switch to the decimal exactSum path")))
      .otherwise(n)

  /** Value-domain exact sum of a [[q4]]-quantized column. */
  def q4Sum(qc: Column, scale: Int = 4): Column =
    sum(qc).cast("double") / lit(math.pow(10, scale))

  /** Value-domain exact sum of products of two [[q4]] columns (pass
    * the same column twice for a sum of squares). */
  def q4ProdSum(qa: Column, qb: Column, scale: Int = 4): Column = {
    val p = qa * qb
    (sum(shiftright(p, 32)).cast("double") * lit(4294967296.0) +
      sum(p.bitwiseAND(lit(4294967295L))).cast("double")) /
      lit(math.pow(10, 2 * scale))
  }

  /** Exception-free numeric coercion — pandas `to_numeric(errors=
    * 'coerce')` (ref cms_preprocess.py:72) without try_cast's failure
    * tax. Spark's TryEval evaluates the ANSI cast and CATCHES the
    * per-row throw on failure — ~7 µs/row, 12× a plain projection
    * when most values are non-numeric (measured on 150k rows:
    * all-fail `try_cast` 1.08 s vs 0.09 s for the succeeding cast).
    * At corpus scale a mostly-non-numeric column would spend the
    * whole stage constructing exceptions. The fix: a cheap rlike
    * prefilter short-circuits certainly-invalid rows to null inside
    * the CASE branch, so try_cast only evaluates on plausible
    * numerics; values that pass the shape check but still fail (e.g.
    * a 22-digit overflow) reach try_cast and null out correctly.
    *
    * The guard direction matters: it must be a SUPERSET of what the
    * cast accepts — a false positive merely pays the exception on a
    * rare weird string, a false negative would silently null a value
    * try_cast accepts. Spark trims chars ≤ 0x20 (not just \s) and
    * its double parser is Java's parseDouble grammar: case-
    * insensitive nan/inf/infinity, trailing d/f suffixes, hex floats
    * like 0x1p3 — the double guard admits all of them. Agreement is
    * pinned value-by-value in RelationalOpsSpec. */
  def coerceLong(c: Column): Column =
    when(c.rlike("^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"),
      c.try_cast("bigint"))

  /** [[coerceLong]] for doubles: the shape check admits decimal,
    * scientific, suffixed, hex-float, and nan/inf forms; try_cast
    * remains the authority on the rest. */
  def coerceDouble(c: Column): Column =
    when(c.rlike("(?i)^[\\x00-\\x20]*[+-]?(nan|inf(inity)?|" +
      "0x[0-9a-f]*\\.?[0-9a-f]*p[+-]?[0-9]+[df]?|" +
      "([0-9]+\\.?[0-9]*|\\.[0-9]+)(e[+-]?[0-9]+)?[df]?)" +
      "[\\x00-\\x20]*$"), c.try_cast("double"))

  /** As-of join: for each left row, the single latest right row with
    * `right.ts <= left.ts` on the same key — the standard point-in-time
    * lookup (features "as of" an event) that Spark's built-in joins
    * can't express without a range-condition row explosion.
    *
    * Implemented with the union-and-window shape: tag both sides, union,
    * and carry the last right payload forward over a (key)-partitioned
    * (ts, side)-ordered window. One shuffle on the key, no pair
    * explosion, and skew follows the key distribution exactly like a
    * groupBy — the scalable form (a range join would replicate right
    * rows per left row).
    *
    * @param left      left rows; must contain `keyCol` and `tsCol`
    * @param right     right rows; must contain `keyCol` and `tsCol`
    * @param payload   right columns to carry (exposed as `asof_<name>`)
    * @return left rows (all columns) plus the as-of payload columns;
    *         inner semantics — left rows with no prior right row drop
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // NULL timestamps are excluded on BOTH sides: nulls sort FIRST in
    // the ascending window, so a null-ts right row would masquerade as
    // "prior to everything" and win last() — where an ASOF comparison
    // (r.ts <= l.ts) is never true for NULL. Null-ts left rows can have
    // no defined as-of point either; inner semantics drop them.
    val leftNn = left.where(col(tsCol).isNotNull)
    val rightNn = right.where(col(tsCol).isNotNull)
    val pay = struct((col(tsCol) +: payload.map(col)): _*)
    val l = leftNn.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(right.select(pay).schema.fields.head.dataType)
          .as("__pay")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
    val r = rightNn.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        pay.as("__pay")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows order before left rows at equal ts → `<=` semantics.
    // The payload fields break ties among right rows sharing (key,
    // ts): last() then picks the lexicographically greatest payload —
    // deterministic across layouts/retries (the data-derived-ordering
    // doctrine of mixKey/saltedAgg), and for a single-column payload
    // it IS "max value at the winning ts", i.e. exactly what a
    // (key, ts) → max(value) pre-aggregation before the join would
    // produce — so callers need no tie-collapsing shuffle of the right
    // side (the r9 asof_join rework: 2 exchanges → 1). The previous
    // xxhash64(__pay) tie-break was equally deterministic but picked
    // the hash-max payload, which no SQL oracle can restate.
    //
    // The tie-break sorts the EXTRACTED payload fields, not the __pay
    // struct (r10): a struct sort key forces interpreted struct
    // comparisons in the window sort where plain field keys stay on
    // the primitive comparator path — measured 1.4-2× warm and ~4×
    // first-execution on a 10M-event as-of (sf10 pyspark A/B). The
    // total order on every pair last() can distinguish is unchanged:
    // __pay's leading field is tsCol, already equal when the struct
    // comparison mattered, so (field₁, field₂, …) compares exactly as
    // the struct did; left rows (null __pay ⇒ all-null fields) sort
    // first within an equal-ts side-1 run either way, and their
    // relative order is immaterial — they all observe the same
    // running last() and carry nothing themselves.
    val w = Window.partitionBy(keyCol)
      .orderBy((Seq(col(tsCol), col("__side")) ++
        payload.map(p => col(s"__pay.$p"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__last", last(col("__pay"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1 && col("__last").isNotNull)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(s"asof_$p"))): _*)
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1 groups
    * by (key, salt) so one hot key spreads over `salts` reducers, phase 2
    * merges the partials. Use when one key holds a disproportionate share
    * of rows (AQE's skew-join handling doesn't cover aggregations).
    *
    * `partials` aggregate raw rows; `merges` combine partial columns
    * (e.g. partial `count` merges with `sum`, partial `sum` with `sum`,
    * partial `max` with `max`). The caller names partial columns and
    * merges by those names.
    *
    * The salt is derived from the row's own data (hash of its hashable
    * columns), not from partition/row position: a retried or speculative
    * task then salts identically, so the output is stable under task
    * failure — the same determinism doctrine as [[mixKey]]. MapType
    * columns are excluded from the salt (Spark's `hash` rejects maps);
    * rows identical in every hashable column share a salt, which only
    * matters if one key's rows are near-all duplicates (then
    * pre-aggregate a count first).
    */
  /** Whether a type transitively contains a MapType — maps aren't
    * hashable/distinct-countable in Spark SQL; shared by [[saltedAgg]]
    * (salt derivation) and [[ProfileOps.profile]] (distinct counts). */
  private[operators] def containsMapType(
      t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case _: org.apache.spark.sql.types.MapType => true
    case a: org.apache.spark.sql.types.ArrayType =>
      containsMapType(a.elementType)
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.exists(x => containsMapType(x.dataType))
    case _ => false
  }

  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val hashable = df.schema.fields
      .filterNot(f => containsMapType(f.dataType))
      .map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedAgg needs at least one non-map column to derive the salt")
    val salted = df.withColumn("__salt",
      pmod(hash(hashable: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }
}
