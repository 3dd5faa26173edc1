package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining shards: lay every document's
  * tokens on one global token stream (in a caller-chosen total order)
  * and chunk the stream into fixed-size context windows — the
  * concatenate-and-chunk layout GPT-style training data uses. A doc's
  * `tok_offset` is its start position on the stream and its `shard` is
  * the window its first token lands in.
  *
  * The natural Spark expression — `sum(n).over(Window.orderBy(id))` —
  * is exact but funnels every row through ONE reducer (an
  * unpartitioned window), the classic global-sort scale-killer.
  * [[packTokens]] is the distributed form of the same prefix sum:
  *
  *  1. split the id domain into ordered range buckets (boundaries
  *     from one approx-quantile sketch pass over the id column alone,
  *     or caller-supplied to skip that pass);
  *  2. per-bucket token totals — one partial-aggregated shuffle of
  *     (bucket, sum) rows, collected: #buckets values, bounded by
  *     configuration, not data (the same justified-collect doctrine
  *     as `Similarity.ivfIndex`'s quantizer sample);
  *  3. broadcast the exclusive prefix over buckets in id order and
  *     run one hash-shuffle + within-partition sort pass that emits
  *     each row's offset with a per-bucket running sum.
  *
  * Correctness depends ONLY on deterministic column values (the
  * bucket of an id under a fixed boundary array, the in-bucket id
  * order) — never on physical partition ids. An earlier formulation
  * keyed the broadcast prefix by `TaskContext.getPartitionId` across
  * two jobs; at 10^7 rows AQE coalesced the two jobs' shuffles to
  * DIFFERENT partition counts and the prefix array misindexed
  * (caught by `PackScale`). Whole-bucket co-location survives any
  * AQE coalescing because coalescing merges partitions, never splits
  * groups of equal hash keys.
  *
  * `PackingSpec` proves equality with the window form row-for-row;
  * `PackScale` re-proves it at 10^7 rows and measures the linearity;
  * `TextQueries.defs("seq_pack")` registers it against a DuckDB
  * window oracle in the driver gate.
  */
object PackingOps {

  /** @param df         input with a unique orderable id and a token count
    * @param idCol      unique id column (defines the stream order; ties
    *                   would make offsets nondeterministic)
    * @param nTokCol    per-doc token count (non-negative)
    * @param budget     context-window size in tokens (> 0)
    * @param boundaries optional ascending id-range boundaries (bucket
    *                   i = ids in (boundaries(i-1), boundaries(i)]);
    *                   supplying them skips the quantile-sketch pass.
    *                   Boundary quality only affects balance, never
    *                   correctness.
    * @return (idCol, nTokCol, tok_offset, shard), one row per input row
    */
  def packTokens(df: DataFrame, idCol: String, nTokCol: String,
                 budget: Long,
                 boundaries: Option[Array[Long]] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    // Fail loudly at entry on precondition violations (null/uncastable
    // id or count, negative count, NON-INTEGRAL value) — without this a
    // null survives the cast and surfaces rows later as an opaque
    // encoder NPE, and a fractional double id would TRUNCATE silently,
    // merging distinct ids and making offsets nondeterministic despite
    // the unique-orderable-id contract. The integrality check compares
    // the double views of the raw and cast values: exact for any value
    // that long truncation could actually change (< 2^53).
    def checked(name: String, c: Column, allowNeg: Boolean): Column = {
      val v = c.cast("long")
      val nonIntegral = c.cast("double") =!= v.cast("double")
      val bad0 = v.isNull || nonIntegral
      val bad = if (allowNeg) bad0 else bad0 || v < 0
      when(bad, raise_error(concat(
        lit(s"packTokens: null/invalid/non-integral $name: "),
        coalesce(c.cast("string"), lit("null")))))
        .otherwise(v)
    }
    val ds0 = df.select(
      checked(idCol, col(idCol), allowNeg = true).as("id"),
      checked(nTokCol, col(nTokCol), allowNeg = false).as("n"))
    val nBuckets = spark.sessionState.conf.numShufflePartitions * 4
    val bnds: Array[Long] = boundaries.getOrElse {
      val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
      if (probs.isEmpty) Array.empty[Long]
      else ds0.stat.approxQuantile("id", probs, 0.01)
        .map(_.toLong).distinct.sorted
    }
    require(bnds.sameElements(bnds.distinct.sorted),
      "boundaries must be ascending and distinct")
    // Bucket of an id: count of boundaries < id (searchsorted-left) —
    // a pure function of (id, bnds), identical in every job that
    // evaluates it. Binary search has no built-in expressionform for
    // an arbitrary array; the UDF is a narrow per-row Long op.
    val bndsLocal = bnds
    val bucketOf = udf { id: Long =>
      val i = java.util.Arrays.binarySearch(bndsLocal, id)
      if (i >= 0) i else -i - 1
    }
    val withG = ds0.withColumn("g", bucketOf(col("id")))
    // Per-bucket totals: #buckets tiny rows, driver-side prefix. Row
    // counts ride along for the cross-job invariant below.
    val totals = withG.groupBy("g")
      .agg(sum("n").as("t"), count("*").as("c"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    // bucket -> (exclusive token prefix, token total, row count)
    val prefix: Map[Int, (Long, Long, Long)] =
      totals.map { case (g, t, c) =>
        val e = g -> (acc, t, c); acc += t; e
      }.toMap
    val bc = spark.sparkContext.broadcast(prefix)
    val b = budget
    withG.repartition(col("g")).sortWithinPartitions("g", "id")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // Cross-job determinism invariant: the offsets are only correct
        // if THIS pass sees the same per-bucket token/row totals the
        // collect pass saw. A deterministic input guarantees that; a
        // nondeterministic one (sample()/rand()-derived) that happens
        // to produce the same bucket keys with different totals would
        // silently corrupt every downstream offset — so each bucket is
        // closed against its collected (total, count) and any drift
        // fails the job loudly instead.
        var curG = Int.MinValue
        var off = 0L
        var rows = 0L
        var expTokens = 0L
        var expRows = 0L
        var base = 0L
        def closeBucket(): Unit =
          if (curG != Int.MinValue &&
            (off - base != expTokens || rows != expRows))
            throw new IllegalStateException(
              s"packTokens: bucket $curG totals drifted between jobs " +
                s"(expected $expTokens tokens/$expRows rows, saw " +
                s"${off - base}/$rows) — is the input deterministic?")
        val out = it.map { case (id, n, g) =>
          if (g != curG) {
            closeBucket()
            curG = g
            val (o, t, c) = bc.value(g)
            off = o; base = o; expTokens = t; expRows = c; rows = 0L
          }
          val start = off
          off += n
          rows += 1
          (id, n, start, start / b)
        }
        out ++ { closeBucket(); Iterator.empty }
      }.toDF(idCol, nTokCol, "tok_offset", "shard")
  }

  /** Materialize the packing as training-shard files: join the
    * assignment back to the payload and write one partition directory
    * per `shardsPerFile` consecutive context windows, rows ordered by
    * stream offset inside each. A trainer then consumes
    * `file_grp=0,1,2,…` in order and sees the exact concatenated
    * token stream.
    *
    * Shapes: one shuffle join on the id (both sides hash-partitioned;
    * the packing side is 4 longs/row), one range exchange on the
    * file group (contiguous by construction — `file_grp` is a
    * monotone function of `tok_offset`), ordered parquet write. The
    * payload never moves twice.
    */
  def writeShards(packed: DataFrame, payload: DataFrame, idCol: String,
                  outDir: String, shardsPerFile: Long = 64L): Unit = {
    require(shardsPerFile > 0,
      s"shardsPerFile must be positive, got $shardsPerFile")
    packed
      .withColumn("file_grp",
        floor(col("shard") / shardsPerFile).cast("long"))
      .join(payload, idCol)
      .repartitionByRange(col("file_grp"))
      .sortWithinPartitions("file_grp", "tok_offset")
      .write.mode("overwrite").partitionBy("file_grp")
      .parquet(outDir)
  }
}
