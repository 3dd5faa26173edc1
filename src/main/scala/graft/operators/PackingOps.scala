package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining shards: lay every document's
  * tokens on one global token stream (in a caller-chosen total order)
  * and chunk the stream into fixed-size context windows — the
  * concatenate-and-chunk layout GPT-style training data uses. A doc's
  * `tok_offset` is its start position on the stream and its `shard` is
  * the window its first token lands in.
  *
  * The natural Spark expression — `sum(n).over(Window.orderBy(id))` —
  * is exact but funnels every row through ONE reducer (an unpartitioned
  * window), which is the classic global-sort scale-killer. [[packTokens]]
  * is the distributed form of the same prefix sum:
  *
  *  1. range-partition + sort within partitions on the id (the same
  *     one-shuffle layout Spark's own global sort uses — no
  *     single-reducer stage);
  *  2. per-partition token totals: one narrow pass emitting
  *     #partitions rows, collected to the driver (bounded by the
  *     partition count, not the data — the same justified-collect
  *     doctrine as `Similarity.ivfIndex`'s quantizer sample);
  *  3. broadcast the exclusive prefix of those totals and run one
  *     narrow per-partition cumulative pass.
  *
  * Two passes read the range-shuffled data, but both are shuffle-file
  * re-reads of the same exchange, not corpus re-scans. Output is
  * invariant to the partitioning: offsets derive from the global id
  * order alone (ids must be unique — ties would make the order, and so
  * the offsets, nondeterministic).
  *
  * PackingSpec proves this equals the window form row-for-row;
  * `TextQueries.defs("seq_pack")` registers it against a DuckDB window
  * oracle in the driver gate.
  */
object PackingOps {

  /** @param df      input with a unique orderable id and a token count
    * @param idCol   unique id column (defines the stream order)
    * @param nTokCol per-doc token count (non-negative)
    * @param budget  context-window size in tokens (> 0)
    * @return (idCol, nTokCol, tok_offset, shard), one row per input row
    */
  def packTokens(df: DataFrame, idCol: String, nTokCol: String,
                 budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df
      .select(col(idCol).cast("long"), col(nTokCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
    // Pass 1: per-partition totals (numPartitions tiny rows).
    val totals = ds.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((TaskContext.getPartitionId(), s))
    }.collect().sortBy(_._1)
    val nParts = totals.length
    val prefix = new Array[Long](nParts)
    var acc = 0L
    totals.foreach { case (pid, tot) => prefix(pid) = acc; acc += tot }
    val bc = spark.sparkContext.broadcast(prefix)
    // Pass 2: narrow per-partition cumulative offsets.
    val b = budget
    ds.mapPartitions { it =>
      var off = bc.value(TaskContext.getPartitionId())
      it.map { case (id, n) =>
        val start = off
        off += n
        (id, n, start, start / b)
      }
    }.toDF(idCol, nTokCol, "tok_offset", "shard")
  }
}
