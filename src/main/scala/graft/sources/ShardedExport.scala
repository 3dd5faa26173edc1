package graft.sources

import graft.operators.RelationalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus export: assign every row a stable
  * shard, write parquet partitioned by it, and emit an audit manifest
  * the reader can re-derive — the reproducible-export stage a training
  * pipeline ends with (fixed shard membership is what makes a data
  * release citable and a resume/re-read verifiable).
  *
  * Shard assignment is [[RelationalOps.mixKey]] mod `nShards` — a pure
  * function of the row's own id. Deliberately NOT round-robin /
  * `spark.sql.files`-derived / partition-id-based: those depend on
  * task layout and AQE coalescing, so two runs of the same corpus
  * would ship different shards (the cross-job partition-id trap,
  * cf. PackingOps' drift guard). Hash sharding also balances row
  * counts to ~±√(n/k) without a sort or range-boundary job.
  *
  * At 100 TB: assignment is map-only; `partitionBy("shard")` writes
  * each task's rows straight into per-shard directories (no global
  * shuffle — accept one file per task per shard, or repartition on
  * shard first for exactly one file each, one bounded shuffle). The
  * manifest aggregation shuffles 32-byte digests, never text.
  */
object ShardedExport {

  /** `df` + a stable `shard` column in [0, nShards). `pmod`, not `%`:
    * mixKey preserves the sign of a negative id, and a `%`-derived
    * shard=-3 directory would be invisible to any reader indexing
    * shards 0..nShards-1 (identical for the id ≥ 0 common case). */
  def assignShards(df: DataFrame, idCol: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shard",
      pmod(RelationalOps.mixKey(col(idCol)), lit(nShards)).cast("int"))
  }

  /** Per-shard audit manifest: counts, char volume, id range, and an
    * order-canonical content digest (md5 over per-row md5s
    * concatenated in ascending `idCol` order — insensitive to task
    * order, sensitive to any content or membership change). */
  def manifest(df: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    assignShards(df, idCol, nShards)
      .select(col("shard"), col(idCol).as("__id"),
        col(textCol).as("__t"))
      .withColumn("h", md5(col("__t")))
      .groupBy("shard")
      .agg(count("*").as("n_docs"),
        sum(length(col("__t"))).as("n_chars"),
        min("__id").as("min_doc"), max("__id").as("max_doc"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("__id"), col("h")))),
          x => x.getField("h")), "")).as("content_md5"))

  /** Write `df` as parquet partitioned by the stable shard, plus the
    * manifest alongside under `_manifest/`. Returns the manifest.
    *
    * The manifest is derived from a READ-BACK of the written files,
    * not from `df`: re-evaluating the input lineage would both pay a
    * second scan of everything upstream of the export and — if that
    * lineage is nondeterministic (a sample, a changed source) —
    * certify rows that are not the rows actually shipped. Reading the
    * output back costs one scan of exactly the exported bytes and
    * makes the audit chain attach to the artifact itself. */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
                  nShards: Int, outDir: String,
                  oneFilePerShard: Boolean = false): DataFrame = {
    val sharded = assignShards(df, idCol, nShards)
    val laidOut =
      if (oneFilePerShard) sharded.repartition(nShards, col("shard"))
      else sharded
    laidOut.write.mode("overwrite").partitionBy("shard")
      .parquet(outDir)
    val m = manifest(
      df.sparkSession.read.parquet(outDir).select(idCol, textCol),
      idCol, textCol, nShards)
    m.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_manifest")
    m
  }
}
