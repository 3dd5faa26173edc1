package graft.sources

import graft.operators.RelationalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Consumer half of the audit chain — the integrity check a training
    * job runs BEFORE reading a shard directory (and a resume runs
    * before trusting a partial download): re-derive the manifest from
    * the shard data actually on disk and diff it against the committed
    * one under `_manifest/`.
    *
    * @return discrepancy rows (shard, field, expected, actual) —
    *         EMPTY means the artifact verifies. Any edit, loss, or
    *         duplication of a single row flips that shard's
    *         `content_md5` (and usually `n_docs`/`n_chars`); a shard
    *         present on only one side reports every field against
    *         `<absent>`; rows sitting in the wrong shard directory
    *         (id-derived shard ≠ partition directory) report as
    *         `misplaced_rows`, which the id-keyed re-derived manifest
    *         alone could never see. One scan of the shard bytes plus
    *         a metadata-scale diff — same cost shape as the write-side
    *         manifest.
    *
    * `nShards` is the count the artifact was written with (the
    * reader's contract, like the schema); a stored shard id at or
    * above it is itself reported as a `shard_id_range` discrepancy.
    */
  def verifyShards(spark: SparkSession, outDir: String, idCol: String,
                   textCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // `_manifest/` starts with an underscore, so the data read's file
    // listing skips it (Hadoop hidden-path convention) — the manifest
    // never verifies itself.
    val data = spark.read.parquet(outDir)
      .select(col(idCol), col(textCol),
        col("shard").cast("int").as("__dir_shard"))
    val misplaced = data
      .withColumn("__expect",
        pmod(RelationalOps.mixKey(col(idCol)), lit(nShards)).cast("int"))
      .where(col("__expect") =!= col("__dir_shard"))
      .groupBy(col("__dir_shard").as("shard"))
      .agg(count("*").as("__n"))
      .select(col("shard"), lit("misplaced_rows").as("field"),
        lit("0").as("expected"), col("__n").cast("string").as("actual"))
    val fields = Seq("n_docs", "n_chars", "min_doc", "max_doc",
      "content_md5")
    val fresh = manifest(data.select(idCol, textCol), idCol, textCol,
      nShards)
    val stored = spark.read.parquet(s"$outDir/_manifest")
    val outOfRange = stored
      .where(col("shard") < 0 || col("shard") >= nShards)
      .select(col("shard").cast("int").as("shard"),
        lit("shard_id_range").as("field"),
        lit(s"[0, $nShards)").as("expected"),
        col("shard").cast("string").as("actual"))
    val j = stored.select(col("shard").cast("int").as("shard") +:
        fields.map(f => col(f).cast("string").as(s"e_$f")): _*)
      .join(fresh.select(col("shard") +:
        fields.map(f => col(f).cast("string").as(s"a_$f")): _*),
        Seq("shard"), "full_outer")
    val fieldDiffs = fields.map { f =>
      j.where(col(s"e_$f").isNull || col(s"a_$f").isNull ||
          col(s"e_$f") =!= col(s"a_$f"))
        .select(col("shard"), lit(f).as("field"),
          coalesce(col(s"e_$f"), lit("<absent>")).as("expected"),
          coalesce(col(s"a_$f"), lit("<absent>")).as("actual"))
    }.reduce(_ unionByName _)
    fieldDiffs.unionByName(misplaced).unionByName(outOfRange)
  }
}
