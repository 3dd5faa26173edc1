package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sharded export: stable assignment, write/read round-trip, and the
  * manifest's audit chain (counts and content digest re-derivable from
  * what was actually written). The driver's DuckDB gate
  * (`shard_manifest`) hash-checks the manifest itself. */
class ShardedExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .where(col("text").isNotNull)
    .select("doc_id", "text").cache()

  test("writeShards round-trips: every row lands in its assigned " +
    "shard and the manifest matches a recount of the written files") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val m = ShardedExport.writeShards(docs, "doc_id", "text",
      nShards = 4, outDir = dir, oneFilePerShard = true)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // shard column survives as partition key and matches assignment
    val expected = ShardedExport.assignShards(docs, "doc_id", 4)
      .select(col("doc_id"), col("shard"))
    val mismatch = back.select(col("doc_id"), col("shard"))
      .exceptAll(expected).count()
    assert(mismatch === 0)
    // manifest counts and digests re-derive from the written data
    val rederived = ShardedExport.manifest(back.select("doc_id", "text"),
      "doc_id", "text", 4)
    assert(m.exceptAll(rederived).count() === 0)
    assert(rederived.count() === 4)
    // the persisted manifest equals the returned one
    val persisted = spark.read.parquet(s"$dir/_manifest")
    assert(persisted.exceptAll(m).count() === 0)
  }

  test("assignment is a pure function of the id — repartitioning the " +
    "input does not move any row across shards") {
    val a = ShardedExport.assignShards(docs, "doc_id", 8)
      .select("doc_id", "shard")
    val b = ShardedExport.assignShards(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard")
    assert(a.exceptAll(b).count() === 0)
  }

  test("negative ids still land in [0, nShards) — pmod, not %") {
    val in = Seq(-1L, -5L, -1000000008L, 0L, 7L).toDF("doc_id")
      .withColumn("text", lit("x"))
    val shards = ShardedExport.assignShards(in, "doc_id", 8)
      .select("shard").as[Int].collect()
    assert(shards.forall(s => s >= 0 && s < 8), shards.mkString(","))
  }

  test("verifyShards: clean artifact verifies empty; a single edited " +
    "row is a loud mismatch naming exactly the corrupted shard") {
    val dir = Files.createTempDirectory("graft_shards_v").toString
    ShardedExport.writeShards(docs, "doc_id", "text", nShards = 4,
      outDir = dir, oneFilePerShard = true)
    assert(ShardedExport.verifyShards(spark, dir, "doc_id", "text", 4)
      .count() === 0, "clean artifact must produce an empty diff")
    // corrupt one row of shard 2: append text to the first document
    val shardDir = s"$dir/shard=2"
    val rows = spark.read.parquet(shardDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    val edited = rows.zipWithIndex.map { case ((id, t), i) =>
      (id, if (i == 0) t + " corrupted" else t) }
    val tmp = Files.createTempDirectory("graft_shard_swap").toString
    edited.toSeq.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(shardDir))
    org.apache.commons.io.FileUtils
      .copyDirectory(new java.io.File(tmp), new java.io.File(shardDir))
    val bad = ShardedExport.verifyShards(spark, dir, "doc_id", "text", 4)
      .collect()
    assert(bad.nonEmpty, "corruption must surface")
    assert(bad.forall(_.getInt(0) == 2),
      s"only shard 2 should be named, got ${bad.mkString("; ")}")
    val fieldsHit = bad.map(_.getString(1)).toSet
    assert(fieldsHit.contains("content_md5"))
    assert(fieldsHit.contains("n_chars")) // ' corrupted' adds chars
    assert(!fieldsHit.contains("n_docs")) // row count unchanged
  }

  test("verifyShards: a row sitting in the wrong shard directory " +
    "reports misplaced_rows (invisible to the id-keyed recount alone)") {
    val dir = Files.createTempDirectory("graft_shards_m").toString
    ShardedExport.writeShards(docs, "doc_id", "text", nShards = 4,
      outDir = dir, oneFilePerShard = true)
    // plant a NEW id whose true shard is NOT 1 into shard=1's directory
    val planted = (1L to 20L).find(id => java.lang.Math.floorMod(
      graft.operators.RelationalOps.mixKeyLong(id * 1000000 + 17), 4L)
      != 1L).map(_ * 1000000 + 17).get
    Seq((planted, "stray row")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$dir/shard=1")
    val bad = ShardedExport.verifyShards(spark, dir, "doc_id", "text", 4)
      .collect()
    val mis = bad.filter(_.getString(1) == "misplaced_rows")
    assert(mis.length === 1 && mis.head.getInt(0) === 1 &&
      mis.head.getString(3) === "1",
      s"expected 1 misplaced row in shard 1, got ${bad.mkString("; ")}")
  }

  test("content digest is sensitive to a single-document edit") {
    val m0 = ShardedExport.manifest(docs, "doc_id", "text", 2)
      .select("shard", "content_md5").as[(Int, String)].collect().toMap
    val oneId = docs.select(min("doc_id")).as[Long].head()
    val edited = docs.withColumn("text",
      when(col("doc_id") === oneId, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val m1 = ShardedExport.manifest(edited, "doc_id", "text", 2)
      .select("shard", "content_md5").as[(Int, String)].collect().toMap
    val changedShard = java.lang.Math.floorMod(
      graft.operators.RelationalOps.mixKeyLong(oneId), 2L).toInt
    assert(m0(changedShard) !== m1(changedShard))
    assert(m0(1 - changedShard) === m1(1 - changedShard))
  }
}
