package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val rows = (1L to 20L).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val content = Array.tabulate[Byte](100 + i.toInt)(j =>
        ((i * 31 + j) % 127).toByte)
      Row(i, s"mem://media/$i", kind, "stub", 640, 480, 1000L * i,
        content)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), MultimodalOps.mediaSchema)
  }

  test("extractFeatures is deterministic, content-sensitive, and keeps " +
    "partitioning (narrow)") {
    val df = mediaDf
    val a = MultimodalOps.extractFeatures(df, dim = 16)
    assert(a.rdd.getNumPartitions === df.rdd.getNumPartitions)
    val feats = a.select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(feats.size === 20)
    assert(feats.values.forall(_.length === 16))
    // deterministic across runs
    val b = MultimodalOps.extractFeatures(df, dim = 16)
      .select("media_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(feats === b)
    // different payloads → different features
    assert(feats(1L) !== feats(2L))
  }

  test("resizeImages rewrites payload and metadata") {
    val out = MultimodalOps.resizeImages(mediaDf, 8, 8)
    val r = out.where(col("media_id") === 1).head()
    assert(r.getAs[Array[Byte]]("content").length === 64)
    assert(r.getAs[Int]("width") === 8 && r.getAs[Int]("height") === 8)
  }

  test("StubCodec.resize yields a zero thumbnail for empty/null " +
      "payloads instead of crashing") {
    // 0-byte files are common in real media dumps; the old guard
    // avoided the modulo-by-zero but then indexed the empty array.
    assert(MultimodalOps.StubCodec.resize(Array.empty[Byte], 4, 4)
      .toSeq === Seq.fill(16)(0.toByte))
    assert(MultimodalOps.StubCodec.resize(null, 2, 2)
      .toSeq === Seq.fill(4)(0.toByte))
  }

  test("loadBinaryDir ingests a file directory into the media schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    (1 to 5).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"img_$i.jpg"),
        Array.tabulate[Byte](50 + i)(j => (i * j % 120).toByte))
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "not media".getBytes)
    val out = MultimodalOps.loadBinaryDir(spark, dir.toString, "image",
      glob = "*.jpg")
    assert(out.count() === 5) // txt pruned at listing time
    assert(out.columns.toSeq === MultimodalOps.mediaSchema.fieldNames
      .toSeq)
    assert(out.select("format").distinct().head().getString(0) === "jpg")
    // flows straight into the feature stage
    val feats = MultimodalOps.extractFeatures(out, dim = 8)
    assert(feats.count() === 5)
  }

  test("packMediaDir round-trips small files through parquet with " +
    "identical payloads and unchanged downstream stages") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_src")
    (1 to 7).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"img_$i.png"),
        Array.tabulate[Byte](40 + 3 * i)(j => ((i * 17 + j) % 110).toByte))
    }
    val out = java.nio.file.Files
      .createTempDirectory("graft_pack_out").toString + "/media"
    val packed = MultimodalOps.packMediaDir(spark, dir.toString, out,
      "image", glob = "*.png")
    assert(packed.count() === 7)
    assert(packed.columns.toSeq ===
      MultimodalOps.mediaSchema.fieldNames.toSeq)
    // payloads byte-identical to the direct binaryFile read
    val direct = MultimodalOps.loadBinaryDir(spark, dir.toString,
      "image", glob = "*.png")
      .select("media_id", "content").as[(Long, Array[Byte])]
      .collect().toMap
    val fromParquet = packed.select("media_id", "content")
      .as[(Long, Array[Byte])].collect().toMap
    assert(fromParquet.keySet === direct.keySet)
    assert(fromParquet.forall { case (k, v) =>
      java.util.Arrays.equals(v, direct(k)) })
    // downstream feature stage runs unchanged on the packed table and
    // agrees with the unpacked pipeline
    val fPacked = MultimodalOps.extractFeatures(packed, dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    val fDirect = MultimodalOps.extractFeatures(
      MultimodalOps.loadBinaryDir(spark, dir.toString, "image",
        glob = "*.png"), dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(fPacked === fDirect)
  }

  test("sampleVideoFrames emits n rows per video with frame indices") {
    val out = MultimodalOps.sampleVideoFrames(mediaDf, nFrames = 4)
    val vids = mediaDf.where(col("kind") === "video").count()
    assert(out.count() === vids * 4)
    assert(out.select("frame_idx").distinct().count() === 4)
    assert(out.columns.toSeq ===
      Seq("media_id", "media_path", "frame_idx", "frame_bytes"))
  }

  test("surrogate id collision across distinct paths fails loudly " +
    "instead of silently merging files (r3 What's-wrong #2)") {
    // Two DISTINCT payloads whose ids collide under the old
    // abs(xxhash64(path)) scheme: a real preimage pair is a 2^64
    // search, so the frame plants the collision directly — same
    // media_id, different media_path/content — which is exactly the
    // state a birthday collision produces at billions of files.
    val rows = Seq(
      Row(42L, "mem://a/img_1.png", "image", "png", null, null, null,
        Array[Byte](1, 2, 3)),
      Row(42L, "mem://b/other.png", "image", "png", null, null, null,
        Array[Byte](9, 9, 9)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val e = intercept[IllegalStateException] {
      MultimodalOps.assertNoIdCollisions(df)
    }
    assert(e.getMessage.contains("media_path"))
    assert(e.getMessage.contains("mem://a/img_1.png"))
    // identity survives the collision: features stay per-path distinct
    val feats = MultimodalOps.extractFeatures(df, dim = 4)
      .select("media_path", "features").as[(String, Seq[Float])]
      .collect().toMap
    assert(feats.size === 2)
    assert(feats("mem://a/img_1.png") !== feats("mem://b/other.png"))
    // and a collision-free frame passes the gate
    MultimodalOps.assertNoIdCollisions(mediaDf)
  }
}
