package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages as
  * partition-wise transforms.
  *
  * The partition-wise transforms here are the Scala analog of PySpark's
  * `mapInPandas` batch-UDF shape: one expensive codec init per
  * partition, rows streamed through as an iterator, arrow-friendly
  * column types on both sides.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries — see the build brief): `StubCodec` produces deterministic
  * fake features from the bytes. Everything around it — schema, batch
  * iteration shape, partitioning, output contract — is the real Spark
  * plumbing and is tested. Swapping `StubCodec` for a JNI/JavaCV decoder
  * changes no plan shape: the transform stays a narrow mapPartitions.
  */
object MultimodalOps {

  /** Typed metadata carried alongside every binary payload.
    *
    * Identity is `media_path` (the source URI — unique by construction);
    * `media_id` is only a 64-bit join/shuffle SURROGATE derived from it.
    * A hashed long alone was the r3-flagged design: 63 usable bits put a
    * birthday collision at ~billions of files — exactly the 100 TB
    * design point — and a collision silently merged two files' features.
    * Now the path rides the pipeline as the authoritative key and
    * [[packMediaDir]] fails loudly if the surrogate ever collides. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_path", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("format", StringType),                 // jpeg|wav|mp4|...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("content", BinaryType)))

  /** Ingest a directory of media files through Spark's binaryFile
    * source into the [[mediaSchema]] shape. The source splits by file;
    * `pathGlobFilter` prunes at listing time. NOTE: the source SKIPS
    * 0-byte files at listing (they yield no splits) — they never enter
    * the pipeline from here or from [[packMediaDir]]; an ingest that
    * must account for every object should reconcile counts against
    * its manifest (MediaScale asserts this semantic at 10^5 files).
    * At 100 TB prefer packing small files into parquet with a binary
    * column first (the small-files problem) — this reader is the
    * packing step's input. */
  def loadBinaryDir(spark: org.apache.spark.sql.SparkSession,
                    path: String, kind: String,
                    glob: String = "*"): DataFrame =
    toMediaSchema(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path), kind)

  /** Project a raw binaryFile-source frame into [[mediaSchema]]. The
    * surrogate uses the full 64-bit xxhash64 (the old `abs(...)` halved
    * the id space); the path column is the identity. */
  def toMediaSchema(binaryFiles: DataFrame, kind: String): DataFrame =
    binaryFiles.select(
      xxhash64(col("path")).as("media_id"),
      col("path").as("media_path"),
      lit(kind).as("kind"),
      regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)
        .as("format"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      col("content"))

  /** Pack a directory of small media files into a parquet table with a
    * binary payload column — the ingest step [[loadBinaryDir]]'s scaladoc
    * promises. At 100 TB the small-files problem is the listing + task
    * overhead of millions of tiny objects: packing once into
    * ~`targetPartitionBytes` parquet files turns every downstream stage
    * into ordinary splittable columnar scans (and metadata-only reads
    * when payloads aren't selected).
    *
    * Sizing uses the binaryFile source's `length` column, which comes
    * from the file STATUS — the sizing pass lists, it does not read
    * payload bytes; content is only streamed once, into the writer. The
    * repartition hashes on media_id so payload bytes spread evenly
    * regardless of directory layout.
    *
    * @return the packed table re-read from `outPath` (same mediaSchema
    *         shape — [[extractFeatures]] et al. run on it unchanged)
    */
  def packMediaDir(spark: org.apache.spark.sql.SparkSession,
                   srcDir: String, outPath: String, kind: String,
                   glob: String = "*",
                   targetPartitionBytes: Long = 128L << 20): DataFrame = {
    // One listing serves both passes: the sizing agg reads only the
    // file-status `length` column, and the write reuses the same frame
    // — a second loadBinaryDir would re-list the directory, doubling
    // exactly the small-files listing cost this function exists to
    // amortize.
    val listed = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(srcDir)
    val total = Option(listed.agg(sum("length")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1,
      math.ceil(total.toDouble / targetPartitionBytes).toInt)
    val media = toMediaSchema(listed, kind)
    // Surrogate-collision gate: runs on the (id, path) projection only
    // (column pruning keeps payload bytes out of this agg — it is
    // listing-sized), and throws BEFORE any output is written.
    assertNoIdCollisions(media)
    media.repartition(parts, col("media_id"))
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** Fail loudly if two distinct paths share a `media_id` surrogate —
    * the silent-merge failure mode of a 64-bit hashed id at billions of
    * files. Downstream joins/groupBys may then key on the compact long
    * safely; pipelines that skip [[packMediaDir]] should call this once
    * after ingest. */
  def assertNoIdCollisions(media: DataFrame): Unit = {
    val collided = media.groupBy("media_id")
      .agg(collect_set("media_path").as("paths"))
      .where(size(col("paths")) > 1)
      .select("paths").limit(5).collect()
    if (collided.nonEmpty) {
      val sample = collided.map(_.getSeq[String](0).mkString(" <> "))
        .mkString("; ")
      throw new IllegalStateException(
        "media_id surrogate collision across distinct paths — key " +
          s"downstream work on media_path instead: $sample")
    }
  }

  /** STUB decoder: deterministic pseudo-features from content bytes.
    * Replace with a real codec behind the same signature. */
  object StubCodec {
    /** "Decode + feature-extract": `dim` floats derived from a rolling
      * hash of the payload — deterministic, content-sensitive. */
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) {
        h = 31 * h + content(i)
        i += 1
      }
      var d = 0
      while (d < dim) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        out(d) = ((h % 2000003L).toFloat / 1000001.5f) - 1.0f
        d += 1
      }
      out
    }

    /** "Resize": stub returns a content-derived thumbnail payload of
      * `w*h` bytes. Null/empty payloads (0-byte files are common in
      * real media dumps) yield an all-zero thumbnail — the old
      * `content(i % max(len, 1))` guard dodged the modulo but then
      * indexed the empty array and killed the task. */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      if (content != null && content.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = content(i % content.length)
          i += 1
        }
      }
      out
    }

    /** "Frame-sample": n pseudo-frames from a video payload. */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map { k =>
        val slice = content.length / math.max(n, 1)
        content.slice(k * slice, k * slice + math.max(slice, 1))
      }
  }

  /** Feature extraction as a partition-wise batch transform — one codec
    * instance per partition (codecs are expensive to init), rows streamed
    * through it. Narrow: no shuffle, parallelism = input partitions.
    * At 100 TB: repartition upstream by size, not count, so each task
    * holds O(maxPartitionBytes) of payload, and keep payloads OUT of any
    * shuffle (extract features first, shuffle the 4-byte floats). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_path", StringType, nullable = false),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "media_path", "kind", "content")
      .mapPartitions { rows =>
        // per-partition "codec init" happens here (stub: nothing)
        rows.map { r =>
          val feats = StubCodec.features(r.getAs[Array[Byte]]("content"),
            dim)
          Row(r.getLong(0), r.getString(1), r.getString(2), feats.toSeq)
        }
      }(enc)
  }

  /** Thumbnail stage: payload-in, payload-out, metadata updated. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf((c: Array[Byte]) => StubCodec.resize(c, w, h))
    media.withColumn("content", resizeUdf(col("content")))
      .withColumn("width", lit(w)).withColumn("height", lit(h))
  }

  /** Frame sampling: one row per sampled frame, frame index carried.
    * Explode happens AFTER the narrow sample — a row's payload never
    * duplicates across the shuffle. */
  def sampleVideoFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val sampleUdf = udf((c: Array[Byte]) =>
      StubCodec.sampleFrames(c, nFrames))
    media.where(col("kind") === "video")
      .select(col("media_id"), col("media_path"),
        posexplode(sampleUdf(col("content"))).as(Seq("frame_idx",
          "frame_bytes")))
  }
}
