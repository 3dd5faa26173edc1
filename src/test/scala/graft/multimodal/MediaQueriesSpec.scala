package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The multimodal driver-gate entries (MediaQueries) on smoke-scale
  * testdata: structural invariants plus an independent JVM-side digest
  * replay, so the DuckDB gate at sf0.01 is the second check of the
  * byte math, not the first.
  */
class MediaQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private lazy val asciiDocs = Tables.load(spark, sfDir, "documents")
    .where(col("text").isNotNull)
    .select(col("doc_id"),
      regexp_replace(col("text"), "[^ -~]", "_").as("atext"))
    .as[(Long, String)].collect().toMap

  test("media_manifest covers every doc with recomputable bytes") {
    val rows = MediaQueries.defs("media_manifest").fn(spark, sfDir)
      .as[(String, String, String, Long, String)].collect()
    assert(rows.length === asciiDocs.size)
    assert(rows.map(_._1).distinct.length === rows.length,
      "media_path must be unique — it is the identity column")
    rows.foreach { case (path, kind, format, nBytes, contentMd5) =>
      val id = path.stripPrefix("mem://corpus/").takeWhile(_ != '.').toLong
      val exp = Seq("jpg", "png", "mp4")((id % 3).toInt)
      assert(format === exp, s"format sniff wrong for $path")
      assert(kind === (if (format == "mp4") "video" else "image"))
      val bytes = asciiDocs(id).getBytes("UTF-8")
      assert(nBytes === bytes.length.toLong)
      assert(contentMd5 === md5hex(bytes), s"digest mismatch for $path")
    }
  }

  test("media_frames replays StubCodec slice arithmetic per frame") {
    val rows = MediaQueries.defs("media_frames").fn(spark, sfDir)
      .as[(String, Int, Long, String)].collect()
    val vids = asciiDocs.filter { case (id, _) => id % 3 == 2 }
    assert(rows.length === vids.size * 4, "exactly 4 frames per video")
    rows.foreach { case (path, idx, flen, fmd5) =>
      val id = path.stripPrefix("mem://corpus/").takeWhile(_ != '.').toLong
      val content = vids(id).getBytes("UTF-8")
      val exp = MultimodalOps.StubCodec.sampleFrames(content, 4)(idx)
      assert(flen === exp.length.toLong, s"frame_len mismatch $path/$idx")
      assert(fmd5 === md5hex(exp), s"frame digest mismatch $path/$idx")
    }
  }
}
