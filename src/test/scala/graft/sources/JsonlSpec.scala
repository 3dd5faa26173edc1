package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("documents round-trip through sharded JSONL exactly") {
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = Tables.load(spark, sfDir, "documents")
    Jsonl.write(docs, s"$dir/docs")
    val back = Jsonl.readStrict(spark, s"$dir/docs", docSchema)
    val a = docs.as[(Long, String, String, String, Long)]
      .collect().sortBy(_._1)
    val b = back.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("gzip round-trip preserves rows and actually compresses") {
    val dir = Files.createTempDirectory("jsonlgz").toString
    val docs = Tables.load(spark, sfDir, "documents")
    Jsonl.write(docs, s"$dir/docs", compression = "gzip")
    val listing = Files.list(Paths.get(s"$dir/docs"))
    val gzParts = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .count(_.getFileName.toString.endsWith(".json.gz"))
    } finally listing.close()
    assert(gzParts > 0, "no .json.gz part files written")
    val back = Jsonl.readStrict(spark, s"$dir/docs", docSchema)
    assert(back.count() == docs.count())
  }

  test("streaming ingest tails a landing dir with the same schema " +
      "discipline and corrupt quarantine") {
    val dir = Files.createTempDirectory("jsonlstream").toString
    Files.write(Paths.get(s"$dir/drop1.jsonl"),
      ("""{"doc_id": 1, "text": "a", "lang": "en", "source": "s",""" +
        """ "n_chars": 1}""" + "\n" +
        """garbage line""" + "\n").getBytes("UTF-8"))
    val q = Jsonl.readStream(spark, dir, docSchema)
      .select(col("doc_id"), col(Jsonl.CorruptCol))
      .writeStream.format("memory").queryName("jsonlstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second drop arrives while the stream runs
      Files.write(Paths.get(s"$dir/drop2.jsonl"),
        ("""{"doc_id": 2, "text": "b", "lang": "en", "source": "s",""" +
          """ "n_chars": 1}""" + "\n").getBytes("UTF-8"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("jsonlstream")
      .as[(Option[Long], Option[String])].collect()
    assert(rows.flatMap(_._1).sorted.toSeq == Seq(1L, 2L))
    assert(rows.flatMap(_._2).toSeq == Seq("garbage line"))
  }

  test("corrupt lines are quarantined, not silently nulled") {
    val dir = Files.createTempDirectory("jsonlbad").toString
    Files.write(Paths.get(s"$dir/part-0.jsonl"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",""" +
        """ "n_chars": 2}""" + "\n" +
        """not json at all""" + "\n" +
        "   \n" + // whitespace-only separator: skipped, not a record
        """{"doc_id": "NaL", "text": "t", "lang": "en",""" +
        """ "source": "s", "n_chars": 0}""" + "\n" + // type mismatch
        """{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s",""" +
        """ "n_chars": 3}""" + "\n").getBytes("UTF-8"))
    val (good, bad) = Jsonl.readSplit(spark, dir, docSchema)
    // Good side: only cleanly parsed rows — no all-null ghosts from
    // the blank line, no half-null row from the type-mismatch line.
    assert(good.count() == 2)
    assert(good.where(col("doc_id").isNull).count() == 0)
    // Quarantine: the unparseable line AND the type-drift line, raw.
    val quarantined = bad.as[String].collect().toSeq.sorted
    assert(quarantined.size == 2)
    assert(quarantined.contains("not json at all"))
    assert(quarantined.exists(_.contains("\"NaL\"")))
    // Strict mode refuses the same file.
    intercept[org.apache.spark.SparkException] {
      Jsonl.readStrict(spark, dir, docSchema).collect()
    }
  }
}
