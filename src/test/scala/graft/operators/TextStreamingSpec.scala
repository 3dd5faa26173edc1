package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The quality-filter projections are stateless, so the SAME column
  * expressions run unchanged under Structured Streaming — an
  * append-mode stream of documents can be filtered/scored/sampled
  * inline at ingest (the streaming half of the text pipeline). The
  * first test proves it by parity against batch over a MemoryStream.
  * The seeded-Gen property tests pin algebraic invariants the DuckDB
  * gate can't express (they must hold on EVERY input, not one corpus).
  */
class TextStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("corpusFilter + sourceMixSample over a MemoryStream match batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = (0 until 200).map { i =>
      val words = (0 to i % 40).map {
        j => if (j % 5 == 0) "the" else s"w${(i * 7 + j) % 23}"
      }
      (i.toLong, words.mkString(" "), s"src${i % 6}")
    }
    mem.addData(docs: _*)
    // filter + sample compose into ONE stateless projection — the
    // shape that runs identically in batch and append-mode streaming.
    def flat(df: org.apache.spark.sql.DataFrame) = {
      val base = df.toDF("doc_id", "text", "source")
      val srcNum = substring(col("source"), 4, 10).cast("int")
      val reason = TextQueries.filterReason(col("text"), 5, 0.03, 0.65)
      TextQueries.sourceMixSample(base, "doc_id",
        (srcNum % 4 + 1).cast("long") * lit(250000L))
        .select(col("doc_id"), col("source"), reason.as("reason"),
          (reason === "kept").cast("int").as("keep"))
    }
    val q = flat(mem.toDF())
      .writeStream.format("memory").queryName("textpipe")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("textpipe")
      .as[(Long, String, String, Int)].collect().toSet
    val batch = flat(docs.toDF("doc_id", "text", "source"))
      .as[(Long, String, String, Int)].collect().toSet
    assert(got === batch)
    assert(got.nonEmpty && got.exists(_._4 == 1) && got.exists(_._4 == 0))
  }

  private val wordGen = Gen.oneOf("the", "a", "of", "x", "yy", "zzz",
    "w1", "w2", "w3", "w4")
  private val textGen = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: repStats fractions stay in-range on random corpora") {
    // 40 seeded corpora × 12 docs: dup fractions are proper fractions;
    // top-gram char coverage is positive (can exceed 1 only through
    // overlapping occurrences — see the spec example pinning 1.285714)
    (0 until 40).foreach { i =>
      val texts = sample(Gen.listOfN(12, textGen), 4000L + i)
      val df = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
        .where(size(split(col("text"), " ")) >= 2)
      TextQueries.repStats(df, "doc_id", "text").collect().foreach { r =>
        val dw = r.getAs[Double]("dup_word_frac")
        val dg = r.getAs[Double]("dup_2gram_frac")
        val tc = r.getAs[Double]("top_2gram_char_frac")
        assert(dw >= 0.0 && dw < 1.0, s"dup_word_frac $dw (seed $i)")
        assert(dg >= 0.0 && dg < 1.0, s"dup_2gram_frac $dg (seed $i)")
        assert(tc > 0.0, s"top_2gram_char_frac $tc (seed $i)")
      }
    }
  }

  test("property: contamination counts bounded and self-consistent") {
    (0 until 25).foreach { i =>
      val evalTexts = sample(Gen.listOfN(8, textGen), 5000L + i)
      val trainTexts = sample(Gen.listOfN(8, textGen), 6000L + i)
      val ev = evalTexts.zipWithIndex
        .map { case (t, j) => (-(j.toLong) - 1, t) }
        .toDF("eval_id", "text")
      val tr = trainTexts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      TextQueries.contaminationCheck(ev, tr, "eval_id", "text")
        .collect().foreach { r =>
          val n = r.getAs[Long]("n_shingles")
          val h = r.getAs[Long]("n_hits")
          val f = r.getAs[Double]("contam_frac")
          val c = r.getAs[Int]("is_contaminated")
          assert(n > 0 && h >= 0 && h <= n, s"counts n=$n h=$h (seed $i)")
          assert(f >= 0.0 && f <= 1.0, s"contam_frac $f (seed $i)")
          assert((c == 1) == (h > 0), s"flag c=$c h=$h (seed $i)")
        }
    }
  }
}
