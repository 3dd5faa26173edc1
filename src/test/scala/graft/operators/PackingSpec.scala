package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum packer must equal the single-reducer
  * window form row-for-row — on skewed sizes, sparse ids, and across
  * multiple range partitions — and its shard assignment must respect
  * the concat-and-chunk invariants. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
                         budget: Long) = {
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tok_offset", sum(col("n")).over(w) - col("n"))
      .withColumn("shard", floor(col("tok_offset") / budget)
        .cast("long"))
      .select("id", "n", "tok_offset", "shard")
  }

  test("packTokens equals the window prefix sum on a skewed corpus") {
    // Sparse non-contiguous ids, size skew (one mega-doc), zero-token
    // docs, enough rows to spread over several range partitions.
    val rows = (0 until 5000).map { i =>
      val id = i.toLong * 7 + (i % 3)
      val n = if (i == 1234) 500000L
              else if (i % 11 == 0) 0L
              else (i % 97).toLong + 1
      (id, n)
    }
    val df = rows.toDF("id", "n").repartition(13)
    val got = PackingOps.packTokens(df, "id", "n", 4096L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val want = windowForm(df, 4096L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == rows.length)
    assert(got.toSeq == want.toSeq)
  }

  test("offsets are a gapless token stream and shards chunk it") {
    val df = Seq((1L, 10L), (2L, 4090L), (3L, 5L), (4L, 8200L),
      (5L, 1L)).toDF("id", "n")
    val out = PackingOps.packTokens(df, "id", "n", 4096L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // Exclusive prefix: each doc starts where the previous ended.
    assert(out.map(_._3).toSeq == Seq(0L, 10L, 4100L, 4105L, 12305L))
    // Shard = window containing the doc's first token.
    assert(out.map(_._4).toSeq == Seq(0L, 0L, 1L, 1L, 3L))
  }

  test("packTokens equals the window form over generated corpora " +
      "and budgets (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      n <- Gen.chooseNum(1, 400)
      budget <- Gen.oneOf(1L, 7L, 128L, 4096L)
      sizes <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
      // ids: unique but clustered/sparse in bursts
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 1000L))
    } yield (budget, sizes.zip(gaps.scanLeft(0L)(_ + _)).map {
      case (s, id) => (id, s)
    })
    (0 until 25).flatMap(i =>
      genCase.apply(Gen.Parameters.default, Seed(1234L + i)))
      .foreach { case (budget, rows) =>
        val df = rows.toDF("id", "n").repartition(5)
        val got = PackingOps.packTokens(df, "id", "n", budget)
          .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
        val want = windowForm(df, budget)
          .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
        assert(got == want, s"budget=$budget n=${rows.size}")
      }
  }

  test("writeShards materializes ordered, non-overlapping shard files " +
      "covering every doc once") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .where(col("text").isNotNull)
    val counted = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = PackingOps.packTokens(counted, "doc_id", "n_tokens",
      512L)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    PackingOps.writeShards(packed, docs, "doc_id", out,
      shardsPerFile = 4L)
    val back = spark.read.parquet(out)
    // Every doc exactly once, text intact.
    assert(back.count() == docs.count())
    assert(back.join(docs, Seq("doc_id", "text")).count() == docs.count())
    // File groups hold non-overlapping, contiguous offset ranges.
    val ranges = back.groupBy("file_grp")
      .agg(min("tok_offset").as("lo"),
        max(col("tok_offset") + col("n_tokens")).as("hi"))
      .orderBy("file_grp")
      .as[(Long, Long, Long)].collect()
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) => assert(hiA == loB)
      case _ =>
    }
    // Group boundary honors shardsPerFile × budget.
    ranges.foreach { case (g, lo, _) =>
      assert(lo / (512L * 4L) == g)
    }
  }

  test("packTokens rejects a non-positive budget") {
    val df = Seq((1L, 1L)).toDF("id", "n")
    intercept[IllegalArgumentException] {
      PackingOps.packTokens(df, "id", "n", 0L)
    }
  }

  test("packTokens rejects fractional double ids instead of silently " +
    "truncate-merging distinct ids") {
    // 1.2 and 1.7 both cast("long") to 1 — before the integrality
    // check they became ONE stream id with nondeterministic offsets
    val df = Seq((1.2, 5L), (1.7, 3L), (2.0, 4L)).toDF("id", "n")
    val e = intercept[Exception] {
      PackingOps.packTokens(df, "id", "n", 8L).collect()
    }
    assert(causeChain(e).contains("non-integral"), causeChain(e))
    // integral-valued doubles remain accepted
    val ok = PackingOps.packTokens(
      Seq((1.0, 5L), (2.0, 3L)).toDF("id", "n"), "id", "n", 8L)
      .collect()
    assert(ok.length === 2)
  }
}
