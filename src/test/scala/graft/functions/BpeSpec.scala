package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainFromHistogram learns the expected merges in frequency " +
    "order with deterministic tie-breaks") {
    // "abab" x10: pair (a,b) dominates (20), then (ab,ab) (10).
    val hist = Array(("abab", 10L), ("ac", 2L))
    val m = Bpe.trainFromHistogram(hist, numMerges = 2)
    assert(m.merges === Seq(("a", "b"), ("ab", "ab")))
    assert(m.tokenizeWord("abab") === Seq("abab"))
    assert(m.tokenizeWord("ababab") === Seq("abab", "ab"))
    assert(m.tokenizeWord("ac") === Seq("a", "c"))
    assert(m.tokenizeWord("") === Seq.empty)
  }

  test("training twice on the same corpus gives identical merges " +
    "regardless of partitioning") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Bpe.train(docs, "text", numMerges = 30)
    val b = Bpe.train(docs.repartition(7), "text", numMerges = 30)
    assert(a.merges === b.merges)
    assert(a.merges.size === 30)
  }

  test("BPE token counts sit between word count and character count " +
    "and shrink as merges grow") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50).cache()
    val m5 = Bpe.train(docs, "text", numMerges = 5)
    val m50 = Bpe.train(docs, "text", numMerges = 50)
    val counted = docs.select(
      size(split(col("text"), " ")).as("words"),
      length(regexp_replace(col("text"), " ", "")).as("chars"),
      Bpe.tokenCount(m5, col("text")).as("t5"),
      Bpe.tokenCount(m50, col("text")).as("t50"))
      .agg(sum("words").as("w"), sum("chars").as("c"),
        sum("t5").as("t5"), sum("t50").as("t50"))
      .head()
    val (w, c, t5, t50) = (counted.getLong(0), counted.getLong(1),
      counted.getLong(2), counted.getLong(3))
    assert(t5 <= c, "merges can only shrink the symbol count")
    assert(t50 <= t5, "more merges, fewer tokens")
    assert(t50 >= w, "tokens can't go below whole words")
  }

  test("tokenization round-trips: concatenated tokens rebuild each " +
    "word exactly") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val m = Bpe.train(docs, "text", numMerges = 40)
    docs.select(col("text")).as[String].collect().foreach { t =>
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        assert(m.tokenizeWord(w).mkString === w,
          s"lossy tokenization of '$w'")
      }
    }
  }
}
