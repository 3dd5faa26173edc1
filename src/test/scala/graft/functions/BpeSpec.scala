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

  test("bpe_token_count's planted corpus trains exactly the closed-form " +
    "merge table its oracle assumes") {
    // Mirror of the driver-gate construction (TextQueries
    // "bpe_token_count"): doc d plants "abab"×(d%4+3) + "abcd abcd xy".
    val planted = spark.range(0, 57).select(col("id").as("doc_id"),
      concat_ws(" ", flatten(array(
        array_repeat(lit("abab"), (col("id") % 4 + 3).cast("int")),
        array(lit("abcd"), lit("abcd"), lit("xy"))))).as("text"))
    val m = Bpe.train(planted, "text", numMerges = 3)
    assert(m.merges === Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    val counts = planted.select(col("doc_id"),
        Bpe.tokenCount(m, col("text")).as("n")).as[(Long, Int)]
      .collect().toMap
    (0L until 57L).foreach { d =>
      assert(counts(d) === (d % 4 + 9).toInt)
    }
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
    // word count must match tokenize()'s convention: split on \s+ and
    // drop empties (split keeps leading/trailing empty strings)
    val counted = docs.select(
      size(filter(split(col("text"), "\\s+"), x => x =!= ""))
        .as("words"),
      length(regexp_replace(col("text"), "\\s", "")).as("chars"),
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

  test("astral characters stay whole (code points, not UTF-16 units) " +
    "and whitespace runs split words") {
    val emoji = new String(Character.toChars(0x1F600))
    val m = Bpe.trainFromHistogram(
      Array((s"a${emoji}b", 5L), ("ab", 3L)), numMerges = 1)
    // the emoji is ONE symbol: tokenizing never tears a surrogate pair
    assert(m.tokenizeWord(s"a${emoji}b")
      .forall(t => !t.exists(Character.isSurrogate) ||
        t.codePointCount(0, t.length) < t.length))
    assert(m.tokenizeWord(emoji) === Seq(emoji))
    // tabs/newlines split like spaces — no line-spanning pseudo-words
    val docs2 = Seq("hello\nworld hello\tworld").toDF("text")
    val m2 = Bpe.train(docs2, "text", numMerges = 0)
    val toks = docs2.select(Bpe.tokenize(m2, col("text")).as("t"))
      .as[Seq[String]].head()
    assert(!toks.exists(t => t.contains("\n") || t.contains("\t")))
    assert(toks.mkString === "helloworldhelloworld")
  }

  test("incremental trainer handles overlapping and decaying pairs " +
    "(lazy-heap correctness)") {
    // "aaaa": (a,a) count 3*8=24 merges first → [aa,aa]; then (aa,aa).
    // The (a,a) count DECAYS for "aaab" words too — the heap must
    // still surface later merges correctly.
    val hist = Array(("aaaa", 8L), ("aaab", 4L), ("cd", 6L))
    val m = Bpe.trainFromHistogram(hist, numMerges = 3)
    assert(m.merges.head === ("a", "a"))
    assert(m.merges.contains(("c", "d")))
    assert(m.tokenizeWord("aaaa").mkString === "aaaa")
    assert(m.tokenizeWord("cd") === Seq("cd"))
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
