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

  test("doc_chunk windows: full coverage, win-stride overlap, and " +
    "stream reconstruction from chunk prefixes") {
    import graft.functions.TextFunctions
    val win = 5
    val stride = 3
    // 1..11 tokens exercises: shorter-than-win, exact-win, one-past,
    // and multi-chunk docs
    val docsDf = (1 to 11).map(n =>
      (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = docsDf
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(TextFunctions.chunkIndices(size(col("w")), win,
          stride)).as("i"), col("w"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("w"), col("i") * stride + 1, lit(win)),
          " ").as("chunk"))
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
      .toMap
    (1 to 11).foreach { n =>
      val toks = (1 to n).map(i => s"t$i")
      val cs = chunks(n.toLong).map(_.split(" ").toSeq)
      // every token covered, chunks ≤ win tokens, last chunk reaches
      // the final token
      assert(cs.flatten.toSet === toks.toSet, s"n=$n coverage")
      assert(cs.forall(_.size <= win), s"n=$n width")
      assert(cs.last.last === s"t$n", s"n=$n tail")
      // consecutive chunks overlap by win - stride
      cs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.takeRight(win - stride) === b.take(win - stride)
            .take(a.size - stride max 0) ||
            a.size < win, s"n=$n overlap")
        case _ =>
      }
      // the original stream rebuilds from stride-prefixes + last tail
      val rebuilt = cs.init.map(_.take(stride)).flatten ++ cs.last
      assert(rebuilt === toks, s"n=$n reconstruction")
    }
  }

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

  test("corpusFilter: first-failing-rule precedence and keep flag") {
    // doc 1 fails BOTH too_short and low_stopword → reason must be the
    // first rule (too_short); doc 2 long but no stopwords; doc 3 long,
    // stopworded, but one word repeated → repetitive; doc 4 passes all.
    val mk = (n: Int, s: String) => (s + " ") * n
    val df = Seq(
      (1L, "zz yy"),
      (2L, Seq.tabulate(25)(i => s"w$i").mkString(" ")),
      (3L, "the " + mk(24, "x").trim),
      (4L, "the " + Seq.tabulate(24)(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextQueries.corpusFilter(df, "doc_id", "text", 20, 0.03, 0.65)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("reason") === "too_short")
    assert(out(2L).getAs[String]("reason") === "low_stopword")
    assert(out(3L).getAs[String]("reason") === "repetitive")
    assert(out(4L).getAs[String]("reason") === "kept")
    assert(out(4L).getAs[Int]("keep") === 1)
    assert(out(3L).getAs[Int]("keep") === 0)
  }

  test("sourceMixSample: deterministic, rate-ordered, partition-stable") {
    val df = spark.range(0, 4000)
      .select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 8).cast("string")).as("source"))
    val srcNum = substring(col("source"), 4, 10).cast("int")
    def run() = TextQueries.sourceMixSample(df, "doc_id",
      (srcNum % 4 + 1).cast("long") * lit(250000L))
    val a = run().collect().map(_.getLong(0)).sorted
    val b = run().repartition(13).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b)) // partitioning cannot change the keep set
    val bySrc = run().groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 candidates per source; expected keep ≈ 500·(n%4+1)/4 — the
    // mixKey stream is uniform enough that observed counts order by
    // rate and land within a loose band of the expectation.
    for (n <- 0 until 8) {
      val exp = 500.0 * (n % 4 + 1) / 4
      val got = bySrc.getOrElse(s"src$n", 0L).toDouble
      assert(math.abs(got - exp) < 90, s"src$n: got $got expected $exp")
    }
  }

  test("contaminationCheckBloom: identical to the exact form") {
    // 200 train docs + 60 eval docs with mixed overlap: full prefix
    // copies, partial tails, and fully novel texts. The Bloom prefilter
    // may only change cost — every output cell must match the exact
    // join, including n_shingles counted before the prune.
    val train = spark.range(0, 200).selectExpr("id AS doc_id",
      "concat_ws(' ', 'w', id, 'x', id + 1, 'y', id % 7, 'z') AS text")
    val eval = spark.range(0, 60).selectExpr("-id - 1 AS eval_id",
      "CASE WHEN id % 3 = 0 THEN concat_ws(' ', 'w', id, 'x', id + 1) " +
        "WHEN id % 3 = 1 THEN concat_ws(' ', 'y', id % 7, 'z', 'q', id) " +
        "ELSE concat_ws(' ', 'n', id, 'o', id, 'p') END AS text")
    val exact = TextQueries.contaminationCheck(eval, train,
      "eval_id", "text").collect().map(_.toSeq).toSet
    val bloom = TextQueries.contaminationCheckBloom(eval, train,
      "eval_id", "text", expectedItems = 2000, fpp = 0.01)
      .collect().map(_.toSeq).toSet
    assert(bloom === exact)
    assert(exact.nonEmpty)
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
