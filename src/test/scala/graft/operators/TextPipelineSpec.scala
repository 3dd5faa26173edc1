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

  /** md5 hex exactly as Spark's `md5` / DuckDB's `md5` render it. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedup_spans: shift-invariant span catch + exact expected set") {
    val t = (1 to 30).map(i => s"t$i")
    val d = (1 to 20).map(i => s"d$i")
    val docsDf = Seq(
      (2L, t.mkString(" ")),                              // source doc
      // 20-token verbatim splice of t6..t25 at a DIFFERENT offset —
      // the case sentence-level dedup misses
      (3L, (Seq("p1", "p2", "p3") ++ t.slice(5, 25) :+ "q1")
        .mkString(" ")),
      (7L, (1 to 20).map(i => s"u$i").mkString(" ")),     // unrelated
      (10L, d.mkString(" "))                              // probe source
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("spans").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.Registry.all("dedup_spans").fn(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("span_hash"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("n_occ"))).toSet
    // expected: the 6 windows fully inside the shared t6..t25 run
    // (doc 2 windows starting at i=6..11 == doc 3 windows i=4..9) …
    val shared = (5 until 11).map(i =>
      (md5hex(t.slice(i, i + 15).mkString(" ")), 2L, 2L, 2L))
    // … plus doc 10's shifted probe re-entry (-11 = drop 3 tokens):
    // probe windows i=1..3 == doc-10 windows i=4..6
    val probe = (3 until 6).map(i =>
      (md5hex(d.slice(i, i + 15).mkString(" ")), 2L, -11L, 2L))
    assert(got === (shared ++ probe).toSet)
  }

  test("gopher_filter: each rule fires on its designed failure doc") {
    val stop2 = "the of" // two stopwords
    val docsDf = Seq(
      // 30 normal words incl. 2 stopwords → all rules pass
      (1L, (stop2 +: (1 to 28).map(i => s"word$i")).mkString(" ")),
      (2L, (stop2 +: (1 to 8).map(i => s"word$i"))
        .mkString(" ")),                                  // short
      (3L, (1 to 30).map(i => s"word$i").mkString(" ")),  // no stopwords
      (4L, (stop2 +: Seq.fill(28)("12345"))
        .mkString(" ")),                                  // non-alpha
      (5L, (stop2 +: Seq.fill(28)("abcdefghijkl"))
        .mkString(" "))                                   // long words
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("gopher").toString
    docsDf.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.Registry.all("gopher_filter").fn(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def flags(id: Long) = (rows(id).getAs[Int]("r_len"),
      rows(id).getAs[Int]("r_mean_len"), rows(id).getAs[Int]("r_alpha"),
      rows(id).getAs[Int]("r_stop"), rows(id).getAs[Int]("keep"))
    assert(flags(1L) === ((1, 1, 1, 1, 1)))
    assert(flags(2L) === ((0, 1, 1, 1, 0)))      // 10 words < 25
    assert(flags(3L) === ((1, 1, 1, 0, 0)))      // 0 stopwords
    assert(flags(4L) === ((1, 1, 0, 1, 0)))      // 28/30 digit words
    // alpha_frac for doc 4: only "the of" are alphabetic → 2/30
    assert(rows(4L).getAs[Double]("alpha_frac") === 0.066667)
    assert(flags(5L) === ((1, 0, 1, 1, 0)))      // mean word len > 10
    // doc 5 mean: (2×len(stopword words)+28×12 chars + spaces…) exact:
    // chars = 6 ("the of") + 1 + 28×12 + 27 = 370; spaces = 29;
    // mean = (370 − 29) / 30
    assert(rows(5L).getAs[Double]("mean_word_len") ===
      math.rint((370.0 - 29) / 30 * 1e6) / 1e6)
  }
}
