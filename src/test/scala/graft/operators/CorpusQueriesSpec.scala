package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-curation queries (value equality
  * vs DuckDB is the driver gate; these pin what the hash can't express)
  * plus the distributedGroupRank ≡ window-form equivalence proof. */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("distributedGroupRank equals ROW_NUMBER over (source) row " +
    "for row on documents") {
    val d = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val got = RelationalOps
      .distributedGroupRank(d, "source", "doc_id", "r")
      .select($"doc_id", $"r")
    val want = d.withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")).cast("long"))
      .select($"doc_id", $"r")
    // anti-join both directions: empty ⇔ identical (doc_id unique)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("bm25_score is zero exactly for documents containing no query " +
    "term, positive otherwise") {
    val out = Registry.all("bm25_score").fn(spark, sfDir)
    val terms = Seq("spark", "dup", "merge", "window")
    val hasTerm = terms.map(t =>
      array_contains(split($"text", " "), t)).reduce(_ || _)
    val joined = out.join(
      Tables.load(spark, sfDir, "documents")
        .where($"text".isNotNull)
        .select($"doc_id", hasTerm.as("has_term")),
      "doc_id").cache()
    assert(joined.where(!$"has_term" && $"bm25" =!= 0.0).count() === 0L)
    assert(joined.where($"has_term" && $"bm25" <= 0.0).count() === 0L)
    // every scored document is accounted for (the join dropped none)
    assert(joined.count() === out.count())
    joined.unpersist()
  }

  test("tfidf_topk emits at most 3 terms per doc, rnk dense from 1, " +
    "tfidf non-increasing in rnk") {
    val out = Registry.all("tfidf_topk").fn(spark, sfDir).cache()
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("k"), min("rnk").as("lo"), max("rnk").as("hi"))
    assert(perDoc.where($"k" > 3 || $"lo" =!= 1 || $"hi" =!= $"k")
      .count() === 0L)
    // within a doc, the rnk order IS the (tfidf desc, word) order
    val disordered = out.withColumn("prev_tfidf",
        lag("tfidf", 1).over(
          Window.partitionBy("doc_id").orderBy("rnk")))
      .where($"prev_tfidf".isNotNull && $"prev_tfidf" < $"tfidf")
    assert(disordered.count() === 0L)
    out.unpersist()
  }

  test("lm_familiarity ratios live in [0,1], familiar counts are " +
    "bounded by totals, and the corpus skews familiar") {
    val out = Registry.all("lm_familiarity").fn(spark, sfDir).cache()
    assert(out.where($"familiar_ratio" < 0.0 ||
      $"familiar_ratio" > 1.0).count() === 0L)
    assert(out.where($"n_familiar" > $"n_bigrams").count() === 0L)
    // exact conservation: summed per-doc familiar counts must equal
    // the corpus-wide occurrence total of the top-200 bigram list,
    // recomputed here from scratch — catches a flagging join that
    // drops or double-counts rows
    val bg = Tables.load(spark, sfDir, "documents")
      .where($"text".isNotNull && size(split($"text", " ")) >= 2)
      .select(explode(zip_with(
        slice(split($"text", " "), lit(1),
          size(split($"text", " ")) - 1),
        slice(split($"text", " "), lit(2),
          size(split($"text", " ")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram")).cache()
    val counts = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
    val topTotal = counts.orderBy($"c".desc, $"bigram").limit(200)
      .agg(sum("c")).as[Long].head()
    val allTotal = bg.count()
    bg.unpersist()
    val (gotFam, gotAll) = out
      .agg(sum("n_familiar"), sum("n_bigrams"))
      .as[(Long, Long)].head()
    assert(gotFam === topTotal && gotAll === allTotal,
      s"familiar $gotFam/$gotAll vs recomputed $topTotal/$allTotal")
    out.unpersist()
  }

  test("mix_interleave ranks are dense per source and mix_pos is the " +
    "stride (rank - 0.5) / weight") {
    val out = Registry.all("mix_interleave").fn(spark, sfDir).cache()
    val perSrc = out.groupBy("source").agg(
      count(lit(1)).as("n"), min("src_rank").as("lo"),
      max("src_rank").as("hi"),
      countDistinct("src_rank").as("d"))
    assert(perSrc.where($"lo" =!= 1 || $"hi" =!= $"n" || $"d" =!= $"n")
      .count() === 0L)
    val w = when(substring($"source", -1, 1)
      .isin("0", "2", "4", "6", "8"), 2.0).otherwise(1.0)
    assert(out.where(
      $"mix_pos" =!= ($"src_rank".cast("double") - 0.5) / w)
      .count() === 0L)
    // both weight classes actually occur in the data, else the stride
    // assertion above is vacuous for one branch
    assert(out.select(w.as("w")).distinct().count() === 2L)
    out.unpersist()
  }

  test("winsorize changes only tail rows and clamps into the " +
    "per-segment [p5, p95] band") {
    val out = Registry.all("winsorize").fn(spark, sfDir)
    val o = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val q = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").agg(
        percentile($"o_totalprice", lit(0.05)).as("lo"),
        percentile($"o_totalprice", lit(0.95)).as("hi"))
    val j = out.join(o, "o_orderkey").join(q, "o_orderstatus").cache()
    assert(j.where($"winsorized" < $"lo" || $"winsorized" > $"hi")
      .count() === 0L)
    // in-band rows pass through untouched
    assert(j.where($"o_totalprice" >= $"lo" &&
      $"o_totalprice" <= $"hi" &&
      $"winsorized" =!= $"o_totalprice").count() === 0L)
    // out-of-band rows land exactly on the violated fence
    assert(j.where($"o_totalprice" < $"lo" &&
      $"winsorized" =!= $"lo").count() === 0L)
    assert(j.where($"o_totalprice" > $"hi" &&
      $"winsorized" =!= $"hi").count() === 0L)
    j.unpersist()
  }
}
