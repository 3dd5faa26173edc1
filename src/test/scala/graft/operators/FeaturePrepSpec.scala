package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 feature-prep/quantization
  * queries (their value equality vs DuckDB is the driver gate; these
  * pin the properties the hash can't express). */
class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  test("minmax_scale maps into [0,1] and hits both endpoints") {
    val out = Registry.all("minmax_scale").fn(spark, sfDir)
      .agg(min("scaled"), max("scaled")).as[(Double, Double)].head()
    assert(out._1 == 0.0 && out._2 == 1.0)
  }

  test("quantile_bin deciles are equal-frequency within 1 row") {
    val sizes = Registry.all("quantile_bin").fn(spark, sfDir)
      .groupBy("decile").count().as[(Int, Long)].collect()
    assert(sizes.length == 10)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    assert(sizes.map(_._1).sorted.toSeq == (1 to 10))
  }

  test("outlier_iqr flags a small minority and never the quartile " +
    "core; robust_scale centers each segment's median at 0") {
    val out = Registry.all("outlier_iqr").fn(spark, sfDir).cache()
    val frac = out.where($"is_outlier" === 1).count().toDouble /
      out.count()
    // Tukey fences at 1.5·IQR flag at most a small tail by
    // construction; a majority flagged would mean inverted fences
    assert(frac < 0.25, s"outlier fraction $frac")
    // no row INSIDE its own segment's [q1, q3] may be flagged — this
    // is what catches fences computed from the wrong segment's
    // quartiles (a bad join key), which the fraction bound cannot
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val q = orders.groupBy("o_orderstatus").agg(
      percentile($"o_totalprice", lit(0.25)).as("q1"),
      percentile($"o_totalprice", lit(0.75)).as("q3"))
    val coreFlagged = out.join(orders.select("o_orderkey",
        "o_totalprice"), "o_orderkey")
      .join(q, "o_orderstatus")
      .where($"o_totalprice" >= $"q1" && $"o_totalprice" <= $"q3" &&
        $"is_outlier" === 1)
      .count()
    assert(coreFlagged === 0L, s"$coreFlagged quartile-core rows flagged")
    out.unpersist()
    val scaled = Registry.all("robust_scale").fn(spark, sfDir)
    // per segment, the median of the scaled values is 0 (to rounding)
    scaled.groupBy("o_orderstatus")
      .agg(percentile($"scaled", lit(0.5)).as("med"))
      .as[(String, Double)].collect()
      .foreach { case (seg, med) =>
        assert(math.abs(med) < 1e-6, s"segment $seg median $med")
      }
  }

  test("target_encode stays within [0,1] for a 0/1 label, constant " +
    "within a category, and lies between the raw and global rates") {
    val out = Registry.all("target_encode").fn(spark, sfDir)
    val pairs = out.select("o_orderpriority", "te")
      .distinct().as[(String, Double)].collect()
    val nCats = out.select("o_orderpriority").distinct().count()
    // one encoding per category (constant within): assert BEFORE any
    // map collapse, so a category with two values fails
    assert(pairs.length.toLong === nCats)
    val te = pairs.toMap
    assert(te.values.forall(v => v >= 0.0 && v <= 1.0))
    // true shrinkage: each encoding sits between its raw category
    // rate and the global rate — an inverted smoothing formula fails
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select($"o_orderpriority",
        when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1.0)
          .otherwise(0.0).as("label"))
    val raw = orders.groupBy("o_orderpriority")
      .agg(avg("label").as("r")).as[(String, Double)].collect().toMap
    val global = orders.agg(avg("label")).as[Double].head()
    te.foreach { case (cat, v) =>
      val lo = math.min(raw(cat), global) - 1e-6
      val hi = math.max(raw(cat), global) + 1e-6
      assert(v >= lo && v <= hi,
        s"$cat: te=$v outside [${raw(cat)}, $global]")
    }
  }

  test("calibration_bins: 10 bins, counts cover the orders table, " +
    "and the mean score rises monotonically with the bin") {
    val rows = Registry.all("calibration_bins").fn(spark, sfDir)
      .orderBy("bin")
      .select("bin", "n", "mean_score")
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === (0 until 10))
    // coverage vs the SOURCE table, not a re-run of the query — a
    // row-dropping bin expression must fail this
    val total = graft.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum === total)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._3, s"bins ${a._1}->${b._1} not increasing")
    }
  }

  test("rare_token_filter flags exactly the planted docs") {
    val out = Registry.all("rare_token_filter").fn(spark, sfDir)
      .select("doc_id", "n_rare").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nRare) =>
      assert(nRare == (if (id % 7 == 0) 1L else 0L),
        s"doc $id: n_rare=$nRare")
    }
  }

  test("embed_quantize codes are int8-bounded and reconstruct " +
      "within half a quantization step") {
    val rows = Registry.all("embed_quantize").fn(spark, sfDir)
      .select("vec_id", "scale", "codes")
      .as[(Long, Double, String)].collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, scale, codes) =>
      val q = codes.split(",").map(_.toInt)
      val v = emb(id)
      assert(q.length == v.length)
      assert(q.forall(c => c >= -127 && c <= 127))
      if (scale > 0) {
        val step = v.map(math.abs).max / 127.0
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(x - c * step) <= step / 2 + 1e-9,
            s"vec $id: x=$x code=$c step=$step")
        }
      }
    }
  }

  test("knn_sq8 recall@10 vs exact cosine top-10 is high") {
    val exact = Registry.all("knn_cosine").fn(spark, sfDir)
      .select("q_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val quant = Registry.all("knn_sq8").fn(spark, sfDir)
      .select("q_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && quant.nonEmpty)
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 recall@10 = $recall")
  }

  test("embed_quantize guards the zero vector") {
    val df = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val v = transform(col("embedding"), x => x.cast("double"))
    val out = df.select(col("vec_id"), v.as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      .select(VectorQueries.sq8Codes(col("v"), col("maxabs"))
        .as("codes"))
      .as[String].head()
    assert(out == "0,0,0")
  }
}
