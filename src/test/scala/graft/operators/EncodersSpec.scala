package graft.operators

import graft.SparkSpec
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  test("freezeVocab is sorted and distinct") {
    val df = Seq("b", "a", "c", "a", null).toDF("code")
    assert(Encoders.freezeVocab(df, "code") === Seq("a", "b", "c"))
  }

  test("codeIndex maps known codes and defaults OOV to -1") {
    val vocab = Seq("a", "b", "c")
    val out = Seq("a", "c", "zz", null).toDF("code")
      .select(Encoders.codeIndex(col("code"), vocab).as("i"))
      .as[Int].collect()
    assert(out.toSeq === Seq(0, 2, -1, -1))
  }

  test("multiHot builds 0/1 sparse vectors, ignoring OOV and dups") {
    val df = Seq((1, Seq(0, 2, 2, -1)), (2, Seq.empty[Int]))
      .toDF("id", "idxs")
    val vecs = df.select($"id", Encoders.multiHot($"idxs", 4).as("v"))
      .orderBy("id")
      .collect()
      .map(r => r.getAs[SparseVector]("v"))
    assert(vecs(0).size === 4)
    assert(vecs(0).indices.toSeq === Seq(0, 2))
    assert(vecs(0).values.forall(_ === 1.0))
    assert(vecs(1).indices.isEmpty)
  }

  test("mheVector scatters codes at (day-1)*W + idx like the reference " +
    "grid (cms_preprocess.py:330-336)") {
    val df = Seq((10, Seq(0, 3))).toDF("doy", "idxs")
    val v = df.select(Encoders.mheVector($"doy", $"idxs", 5).as("v"))
      .head().getAs[SparseVector]("v")
    assert(v.size === 366 * 5)
    assert(v.indices.toSeq === Seq(9 * 5 + 0, 9 * 5 + 3))
    // nnz == number of active codes — the SURVEY §5 property
    assert(v.indices.length === 2)
  }

  test("mheVector drops OOV -1 sentinels instead of ghost-setting the " +
    "previous day's last cell") {
    // Before the filter, a -1 at doy=10 flattened to 9*5-1 = 44 — an
    // in-range index (day 9's last cell) that toSparse's bounds guard
    // could not catch.
    val df = Seq((10, Seq(0, -1, 3))).toDF("doy", "idxs")
    val v = df.select(Encoders.mheVector($"doy", $"idxs", 5).as("v"))
      .head().getAs[SparseVector]("v")
    assert(v.indices.toSeq === Seq(9 * 5 + 0, 9 * 5 + 3))
    assert(!v.indices.contains(9 * 5 - 1), "ghost cell from OOV -1")
  }

  test("mheVector is permutation-invariant in slot order") {
    val a = Seq((42, Seq(1, 4, 2))).toDF("doy", "idxs")
      .select(Encoders.mheVector($"doy", $"idxs", 6).as("v"))
      .head().getAs[SparseVector]("v")
    val b = Seq((42, Seq(4, 2, 1))).toDF("doy", "idxs")
      .select(Encoders.mheVector($"doy", $"idxs", 6).as("v"))
      .head().getAs[SparseVector]("v")
    assert(a.indices.toSeq === b.indices.toSeq)
  }

  test("aovFlatten skips null demo values instead of failing") {
    val perYear = Seq(
      ("p1", 2008, Option.empty[Double], Seq(1)),
      ("p1", 2009, Some(70.0), Seq.empty[Int])
    ).toDF("id", "y", "age", "idxs")
    val out = Encoders.aovFlatten(perYear, "id", "y", Seq("age"), "idxs",
      2, Seq(2008, 2009))
    val v = out.head().getAs[SparseVector]("features")
    // span 3: 2008 block = [age(null→absent), code0, code1];
    // 2009 block at offset 3 has age only
    assert(v.indices.toSeq === Seq(2, 3))
    assert(v.values.toSeq === Seq(1.0, 70.0))
  }

  test("aovFlatten lays out years × (demos + W), year-major") {
    val perYear = Seq(
      ("p1", 2008, 70.0, Seq(0, 2)),
      ("p1", 2009, 71.0, Seq(1)),
      ("p1", 2010, 72.0, Seq.empty[Int]),
      ("p2", 2009, 50.0, Seq(2))
    ).toDF("id", "y", "age", "idxs")
    val out = Encoders.aovFlatten(perYear, "id", "y", Seq("age"), "idxs",
      3, Seq(2008, 2009, 2010))
    val rows = out.collect().map(r =>
      r.getString(0) -> r.getAs[SparseVector]("features")).toMap
    val span = 1 + 3 // 1 demo + width 3
    val p1 = rows("p1")
    assert(p1.size === 3 * span)
    // year 2008 block: age at 0, codes 0,2 at 1+0 and 1+2
    assert(p1.indices.toSeq === Seq(0, 1, 3, span, span + 2, 2 * span))
    assert(p1.values.toSeq === Seq(70.0, 1.0, 1.0, 71.0, 1.0, 72.0))
    // p2 has only 2009: offset span
    val p2 = rows("p2")
    assert(p2.indices.toSeq === Seq(span, span + 1 + 2))
    assert(p2.values.toSeq === Seq(50.0, 1.0))
  }
}
