package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches the HOF fold bit-for-bit") {
    val df = (1 to 200).map { i =>
      (Seq.tabulate(64)(j => math.sin(i * 64 + j)),
        Seq.tabulate(64)(j => math.cos(i * 64 + j)))
    }.toDF("a", "b")
    val both = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("fold"))
    assert(both.where(col("native") =!= col("fold")).count() === 0)
  }

  test("null arrays propagate null; mismatched lengths use the min") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dot(col("a"), col("b"))
      .as("d")).collect()
    assert(out(0).getDouble(0) === 1.0 * 3.0 + 2.0 * 4.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("adcLookup sums the coded lut cells and stays codegen'd") {
    val ksub = 4
    // lut for m=3 subspaces × ksub=4: cell (i, c) = 10*i + c (exactly
    // representable → equality is exact)
    // spark.range input (not a literal Seq): ConvertToLocalRelation
    // folds literal projections into a LocalTableScan, which would
    // bypass codegen and make the plan assertion vacuous.
    val lutCol = array(Seq.tabulate(3 * ksub)(x =>
      lit((10 * (x / ksub) + x % ksub).toDouble)): _*)
    val codeCol = array((col("id") % ksub).cast("int"),
      ((col("id") + 1) % ksub).cast("int"),
      ((col("id") + 2) % ksub).cast("int"))
    val out = spark.range(3)
      .select(col("id"), lutCol.as("lut"), codeCol.as("code"))
      .select(col("id"), VectorExpressions
        .adcLookup(col("lut"), col("code"), ksub).as("d"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*(1) Project"),
      s"adc Project not codegen'd:\n$plan")
    // id=0 → codes (0,1,2) → 0+11+22; id=1 → (1,2,3) → 1+12+23;
    // id=2 → (2,3,0) → 2+13+20
    assert(out.orderBy("id").select("d").as[Double].collect().toSeq ==
      Seq(33.0, 36.0, 35.0))
  }

  test("adcLookup fails loudly on out-of-range codes and short luts " +
    "instead of reading garbage memory") {
    val ksub = 4
    val lutCol = array(Seq.tabulate(2 * ksub)(x =>
      lit(x.toDouble)): _*)
    // code 4 ≥ ksub at subspace 0: in-bounds for the 8-cell lut as a
    // flat index, so ONLY the explicit ksub check can catch it
    val badCode = spark.range(1)
      .select(lutCol.as("lut"),
        array(lit(4), lit(0)).cast("array<int>").as("code"))
    val e1 = intercept[Exception] {
      badCode.select(VectorExpressions
        .adcLookup(col("lut"), col("code"), ksub)).collect()
    }
    assert(causeChain(e1).contains("adc_lookup"), causeChain(e1))
    // short lut: valid codes, but subspace 2 indexes past the end
    val shortLut = spark.range(1)
      .select(lutCol.as("lut"), array(lit(0), lit(0), lit(0))
        .cast("array<int>").as("code"))
    val e2 = intercept[Exception] {
      shortLut.select(VectorExpressions
        .adcLookup(col("lut"), col("code"), ksub)).collect()
    }
    assert(causeChain(e2).contains("adc_lookup"), causeChain(e2))
  }

  test("adcLookup equals the direct per-subspace distance on the " +
      "probe gate's grid codebooks") {
    import graft.operators.Similarity
    val cb = Similarity.gridCodebooks(8)
    val m = cb.length
    val ksub = cb(0).length
    val vecs = (1 to 50).map { i =>
      (i.toLong, Seq.tabulate(8)(j => -2.0 + 0.25 *
        ((i * 13 + j * 7) % 16)))
    }
    val codes = Similarity.pqEncode(
      vecs.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double"))
            .as("embedding")), cb)
    val queries = vecs.take(5)
      .toDF("id", "v")
    val got = Similarity.pqTopK(codes, cb, queries, k = 3)
      .select("q_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect().toSet
    // direct recompute
    val byId = vecs.toMap
    val want = vecs.take(5).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid).map { case (nid, nv) =>
        // codes reconstruct exactly on the grid → ADC = exact sq-L2
        val d = qv.zip(nv).map { case (a, b) =>
          val t = a - b; t * t
        }.sum
        (qid, nid, d)
      }
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(3)
    }.toSet
    assert(got == want)
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(10)
      .select(array(col("id").cast("double"),
        (col("id") + 1).cast("double")).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(VectorExpressions.dot(col("a"), col("b")).as("d"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*(1) Project"),
      s"dot-product Project not codegen'd:\n$plan")
    assert(df.head().getDouble(0) === 0.0 * 3.0 + 1.0 * 4.0)
  }
}
