package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.TotalOrderBucket

class TotalOrderBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formula the codegen path must reproduce exactly —
    * the former UDF body from groupQuantileValues' r9.2 bucketing. */
  private def ref(v: Double, shift: Int): Int = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val key = if (bits < 0) ~bits else bits | Long.MinValue
    (key >>> shift).toInt
  }

  private val adversarial: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, math.Pi, -math.Pi,
    Double.MinPositiveValue, -Double.MinPositiveValue,
    java.lang.Double.MIN_NORMAL, -java.lang.Double.MIN_NORMAL,
    Double.MaxValue, Double.MinValue,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN,
    1e-300, -1e-300, 1e300, -1e300, 0.1, -0.1, 2.0, 4.0, 1023.5)

  test("codegen'd bucket equals the scalar formula on adversarial " +
    "doubles, including -0.0, subnormals, infinities, and NaN") {
    // spark.range driver: ConvertToLocalRelation would fold a literal
    // Seq into a LocalTableScan and bypass codegen entirely.
    val vs = adversarial
    val out = spark.range(vs.length)
      .select(col("id"),
        element_at(array(vs.map(lit): _*), col("id").cast("int") + 1)
          .as("v"))
      .select(col("id"), col("v"),
        TotalOrderBucket.asColumn(col("v"), 44).as("b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*(1) Project"),
      s"bucket Project not codegen'd:\n$plan")
    out.orderBy("id").collect().foreach { r =>
      val v = r.getDouble(1)
      assert(r.getInt(2) === ref(v, 44), s"v=$v")
    }
  }

  test("interpreted eval matches codegen and null propagates") {
    // a literal Seq folds to LocalTableScan → interpreted eval path
    val out = adversarial.map(Option(_)).:+(None).toDF("v")
      .select(col("v"), TotalOrderBucket.asColumn(col("v"), 44).as("b"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getInt(1) === ref(r.getDouble(0), 44))
    }
  }

  test("bucket key is monotone in double order (the exactness " +
    "contract: cells only set pruning granularity)") {
    val sorted = adversarial.filterNot(_.isNaN).sorted
    val keys = sorted.map(ref(_, 44))
    assert(keys === keys.sorted, "bucket of a larger value may not " +
      "be smaller — pruning would assign ranks to the wrong cell")
    // NaN collates above +Inf under total order
    assert(ref(Double.NaN, 44) >= ref(Double.PositiveInfinity, 44))
  }

  test("shift outside [33,63] is rejected") {
    intercept[IllegalArgumentException] {
      TotalOrderBucket(org.apache.spark.sql.catalyst.expressions
        .Literal(1.0), 20)
    }
  }
}
