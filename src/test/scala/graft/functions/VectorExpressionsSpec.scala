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
