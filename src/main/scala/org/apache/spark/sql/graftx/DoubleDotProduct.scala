package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two `array<double>`
  * columns.
  *
  * This is the one hot-loop the built-in surface can't express
  * efficiently: `aggregate(zip_with(a, b, _*_), 0d, _+_)` is evaluated by
  * interpreted higher-order functions (one closure call per element,
  * boxing on the accumulator), which dominates brute-force knn and
  * LSH-ANN verification. This expression participates in whole-stage
  * codegen: the generated code is a primitive double loop over the two
  * array buffers.
  *
  * Summation is left-to-right — identical to both the HOF fold and
  * DuckDB's `list_dot_product`, so oracle comparisons stay bit-exact
  * FOR EQUAL-LENGTH INPUTS (the only case the oracle paths produce:
  * all embeddings share one dimension). Unequal lengths deliberately
  * truncate to the shorter array as a ragged-input defense; note the
  * engines differ there (the HOF fold nulls out via zip_with padding,
  * DuckDB errors), so don't lean on mismatched lengths cross-engine.
  * Null array elements are not supported (undefined content, as with
  * Spark's own numeric array kernels); null arrays propagate null.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and the
  * Column↔Expression bridge (`classic.ExpressionUtils`) are
  * `private[sql]` — the conventional placement for Spark-native
  * extension expressions. Public API: [[graft.functions.VectorExpressions]].
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "double_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object DoubleDotProduct {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
