package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for PQ asymmetric-distance computation
  * (ADC) over a per-query lookup table:
  *
  *   value = Σ_i lut[i·ksub + code(i)]
  *
  * `lut` is the query's precomputed table of per-subspace partial
  * distances (m·ksub doubles, built ONCE per query on the broadcast
  * side — queries are tiny); `code` is a corpus vector's PQ code
  * (m small ints). This is the half of PQ search that touches every
  * (query, corpus) pair, so it must live inside whole-stage codegen:
  * the UDF form re-boxed both arrays per pair and recomputed the
  * per-subspace subtraction O(m·subDim) instead of the O(m) lookups
  * the LUT makes possible ([[graft.operators.Similarity.pqTopK]]).
  *
  * Preconditions (caller-enforced, as with Spark's own array kernels):
  * `lut.length == m·ksub` and every `code(i) ∈ [0, ksub)` — violations
  * throw the JVM's own bounds error rather than silently clamping.
  * Summation is left-to-right over subspaces, matching the per-
  * subspace grouping of the LUT build; on the exactly-representable
  * quarter-grid codebooks of the `ann_pq_probe` gate the result is
  * bit-identical to the direct form.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and
  * the Column↔Expression bridge are `private[sql]` (same note as
  * [[DoubleDotProduct]]). Public API:
  * [[graft.functions.VectorExpressions.adcLookup]].
  */
case class AdcLookup(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(ksub > 0, s"ksub must be positive, got $ksub")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_lookup"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * ksub + code.getInt(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $m = $code.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $lut.getDouble($i * $ksub + $code.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}

object AdcLookup {
  def asColumn(lut: Column, code: Column, ksub: Int): Column =
    ExpressionUtils.column(AdcLookup(
      ExpressionUtils.expression(lut),
      ExpressionUtils.expression(code), ksub))
}
