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
  * Preconditions: `lut.length == m·ksub` and every
  * `code(i) ∈ [0, ksub)` — violations throw IllegalArgumentException
  * from an explicit per-element bounds check. The check is load-bearing,
  * not defensive: on UnsafeArrayData (the common post-shuffle/codegen
  * representation) `getDouble` is an unchecked Platform memory read, so
  * WITHOUT the branch an out-of-range code would silently yield garbage
  * distances instead of failing. The branch is predictable (never taken
  * on valid input) and negligible next to the memory load.
  * Summation is left-to-right over subspaces, matching the per-
  * subspace grouping of the LUT build; on the exactly-representable
  * quarter-grid codebooks of the `ann_pq_probe` gate the result is
  * bit-identical to the direct form.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and
  * the Column↔Expression bridge are `private[sql]` (same note as
  * [[DoubleDotProduct]]). Public API:
  * [[graft.functions.VectorExpressions.adcLookup]] (Column route) and
  * the `adc_lookup(lut, code, ksub)` SQL function registered by
  * [[graft.GraftExtensions]] — the internal search path itself runs
  * the query-major [[graft.operators.Similarity]] ADC kernel (the LUT
  * side there is broadcast, not a column), so the expression is the
  * SQL-composable form over a STORED (lut, code) layout.
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
    val n = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      val c = code.getInt(i)
      val idx = i * ksub + c
      if (c < 0 || c >= ksub || idx >= n)
        throw new IllegalArgumentException(
          s"adc_lookup: code $c at subspace $i out of range " +
            s"(ksub=$ksub, lut length $n)")
      s += lut.getDouble(idx)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      s"""
         |final int $m = $code.numElements();
         |final int $n = $lut.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  final int $c = $code.getInt($i);
         |  final int $idx = $i * $ksub + $c;
         |  if ($c < 0 || $c >= $ksub || $idx >= $n) {
         |    throw new IllegalArgumentException(
         |      "adc_lookup: code " + $c + " at subspace " + $i +
         |      " out of range (ksub=$ksub, lut length " + $n + ")");
         |  }
         |  $s += $lut.getDouble($idx);
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
