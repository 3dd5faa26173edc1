package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the IEEE-754 total-order bucket key
  * used by `RelationalOps.groupQuantileValues`: the top `64 - shift`
  * bits of the standard total-order transform
  *
  *   key = bits < 0 ? ~bits : bits | Long.MIN_VALUE
  *
  * whose UNSIGNED order equals double value order (negatives flipped
  * entirely, sign bit set on positives). The `>>> shift` keeps a
  * monotone non-negative Int, so per-(group, bucket) exact counts can
  * place interpolation ranks without any boundary sketch — bucketing
  * is data-independent and edge-free by construction.
  *
  * This replaces a Scala UDF on the quantile path's two full-data
  * passes: a UDF breaks whole-stage codegen for the scan→project→
  * partial-agg pipeline and pays boxing per row, which is pure
  * overhead on a key that is three integer ops. NaN keys (all NaNs
  * collate above +Inf under total order) are accepted and ordered the
  * same way both routes order them; null propagates null.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and
  * the Column↔Expression bridge (`classic.ExpressionUtils`) are
  * `private[sql]` — the conventional placement for Spark-native
  * extension expressions (same as [[DoubleDotProduct]]).
  */
case class TotalOrderBucket(child: Expression, shift: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(shift >= 33 && shift <= 63,
    s"TotalOrderBucket shift=$shift outside [33,63] — the bucket must " +
      "fit a non-negative Int")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "total_order_bucket"

  override def nullSafeEval(a: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(a.asInstanceOf[Double])
    val key = if (bits < 0) ~bits else bits | Long.MinValue
    (key >>> shift).toInt
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      val key = ctx.freshName("key")
      s"""
         |final long $bits = java.lang.Double.doubleToLongBits($v);
         |final long $key = $bits < 0L ? ~$bits : ($bits | java.lang.Long.MIN_VALUE);
         |${ev.value} = (int) ($key >>> $shift);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TotalOrderBucket = copy(child = newChild)
}

object TotalOrderBucket {
  def asColumn(v: Column, shift: Int): Column =
    ExpressionUtils.column(TotalOrderBucket(
      ExpressionUtils.expression(v), shift))
}
