package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftx.{AdcLookup, DoubleDotProduct, YearRangePushdown}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers the library's native
  * expressions with the SQL function registry, so `spark.sql` queries
  * (and thus pure-SQL users of the engine) can call them directly:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT double_dot_product(a, b) FROM pairs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // year(ts)-comparison → scan-pushable range rewrite (see the rule's
    // scaladoc); runs with the operator-optimization batch so the
    // rewritten predicate flows into PushDownPredicate.
    ext.injectOptimizerRule(_ => YearRangePushdown)
    ext.injectFunction((
      new FunctionIdentifier("double_dot_product"),
      new ExpressionInfo(classOf[DoubleDotProduct].getName,
        "double_dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "double_dot_product takes exactly 2 arguments")
        DoubleDotProduct(children.head, children(1))
      }))
    // adc_lookup(lut, code, ksub): the codegen'd PQ asymmetric-distance
    // LUT sum — lets a pure-SQL user compose PQ search over a stored
    // (lut, code) layout without the Scala kernel route. `ksub` shapes
    // the generated code (LUT stride), so it must be a literal, like
    // every codegen'd shape parameter.
    ext.injectFunction((
      new FunctionIdentifier("adc_lookup"),
      new ExpressionInfo(classOf[AdcLookup].getName, "adc_lookup"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "adc_lookup takes exactly 3 arguments (lut, code, ksub)")
        val k = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"adc_lookup: ksub must be an INTEGER literal, got $other")
        }
        AdcLookup(children.head, children(1), k)
      }))
  }
}
