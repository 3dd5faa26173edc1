package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftx.{DoubleDotProduct, YearRangePushdown}

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
  }
}
