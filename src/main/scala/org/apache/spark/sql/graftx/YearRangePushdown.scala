package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite comparisons on `year(col)` into raw range
  * predicates on `col`.
  *
  * `year(ts) BETWEEN 1996 AND 1998` is a function of the column, so the
  * parquet reader can't use row-group statistics and the catalog can't
  * prune partitions; the equivalent `ts >= '1996-01-01' AND ts <
  * '1999-01-01'` can. `year` is monotone over date/timestamp, so the
  * rewrite is exact (nulls propagate identically: both forms evaluate to
  * null → filter drops the row).
  *
  * Handled shapes (plus their commuted forms):
  *   year(c) =  y   →  c >= y-01-01 AND c < (y+1)-01-01
  *   year(c) >= y   →  c >= y-01-01
  *   year(c) >  y   →  c >= (y+1)-01-01
  *   year(c) <= y   →  c < (y+1)-01-01
  *   year(c) <  y   →  c < y-01-01
  *
  * The original predicate is preserved alongside only when the rewrite
  * is not exact — here it always is, so the function form is dropped.
  * Registered through [[graft.GraftExtensions]].
  */
object YearRangePushdown extends Rule[LogicalPlan] {

  /** year(c) appears analyzed as Year(c: date) or Year(Cast(c, DateType)).
    * Returns the underlying column expression if it is attribute-like
    * (we only rewrite direct column references — arbitrary expressions
    * gain nothing from pushdown), paired with the timezone the
    * optimizer-introduced cast used (needed to build an equivalent
    * timestamp literal).
    *
    * Only date and timestamp children are rewritten. A StringType child
    * must NOT be: the rewrite would degenerate to lexicographic string
    * comparison, which is not equivalent to year(cast(c as date)) —
    * malformed values like '1996-99-99' pass the string range but cast
    * to null in the original predicate. */
  private def yearChild(e: Expression): Option[(Expression, Option[String])] =
    e match {
      case Year(c: Attribute) if c.dataType == DateType => Some((c, None))
      case Year(Cast(c: Attribute, DateType, tz, _)) => c.dataType match {
        case DateType => Some((c, None))
        case TimestampType =>
          // ts→date truncation happens in the cast's timezone; the range
          // literal must be anchored in the same zone to stay exact.
          Some((c, tz.orElse(Some(conf.sessionLocalTimeZone))))
        case TimestampNTZType => Some((c, None))
        case _ => None
      }
      case _ => None
    }

  private def lit(col: Expression, tz: Option[String], year: Int): Expression = {
    val s = f"$year%04d-01-01"
    col.dataType match {
      case TimestampType => Cast(Literal(s), TimestampType, tz)
      case t => Cast(Literal(s), t)
    }
  }

  /** Year literals outside 1..9998 are left to the original predicate:
    * yr+1 would overflow Int at Int.MaxValue, and years outside the
    * 4-digit range format as strings ('-005-01-01', '10000-01-01') that
    * cast to null — turning the rewritten predicate null where the
    * original is a plain true/false. Real data is 4-digit; nothing is
    * lost by not pushing the extremes down. */
  private def intOf(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= 1 && v < 9999 => Some(v)
    case Literal(v: Long, LongType) if v >= 1L && v < 9999L =>
      Some(v.toInt)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.BINARY_COMPARISON)) {
      case EqualTo(y, v) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v)
        And(GreaterThanOrEqual(c, lit(c, tz, yr)),
          LessThan(c, lit(c, tz, yr + 1)))
      case EqualTo(v, y) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v)
        And(GreaterThanOrEqual(c, lit(c, tz, yr)),
          LessThan(c, lit(c, tz, yr + 1)))
      case GreaterThanOrEqual(y, v) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); GreaterThanOrEqual(c, lit(c, tz, yr))
      case LessThanOrEqual(v, y) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); GreaterThanOrEqual(c, lit(c, tz, yr))
      case GreaterThan(y, v) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v)
        GreaterThanOrEqual(c, lit(c, tz, yr + 1))
      case LessThan(v, y) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v)
        GreaterThanOrEqual(c, lit(c, tz, yr + 1))
      case LessThanOrEqual(y, v) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); LessThan(c, lit(c, tz, yr + 1))
      case GreaterThanOrEqual(v, y) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); LessThan(c, lit(c, tz, yr + 1))
      case LessThan(y, v) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); LessThan(c, lit(c, tz, yr))
      case GreaterThan(v, y) if rewritable(y, v) =>
        val (c, tz, yr) = parts(y, v); LessThan(c, lit(c, tz, yr))
    }

  private def rewritable(y: Expression, v: Expression): Boolean =
    yearChild(y).isDefined && intOf(v).isDefined

  private def parts(y: Expression, v: Expression)
      : (Expression, Option[String], Int) = {
    val (c, tz) = yearChild(y).get
    (c, tz, intOf(v).get)
  }
}
