package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The groupQuantileValues size-routing contract (r9 verdict item 1):
  * the compact 1-exchange sorted-array route and the 2-pass bucketed
  * route must produce IDENTICAL rows — routing is a performance
  * decision, never a semantic one. Both routes share one
  * interpolation fold (RelationalOps.interpolateEndpoints), so
  * equality here is the endpoint-extraction machinery's claim, and
  * the comparison is on exact doubles, no tolerance.
  */
class QuantileRouteSpec extends SparkSpec {
  import spark.implicits._

  private val probs =
    Seq("p5" -> 0.05, "q1" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)

  test("compact and bucketed routes produce identical rows on the " +
    "orders testdata") {
    val o = graft.Tables.load(spark, sfDir, "orders")
    val compact = RelationalOps.groupQuantileValues(o, "o_orderstatus",
      "o_totalprice", probs, compactBytesLimit = Long.MaxValue)
    val bucketed = RelationalOps.groupQuantileValues(o, "o_orderstatus",
      "o_totalprice", probs, compactBytesLimit = 0L)
    val c = compact.collect().map(_.toSeq).toSet
    val b = bucketed.collect().map(_.toSeq).toSet
    assert(c.nonEmpty, "route comparison must not be vacuous")
    val onlyC = c -- b
    val onlyB = b -- c
    assert(onlyC.isEmpty && onlyB.isEmpty,
      s"route divergence: ${onlyC.take(3)} only-compact, " +
        s"${onlyB.take(3)} only-bucketed")
  }

  test("the size router picks compact for small stats and bucketed " +
    "past the limit, and the sys-prop override steers it") {
    val o = graft.Tables.load(spark, sfDir, "orders")
    def planOf(limit: Long): String =
      RelationalOps.groupQuantileValues(o, "o_orderstatus",
        "o_totalprice", probs, compactBytesLimit = limit)
        .queryExecution.executedPlan.toString
    // compact: one hash exchange into a grouped sorted array, no
    // TotalOrderBucket cell machinery. (The sort_array lives in the
    // aggregate's resultExpressions, which the plan string does not
    // print — collect_list is the visible signature.)
    val compactPlan = planOf(Long.MaxValue)
    assert(compactPlan.contains("collect_list"),
      s"compact route must build the grouped sorted array:\n" +
        compactPlan)
    assert(!compactPlan.contains("total_order_bucket"),
      s"compact route must not build buckets:\n$compactPlan")
    // bucketed: target-cell pruning joins a broadcast cell list and
    // keys the scan by the TotalOrderBucket key
    val bucketedPlan = planOf(0L)
    assert(bucketedPlan.contains("total_order_bucket"),
      s"bucketed route must bucket by the total-order key:\n" +
        bucketedPlan)
    assert(bucketedPlan.contains("BroadcastHashJoin"),
      s"bucketed route must broadcast the target cells:\n$bucketedPlan")
    // sys-prop steering (the registry-path force): 0 ⇒ bucketed even
    // for this tiny relation. Save/restore — the prop is JVM-global.
    val key = "graft.quantile.compactBytesLimit"
    val saved = sys.props.get(key)
    try {
      sys.props(key) = "0"
      assert(planOf(-1L).contains("total_order_bucket"),
        "sys-prop 0 must force the bucketed route")
      sys.props(key) = Long.MaxValue.toString
      assert(!planOf(-1L).contains("total_order_bucket"),
        "sys-prop MaxValue must force the compact route")
      sys.props(key) = "not-a-number"
      val e = intercept[IllegalArgumentException](planOf(-1L))
      assert(e.getMessage.contains("compactBytesLimit"))
    } finally {
      saved match {
        case Some(v) => sys.props(key) = v
        case None => sys.props -= key
      }
    }
  }

  test("both routes raise loudly on a null value column and a null " +
    "group key instead of silently mis-ranking") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(2.0)))
      .toDF("g", "v")
    for (limit <- Seq(Long.MaxValue, 0L)) {
      val e = intercept[Throwable] {
        RelationalOps.groupQuantileValues(df, "g", "v",
          Seq("p50" -> 0.5), compactBytesLimit = limit).collect()
      }
      assert(causeChain(e).contains("null value column"),
        s"limit=$limit: ${causeChain(e)}")
    }
    val ng = Seq((Option.empty[String], 1.0), (Some("b"), 2.0))
      .toDF("g", "v")
    for (limit <- Seq(Long.MaxValue, 0L)) {
      val e = intercept[Throwable] {
        RelationalOps.groupQuantileValues(ng, "g", "v",
          Seq("p50" -> 0.5), compactBytesLimit = limit).collect()
      }
      assert(causeChain(e).contains("null group key"),
        s"limit=$limit: ${causeChain(e)}")
    }
  }

  test("the compact route survives ANSI mode at p = 1.0 and on " +
    "singleton groups (hi-index clamp)") {
    // Spark 4.x defaults ansi.enabled TRUE for library callers; the
    // repo's own sessions disable it, so this flips it on explicitly.
    // Before the clamp, element_at(__vs, lo+2) was out of bounds
    // exactly where frac = 0 (top rank, singleton groups) and ANSI
    // threw INVALID_ARRAY_INDEX at extraction — size routing became
    // semantics-changing (advisory r10, medium).
    val df = Seq(("solo", 7.0), ("multi", 1.0), ("multi", 2.0),
      ("multi", 3.0), ("multi", 4.0)).toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p100" -> 1.0)
    val saved = spark.conf.get("spark.sql.ansi.enabled", "false")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val compact = RelationalOps.groupQuantileValues(df, "g", "v",
        ps, compactBytesLimit = Long.MaxValue)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(3))).toMap
      assert(compact("solo") == ((7.0, 7.0)))
      assert(compact("multi") == ((2.5, 4.0)))
      // and route equality still holds under ANSI
      val bucketed = RelationalOps.groupQuantileValues(df, "g", "v",
        ps, compactBytesLimit = 0L)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(3))).toMap
      assert(bucketed == compact,
        s"ANSI route divergence: $bucketed vs $compact")
    } finally spark.conf.set("spark.sql.ansi.enabled", saved)
  }
}
