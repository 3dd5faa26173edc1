package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** pointInIntervalJoin ≡ the naive theta join, at grains both above
  * and below the interval length, plus the approx-distinct error
  * bound the driver probe states as a flag. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def evPoints = Tables.load(spark, sfDir, "events")
    .where($"ts".isNotNull)
    .select($"event_id", $"ts", $"value")

  private def evWindows = Tables.load(spark, sfDir, "events")
    .where($"ts".isNotNull && $"event_type" === "error")
    .select($"event_id".as("inc_id"), $"ts".as("lo"),
      ($"ts" + expr("INTERVAL 10 MINUTES")).as("hi"))

  private def thetaPairs = evPoints.join(evWindows,
      $"ts" >= $"lo" && $"ts" <= $"hi")
    .select($"event_id", $"inc_id")

  test("pointInIntervalJoin equals the theta join when the grain " +
    "covers the interval (≤2 copies) and when it is far below it " +
    "(many copies)") {
    for (grain <- Seq(600L, 60L, 7L)) {
      val got = RelationalOps.pointInIntervalJoin(
          evPoints, "ts", evWindows, "lo", "hi", grainSec = grain)
        .select($"event_id", $"inc_id")
      assert(got.except(thetaPairs).isEmpty &&
        thetaPairs.except(got).isEmpty, s"grain=$grain")
      // no dedup in the operator, so pair MULTIPLICITY must match
      // too (except() is set-semantics and cannot see duplicates)
      assert(got.count() === thetaPairs.count(), s"grain=$grain count")
    }
  }

  test("range_join boundary semantics are inclusive at both fence " +
    "posts: every error event is inside its own window") {
    val out = Registry.all("range_join").fn(spark, sfDir)
    val errs = evWindows.select($"inc_id")
    // the lo fence post, asserted on the PAIR relation (the n_events
    // aggregate can't emit a count < 1 by construction): each
    // window's own opening event (ts == lo) is among its matches
    val openers = RelationalOps.pointInIntervalJoin(
        evPoints, "ts", evWindows, "lo", "hi", grainSec = 600)
      .where($"event_id" === $"inc_id")
    assert(openers.count() === errs.count())
    assert(errs.except(out.select($"inc_id")).isEmpty)
  }

  test("approx_distinct estimates stay within 5% of exact per " +
    "event_type (rsd=0.02, fixed data)") {
    val approx = Registry.all("approx_distinct").fn(spark, sfDir)
    val exact = Tables.load(spark, sfDir, "events")
      .where($"user_id".isNotNull)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    val bad = approx.join(exact, "event_type")
      .where(abs($"approx_users" - $"exact_users")
        .cast("double") / $"exact_users".cast("double") > 0.05)
    assert(bad.count() === 0L)
    // and the driver-gated probe flag agrees
    val probe = Registry.all("approx_distinct_probe").fn(spark, sfDir)
    assert(probe.where($"within_bound" =!= 1).count() === 0L)
  }
}
