package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins the `session_agg` gap-boundary semantics: what happens when two
  * events are EXACTLY the gap apart. Empirically (asserted below),
  * Spark's `session_window` MERGES at the boundary — the window merge
  * treats [t, t+gap] as inclusive, so an event at exactly t+gap extends
  * the session. That is precisely the DuckDB oracle's convention (`new
  * session only when diff > gap`), so the two engines agree at the
  * boundary and the r2 worry (that they'd diverge and only escaped
  * notice because nanosecond timestamps make exact-boundary gaps rare)
  * is settled by construction, not by luck.
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def t(min: Double): Timestamp =
    new Timestamp(base + (min * 60000L).toLong)

  private def sessions(times: Seq[Timestamp]): Seq[(Long, Long)] = {
    val df = times.map(ts => (1L, ts)).toDF("user_id", "ts")
    val viaWindow = df.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count("*").as("n"))
      .select(col("w.start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // The registered `session_agg` runs the lag/islands form (one
    // exchange; see AnalyticsQueries) — every fixture must see the
    // SAME sessions from both constructions, or the r9.6 plan swap
    // changed semantics, not just the plan.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val us = unix_micros(col("ts"))
    val viaIslands = df
      .withColumn("__new",
        when(us - lag(us, 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).cast("long").as("st"), count("*").as("n"))
      .select(col("st"), col("n"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(viaIslands === viaWindow,
      s"islands $viaIslands != session_window $viaWindow")
    viaWindow
  }

  test("an event exactly gap minutes after the last one EXTENDS the " +
    "session (inclusive boundary, same as the oracle's diff > gap)") {
    val out = sessions(Seq(t(0), t(30)))
    assert(out.length === 1, s"boundary event must merge: $out")
    assert(out.head._2 === 2L)
  }

  test("an event just past the gap starts a new session") {
    val out = sessions(Seq(t(0), t(30.001)))
    assert(out.length === 2)
    assert(out.map(_._2) === Seq(1L, 1L))
  }

  test("an event just inside the gap extends the session") {
    val out = sessions(Seq(t(0), t(29.999)))
    assert(out.length === 1)
    assert(out.head._2 === 2L)
  }

  test("session extension is from the LAST event, not the first") {
    // 0, 20, 40: each consecutive gap is 20 min < 30 → one session,
    // even though 40 - 0 exceeds the gap.
    val out = sessions(Seq(t(0), t(20), t(40)))
    assert(out.length === 1)
    assert(out.head._2 === 3L)
  }
}
