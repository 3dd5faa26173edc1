package graft.operators

import graft.SparkSpec
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Injection counter in a companion object: local-mode tasks share the
  * test JVM, so executor-side increments are visible to the suite. */
object RetryInjector {
  val fired = new AtomicInteger(0)
}

/** Pins the README claim "reproducible across retries and speculative
  * tasks": a task that fails MID-PARTITION on its first attempt (some
  * rows already emitted, then an exception) and is re-run by the
  * scheduler must not change any downstream result — no duplicated or
  * lost rows through shuffles, no key reassignment in hash-keyed
  * splits, no signature drift in minhash.
  *
  * On a 1000-executor cluster task retries and speculative duplicates
  * are routine, so an operator whose output depends on attempt history
  * is broken at scale by construction. Spark guarantees failed-attempt
  * output is discarded (shuffle files of a failed task are never
  * registered); these tests verify OUR operators don't defeat that —
  * e.g. via attempt-visible state or non-deterministic keys.
  *
  * Requires SparkSpec's `local[4, 2]` master: plain `local[4]` pins
  * spark.task.maxFailures to 1 and the injected failure would kill the
  * job instead of retrying the task.
  */
class RetryDeterminismSpec extends SparkSpec {
  import spark.implicits._

  /** (id, text, value) rows through a partition-0 first-attempt failure
    * injected after 3 rows have already been produced. Each call builds
    * a FRESH lineage (fresh RDD), so the injection re-fires per query
    * rather than being masked by shuffle-output reuse. */
  private def injectedRows(n: Int): DataFrame =
    spark.sparkContext.parallelize(1 to n, 4)
      .mapPartitionsWithIndex { (pid, it) =>
        val tc = TaskContext.get()
        val failing = pid == 0 && tc.attemptNumber() == 0
        if (failing) RetryInjector.fired.incrementAndGet()
        var k = 0
        it.map { i =>
          k += 1
          if (failing && k == 4)
            throw new RuntimeException("injected first-attempt failure")
          (i.toLong,
            s"retry fixture sentence ${i / 2} topic ${(i / 2) % 5} " +
              "with shared words across the pair",
            (i % 17).toDouble)
        }
      }.toDF("id", "text", "v")

  private def cleanRows(n: Int): DataFrame =
    spark.sparkContext.parallelize(1 to n, 4)
      .map(i => (i.toLong,
        s"retry fixture sentence ${i / 2} topic ${(i / 2) % 5} " +
          "with shared words across the pair",
        (i % 17).toDouble))
      .toDF("id", "text", "v")

  test("a mid-partition first-attempt task failure changes nothing " +
    "through a shuffled aggregation (no lost or duplicated rows)") {
    val before = RetryInjector.fired.get()
    val agg = (df: DataFrame) =>
      df.groupBy((col("id") % 7).as("g"))
        .agg(count("*").as("n"), RelationalOps.exactSum(col("v")).as("s"))
        .orderBy("g")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val injected = agg(injectedRows(400))
    assert(RetryInjector.fired.get() > before,
      "injection never fired — the test is vacuous")
    assert(agg(cleanRows(400)) === injected)
  }

  test("hash-keyed stratified split assigns identical rows to train " +
    "after a task retry (attempt history can't move keys)") {
    val split = (df: DataFrame) =>
      RelationalOps.hashStratifiedSplit(df, "id", trainFrac = 0.8)
        .where(col("is_train") === 1)
        .select("id").as[Long].collect().sorted.toSeq
    assert(split(injectedRows(400)) === split(cleanRows(400)))
  }

  test("minhash near-dup pairs are identical through a task retry " +
    "(signatures carry no attempt-visible state)") {
    val pairs = (df: DataFrame) =>
      Dedup.minhashDedup(df, "id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = pairs(injectedRows(200))
    assert(injected.nonEmpty, "fixture should produce near-dup pairs")
    assert(pairs(cleanRows(200)) === injected)
  }
}
