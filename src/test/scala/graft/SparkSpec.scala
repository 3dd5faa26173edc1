package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared per-suite SparkSession (local, ANSI off to mirror the
  * reference's coerce-to-null cast semantics).
  *
  * Master is `local[4, 2]` — 4 threads, maxFailures 2 — so the suite
  * runs under retry-enabled scheduling like a real cluster (plain
  * `local[4]` pins maxFailures to 1 and silently ignores the conf),
  * which is what lets RetryDeterminismSpec inject first-attempt task
  * failures and assert results don't move. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // One session is shared across suites in the forked test JVM; don't
    // stop it per-suite (scalatest runs suites sequentially by default).
    super.afterAll()
  }

  lazy val sfDir = "/root/testdata/sf0.001"

  /** All messages along a throwable's cause chain — Spark wraps task
    * failures (raise_error, codegen throws) in SparkException layers
    * whose outer message may not carry the root cause's text. */
  protected def causeChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
}
