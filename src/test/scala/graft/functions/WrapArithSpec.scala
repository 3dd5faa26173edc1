package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.WrapArith

/** WrapArith's contract is COST-neutrality as much as value-neutrality:
  * under an ansi=false session (this repo's own sessions, every bench
  * tier), `WrapArith.mul/add` must analyze to the bit-identical
  * expression the plain `*`/`+` operators get — same Multiply/Add with
  * EvalMode.LEGACY, same codegen, zero plan drift. Only under ansi=true
  * do the two forms diverge (that divergence is the point: wraparound
  * hash semantics must not follow the session conf). */
class WrapArithSpec extends SparkSpec {

  test("under ansi=false, WrapArith analyzes to the same plan as */+ " +
    "(cost-neutral for every existing session and bench number)") {
    val df = spark.range(4).select(col("id"))
    val plain = df.select(
      (col("id") * lit(0x9E3779B97F4A7C15L) + lit(7L)).as("x"))
    val wrapped = df.select(
      WrapArith.add(WrapArith.mul(col("id"), lit(0x9E3779B97F4A7C15L)),
        lit(7L)).as("x"))
    assert(plain.queryExecution.analyzed.canonicalized ===
      wrapped.queryExecution.analyzed.canonicalized,
      "WrapArith drifted from the non-ANSI operator plan — the " +
        "cost-neutrality claim no longer holds")
  }

  test("under ansi=true, WrapArith wraps where * throws") {
    val saved = spark.conf.get("spark.sql.ansi.enabled", "false")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val df = spark.range(1)
        .select(lit(Long.MaxValue).as("h"))
      val wrapped = df
        .select(WrapArith.mul(col("h"), lit(3L)).as("x"))
        .head().getLong(0)
      assert(wrapped === Long.MaxValue * 3L) // JVM two's-complement
      val thrown = intercept[Exception] {
        df.select((col("h") * lit(3L)).as("x")).head()
      }
      assert(causeChain(thrown).toLowerCase.contains("overflow"))
    } finally spark.conf.set("spark.sql.ansi.enabled", saved)
  }
}
