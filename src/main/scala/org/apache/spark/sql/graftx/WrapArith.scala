package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, EvalMode, Multiply}
import org.apache.spark.sql.classic.ExpressionUtils

/** Long arithmetic with explicit mod-2^64 wraparound, independent of the
  * session's `spark.sql.ansi.enabled`.
  *
  * Hash mixing (e.g. [[graft.operators.Dedup]]'s universal-hash family
  * `h_j(x) = a_j·x + b_j` over 64-bit shingle hashes) REQUIRES natural
  * two's-complement overflow — that IS the "mod 2^64". Column `*`/`+`
  * pick their eval mode from the session conf at analysis time, so under
  * Spark 4.x's default ANSI-on a library caller gets
  * ARITHMETIC_OVERFLOW mid-pipeline (r11 ANSI sweep: 5 of 138 registered
  * queries — the whole minhash/components family — crashed this way).
  * `try_multiply` would be semantically wrong here: NULL-on-overflow
  * collapses most of the hash family to NULL, destroying the signatures.
  *
  * Building `Multiply`/`Add` with `EvalMode.LEGACY` pins wraparound at
  * expression construction. Codegen is the same plain JVM `*`/`+` the
  * non-ANSI session generated before, so this is cost- and value-neutral
  * for every existing caller.
  *
  * Lives under `org.apache.spark.sql` for the same reason as the sibling
  * graftx expressions: the Column↔Expression bridge
  * (`classic.ExpressionUtils`) is `private[sql]`.
  */
object WrapArith {
  def mul(a: Column, b: Column): Column =
    ExpressionUtils.column(Multiply(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      EvalMode.LEGACY))

  def add(a: Column, b: Column): Column =
    ExpressionUtils.column(Add(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      EvalMode.LEGACY))
}
