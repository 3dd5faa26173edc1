package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx.{AdcLookup, DoubleDotProduct}

/** Public surface for the library's native Catalyst expressions (the
  * implementations live in [[org.apache.spark.sql.graftx]] — see the
  * packaging note there). */
object VectorExpressions {

  /** Codegen'd dot product of two `array<double>` columns. Left-to-right
    * summation; bit-identical to the HOF fold and DuckDB's
    * `list_dot_product`. */
  def dot(a: Column, b: Column): Column = DoubleDotProduct.asColumn(a, b)

  /** Codegen'd PQ asymmetric-distance: Σ_i lut[i·ksub + code(i)] over
    * an `array<double>` lookup table and an `array<int>` code. */
  def adcLookup(lut: Column, code: Column, ksub: Int): Column =
    AdcLookup.asColumn(lut, code, ksub)
}
