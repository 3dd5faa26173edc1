package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Pinned post-`Tables.load` schema of every testdata table — the
  * testdata-drift canary's single source of truth.
  *
  * Round 6 lost 13 gate queries, 7 tests, and the whole bench to ONE
  * silent environment shift: the driver regenerated `/root/testdata` with
  * `events.ts` as TIMESTAMP(MICROS) where the loader assumed legacy
  * TIMESTAMP(NANOS), and the failure surfaced as ~20 opaque
  * `DATATYPE_MISMATCH` analysis errors scattered across suites. This
  * object is the one-line diagnosis for next time: [[drift]] names the
  * drifted table/column/both-types directly. It is consumed twice —
  * TestdataCanarySpec fails the build on any drift, and Verify prints a
  * loud warning before the gate runs (warning, not fatal: a partial gate
  * that names its cause beats an empty one).
  *
  * Expectations were read from the 2026-08-13 regeneration (pyarrow
  * footer dump, identical across sf0.001/0.01/0.1), adjusted for Spark's
  * read mapping: parquet timestamp[us] with isAdjustedToUTC=false infers
  * as TIMESTAMP_NTZ on the generic path (o_orderdate, l_shipdate) and is
  * normalized to TimestampType by the loader on the events path only.
  */
object TestdataSchema {

  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType, // loader-normalized
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  /** nullable/containsNull-insensitive comparison — physical-encoding
    * detail the canary doesn't care about; type identity is the contract. */
  private def same(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(x, _), ArrayType(y, _)) => same(x, y)
    case (x, y)                             => x == y
  }

  /** Drift report for one table: empty = schema as pinned; otherwise one
    * human-readable line per drifted/missing/new column. */
  def drift(spark: SparkSession, dir: String, table: String): Seq[String] = {
    val cols = expected(table)
    val gotMap = Tables.load(spark, dir, table)
      .schema.fields.map(f => f.name -> f.dataType).toMap
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, want) <- cols) gotMap.get(name) match {
      case None =>
        out += s"$table.$name: MISSING (expected ${want.simpleString})"
      case Some(have) if !same(have, want) =>
        out += s"$table.$name: expected ${want.simpleString}, " +
          s"testdata now reads as ${have.simpleString}"
      case _ => ()
    }
    val extra = gotMap.keySet -- cols.map(_._1).toSet
    if (extra.nonEmpty)
      out += s"$table has unexpected new columns: " +
        extra.toSeq.sorted.mkString(", ")
    out.toSeq
  }

  /** All-tables drift report; also catches tables that fail to LOAD
    * (e.g. the r6 nanos workaround throwing on micros data) and reports
    * the load error as drift instead of propagating it. */
  def driftAll(spark: SparkSession, dir: String): Seq[String] =
    expected.keys.toSeq.sorted.flatMap { t =>
      try drift(spark, dir, t)
      catch {
        case e: Throwable =>
          Seq(s"$t: Tables.load FAILED on current testdata: ${e.getMessage}")
      }
    }
}
