package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries`/`oracleSql` are assembled from the per-domain modules in
  * [[graft.Registry]]; each entry is one named operator from the
  * SURVEY.md §2 inventory (or a beyond-reference training-data op).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 "minimum end-to-end slice"): per
    * customer-year order metrics for fully-active (1996-1998 enrolled)
    * customers — scan → broadcast join → filter → semi-join → hash agg,
    * the same shape as the reference's AOV pipeline spine
    * (cms_preprocess.py:54-101 + :286).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val enrolled = RelationalOps.filterEnrolled(
      orders.where(RelationalOps.yearRange(col("o_orderdate"),
        1996, 1998)),
      orders.where(RelationalOps.yearRange(col("o_orderdate"),
        1996, 1998))
        .select(col("o_custkey"), col("o_orderdate")),
      "o_custkey", year(col("o_orderdate")), Seq(1996, 1997, 1998))
    enrolled
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"), col("c_mktsegment"),
        year(col("o_orderdate")).as("o_year"))
      .agg(count("*").as("n_orders"),
        max(col("o_totalprice")).as("max_price"),
        RelationalOps.exactSum(col("o_totalprice")).as("sum_price"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (k, QDef(_, Some(sql))) => k -> sql }
}
