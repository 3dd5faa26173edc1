package graft

import org.apache.spark.sql.functions._

/** End-to-end SQL surface (r7 verdict item 7): a pure-SQL user drives
  * the engine through `Tables.registerViews` + `spark.sql(...)` with
  * [[GraftExtensions]] installed — no DataFrame API in sight. For a
  * representative slice of the registry (scan/filter/joins/agg/window
  * sessionization) the oracle SQL is dialect-portable ANSI, so the SAME
  * text the driver runs in DuckDB must also run in Spark over the views
  * and produce exactly the DataFrame form's result — three engines, one
  * semantics. Plus the two extension points a SQL-only user needs: the
  * injected native function (`double_dot_product`) resolving from SQL
  * text, and the YearRangePushdown optimizer rule firing on a
  * `year(col) = k` predicate that arrived as SQL.
  */
class SqlSurfaceSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerViews(spark, sfDir)
  }

  /** The registered queries whose oracle SQL is ANSI-portable (no
    * DuckDB-only functions): run that exact text via spark.sql over
    * the views and demand row-for-row equality with the DataFrame
    * form. exceptAll both ways — duplicate rows must match in
    * multiplicity, not just membership. */
  private val portable = Seq(
    "scan_project",        // S1 projection
    "eq_filter",           // P7 predicate
    "year_pushdown_filter",// P6 + optimizer rule
    "join_ben_ip",         // J1 broadcast equi-join
    "join_3way",           // J3 chained dims
    "dict_recode",         // J2 lookup + default
    "groupby_max",         // A1 agg (decimal-exact sum)
    "distinct_ccs",        // A3 distinct
    "session_agg")         // gaps-and-islands sessionization

  for (name <- portable) {
    test(s"SQL surface: $name — oracle text over views ≡ DataFrame form") {
      val qd = Registry.all(name)
      val df = qd.fn(spark, sfDir)
      val viaSql = spark.sql(qd.oracle.get)
      assert(viaSql.columns.toSeq === df.columns.toSeq,
        s"$name: SQL column surface drifted from the DataFrame form")
      val n = df.count()
      assert(n > 0 && viaSql.count() === n)
      assert(viaSql.exceptAll(df).isEmpty,
        s"$name: SQL text produced rows the DataFrame form did not")
      assert(df.exceptAll(viaSql).isEmpty,
        s"$name: DataFrame form produced rows the SQL text did not")
    }
  }

  test("SQL surface: injected double_dot_product resolves in spark.sql") {
    val viaSql = spark.sql(
      "SELECT vec_id, double_dot_product(" +
        "CAST(embedding AS ARRAY<DOUBLE>), " +
        "CAST(embedding AS ARRAY<DOUBLE>)) AS d2 FROM embeddings")
    val v = col("embedding").cast("array<double>")
    val viaDf = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorExpressions.dot(v, v).as("d2"))
    assert(viaSql.count() > 0)
    // identical expression, identical left-to-right fold → bit-exact
    assert(viaSql.exceptAll(viaDf).isEmpty &&
      viaDf.exceptAll(viaSql).isEmpty)
  }

  test("SQL surface: injected adc_lookup resolves in spark.sql and " +
      "demands a literal ksub") {
    // lut for ksub=2, m=2: [s0c0, s0c1, s1c0, s1c1]; code [1, 0]
    // picks s0c1 + s1c0 = 2.5 + 4.0
    val viaSql = spark.sql(
      "SELECT adc_lookup(ARRAY(1.0D, 2.5D, 4.0D, 8.0D), " +
        "ARRAY(1, 0), 2) AS d").collect()
    assert(viaSql.head.getDouble(0) === 6.5)
    val e = intercept[Exception](spark.sql(
      "SELECT adc_lookup(ARRAY(1.0D), ARRAY(0), 1 + 1)").collect())
    assert(causeChain(e).contains("INTEGER literal"), causeChain(e))
  }

  test("SQL surface: year() predicate from SQL text reaches the scan") {
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE year(o_orderdate) = 1997")
      .queryExecution.executedPlan.toString
    // the injected rule rewrites year(c)=k into an o_orderdate range
    // that the parquet source accepts as a pushed filter
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate,"),
      s"year() predicate was not pushed to the scan:\n$plan")
  }
}
