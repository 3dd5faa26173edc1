package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named relational operator queries (SURVEY.md §2.2-§2.5, §2.7 metrics),
  * each with a DuckDB oracle. Role mapping per FIXTURES.md §B:
  * customer≈ben, orders≈ip claim header, lineitem≈code slots,
  * part≈crosswalk, events≈dated events.
  *
  * Cross-engine determinism rules used throughout:
  *  - no `rand()`: deterministic multiplicative mix keys
  *    ([[RelationalOps.mixKey]]);
  *  - double sums go through decimal ([[RelationalOps.exactSum]]) so
  *    aggregation order can't perturb bits;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - int-ish outputs are cast to the same width on both sides.
  */
object RelationalQueries {
  import RelationalOps._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** orders.label: TJR-claim analog (`cms_preprocess.py:202` DRG 469/470 →
    * 1). Here: urgent/high priority → 1. */
  private def orderLabel = when(
    col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)

  private val orderLabelSql =
    "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END"

  /** Deterministic stand-in for a model score in the metric queries. */
  private def orderScore = (col("o_orderkey") % 100) / lit(100.0)
  private val orderScoreSql = "(o_orderkey % 100) / 100.0"

  val defs: Map[String, QDef] = Map(

    // ----- §2.1/§2.2 scans, projections, casts, filters -----------------

    // S1: projection pruned into the scan (ref cms_preprocess.py:45-49).
    "scan_project" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
      "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice " +
        "FROM lineitem"),

    // P1: to_numeric(errors='coerce') ≡ try_cast (ref cms_preprocess.py:72)
    // via RelationalOps.coerceLong — rlike-guarded so the all-non-numeric
    // status column doesn't pay try_cast's per-row exception (was 1.27 s,
    // 5× its projection peers at sf0.1; now in line). Oracle unchanged:
    // the guard is semantically invisible.
    "cast_coerce" -> QDef(
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        RelationalOps.coerceLong(
          substring(col("o_orderpriority"), 1, 1)).as("prio_num"),
        RelationalOps.coerceLong(col("o_orderstatus")).as("status_num")),
      "SELECT o_orderkey, " +
        "TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num, " +
        "TRY_CAST(o_orderstatus AS BIGINT) AS status_num FROM orders"),

    // P2: dropna(subset=...) ≡ na.drop (ref cms_preprocess.py:75).
    "dropna_filter" -> QDef(
      (s, d) => t(s, d, "orders")
        .withColumn("v", when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_totalprice")))
        .na.drop(Seq("v"))
        .select("o_orderkey", "v"),
      "SELECT o_orderkey, v FROM (SELECT o_orderkey, " +
        "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v " +
        "FROM orders) WHERE v IS NOT NULL"),

    // P4: date → year (ref cms_preprocess.py:79).
    "year_extract" -> QDef(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year " +
        "FROM orders"),

    // P6: range predicate (ref cms_preprocess.py:83), in the
    // scan-pushable timestamp-range form (see RelationalOps.yearRange).
    "range_filter" -> QDef(
      (s, d) => t(s, d, "orders")
        .where(yearRange(col("o_orderdate"), 1996, 1998))
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE year(o_orderdate) BETWEEN 1996 AND 1998"),

    // P6 (optimizer-rule form): the same year predicate written naively as
    // year(c) = y with NO hand-written range — the YearRangePushdown rule
    // (GraftExtensions, wired into the Verify/Bench/test sessions) rewrites
    // it into the scan-pushable timestamp range, so PushedFilters carries
    // the bounds without the query author knowing the trick.
    "year_pushdown_filter" -> QDef(
      (s, d) => t(s, d, "orders")
        .where(year(col("o_orderdate")) === 1997)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE year(o_orderdate) = 1997"),

    // P7: equality predicate (ref cms_preprocess.py:86, SP_RA_OA == 1).
    "eq_filter" -> QDef(
      (s, d) => t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal"),
      "SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_mktsegment = 'BUILDING'"),

    // P8: negated compound IN predicate (ref cms_preprocess.py:89).
    "not_in_filter" -> QDef(
      (s, d) => t(s, d, "orders")
        .where(!(year(col("o_orderdate")).isin(1995, 1996) &&
          col("o_orderstatus").isin("F", "P")))
        .select("o_orderkey", "o_orderstatus"),
      "SELECT o_orderkey, o_orderstatus FROM orders " +
        "WHERE NOT (year(o_orderdate) IN (1995, 1996) " +
        "AND o_orderstatus IN ('F', 'P'))"),

    // P9: age via date difference / 365.0 (ref cms_preprocess.py:96-99).
    "age_datediff" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            / lit(365.0)).as("age_years")),
      "SELECT l_orderkey, l_linenumber, " +
        "date_diff('day', CAST(o_orderdate AS DATE), " +
        "CAST(l_shipdate AS DATE)) / 365.0 AS age_years " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),

    // P10: strip quotes + truncate at dot (ref cms_preprocess.py:119-121);
    // the dirt is synthesized because testdata is clean.
    "str_clean" -> QDef(
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        substring_index(
          regexp_replace(concat(lit("'"), col("p_type"), lit(".x'")),
            "^'|'$", ""),
          ".", 1).as("clean_type")),
      "SELECT p_partkey, " +
        "split_part(trim('''' || p_type || '.x''', ''''), '.', 1) " +
        "AS clean_type FROM part"),

    // P12: regex blank → sentinel (ref cms_preprocess.py:125).
    "regex_replace" -> QDef(
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        regexp_replace(
          when(col("doc_id") % 5 === 0, lit("   ")).otherwise(col("lang")),
          "^\\s*$", "None").as("lang_clean")),
      "SELECT doc_id, regexp_replace(" +
        "CASE WHEN doc_id % 5 = 0 THEN '   ' ELSE lang END, " +
        "'^\\s*$', 'None') AS lang_clean FROM documents"),

    // Smoothed target encoding (the category-mean feature James-Stein
    // shrunk toward the global rate with prior weight m=10) — the
    // standard high-cardinality categorical encoder next to multi_hot
    // and dict_recode. Shape: two tiny aggregates (per-category, and
    // one global row) broadcast back over the scan — the fact table
    // never shuffles. Integer label sums are exact; the final
    // arithmetic is the same IEEE op sequence on both engines,
    // round(6)ed.
    "target_encode" -> QDef(
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            orderLabel.as("label"))
        // the global row derives FROM the per-category aggregate —
        // sums of integer-valued doubles are order-exact, and it
        // saves a third scan of the fact table
        val c = o.groupBy("o_orderpriority").agg(
          sum(col("label")).cast("double").as("sc"),
          count("*").cast("double").as("nc"))
        val g = c.agg(sum(col("sc")).as("sg"),
          sum(col("nc")).as("ng"))
        o.join(broadcast(c), Seq("o_orderpriority"))
          .crossJoin(broadcast(g))
          .select(col("o_orderkey"), col("o_orderpriority"),
            round((col("sc") + lit(10.0) * (col("sg") / col("ng"))) /
              (col("nc") + lit(10.0)), 6).as("te"))
      },
      s"WITH lab AS (SELECT o_orderkey, o_orderpriority, " +
        s"$orderLabelSql AS label FROM orders), " +
        "c AS (SELECT o_orderpriority, CAST(SUM(label) AS DOUBLE) " +
        "AS sc, CAST(COUNT(*) AS DOUBLE) AS nc FROM lab GROUP BY 1), " +
        "g AS (SELECT SUM(sc) AS sg, SUM(nc) AS ng FROM c) " +
        "SELECT o_orderkey, lab.o_orderpriority, " +
        "ROUND((sc + 10.0 * (sg / ng)) / (nc + 10.0), 6) AS te " +
        "FROM lab JOIN c ON lab.o_orderpriority = c.o_orderpriority " +
        "CROSS JOIN g"),

    // P15: binary label derivation (ref cms_preprocess.py:202).
    "label_case_when" -> QDef(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), orderLabel.as("label")),
      s"SELECT o_orderkey, $orderLabelSql AS label FROM orders"),

    // P18: day-of-year extract (ref cms_preprocess.py:320-321).
    "dayofyear_extract" -> QDef(
      (s, d) => t(s, d, "events")
        .select(col("event_id"), dayofyear(col("ts")).as("doy")),
      "SELECT event_id, CAST(dayofyear(ts) AS INT) AS doy FROM events"),

    // ----- §2.3 joins ---------------------------------------------------

    // J1: small dim ⋈ big fact — broadcast hash join, no shuffle of the
    // fact side (ref cms_preprocess.py:69 pd.merge(ben, ip)).
    "join_ben_ip" -> QDef(
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
          col("o_totalprice")),
      "SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey"),

    // J3: chained 3-way join over broadcast dims (ref modelling CNN.ipynb
    // cell 3 ben⋈pde⋈ip variant).
    "join_3way" -> QDef(
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count("*").as("n_cust")),
      "SELECT r_name, COUNT(*) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"),

    // J2: dictionary recode = broadcast left join + default (ref
    // cms_preprocess.py:158,191-195 dict.get(x, 0)).
    "dict_recode" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("p_brand"), lit("UNK")).as("brand_code")),
      "SELECT l_orderkey, l_linenumber, " +
        "COALESCE(p_brand, 'UNK') AS brand_code FROM lineitem " +
        "LEFT JOIN part ON l_partkey = p_partkey"),

    // J4/A2: left-semi join against the qualifying-key set.
    "semi_join_enrolled" -> QDef(
      (s, d) => {
        val c = t(s, d, "customer")
        filterEnrolled(c, t(s, d, "orders")
          .where(yearRange(col("o_orderdate"), 1996, 1998))
          .select(col("o_custkey").as("c_custkey"),
            col("o_orderdate")),
          "c_custkey", year(col("o_orderdate")), Seq(1996, 1997, 1998))
          .select("c_custkey", "c_name")
      },
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (" +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) IN " +
        "(1996, 1997, 1998) GROUP BY o_custkey " +
        "HAVING COUNT(DISTINCT year(o_orderdate)) = 3)"),

    // A2: the enrollment filter applied to the fact table itself (ref
    // cms_preprocess.py:92-93): keep claims of fully-enrolled patients.
    "enrollment_filter" -> QDef(
      (s, d) => {
        val o = t(s, d, "orders")
        filterEnrolled(o, o
          .where(yearRange(col("o_orderdate"), 1996, 1998))
          .select(col("o_custkey"), col("o_orderdate")),
          "o_custkey", year(col("o_orderdate")), Seq(1996, 1997, 1998))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year"))
      },
      "SELECT o_orderkey, o_custkey, CAST(year(o_orderdate) AS INT) " +
        "AS o_year FROM orders WHERE o_custkey IN (" +
        "SELECT o_custkey FROM orders WHERE year(o_orderdate) IN " +
        "(1996, 1997, 1998) GROUP BY o_custkey " +
        "HAVING COUNT(DISTINCT year(o_orderdate)) = 3)"),

    // ----- §2.4 aggregation ---------------------------------------------

    // A1: hash groupBy + max/count/sum (ref cms_preprocess.py:286).
    // sum_price via exactSumQ (guarded long lanes, identical HALF-UP
    // scale-2 quantization): the decimal update path was half this
    // query's sf1 time (2.0 s → 1.0 s measured); the decimal exactSum
    // form stays gated on window_hourly/percentile siblings.
    "groupby_max" -> QDef(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"), year(col("o_orderdate")).as("o_year"))
        .agg(max(col("o_totalprice")).as("max_price"),
          count("*").as("n_orders"),
          RelationalOps.exactSumQ(col("o_totalprice"), 2)
            .as("sum_price")),
      "SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS o_year, " +
        "MAX(o_totalprice) AS max_price, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(SIGN(o_totalprice) * FLOOR(ABS(o_totalprice) " +
        "* 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 " +
        "AS sum_price FROM orders GROUP BY o_custkey, year(o_orderdate)"),

    // A3: distinct (ref cms_preprocess.py:159 unique()).
    "distinct_ccs" -> QDef(
      (s, d) => t(s, d, "part").select("p_brand").distinct(),
      "SELECT DISTINCT p_brand FROM part"),

    // A4/E3: set-membership indicators — which categories appear per group
    // (ref cms_preprocess.py:229-236 np.isin). max(when) per known
    // category, NOT collect_set + array_contains (r9.6): collect_set
    // is an ObjectHashAggregate — object-buffer sets, no whole-stage
    // codegen, set-valued shuffle partials — while max-of-indicator is
    // a codegen'd hash aggregate whose map-side partials are three
    // ints regardless of group size (and whose state stays bounded if
    // a category column were high-cardinality). Same rows; the open
    // category-set form lives in operators/Encoders.multiHot.
    "multi_hot" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          max(when(col("l_returnflag") === "A", 1).otherwise(0))
            .as("has_a"),
          max(when(col("l_returnflag") === "N", 1).otherwise(0))
            .as("has_n"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("has_r")),
      "SELECT l_orderkey, " +
        "MAX(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS has_a, " +
        "MAX(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS has_n, " +
        "MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r " +
        "FROM lineitem GROUP BY l_orderkey"),

    // ----- §2.5 sort / limit / split ------------------------------------

    // O1: global sort desc with unique tie-break (ref :313).
    "sort_desc" -> QDef(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")),
      "SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey"),

    // O2: sort+limit fuses to TakeOrderedAndProject — one reduce, no
    // global sort (ref :313-314 rebalance-by-head).
    "topk_limit" -> QDef(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      "SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),

    // O3: seeded shuffle via deterministic permutation key (ref :317).
    "shuffled" -> QDef(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          mixKey(col("o_orderkey")).as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("o_orderkey")),
      "SELECT o_orderkey, ((o_orderkey % 1000000007) * 2654435761) % 1000000007 " +
        "AS shuffle_key FROM orders " +
        "ORDER BY shuffle_key, o_orderkey"),

    // O4: exact stratified split (ref :364-365, sklearn stratify).
    "stratified_split" -> QDef(
      (s, d) => stratifiedSplit(
        t(s, d, "orders").select(col("o_orderkey"), orderLabel.as("label")),
        "label", "o_orderkey", 0.8)
        .select("o_orderkey", "label", "is_train"),
      // test side rounded up (sklearn): n_train = n - ceil((1-0.8)*n).
      // The float literal is Scala's (1.0 - 0.8) printed exactly, so
      // both engines ceil the SAME double near stratum-size boundaries.
      "SELECT o_orderkey, label, CASE WHEN " +
        "row_number() OVER (PARTITION BY label ORDER BY " +
        "((o_orderkey % 1000000007) * 2654435761) % 1000000007, o_orderkey) <= " +
        "COUNT(*) OVER (PARTITION BY label) - " +
        s"CEIL(${1.0 - 0.8} * COUNT(*) OVER (PARTITION BY label)) " +
        "THEN 1 ELSE 0 END " +
        s"AS is_train FROM (SELECT o_orderkey, $orderLabelSql AS label " +
        "FROM orders)"),

    // O4 forced-distributed witness (r14): stratifiedSplit with the
    // prefix-sum rank branch FORCED (compactBytesLimit = 0) under the
    // SAME oracle SQL — at gate scale the size router picks the
    // per-label window, so without this entry the route a 100-TB
    // split actually runs would drop out of the per-round DuckDB
    // gate (the `_dist` contract: percentile_scale_dist,
    // dedup_components_dist).
    "stratified_split_dist" -> QDef(
      (s, d) => stratifiedSplit(
        t(s, d, "orders").select(col("o_orderkey"), orderLabel.as("label")),
        "label", "o_orderkey", 0.8, compactBytesLimit = 0L)
        .select("o_orderkey", "label", "is_train"),
      "SELECT o_orderkey, label, CASE WHEN " +
        "row_number() OVER (PARTITION BY label ORDER BY " +
        "((o_orderkey % 1000000007) * 2654435761) % 1000000007, o_orderkey) <= " +
        "COUNT(*) OVER (PARTITION BY label) - " +
        s"CEIL(${1.0 - 0.8} * COUNT(*) OVER (PARTITION BY label)) " +
        "THEN 1 ELSE 0 END " +
        s"AS is_train FROM (SELECT o_orderkey, $orderLabelSql AS label " +
        "FROM orders)"),

    // O5: deterministic 5-fold assignment (ref ml_models.ipynb KFold).
    "kfold_assign" -> QDef(
      (s, d) => kfoldAssign(
        t(s, d, "orders").select("o_orderkey"), "o_orderkey", 5)
        .select("o_orderkey", "fold"),
      "SELECT o_orderkey, CAST(ntile(5) OVER (ORDER BY " +
        "((o_orderkey % 1000000007) * 2654435761) % 1000000007, o_orderkey) AS INT) " +
        "AS fold FROM orders"),

    // O5 forced-distributed witness (r14): kfoldAssign's
    // distributedNtile branch FORCED under the same oracle SQL —
    // same `_dist` contract as stratified_split_dist above.
    "kfold_assign_dist" -> QDef(
      (s, d) => kfoldAssign(
        t(s, d, "orders").select("o_orderkey"), "o_orderkey", 5,
        compactBytesLimit = 0L)
        .select("o_orderkey", "fold"),
      "SELECT o_orderkey, CAST(ntile(5) OVER (ORDER BY " +
        "((o_orderkey % 1000000007) * 2654435761) % 1000000007, o_orderkey) AS INT) " +
        "AS fold FROM orders"),

    // O5 scale path: shuffle-free fold assignment — a pure map (no
    // window, no sort, no exchange at ANY cluster size), the form a
    // billion-row corpus uses. Folds are equal in expectation rather
    // than exactly; mixKey is non-negative so pmod ≡ %, and both
    // engines compute identical integers.
    "kfold_hash" -> QDef(
      (s, d) => hashFold(
        t(s, d, "orders").select("o_orderkey"), "o_orderkey", 5)
        .select("o_orderkey", "fold"),
      "SELECT o_orderkey, CAST((((o_orderkey % 1000000007) * " +
        "2654435761) % 1000000007) % 5 + 1 AS INT) AS fold FROM orders"),

    // O4 scale path: hash-threshold train/test split — the same pure
    // map, replacing stratified_split's per-label window (2 reducers
    // for a binary label regardless of cluster size). The literal
    // threshold is Scala's (0.8 * 1000000007L).toLong, interpolated so
    // both engines compare against the SAME integer.
    "split_hash" -> QDef(
      (s, d) => hashStratifiedSplit(
        t(s, d, "orders").select("o_orderkey"), "o_orderkey", 0.8)
        .select("o_orderkey", "is_train"),
      "SELECT o_orderkey, CASE WHEN ((o_orderkey % 1000000007) * " +
        "2654435761) % 1000000007 < " +
        s"${(0.8 * 1000000007L).toLong} THEN 1 ELSE 0 END " +
        "AS is_train FROM orders"),

    // ----- §2.6/E1 pivot ------------------------------------------------

    // E1: AOV flatten = groupBy + fixed-year conditional aggregation (ref
    // cms_preprocess.py:267-297). One shuffle; pivot list is fixed so no
    // pivot-discovery job.
    "aov_pivot" -> QDef(
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_custkey"), year(col("o_orderdate")).as("y"),
            col("o_totalprice"))
        o.groupBy("o_custkey").agg(
          coalesce(exactSum(when(col("y") === 1996,
            col("o_totalprice"))), lit(0.0)).as("total_1996"),
          coalesce(exactSum(when(col("y") === 1997,
            col("o_totalprice"))), lit(0.0)).as("total_1997"),
          coalesce(exactSum(when(col("y") === 1998,
            col("o_totalprice"))), lit(0.0)).as("total_1998"),
          count(when(col("y") === 1996, 1)).as("n_1996"),
          count(when(col("y") === 1997, 1)).as("n_1997"),
          count(when(col("y") === 1998, 1)).as("n_1998"))
      },
      "SELECT o_custkey, " +
        "COALESCE(CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) " +
        "AS total_1996, " +
        "COALESCE(CAST(SUM(CASE WHEN year(o_orderdate) = 1997 THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) " +
        "AS total_1997, " +
        "COALESCE(CAST(SUM(CASE WHEN year(o_orderdate) = 1998 THEN " +
        "CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) " +
        "AS total_1998, " +
        "COUNT(CASE WHEN year(o_orderdate) = 1996 THEN 1 END) AS n_1996, " +
        "COUNT(CASE WHEN year(o_orderdate) = 1997 THEN 1 END) AS n_1997, " +
        "COUNT(CASE WHEN year(o_orderdate) = 1998 THEN 1 END) AS n_1998 " +
        "FROM orders GROUP BY o_custkey"),

    // ----- events: batch analog of the streaming hourly window ----------

    "window_hourly" -> QDef(
      (s, d) => t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count("*").as("n_events"),
          exactSum(col("value"), 6).as("sum_value")),
      "SELECT event_type, date_trunc('hour', ts) AS hour_start, " +
        "COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type, date_trunc('hour', ts)"),

    // S5: profile summary — exact stats per numeric column (ref
    // dataprep_report.py EDA; full profiling out of scope, SURVEY §2.1).
    // ONE aggregation pass for all profiled columns, reshaped to
    // per-column rows with a constant-width explode — the prior
    // one-agg-per-column union planned one Scan per column (3 Scan /
    // 3 Exchange at 3 columns). Column pruning means the union form
    // read each column's BYTES once too; what the single pass removes
    // is the per-scan machinery — per-column jobs, file listings,
    // row-group footer reads, and one pipelined pass over the row
    // count per column (a 30-column EDA report walks the table's rows
    // 30 times vs once). Measured: 0.45 → 0.17 s at sf0.1; 0.89 →
    // 0.76 s at sf10 min-over-2-fresh-JVMs. The aggregate values are
    // bit-identical (same count/min/max over the same parquet
    // doubles), so the oracle hash is unchanged.
    "profile_summary" -> QDef(
      (s, d) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"__n_$c"),
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c")))
        t(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"), col(s"__n_$c").as("n"),
            col(s"__mn_$c").as("min_v"), col(s"__mx_$c").as("max_v")))
            : _*)).as("__r"))
          .select(col("__r.*"))
      },
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        s"SELECT '$c' AS col_name, COUNT($c) AS n, " +
          s"CAST(MIN($c) AS DOUBLE) AS min_v, " +
          s"CAST(MAX($c) AS DOUBLE) AS max_v FROM lineitem"
      }.mkString(" UNION ALL ")),

    // S5 distributions: the dataprep report's per-column histograms
    // (dataprep_report.py's distribution plots) — all columns in one
    // unpivot + one (column, bin) shuffle, bounds from one tiny agg.
    // Binning is plain IEEE arithmetic on identical parquet doubles,
    // so DuckDB reproduces the bins exactly; the oracle replicates the
    // Spark side's non-finite exclusion and two-ended clamp, so parity
    // holds even on double columns carrying NaN/Infinity (vacuous on
    // these columns, load-bearing for any future histogram query).
    "profile_histogram" -> QDef(
      (s, d) => ProfileOps.histograms(
        t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice"), bins = 20)
        .select(col("column").as("col_name"), col("bin"), col("n")),
      Seq("l_quantity", "l_extendedprice").map { c =>
        s"SELECT '$c' AS col_name, " +
          s"CAST(GREATEST(LEAST(FLOOR((CAST($c AS DOUBLE) - mn) / " +
          s"(mx - mn) * 20), 19), 0) AS INT) AS bin, " +
          s"COUNT(*) AS n FROM lineitem, (SELECT CAST(MIN($c) AS " +
          s"DOUBLE) AS mn, CAST(MAX($c) AS DOUBLE) AS mx FROM " +
          s"lineitem WHERE isfinite(CAST($c AS DOUBLE))) " +
          s"WHERE $c IS NOT NULL AND isfinite(CAST($c AS DOUBLE)) " +
          "GROUP BY 2"
      }.mkString(" UNION ALL ")),

    // S5 interactions: pairwise Pearson over the numeric columns —
    // one moment-sum pass for every pair, closed form + the SAME
    // floor-based rounding on both sides. Moments ride the long-lane
    // quantized sums (RelationalOps.q4*): exact integer arithmetic in
    // both engines, recombined in double in identical textual order —
    // bit-exact, and ~2× faster than the decimal(28,4) route whose
    // BigDecimal per-row path dominated this query's bench time.
    // (Lineitem values are well inside the |q| < 2^31.5 lane domain,
    // so the fallback the API carries never fires here.)
    "profile_corr" -> QDef(
      (s, d) => ProfileOps.correlations(
        t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        def q(c: String) =
          s"CAST(FLOOR($c * 10000.0 + 0.5) AS BIGINT)"
        def m(c: String) =
          s"(CAST(SUM(${q(c)}) AS DOUBLE) / 10000.0)"
        def mm(a: String, b: String) =
          s"((CAST(SUM((${q(a)} * ${q(b)}) >> 32) AS DOUBLE) * " +
            s"4294967296.0 + CAST(SUM((${q(a)} * ${q(b)}) & " +
            s"4294967295) AS DOUBLE)) / 100000000.0)"
        val pairs = for {
          i <- cols.indices; j <- (i + 1) until cols.size
        } yield (cols(i), cols(j))
        "WITH mo AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, " +
          cols.flatMap(c => Seq(s"${m(c)} AS s_$c",
            s"${mm(c, c)} AS ss_$c")).mkString(", ") + ", " +
          pairs.zipWithIndex.map { case ((a, b), i) =>
            s"${mm(a, b)} AS sp_$i"
          }.mkString(", ") + " FROM lineitem) " +
          pairs.zipWithIndex.map { case ((a, b), i) =>
            s"SELECT '$a' AS col_a, '$b' AS col_b, " +
              s"FLOOR((n * sp_$i - s_$a * s_$b) / " +
              s"SQRT((n * ss_$a - s_$a * s_$a) * " +
              s"(n * ss_$b - s_$b * s_$b)) * 1000000 + 0.5) / 1000000 " +
              s"AS corr FROM mo"
          }.mkString(" UNION ALL ")
      }),

    // ----- §2.7 metric queries ------------------------------------------

    // M6: confusion matrix.
    "confusion_matrix" -> QDef(
      (s, d) => MetricsOps.confusionMatrix(
        t(s, d, "orders"), orderLabel,
        when(col("o_totalprice") > 250000.0, 1).otherwise(0)),
      s"SELECT $orderLabelSql AS label, " +
        "CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END " +
        "AS prediction, COUNT(*) AS n FROM orders " +
        "GROUP BY label, prediction"),

    // M11: accuracy.
    "accuracy_agg" -> QDef(
      (s, d) => MetricsOps.accuracy(
        t(s, d, "orders"), orderLabel,
        when(col("o_totalprice") > 250000.0, 1).otherwise(0)),
      s"SELECT CAST(SUM(CASE WHEN ($orderLabelSql) = " +
        "(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END) " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS accuracy " +
        "FROM orders"),

    // Calibration / reliability diagram: equal-width score bins with
    // per-bin mean prediction vs observed label rate — the standard
    // probability-calibration read-off next to M5-M11. One hash
    // aggregate; the mean score sums INTEGER hundredths (the score is
    // k/100 by construction) so no float accumulation order exists,
    // and the fixed division chain is identical on both engines.
    "calibration_bins" -> QDef(
      (s, d) => t(s, d, "orders")
        .select((col("o_orderkey") % 100).as("k"),
          orderLabel.as("label"))
        .groupBy(least(floor((col("k") / lit(100.0)) * 10), lit(9))
          .cast("int").as("bin"))
        .agg(count("*").as("n"),
          round(sum(col("k")).cast("double") / 100.0 / count("*"), 6)
            .as("mean_score"),
          round(sum(col("label")).cast("double") / count("*"), 6)
            .as("mean_label")),
      "SELECT CAST(LEAST(FLOOR(((o_orderkey % 100) / 100.0) * 10), 9) " +
        "AS INT) AS bin, COUNT(*) AS n, " +
        "ROUND(CAST(SUM(o_orderkey % 100) AS DOUBLE) / 100.0 " +
        "/ COUNT(*), 6) AS mean_score, " +
        s"ROUND(CAST(SUM($orderLabelSql) AS DOUBLE) / COUNT(*), 6) " +
        "AS mean_label FROM orders GROUP BY 1"),

    // M10: MSE of a deterministic score against the label.
    "mse_agg" -> QDef(
      (s, d) => MetricsOps.mse(
        t(s, d, "orders"), orderLabel, orderScore),
      s"SELECT CAST(SUM(CAST((($orderLabelSql) - ($orderScoreSql)) * " +
        s"(($orderLabelSql) - ($orderScoreSql)) AS DECIMAL(18,8))) " +
        "AS DOUBLE) / COUNT(*) AS mse FROM orders"),

    // M5: weighted-F1 threshold sweep.
    "f1_threshold_sweep" -> QDef(
      (s, d) => MetricsOps.weightedF1Sweep(s,
        t(s, d, "orders")
          .select(orderLabel.as("label"), orderScore.as("score"))),
      "WITH lab AS (SELECT " + orderLabelSql + " AS label, " +
        orderScoreSql + " AS score FROM orders), " +
        "th AS (SELECT i / 100.0 AS threshold FROM range(0, 100) r(i)), " +
        "c AS (SELECT threshold, " +
        "SUM(CASE WHEN label = 1 AND score > threshold THEN 1 ELSE 0 END) " +
        "AS tp, " +
        "SUM(CASE WHEN label = 0 AND score > threshold THEN 1 ELSE 0 END) " +
        "AS fp, " +
        "SUM(CASE WHEN label = 1 AND score <= threshold THEN 1 ELSE 0 END) " +
        "AS fn, " +
        "SUM(CASE WHEN label = 0 AND score <= threshold THEN 1 ELSE 0 END) " +
        "AS tn FROM lab CROSS JOIN th GROUP BY threshold), " +
        "f AS (SELECT threshold, " +
        "((tp + fn) * (CASE WHEN 2*tp + fp + fn = 0 THEN 0.0 ELSE " +
        "2.0 * tp / (2*tp + fp + fn) END) + " +
        "(tn + fp) * (CASE WHEN 2*tn + fn + fp = 0 THEN 0.0 ELSE " +
        "2.0 * tn / (2*tn + fn + fp) END)) / (tp + fn + tn + fp) AS wf1 " +
        "FROM c) " +
        "SELECT threshold, ROUND(wf1, 6) AS weighted_f1 FROM f " +
        "ORDER BY wf1 DESC, threshold LIMIT 1")
  )
}
