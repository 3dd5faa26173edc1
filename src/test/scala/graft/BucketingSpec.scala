package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The co-located join strategy for repeated big-big joins at scale:
  * bucket both fact tables on the join key at write time, and the join
  * plans with ZERO exchanges — each task reads matching buckets from
  * both sides. At 100 TB this turns the recurring orders⋈lineitem
  * shuffle (the dominant cost of the fact-fact join) into a scan-side
  * merge. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle") {
    // warehouse.dir is a static conf — tables land in the default
    // ./spark-warehouse (gitignored) and are dropped in the finally.
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("l_extendedprice")).as("rev"))
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        joined.explain("formatted")
      }
      val plan = out.toString
      // exactly ONE Exchange (the final groupBy's): the join reads
      // co-located buckets from both sides, shuffle-free
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // correctness unchanged vs the unbucketed join
      val expect = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("l_extendedprice")).as("rev"))
        .as[(Long, Double)].collect().toMap
      val got = joined.as[(Long, Double)].collect().toMap
      assert(got.keySet === expect.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - expect(k)) < 1e-6 * math.max(1.0,
          math.abs(v)))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitionBy(year) writes prune at read time") {
    val dir = Files.createTempDirectory("graft_part").toString + "/orders"
    val orders = Tables.load(spark, sfDir, "orders")
    orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val back = spark.read.parquet(dir).where(col("o_year") === 1997)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      back.explain("formatted")
    }
    val plan = out.toString
    // the year predicate must be a PartitionFilter (directory pruning),
    // not a post-scan filter
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    val expected = orders.where(year(col("o_orderdate")) === 1997).count()
    assert(back.count() === expected && expected > 0)
  }

  test("IVF cells written partitionBy(cell) turn a probe into a " +
    "partition-pruned scan (the ivfIndex scaladoc's scale path)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val (centroids, indexed) = operators.Similarity.ivfIndex(emb,
      nlist = 8)
    val dir = Files.createTempDirectory("graft_ivf").toString + "/ivf"
    indexed.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val back = spark.read.parquet(dir).where(col("cell").isin(2, 5))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      back.explain("formatted")
    }
    val plan = out.toString
    // probing 2 of 8 cells must prune at the directory level — the
    // scan never touches the other 6 cells' files
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("cell"), plan)
    val expected = indexed.where(col("cell").isin(2, 5)).count()
    assert(back.count() === expected)
    assert(centroids.length === 8)
  }

  test("registerViews exposes the testdata to spark.sql") {
    Tables.registerViews(spark, sfDir)
    val n = spark.sql(
      "SELECT COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey")
      .head().getLong(0)
    assert(n === 1500)
  }
}
