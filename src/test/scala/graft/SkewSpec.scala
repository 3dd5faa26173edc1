package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: the engine's stated strategy for skewed joins is
  * "let AQE split the hot partitions" (README scale notes), with
  * saltedAgg covering the aggregation case AQE doesn't. This spec
  * forces a skewed sort-merge join under tiny skew thresholds and
  * asserts AQE actually marks and splits the skewed partition. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows share key 0; right is uniform
      val left = spark.range(0, 200000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // collect() executes THIS Dataset's QueryExecution, so the
      // adaptive plan below is the finalized one (count() would build
      // a separate QueryExecution and leave this plan unexecuted)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
