package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 check: `entry()` must
  * return rows on sf0.001. Not part of the driver contract. */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("cms")) {
      val base = "src/test/resources/cms"
      val aov = cms.CmsPipeline.aovPipeline(spark, s"$base/ben.csv",
        s"$base/ip.csv", s"$base/dx.csv", s"$base/pcs.csv")
      println("AOV_ROWS=" + aov.count())
      aov.show(5, truncate = false)
      aov.explain("formatted")
    } else {
      val df = SparkEntry.entry(spark)
      println("ENTRY_ROWS=" + df.count())
      df.show(5, truncate = false)
      df.explain("formatted")
    }
    spark.stop()
  }
}
