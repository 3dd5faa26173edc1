package graft.examples

import graft.Tables
import graft.operators.Encoders
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-dimension MHE training demo: builds 366×516 = 188,856-dim
  * sparse day-grid vectors (the exact tensor shape the reference's CNN
  * consumes, `cnn_model.ipynb:155`) from the sf0.1 events table and
  * trains the M3-equivalent linear head, printing stage timings.
  *
  * Baseline context (BASELINE.md): the reference trains its CNN at
  * ~5 s/epoch on an RTX 3060 (10 epochs, 6,400 train rows) and
  * ~95 s/epoch on CPU at the 60k config. The grid here is synthetic
  * (event props hashed into the 516-code space) — the point is the
  * vector dimensions, row counts, and end-to-end wall time on CPU.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.MheScale"`.
  */
object MheScale {
  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[mhe-scale] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val width = 516

    val events = Tables.load(spark, dir, "events")
    // per (user, day): the codes seen that day, hashed into 516 bins —
    // same grain as the reference's per-claim code slots
    val grid = timed("encode") {
      val perDay = events
        .groupBy(col("user_id"), dayofyear(col("ts")).as("doy"))
        .agg(collect_set(pmod(xxhash64(col("event_type"), col("props")),
          lit(width)).cast("int")).as("code_idxs"),
          max(col("value")).as("label_src"))
      val df = perDay.select(
        col("user_id"), col("doy"),
        Encoders.mheVector(col("doy"), col("code_idxs"), width)
          .as("features"),
        (col("label_src") > 50.0).cast("double").as("label"))
      df.cache()
      println(s"[mhe-scale] rows=${df.count()} dim=${366 * width}")
      df
    }
    val model = timed("train") {
      new LogisticRegression().setMaxIter(10)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(grid)
    }
    timed("score") {
      val acc = model.transform(grid)
        .select(avg(when(col("label") === col("prediction"), 1.0)
          .otherwise(0.0)).as("acc")).head().getDouble(0)
      println(f"[mhe-scale] train accuracy $acc%.4f " +
        f"(coefficients nnz=${model.coefficients.numNonzeros})")
    }
    spark.stop()
  }
}
