package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorQueries}

/** Scratch A/B for the r9 verdict's ann_ivf attribution question: did
  * the sf0.1 0.62 → 0.81 s delta come from the r9 adaptive index
  * constants (nlist √n = 45 at the 2k gate vs r8's fixed 8) or from
  * host noise? Runs the full ann_ivf query shape under both constants,
  * interleaved A/B/A/B after a shared warmup, with a scan_project
  * calibration pass — one number per variant, min over rounds. */
object DevIvfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ivf(nlist: Int): Unit = {
      val e = Tables.load(spark, sfDir, "embeddings")
      val n = e.count()
      val (centroids, indexed) = Similarity.ivfIndex(
        e, nlist = nlist, sizeHint = Some(n))
      val queries = VectorQueries.withNorm(e)
        .withColumnRenamed("vec_id", "id")
        .where(col("id") % 50 === 0)
      Similarity.ivfTopK(centroids, indexed, queries, k = 10,
        nprobe = 3, queryRowsHint = Some(n / 50 + 1))
        .select(col("q_id"), col("neighbor_id"), col("nn_rank"),
          round(col("cos"), 6).as("cosine"))
        .write.format("noop").mode("overwrite").save()
    }
    def calib(): Double = {
      val fn = SparkEntry.queries("scan_project")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val adaptive = Similarity.adaptiveNlist(n)
    val fixed = 8 // the r8 constant
    // warmup both variants
    ivf(adaptive); ivf(fixed)
    val rounds = 3
    var tA = Double.MaxValue; var tF = Double.MaxValue
    var cal = Double.MaxValue
    for (_ <- 1 to rounds) {
      cal = math.min(cal, calib())
      var t0 = System.nanoTime(); ivf(adaptive)
      tA = math.min(tA, (System.nanoTime() - t0) / 1e9)
      t0 = System.nanoTime(); ivf(fixed)
      tF = math.min(tF, (System.nanoTime() - t0) / 1e9)
    }
    println(f"[ivfab] n=$n adaptive_nlist=$adaptive fixed_nlist=$fixed" +
      f" adaptive=$tA%.3f s fixed=$tF%.3f s calib=$cal%.3f s" +
      f" ratio=${tA / tF}%.2f")
    spark.stop()
  }
}
