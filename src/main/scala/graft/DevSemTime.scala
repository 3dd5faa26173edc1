package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, VectorQueries}

/** Scratch phase-timer for semantic_dedup (not part of the library
  * surface; attributes the sf1 bench seconds to assignment, pairing,
  * components, and the verdict join). */
object DevSemTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled",
        sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semtime] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = t("count")(e.count())
    val step = math.max(101L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val plants = e.where(col("vec_id") % 100 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        col("embedding"))
    val cents = t("collect centroids")(
      e.where(col("vec_id") % step === 0)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)))
    println(s"[semtime] n=$n step=$step centroids=${cents.length}")
    val all = e.unionByName(plants)
    // construction runs the pair pipeline + components EAGERLY
    // (dupComponents checkpoints per round); the write then runs the
    // verdict join (one more assignment pass over `celled`)
    val df = t("construct: assignment + pairs + components")(
      Similarity.semanticDedup(all, cents, threshold = 0.44))
    t("verdict join write")(
      df.write.format("noop").mode("overwrite").save())
    val df2 = t("construct 2nd")(
      Similarity.semanticDedup(all, cents, threshold = 0.44))
    t("verdict write 2nd")(
      df2.write.format("noop").mode("overwrite").save())
    // keep the UI alive for REST inspection when asked
    sys.env.get("GRAFT_DEV_HOLD").foreach(s2 =>
      Thread.sleep(s2.toLong * 1000))
    spark.stop()
  }
}
