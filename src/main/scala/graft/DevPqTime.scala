package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch phase-timer for the PQ probe path (not part of the library
  * surface; used to attribute ann_pq_probe bench seconds — the
  * sibling of [[DevIvfTime]]). */
object DevPqTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqtime] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.load(spark, sfDir, "embeddings")
    val cbs = Similarity.gridCodebooks(dim = 64)
    val codes = Similarity.pqEncode(e, cbs)
    t("encode pass alone (noop write)")(
      codes.write.format("noop").mode("overwrite").save())
    val queries = t("query prep (decode every 25th + collect)")(
      Similarity.pqDecode(codes.where(col("id") % 25 === 0), cbs)
        .collect())
    println(s"[pqtime] queries=${queries.length}")
    t("full pqTopK (encode + stream + rank)")(
      Similarity.pqTopK(codes, cbs,
        Similarity.pqDecode(codes.where(col("id") % 25 === 0), cbs),
        k = 5)
        .write.format("noop").mode("overwrite").save())
    val cached = codes.cache()
    t("materialize code cache")(cached.count())
    t("pqTopK on CACHED codes (kernel + rank only)")(
      Similarity.pqTopK(cached, cbs,
        Similarity.pqDecode(cached.where(col("id") % 25 === 0), cbs),
        k = 5)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
