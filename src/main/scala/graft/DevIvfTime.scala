package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorQueries}

/** Scratch phase-timer for the IVF search path (not part of the
  * library surface; used to attribute ann_ivf* bench seconds). */
object DevIvfTime {
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
      println(f"[ivftime] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = t("count")(e.count())
    val nlist = Similarity.adaptiveNlist(n)
    println(s"[ivftime] n=$n nlist=$nlist")
    val (centroids, indexed) = t("ivfIndex (train collect + driver kmeans, lazy assign)")(
      Similarity.ivfIndex(e, nlist = nlist, sizeHint = Some(n)))
    t("materialize assigned index (noop write)")(
      indexed.write.format("noop").mode("overwrite").save())
    val cached = indexed.cache()
    t("materialize cache")(cached.count())
    val cellSizes = cached.groupBy("cell").count()
      .select(col("cell"), col("count")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sz = cellSizes.values.toArray.sorted
    println(s"[ivftime] cells=${sz.length} max=${sz.last} " +
      s"p50=${sz(sz.length / 2)} p99=${sz((sz.length * 99) / 100)}")
    val queries = cached.where(col("id") % 10 === 0)
    val q = t("collect queries (pruned)")(
      queries.select(col("id"), col("v"), col("nrm")).collect())
    println(s"[ivftime] queries=${q.length}")
    // candidate volume under nprobe=3 (driver-side replay)
    val cand = t("driver-side closestCells for all queries")(q.iterator.map { r =>
      val v = r.getSeq[Double](1).toArray
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length && j < v.length) {
          val t2 = v(j) - c(j); d += t2 * t2; j += 1
        }
        (i, d)
      }.sortBy(_._2).take(3).map(p => cellSizes.getOrElse(p._1, 0L)).sum
    }.sum)
    println(s"[ivftime] candidate volume=$cand")
    t("ivfTopK kernel route on CACHED index")(
      Similarity.ivfTopK(centroids, cached, queries, k = 1, nprobe = 3,
        queryRowsHint = Some(n / 10 + 1))
        .write.format("noop").mode("overwrite").save())
    t("ivfTopK kernel route on cached index, 2nd run")(
      Similarity.ivfTopK(centroids, cached, queries, k = 1, nprobe = 3,
        queryRowsHint = Some(n / 10 + 1))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
