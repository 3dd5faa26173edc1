package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev diagnostic: LSH / IVF bucket-occupancy profile of an embeddings
  * dir — the skew numbers behind candidate-volume estimates
  * (Σ bucket² drives the within-bucket join cost, not n²/buckets).
  * Usage: runMain graft.DevBuckets [sfDir] [nBits]
  */
object DevBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled",
        sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count()
    // position 1 may be a flag ("ann"/"annfull") rather than a number
    val nBits = args.lift(1)
      .flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(Similarity.adaptiveNBits(n))
    println(s"n=$n nBits=$nBits nlist=${Similarity.adaptiveNlist(n)}")
    val idx = Similarity.index(e, nBits = nBits, dim = 64, tables = 4)
    val occ = idx.groupBy("tbl", "bucket").count()
    occ.select(sum(col("count") * col("count")).as("sum_sq"),
        max("count").as("max"), count(lit(1)).as("nonempty"),
        expr("percentile(count, 0.5)").as("p50"),
        expr("percentile(count, 0.99)").as("p99"))
      .show(false)
    occ.orderBy(col("count").desc).show(20, false)
    if (args.contains("annfull")) {
      val t0 = System.nanoTime()
      Registry.all("ann_lsh").fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"ann_lsh full: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (args.contains("ann")) {
      // bisect the r8 join+dedup+window chain (annTopK's SUPERSEDED
      // shape, kept here for A/B against the streamed-heap route):
      // join+dot, +dedup, +rank
      val queries = idx.where(col("id") % 50 === 0)
      val probes = queries.withColumn("probe", explode(array(
          col("bucket") +:
            (0 until nBits).map(b =>
              col("bucket").bitwiseXOR(lit(1 << b))): _*)))
        .select(col("tbl"), col("probe"), col("id").as("q_id"),
          col("v").as("qv"), col("nrm").as("qn"))
      def timed(label: String)(df: org.apache.spark.sql.DataFrame)
          : Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      val pairs = idx.as("i").join(probes.as("p"),
          col("i.tbl") === col("p.tbl") &&
            col("i.bucket") === col("p.probe") &&
            col("i.id") =!= col("p.q_id"))
        .select(col("p.q_id").as("q_id"), col("i.id").as("neighbor_id"),
          (graft.functions.VectorExpressions.dot(col("p.qv"), col("i.v"))
            / (col("p.qn") * col("i.nrm"))).as("cos"))
      timed("pairs+dot")(pairs)
      val deduped = pairs.dropDuplicates("q_id", "neighbor_id")
      timed("pairs+dot+dedup")(deduped)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
      timed("full")(deduped.withColumn("nn_rank",
        row_number().over(w)).where(col("nn_rank") <= 10))
    }
    spark.stop()
  }
}
