package graft.examples

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench: isolate the p=1 vs p=2 cost of
  * [[Similarity.lshDedupPairs]] on the `dedup_embed_lsh` input shape —
  * used to keep the multi-probe fan-out honest (the r7 one-directional
  * probe join exists because the first cut tripled candidates). */
object LshProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, dir, "embeddings")
    val probes = e.where(col("vec_id") % 10 === 0)
      .select((-col("vec_id") - 1).as("vec_id"), col("label"),
        transform(col("embedding"), x => x * lit(2.0f))
          .as("embedding"))
    val u = e.unionByName(probes)
    // r6-shape baseline: the pre-multi-probe join over Similarity.index
    // (bucketExpr when-chain, no flip machinery) — kept here so the
    // multi-probe path's cost is always measured against it.
    def oldP1() = {
      val indexed = Similarity.index(u, 6, 64, tables = 4)
      val pruned = graft.operators.Dedup.pruneOversized(
        indexed, Seq("tbl", "bucket"), 100000)
      pruned.as("a").join(pruned.as("b"),
          col("a.tbl") === col("b.tbl") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          (graft.operators.VectorQueries.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .where(col("cos") >= 0.95)
        .dropDuplicates("a_id", "b_id")
    }
    for (rep <- 1 to 3; p <- Seq(0, 1, 2)) {
      val t0 = System.nanoTime()
      val df = if (p == 0) oldP1()
        else Similarity.lshDedupPairs(u, threshold = 0.95, probes = p)
      val n = df.count()
      println(f"[lsh-probe] rep=$rep impl=${if (p == 0) "old-p1" else s"p$p"} " +
        f"pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
