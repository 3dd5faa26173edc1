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
    // Interleaved A/B (r13 verdict item 4): the WINDOWED per-cell
    // engage (autoChunk=false, the committed default) vs the CENSUS
    // route now that it persists the celled frame (the census's count
    // job materializes the assignment kernel instead of re-running
    // it). Registry-identical workload; cache cleared before every
    // run so each reading pays its own materialization.
    // `runMain graft.DevSemTime <sfDir> ab [rounds]`
    if (args.lift(1).contains("ab")) {
      val rounds = args.lift(2).map(_.toInt).getOrElse(3)
      def run(auto: Boolean): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        Similarity.semanticDedup(all, cents, threshold = 0.44,
          sizeHint = Some(n + n / 100 + 1), blockRows = 2048,
          autoChunk = auto)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(auto = false); run(auto = true) // shared warmup
      val (ws, cs) = (Array.fill(rounds)(0.0), Array.fill(rounds)(0.0))
      (0 until rounds).foreach { r =>
        ws(r) = run(auto = false)
        cs(r) = run(auto = true)
        println(f"[semab] round ${r + 1}: window=${ws(r)}%.2f s " +
          f"census_cached=${cs(r)}%.2f s")
      }
      println(f"[semab] MIN window=${ws.min}%.2f s " +
        f"census_cached=${cs.min}%.2f s ratio=${cs.min / ws.min}%.3f")
      spark.stop()
      return
    }
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
    // phase split: materialize the pair pipeline alone, then run
    // components on the checkpointed pairs
    val sorted = cents.sortBy(_._1)
    val base = VectorQueries.withNorm(all)
      .select(col("vec_id").as("id"), col("v"), col("nrm"))
      .repartition(64)
    val bcCts = spark.sparkContext.broadcast(sorted.map(_._2))
    val bcIds = spark.sparkContext.broadcast(sorted.map(_._1))
    import org.apache.spark.sql.types._
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", ArrayType(DoubleType), nullable = true),
        StructField("nrm", DoubleType, nullable = true),
        StructField("cell", LongType, nullable = false))))
    val celled = base.mapPartitions { rows =>
      val cc = bcCts.value; val ids = bcIds.value
      rows.map { r =>
        val v = r.getSeq[Double](1).toArray
        org.apache.spark.sql.Row(r.getLong(0), v.toSeq, r.get(2),
          ids(Similarity.nearestCell(cc, v)))
      }
    }(enc)
    val assigned = t("phase: assignment checkpoint")(
      celled.localCheckpoint(true))
    val pruned = Dedup.pruneOversized(assigned, Seq("cell"), 100000)
    val pairs = t("phase: pair gen checkpoint")(
      pruned.as("a").join(pruned.as("b"),
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          (VectorQueries.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
        .where(col("cos") >= 0.44)
        .select("a_id", "b_id")
        .localCheckpoint(true))
    val comp = t("phase: components")(
      Dedup.dupComponents(pairs).localCheckpoint(true))
    println(s"[semtime] pairs=${pairs.count()} comp=${comp.count()}")
    // keep the UI alive for REST inspection when asked
    sys.env.get("GRAFT_DEV_HOLD").foreach(s2 =>
      Thread.sleep(s2.toLong * 1000))
    spark.stop()
  }
}
