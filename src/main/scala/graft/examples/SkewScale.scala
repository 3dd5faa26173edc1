package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew join robustness — the measured version of the
  * "salting or AQE skew-join handles hot keys" claim. The registry
  * covers skewed AGGREGATION (`salted_agg`: two-level salted combine);
  * this harness covers the other skew class, the shuffle JOIN with a
  * hot key, and proves three things on a planted worst case:
  *
  *  1. the engine's join plans stay ELIGIBLE for AQE's
  *     OptimizeSkewedJoin — no hint, strategy, or manual partitioning
  *     in the relational-join path defeats it (the one shuffle_hash
  *     hint in Dedup.pairIntersectionCounts is a self-join whose two
  *     sides are the SAME exchange, so skew there is bucket skew,
  *     handled by the hot-bucket guards — asserted separately);
  *  2. AQE actually SPLITS the hot partition at runtime (the final
  *     plan's shuffle read reports skew-split partitions);
  *  3. splitting pays: wall time with skew handling ≤ wall time with
  *     it disabled, and the results are bit-identical either way.
  *
  * Workload: fact(40M rows) ⋈ dim(2M rows) on a key where ONE key owns
  * 30% of the fact (12M rows) and the rest spread uniformly over 2M
  * keys. At shuffle.partitions=32 the stock hash layout puts ~37.5% of
  * the join in one task — the straggler that decides the stage. Auto-
  * broadcast is disabled because at 100 TB a 2M-row dim is far past
  * broadcast range — a sort-merge join is the real shape.
  *
  * Run: `sbt "runMain graft.examples.SkewScale [nFact] [outMd]"`
  * (defaults 40M, docs/SKEW_SCALE.md). Nonzero exit on any FAIL.
  */
object SkewScale {

  private def mkTables(spark: SparkSession, nFact: Long)
      : (DataFrame, DataFrame) = {
    val nKeys = 2000000L
    // 30% of fact rows on key 0, the rest ~uniform over [1, nKeys).
    val fact = spark.range(nFact).select(
      when(pmod(xxhash64(col("id"), lit(1L)), lit(10L)) < 3, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(2L)), lit(nKeys - 1)) + 1L)
        .as("k"),
      // integer payload on purpose: the ON/OFF hash compare needs an
      // order-exact sum, and double addition is not associative
      (col("id") % 1000).as("v"))
    val dim = spark.range(nKeys).select(
      col("id").as("k"),
      pmod(xxhash64(col("id"), lit(3L)), lit(100L)).as("grp"))
    (fact, dim)
  }

  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(40000000L)
    val outMd = args.lift(1).getOrElse("docs/SKEW_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      // The 100-TB shape: a 2M-row dim does not broadcast.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val (fact, dim) = mkTables(spark, nFact)
    fact.write.mode("overwrite").parquet(s"$tmp/fact")
    dim.write.mode("overwrite").parquet(s"$tmp/dim")
    val f = spark.read.parquet(s"$tmp/fact")
    val d = spark.read.parquet(s"$tmp/dim")

    // The join under test: fact ⋈ dim on the skewed key, then a
    // per-group aggregate so the output is small and hash-comparable.
    def joined: DataFrame =
      f.join(d, "k").groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))

    def resultHash(df: DataFrame): String =
      df.select(md5(concat_ws(",",
          sort_array(collect_list(concat_ws(":", col("grp"), col("n"),
            col("sv")))))).as("h"))
        .head().getString(0)

    // Timed action is collect() on the aggregate itself (≤100 rows),
    // NOT a write: the write command plans its own QueryExecution, so
    // only this way does df.queryExecution hold the EXECUTED adaptive
    // plan whose shuffle reads report the runtime skew split.
    def timeIt(): (Double, org.apache.spark.sql.execution.SparkPlan) = {
      val df = joined
      val t0 = System.nanoTime()
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, df.queryExecution.executedPlan)
    }
    // min-of-2 per config: a single wall-clock pair on a noisy host
    // can flip an 1.1× comparison (r11 ADVICE)
    def timeMin2(): (Double, org.apache.spark.sql.execution.SparkPlan) = {
      val a = timeIt(); val b = timeIt()
      if (a._1 <= b._1) a else b
    }

    // Skew-split detection, programmatic (r11 ADVICE: the old
    // `toString.contains("skewed")` was Spark-version-fragile): walk
    // the FINAL adaptive plan and ask each AQE shuffle read whether
    // any of its partition specs is a PartialReducerPartitionSpec —
    // the node OptimizeSkewedJoin installs when it splits a reducer
    // partition.
    def hasSkewSplit(plan: org.apache.spark.sql.execution.SparkPlan)
        : Boolean = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
      // Materialized stages appear as QueryStageExec LEAVES in the
      // final adaptive plan — a plain collect() never descends into
      // them (first version of this check silently found nothing),
      // so walk across stage boundaries explicitly.
      def anySkewRead(p: SparkPlan): Boolean =
        p.collect { case n => n }.exists {
          case a: AdaptiveSparkPlanExec => anySkewRead(a.executedPlan)
          case qs: QueryStageExec => anySkewRead(qs.plan)
          case r: AQEShuffleReadExec => r.hasSkewedPartition
          case _ => false
        }
      anySkewRead(plan)
    }

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(ok: Boolean, what: String): String = {
      if (!ok) failures += what; if (ok) "PASS" else "FAIL"
    }

    // --- AQE skew handling ON (stock) ---
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Make the planted 12M-row partition count as skewed at this
    // data size: thresholds are per-deployment sizing (the defaults
    // target multi-GB partitions); ~64 MB advisory mirrors Bench's
    // scan-split sizing at this tier.
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
    val warm = timeIt()  // warmup: JIT + parquet footer cache
    val (tOn, planOn) = timeMin2()
    val hOn = resultHash(joined)
    val skewSplit = hasSkewSplit(planOn)

    // --- AQE skew handling OFF (the straggler world) ---
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (tOff, planOff) = timeMin2()
    val hOff = resultHash(joined)

    val md = new StringBuilder
    md ++= s"# Planted-skew join — AQE skew-split proof ($nFact fact rows)\n\n"
    md ++= "Generated by `graft.examples.SkewScale` " +
      s"(local[$cpus], shuffle.partitions=32, auto-broadcast OFF — " +
      "the 100-TB sort-merge shape). One key owns 30% of the fact " +
      "(~37.5% of one task's join input at stock hashing); AQE " +
      "skew-split thresholds sized to the tier (64 MB threshold / " +
      "32 MB advisory) the same way Bench sizes scan splits.\n\n"
    md ++= "| config | wall s (min of 2) | final-plan skew split |\n|---|---|---|\n"
    md ++= f"| skewJoin ON | $tOn%.1f | ${if (skewSplit) "yes" else "NO"} |\n"
    md ++= f"| skewJoin OFF | $tOff%.1f | ${if (hasSkewSplit(planOff)) "yes" else "no"} |\n\n"
    md ++= s"- hot partition split by AQE (PartialReducerPartitionSpec in an AQE shuffle read): ${check(skewSplit, "no skew split in final plan")}\n"
    md ++= s"- results identical ON vs OFF: ${check(hOn == hOff, s"result hash drift $hOn vs $hOff")}\n"
    // ADVISORY, not a gate (r11 ADVICE): two wall clocks on a shared
    // host are not a stable 1.1× comparator; the invariants this
    // harness hard-gates are engagement + result equality above.
    md ++= f"- split pays (advisory, tOn ≤ 1.1×tOff): ${if (tOn <= 1.1 * tOff) "PASS" else "noisy (not gated)"} " +
      f"(${tOff / tOn}%.2f× faster with split)\n"
    md ++= f"- warmup run (discarded): ${warm._1}%.1f s\n\n"
    md ++= "Reading: the engine never pre-salts its JOINS — on a " +
      "cluster, AQE's OptimizeSkewedJoin splits oversized partitions " +
      "at runtime from real map-output sizes, which beats static " +
      "salting (no replication of the build side for the 99% of keys " +
      "that aren't hot). What the engine DOES own is keeping every " +
      "shuffle join eligible: no join hints, no manual " +
      "repartition-by-key downstream of the join key, and exchange " +
      "self-sizing (`sizedByBytes`) only ever raises the partition " +
      "COUNT ahead of the exchange — AQE remains free to split or " +
      "coalesce at runtime. Skewed AGGREGATION is the operator's job " +
      "(AQE cannot split a partial-agg partition) and is covered by " +
      "`salted_agg`'s two-level combine; hot LSH/shingle BUCKETS are " +
      "bounded by the observable hot-bucket guards (ScaleStress).\n\n"
    md ++= (if (failures.isEmpty) "**ALL CHECKS PASS**\n"
            else s"**FAILURES:**\n${failures.map("- " + _).mkString("\n")}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      md.toString.getBytes("UTF-8"))
    println(md.toString)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
