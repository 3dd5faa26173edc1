package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale evidence for [[Similarity.semanticDedup]], the same
  * doctrine as ScaleStress/NtileScale: the driver gate proves the
  * operator EXACT at sf0.01; this proves the claimed 100-TB shape on a
  * 10^5-embedding corpus with planted ground truth ([[ScaleGen]]'s
  * cosine-≥0.999 twins), and FAILS (nonzero exit) unless:
  *
  *  1. twin recall ≥ 0.95: a planted twin pair ends up in one cluster
  *     (same canonical) — cluster blocking may only lose the rare pair
  *     whose members quantize to different cells;
  *  2. scaling under the BALANCED cell-count discipline k ≈ √n: the
  *     operator's two costs pull in opposite directions — flat-scan
  *     centroid assignment is O(n·k) while within-cell pair
  *     generation is O(n²/k) — so k ≈ √n equalizes them at O(n^1.5)
  *     total and 4× rows may cost at most 8×; the gate allows
  *     slack × 8. Both failure regimes are measured and REPORTED
  *     (not gated) to show the trade is real: k fixed (pair work
  *     explodes as n²) and k ∝ n (assignment explodes as n²). An
  *     earlier draft of this harness gated k ∝ n as "the" discipline
  *     and the measurements refuted it — assignment dominated
  *     exactly as the cost model predicts (at billion-scale, FAISS
  *     replaces the flat scan with an HNSW coarse quantizer to relax
  *     the O(n·k) term; the flat scan is the honest local form);
  *  3. the verdict is total (one row per input) and drops at least the
  *     found twin pairs.
  *
  * Run: `SPARK_GRAFT_CPUS=16 sbt "runMain graft.examples.SemDedupScale
  * [nVecs] [reportPath]"` — defaults 1e5 / docs/SEMDEDUP_SCALE.md.
  */
object SemDedupScale {

  private def timeNoop(df: => DataFrame): Double = Timing.minOf2Noop(df)

  private def verdict(emb: DataFrame, nlist: Int,
                      threshold: Double): DataFrame = {
    val (cents, _) = Similarity.ivfIndex(emb, nlist = nlist)
    Similarity.semanticDedup(emb,
      cents.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      threshold)
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(100000L)
    val report = args.lift(1).getOrElse("docs/SEMDEDUP_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_semdedup")
      .toString
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(ok: Boolean, what: String): String = {
      if (!ok) failures += what
      if (ok) "PASS" else "FAIL"
    }

    // k ≈ √n: balances O(n·k) assignment vs O(n²/k) pair generation
    def nlistFor(n: Long): Int = math.max(8, math.sqrt(n.toDouble).toInt)
    val threshold = 0.99

    val (emb, pairs) = ScaleGen.embeddings(spark, nVecs)
    emb.write.mode("overwrite").parquet(s"$tmp/emb")
    pairs.write.mode("overwrite").parquet(s"$tmp/pairs")
    val full = spark.read.parquet(s"$tmp/emb")
    val planted = spark.read.parquet(s"$tmp/pairs")
    val nRows = full.count()

    // ---- recall + verdict totality on the full corpus -----------------
    val v = verdict(full, nlistFor(nRows), threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verdictRows = v.count()
    val canon = v.select(col("vec_id"), col("canonical_id"))
    val clustered = planted
      .join(canon.withColumnRenamed("vec_id", "a_id")
        .withColumnRenamed("canonical_id", "ca"), Seq("a_id"))
      .join(canon.withColumnRenamed("vec_id", "b_id")
        .withColumnRenamed("canonical_id", "cb"), Seq("b_id"))
      .where(col("ca") === col("cb")).count()
    val nPlanted = planted.count()
    val recall = clustered.toDouble / nPlanted
    val drops = v.where(col("keep") === 0).count()
    // last consumer of the cached verdict — release before the timing
    // runs so they measure fresh pipelines, not block-manager pressure
    v.unpersist(blocking = true)

    // ---- multi-probe boundary recovery: p=2 vs p=1 --------------------
    // Plant twin pairs ON cell boundaries (midpoint of each centroid
    // and its nearest neighbor, nudged ±1e-3 along the axis): cluster
    // blocking at p=1 misses them BY CONSTRUCTION — the members
    // quantize to different cells — while probes = 2 indexes each
    // member into both cells, so the pair meets. Same trained
    // quantizer as the production path.
    import spark.implicits._
    val (cents, _) = Similarity.ivfIndex(full, nlistFor(nRows))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    def nearestOf(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < cents.length) {
        val dd = d2(cents(c), v)
        if (dd < bd) { bd = dd; best = c }
        c += 1
      }
      best
    }
    def cosOf(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        s += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1
      }
      s / math.sqrt(na * nb)
    }
    val boundary = cents.indices.iterator.flatMap { ci =>
      var bj = -1; var bd = Double.MaxValue; var j = 0
      while (j < cents.length) {
        if (j != ci) {
          val dd = d2(cents(ci), cents(j))
          if (dd < bd) { bd = dd; bj = j }
        }
        j += 1
      }
      val a = cents(ci); val b = cents(bj)
      // float-round exactly as the planted rows will be stored, then
      // re-check assignment/similarity on what the engine will see
      def mk(sign: Double) = Array.tabulate(a.length)(x =>
        ((a(x) + b(x)) / 2 + sign * 1e-3 * (b(x) - a(x))).toFloat
          .toDouble)
      val t1 = mk(-1.0); val t2 = mk(1.0)
      if (nearestOf(t1) == ci && nearestOf(t2) == bj &&
          cosOf(t1, t2) >= threshold) Iterator((t1, t2))
      else Iterator.empty
    }.take(50).toArray
    val twinDf = boundary.zipWithIndex.flatMap { case ((t1, t2), i) =>
      Seq((-(2L * i + 1), 0, t1.map(_.toFloat).toSeq),
        (-(2L * i + 2), 0, t2.map(_.toFloat).toSeq))
    }.toSeq.toDF("vec_id", "label", "embedding")
    val withTwins = full.unionByName(twinDf)
    val centsIdx = cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }
    def boundaryRecovered(probes: Int): Int = {
      val m = Similarity
        .semanticDedup(withTwins, centsIdx, threshold, probes = probes)
        .where(col("vec_id") < 0)
        .select(col("vec_id"), col("canonical_id"))
        .as[(Long, Long)].collect().toMap
      boundary.indices.count(i => m(-(2L * i + 1)) == m(-(2L * i + 2)))
    }
    val nBoundary = boundary.length
    val rec1 = boundaryRecovered(1)
    val rec2 = boundaryRecovered(2)

    // ---- scaling: quarter vs full, k ∝ n vs fixed k --------------------
    full.where(col("vec_id") % 4 === 0)
      .write.mode("overwrite").parquet(s"$tmp/emb_q")
    val q = spark.read.parquet(s"$tmp/emb_q")
    val nQ = q.count()
    val tQ = timeNoop(verdict(q, nlistFor(nQ), threshold))
    val tF = timeNoop(verdict(full, nlistFor(nRows), threshold))
    val ratio = tF / tQ
    // the two failure regimes, measured and reported (not gated)
    val kFixed = nlistFor(nQ)
    val tQfix = timeNoop(verdict(q, kFixed, threshold))
    val tFfix = timeNoop(verdict(full, kFixed, threshold))
    val ratioFix = tFfix / tQfix
    def kLinear(n: Long): Int = math.max(8, (n / 1000).toInt)
    val tQlin = timeNoop(verdict(q, kLinear(nQ), threshold))
    val tFlin = timeNoop(verdict(full, kLinear(nRows), threshold))
    val ratioLin = tFlin / tQlin

    val slack = 2.0 // single-JVM noise + AQE differences
    val md = new StringBuilder
    md ++= s"# SemDeDup scale — $nRows embeddings " +
      s"(${nPlanted} planted twin pairs)\n\n"
    md ++= "Generated by `graft.examples.SemDedupScale` " +
      s"(local[$cpus], noop-sink timings, min of 2). Threshold " +
      s"$threshold; gated regime k = max(8, √n) (assignment O(n·k) " +
      "and pair generation O(n²/k) balanced at O(n^1.5) → ≤ 8× per " +
      "4× rows).\n\n"
    md ++= "| check | value | gate | result |\n|---|---|---|---|\n"
    md ++= s"| verdict totality | $verdictRows of $nRows | == | " +
      s"${check(verdictRows == nRows, "verdict totality")} |\n"
    md ++= s"| planted-twin recall | ${f"$recall%.4f"} | >= 0.95 | " +
      s"${check(recall >= 0.95, "twin recall")} |\n"
    md ++= s"| drops >= found twins | $drops >= $clustered | >= | " +
      s"${check(drops >= clustered, "drop count")} |\n"
    md ++= s"| boundary twins at p=1 | $rec1 of $nBoundary | <= " +
      s"${nBoundary / 2} | ${check(rec1 <= nBoundary / 2,
        "p=1 boundary miss")} |\n"
    md ++= s"| boundary twins at p=2 | $rec2 of $nBoundary | >= " +
      s"${math.ceil(0.9 * nBoundary).toInt} | ${check(nBoundary > 0 &&
        rec2 >= math.ceil(0.9 * nBoundary).toInt, "p=2 boundary " +
        "recovery")} |\n"
    md ++= f"| 4x rows, k = √n | ${tQ}%.2f s -> ${tF}%.2f s " +
      f"(${ratio}%.1fx) | <= ${slack * 8}%.0fx | " +
      s"${check(ratio <= slack * 8, "k = √n scaling")} |\n"
    md ++= f"| 4x rows, k fixed ($kFixed) | ${tQfix}%.2f s -> " +
      f"${tFfix}%.2f s (${ratioFix}%.1fx) | reported | — |\n"
    md ++= f"| 4x rows, k ∝ n (${kLinear(nQ)}→${kLinear(nRows)}) | " +
      f"${tQlin}%.2f s -> ${tFlin}%.2f s (${ratioLin}%.1fx) | " +
      "reported | — |\n"
    md ++= "\nBoundary rows: twin pairs planted at cell-boundary " +
      "midpoints (members quantize to DIFFERENT cells of the trained " +
      "quantizer by construction). p=1 cluster blocking misses them — " +
      "the documented recall trade — and probes = 2 (each vector " +
      "indexed into its two nearest cells) recovers them for ~2× pair " +
      "cost.\n"
    md ++= "\nThe reported rows are the two failure regimes of the " +
      "O(n·k) + O(n²/k) cost model: hold k fixed and pair work grows " +
      "as n²; scale k ∝ n and the flat-scan assignment grows as n². " +
      "k ≈ √n balances them (an earlier draft gated k ∝ n and the " +
      "measurements refuted it — assignment dominated). At " +
      "billion-scale, FAISS-style engines relax the O(n·k) term with " +
      "an HNSW coarse quantizer over the centroids; the flat scan is " +
      "the honest local form.\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(report),
      md.toString)
    println(md)
    if (failures.nonEmpty) {
      System.err.println("FAILURES: " + failures.mkString("; "))
      sys.exit(1)
    }
    spark.stop()
  }
}
