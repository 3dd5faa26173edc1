package graft.examples

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Empirical scale proof for [[Dedup.dupComponents]]' DISTRIBUTED
  * alternating-star route at an edge count the size gate would
  * otherwise send to the driver union-find — the route a 100-TB dedup
  * run (billions of pairs) actually takes, which after the r9.3 size
  * gate no registry query exercises above fixture scale. On ~1.1M
  * edges of deliberately-mixed shape this harness asserts (nonzero
  * exit on failure):
  *
  *  1. EXACT route equality — forced-distributed vs driver union-find
  *     labels, `exceptAll` both directions empty;
  *  2. structure — the planted 100k-link DESCENDING-id chain (the
  *     shape that degraded min-propagation to 1 hop/round) collapses
  *     to ONE component rooted at its minimum, and every node that
  *     appears in an edge gets exactly one label;
  *  3. the distributed route converges within the default round cap
  *     and its wall time is reported beside the driver route's (the
  *     cluster argument is round-parallelism, which single-machine
  *     timing cannot show — the driver route exists precisely because
  *     small graphs pay the rounds' serial latency for nothing).
  *
  * Run: `SPARK_GRAFT_CPUS=16 sbt "runMain
  * graft.examples.ComponentsScale [nRandomEdges] [reportPath]"` —
  * defaults 1e6 / docs/COMPONENTS_SCALE.md.
  */
object ComponentsScale {

  def main(args: Array[String]): Unit = {
    val nRand = args.headOption.map(_.toLong).getOrElse(1000000L)
    val report = args.lift(1).getOrElse("docs/COMPONENTS_SCALE.md")
    val chainLen = 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(ok: Boolean, what: String): String = {
      if (!ok) failures += what
      if (ok) "PASS" else "FAIL"
    }

    // Edge set, materialized once: a 100k-link chain with ids FALLING
    // along it (component min at the far end — the alternating-star
    // stress shape) on ids [1, chainLen], plus ~1e6 random pairs over
    // a disjoint id range sized for many mid-size components
    // (xxhash64-derived, deterministic).
    val tmp = java.nio.file.Files.createTempDirectory("graft_comp")
      .toString
    val base = chainLen + 10
    val chain = spark.range(1, chainLen)
      .select((lit(chainLen) - col("id") + 1).as("a_id"),
        (lit(chainLen) - col("id")).as("b_id"))
    val rand = spark.range(nRand)
      .select(
        (pmod(xxhash64(col("id")), lit(nRand / 2)) + base).as("a_id"),
        (pmod(xxhash64(col("id") + 7), lit(nRand / 2)) + base)
          .as("b_id"))
      .where(col("a_id") =!= col("b_id"))
    chain.unionByName(rand).write.mode("overwrite")
      .parquet(s"$tmp/edges")
    val edges = spark.read.parquet(s"$tmp/edges")
    val nEdges = edges.count()

    // Both routes are FORCED via the parameter (0 = distributed
    // rounds, MaxValue = driver union-find) — routing by the default
    // limit would silently turn this into distributed-vs-distributed
    // whenever the CLI edge count exceeds the gate, vacuating the
    // equality check. Each route is timed twice (min published); the
    // second run's result is kept checkpointed for the correctness
    // checks, so each route computes exactly twice.
    def timeMin2(mk: => org.apache.spark.sql.DataFrame)
        : (Double, Long, org.apache.spark.sql.DataFrame) = {
      var best = Double.MaxValue; var rows = 0L
      var last: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        last = mk.localCheckpoint(true)
        rows = last.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows, last)
    }

    val (tDist, nDist, dist) = timeMin2(
      Dedup.dupComponents(edges, driverEdgeLimit = 0L))
    val (tDrv, nDrv, drv) = timeMin2(
      Dedup.dupComponents(edges, driverEdgeLimit = Long.MaxValue))
    val diff = dist.exceptAll(drv).count() + drv.exceptAll(dist).count()
    val vEq = check(diff == 0, s"route labels differ ($diff rows)")

    // chain structure: one component, rooted at id 1
    val chainLabels = dist.where(col("id") <= chainLen)
    val chainRoots = chainLabels.select("canonical_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val vChain = check(chainRoots == Seq(1L),
      s"descending chain roots: $chainRoots (want Seq(1))")
    val chainN = chainLabels.count()
    val vChainN = check(chainN == chainLen,
      s"chain labeled $chainN of $chainLen nodes")

    // totality: every node in an edge appears exactly once
    val nodes = edges.select(col("a_id").as("id"))
      .union(edges.select(col("b_id").as("id"))).distinct().count()
    val vTotal = check(nDist == nodes && nDrv == nodes,
      s"label totality: dist=$nDist drv=$nDrv want=$nodes")

    val md = new StringBuilder
    md ++= s"# Components scale — $nEdges mixed-shape edges " +
      "(distributed route forced vs driver union-find)\n\n"
    md ++= "Generated by `graft.examples.ComponentsScale` " +
      s"(local[$cpus], min of 2). The r9.3 size gate sends graphs " +
      "at or under 4M edges to a driver union-find; this harness " +
      "forces the alternating-star distributed route at a size no " +
      "registry query reaches, proving the 100-TB path stays " +
      "correct and convergent beside the fast path.\n\n"
    md ++= "| check | value | result |\n|---|---|---|\n"
    md ++= s"| route label equality | $diff mismatched rows | $vEq |\n"
    md ++= s"| 100k descending chain → 1 component @ min | " +
      s"roots ${chainRoots.mkString(",")} | $vChain |\n"
    md ++= s"| chain label totality | $chainN of $chainLen | $vChainN |\n"
    md ++= s"| node label totality | dist $nDist / drv $nDrv / " +
      s"want $nodes | $vTotal |\n\n"
    md ++= "## Wall time\n\n| route | s |\n|---|---|\n"
    md ++= f"| distributed alternating-star (forced) | $tDist%.1f |\n"
    md ++= f"| driver union-find (forced; the default route ≤4M " +
      f"edges) | $tDrv%.1f |\n\n"
    md ++= f"Driver route speedup ${tDist / tDrv}%.1f× at $nEdges " +
      "edges — the serial per-round exchange latency the size gate " +
      "deletes; above the 4M-edge bound the distributed rounds are " +
      "the only memory-safe form and this proof is their regression " +
      "harness.\n"
    md ++= s"\n${if (failures.isEmpty) "**ALL CHECKS PASS**"
    else s"**FAILURES (${failures.size})**: ${failures.mkString("; ")}"}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(report),
      md.toString.getBytes("UTF-8"))
    println(f"[components] edges=$nEdges dist=$tDist%.1fs " +
      f"drv=$tDrv%.1fs diff=$diff")
    println(s"[components] report written to $report")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(failures.mkString(
        "COMPONENTS-SCALE FAILURES:\n  ", "\n  ", ""))
      sys.exit(1)
    }
  }
}
