package graft.examples

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timed proof for the minhash verify-join exchange self-sizing (r10
  * verdict item 2): GROWTH_SF10.md measured that payload-carrying
  * shuffles live or die on PER-TASK shuffle-state size two decades
  * above the gate tier, and r10 fixed the vector exchanges
  * (Similarity.sizedByHint); this harness measures the SHINGLE-keyed
  * analogue — [[Dedup.minhashDedup]]'s exact-verify joins — at the
  * 500k-document tier the verdict names, plus a 2M tier. This
  * harness's first interleaved run IS the measurement behind the
  * spill-bar engage gate in
  * [[graft.operators.Similarity.sizedByBytes]]: at 2.2M docs the
  * 64 MB formula (89 parts > 32 session) engaged but per-task state
  * was only ~116 MB — the forced exchange cost 9% (24.9 vs 22.9 s
  * stock; the downstream pair join broadcasts its small side, so the
  * repartition shipped 62M rows for nothing) while manual 256
  * partitions cost 76% (40.3 s). Engagement now additionally
  * requires >4× session (≈ >256 MB/task), under which both tiers
  * here run the stock plan unchanged — the PASS row documents the
  * no-tax claim.
  *
  * Three timings per tier, min of 2 (the Bench methodology):
  *  - `stock+hint`  — 32 session partitions, sizeHint threaded (what
  *                    callers now do); self-sizing decides.
  *  - `stock`       — 32 session partitions, no hint (pre-r11 shape).
  *  - `wide-256`    — session forced to 256 partitions: the manual
  *                    right-sizing reference band from the GROWTH
  *                    matrix methodology.
  *
  * PASS = stock+hint inside 1.3× of min(all three) at each tier —
  * i.e. the self-sized stock config sits in the right-sized band.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.examples.MinhashSizeScale [nDocs...]"` — default tiers
  * 500000 2000000. Appends a row per tier to stdout; the committed
  * numbers live in docs/TEXT_SCALE.md.
  */
object MinhashSizeScale {

  private def timeNoop(df: => DataFrame): Double = Timing.minOf2Noop(df)

  def main(args: Array[String]): Unit = {
    val tiers: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(500000L, 2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mhsize").toString
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    tiers.foreach { n =>
      require(n % 4 == 0, "nDocs must be a multiple of 4 (ScaleGen)")
      val (clean, _, _) = ScaleGen.documents(spark, n, mega = 2000)
      clean.write.mode("overwrite").parquet(s"$tmp/docs_$n")
      val docs = spark.read.parquet(s"$tmp/docs_$n")
      val nDocs = docs.count()
      val hint = nDocs * 28L // ~30-word ScaleGen docs → 28 3-grams
      val parts = (hint * Dedup.ShingleRowBytes / (64L << 20)).toInt + 1
      // One timed drain per invocation, its own persist lifecycle:
      // the first version of this harness let each variant's cached
      // 60M-row shingle relation pile up in the shared session and
      // timed the variants back-to-back, so variant order (cold page
      // cache first, cache eviction pressure later) dominated the
      // comparison. Now: one warm-up drain for the page cache, then
      // variants INTERLEAVED (min of 2 rounds), each run releasing
      // its cache before the next starts.
      def once(h: Option[Long], sessParts: Int): Double = {
        spark.conf.set("spark.sql.shuffle.partitions",
          sessParts.toString)
        val m = Dedup.minhashDedupManaged(docs, "doc_id", "text",
          threshold = 0.9, sizeHint = h)
        val t0 = System.nanoTime()
        m.df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        m.release(blocking = true)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        s
      }
      once(None, 32) // warm-up: page cache + codegen
      val variants = Seq(
        "stock+hint" -> (Some(hint), 32),
        "stock" -> (Option.empty[Long], 32),
        "wide256" -> (Option.empty[Long], 256))
      val times = scala.collection.mutable.Map.empty[String, Double]
      for (_ <- 1 to 2; (nm, (h, p)) <- variants) {
        val s = once(h, p)
        times(nm) = math.min(times.getOrElse(nm, Double.MaxValue), s)
      }
      val (tHint, tStock, tWide) =
        (times("stock+hint"), times("stock"), times("wide256"))
      val best = Seq(tHint, tStock, tWide).min
      val band = tHint <= 1.3 * best
      if (!band) failures +=
        f"tier $n: stock+hint $tHint%.1f s outside 1.3x of $best%.1f s"
      println(f"[mhsize] docs=$nDocs formulaParts=$parts " +
        f"stock+hint=$tHint%.1f stock=$tStock%.1f wide256=$tWide%.1f " +
        (if (band) "PASS" else "FAIL"))
    }
    spark.stop()
    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[mhsize] FAIL $f"))
      sys.exit(1)
    }
  }
}
