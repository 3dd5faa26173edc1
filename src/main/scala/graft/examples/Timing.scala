package graft.examples

import org.apache.spark.sql.DataFrame

/** The one definition of the harness timing methodology: min of 2
  * noop-sink executions (amortizes JIT/codegen warmup and the host
  * VM's sporadic CPU-throttle stalls — the same steady-state read
  * `graft.Bench` reports). Previously four near-identical private
  * copies lived in Bench/PackScale/ScaleStress/TextScaleStress and
  * had already drifted (by-name vs by-value argument); a methodology
  * change now lands in one place.
  *
  * The argument is BY-NAME and rebuilt per run: operators that run
  * eager jobs while CONSTRUCTING their DataFrame (quantile sketches,
  * driver-collected totals, Bloom builds) must pay those inside the
  * timed region, or the harness under-reports them (the PackScale
  * review catch). `clearCache = true` additionally drops the Spark
  * cache before each run so persisted intermediates don't carry
  * warmth across the two runs (the TextScaleStress Bloom-vs-exact
  * symmetry requirement).
  */
private[examples] object Timing {
  def minOf2Noop(mk: => DataFrame, clearCache: Boolean = false): Double = {
    def once(): Double = {
      if (clearCache)
        org.apache.spark.sql.SparkSession.active.catalog.clearCache()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }
}
