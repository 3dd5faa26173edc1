package graft.functions

import graft.{SparkSpec, Tables}

/** Trainer-throughput guard: production-scale merge counts must stay
  * tractable (the pre-incremental trainer was O(merges × vocab) and
  * would hang here). */
class BpeScaleCheck extends SparkSpec {
  test("5000 merges on the corpus histogram train in seconds") {
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val m = Bpe.train(docs, "text", numMerges = 5000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.merges.nonEmpty)
    assert(secs < 60.0, f"trainer took $secs%.1f s for 5000 merges")
  }
}
