package graft.operators

import org.apache.spark.sql.DataFrame

/** A lazily-composed pipeline result plus the persisted intermediates
  * backing it — the explicit ownership handle for multi-pass pipelines
  * ([[Dedup.minhashDedupManaged]], [[Dedup.crossMinhashMatchesManaged]],
  * [[TextQueries.contaminationCheckBloomManaged]]) whose exploded
  * shingle/digest relations must stay cached across the pipeline's
  * internal passes (signatures, sizes, exact verify) but must not
  * outlive the query in a long-lived session: un-released, repeated
  * invocations accumulate MEMORY_AND_DISK blocks until the block
  * manager LRU-evicts them, squeezing storage every other cached
  * relation shares.
  *
  * Contract: run the terminal action on [[df]] FIRST, then
  * [[release]]. Releasing early is not a correctness bug — results are
  * identical — but it degrades the pipeline back to the double-scan
  * shape (each internal pass re-derives its shingles from the corpus).
  */
final case class ManagedResult(df: DataFrame, cached: Seq[DataFrame]) {

  /** Unpersist every intermediate this pipeline pinned. `blocking =
    * true` waits until the blocks are actually dropped — the
    * deterministic form for specs and storage-sensitive callers;
    * the default returns immediately (eviction proceeds async). */
  def release(blocking: Boolean = false): Unit =
    cached.foreach(_.unpersist(blocking))
}
