package graft.operators

import graft.SparkSpec

/** The tfidf_topk size-routing contract (r8 verdict item 2): the
  * closed-vocabulary route (broadcast df map + in-kernel top-3, zero
  * corpus-keyed shuffle) and the open-vocabulary route (word-keyed
  * shuffle join + aggregate top-3) must produce IDENTICAL rows on the
  * same corpus — routing is a performance decision, never a semantic
  * one. Forcing each route through the `maxBroadcastVocab` knob (0 ⇒
  * every vocabulary overflows ⇒ open; default cap ⇒ the test corpus
  * fits ⇒ closed) makes both code paths run for real.
  */
class TfidfRouteSpec extends SparkSpec {

  test("closed and open tfidf routes produce identical rows") {
    val closed = CorpusQueries.tfidfTopk(spark, sfDir,
      maxBroadcastVocab = CorpusQueries.TfidfMaxBroadcastVocab)
    val open = CorpusQueries.tfidfTopk(spark, sfDir,
      maxBroadcastVocab = 0)
    val c = closed.collect().map(_.toSeq).toSet
    val o = open.collect().map(_.toSeq).toSet
    assert(c.nonEmpty, "route comparison must not be vacuous")
    val onlyC = c -- o
    val onlyO = o -- c
    assert(onlyC.isEmpty && onlyO.isEmpty,
      s"route divergence: ${onlyC.take(3)} only-closed, " +
        s"${onlyO.take(3)} only-open")
    // every doc with text contributes >= 1 and <= 3 ranked rows
    val perDoc = closed.groupBy("doc_id").count().collect()
    assert(perDoc.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
  }

  test("closed route plans zero corpus-keyed exchanges") {
    val plan = CorpusQueries.tfidfTopk(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the in-kernel top-3 leaves no per-doc aggregate: no Exchange at
    // all in the scoring query (the df pass ran at CONSTRUCTION time
    // into the broadcast map, so the returned plan is map-only)
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      s"closed route must not shuffle per-doc rows:\n$plan")
  }

  test("codePointCompare orders like UTF-8 bytes, not UTF-16 units") {
    import CorpusQueries.codePointCompare
    // U+FFFD (3-byte UTF-8, BMP) vs U+1F600 (4-byte, supplementary):
    // byte order puts the BMP char FIRST; UTF-16 code-unit order
    // (String.compareTo) puts the surrogate pair first — the exact
    // divergence the tie-break must avoid
    val bmp = "�"
    val supp = new String(Character.toChars(0x1F600))
    assert(codePointCompare(bmp, supp) < 0)
    assert(bmp.compareTo(supp) > 0, "if this flips, Java changed")
    assert(codePointCompare("abc", "abd") < 0)
    assert(codePointCompare("ab", "abc") < 0)
    assert(codePointCompare("abc", "abc") == 0)
    assert(codePointCompare("", "a") < 0)
  }
}
