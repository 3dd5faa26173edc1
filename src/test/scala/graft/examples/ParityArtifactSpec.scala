package graft.examples

import org.scalatest.funsuite.AnyFunSuite

/** Enforcement wrapper for the de-saturation parity gates (r8 verdict
  * item 8): `ReferenceParity` exits nonzero when a scaled run
  * re-saturates the table or breaks the M4 ordering — but only when
  * someone RUNS it. This spec makes `sbt test` the enforcement point
  * by parsing the COMMITTED docs/REFERENCE_PARITY.md (the artifact of
  * the scaled fixture run) and re-asserting the same gates on its
  * numbers: a fixture regeneration that saturates the table and
  * regenerates the doc goes red here, not in a manual run nobody
  * launched. Parsing, not retraining: the scaled run takes minutes of
  * MLlib fits, and the gate's subject is the committed artifact.
  */
class ParityArtifactSpec extends AnyFunSuite {

  private lazy val doc: String = {
    val p = java.nio.file.Paths.get("docs/REFERENCE_PARITY.md")
    assert(java.nio.file.Files.exists(p),
      "docs/REFERENCE_PARITY.md missing - run ReferenceParity on a " +
        "scaled fixture dir to regenerate it")
    java.nio.file.Files.readString(p)
  }

  private def auc(label: String): Double = {
    val re = (java.util.regex.Pattern.quote(label) +
      raw" AUC (\d+\.\d+)").r
    re.findFirstMatchIn(doc).map(_.group(1).toDouble).getOrElse(
      fail(s"'$label AUC <x>' not found in REFERENCE_PARITY.md - " +
        "the ordering-gate line was removed or reworded"))
  }

  test("leakage signature is recorded and holds (train AUC >= 0.95)") {
    val re = raw"LEAKAGE_TRAIN_AUC=(\d+\.\d+)".r
    val v = re.findFirstMatchIn(doc).map(_.group(1).toDouble)
      .getOrElse(fail("LEAKAGE_TRAIN_AUC line missing"))
    assert(v >= 0.95, s"leakage signature lost: train AUC $v < 0.95")
    assert(v <= 1.0)
  }

  test("M4 chain ordering is strictly increasing and de-saturated") {
    val pooling = auc("m4_pooling_mlp")
    val window = auc("m4_window_mlp")
    val decay = auc("m4_decay_mlp")
    assert(pooling < window && window < decay,
      s"fidelity ordering broken: pooling=$pooling window=$window " +
        s"decay=$decay - the chain's order-sensitivity claim no " +
        "longer measures")
    for ((n, v) <- Seq("pooling" -> pooling, "window" -> window,
        "decay" -> decay))
      assert(v > 0.55 && v < 0.999,
        s"m4_$n AUC $v re-saturated (must sit in (0.55, 0.999)): " +
          "regenerate fixtures with a weaker positional signal")
  }

  test("published-vs-engine table rows are present and non-saturated " +
    "where the gate demands") {
    // the two grid heads the r7 verdict called out as vacuously 1.0
    assert(doc.contains("m3_grid_mlp"), "M3 row missing")
    // engine column of the CNN row: "| 0.9662 / 0.7126"
    val cnnRow = doc.linesIterator
      .find(_.contains("m3_grid_mlp"))
      .getOrElse(fail("CNN (10k) row missing"))
    val aucRe = raw"\| (\d+\.\d+) / \d+\.\d+".r
    val v = aucRe.findFirstMatchIn(cnnRow).map(_.group(1).toDouble)
      .getOrElse(fail(s"engine AUC cell not parseable: $cnnRow"))
    assert(v > 0.55 && v < 0.999,
      s"m3_grid_mlp engine AUC $v re-saturated")
  }
}
