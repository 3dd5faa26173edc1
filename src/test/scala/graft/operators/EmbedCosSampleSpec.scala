package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The dedup_embed_cosine count-adaptive sampling contract (r9
  * verdict item 3): past the maxExactRows bound the A side keeps only
  * vec_id % mod == 0, so the emitted pairs must be EXACTLY the full
  * quadratic pair set restricted to sampled smaller-ids — a uniform
  * 1/mod pair sample, no other difference. Both routes are forced
  * through the sys-prop (the registry path the plan pins and A/Bs
  * use), full first so route selection is proven live, and the
  * comparison is on exact rows including the rounded cosine.
  */
class EmbedCosSampleSpec extends SparkSpec {

  private val key = "graft.embedcos.maxExactRows"

  private def run(limit: String): DataFrame = {
    val saved = sys.props.get(key)
    try {
      sys.props(key) = limit
      VectorQueries.defs("dedup_embed_cosine").fn(spark, sfDir)
    } finally {
      saved match {
        case Some(v) => sys.props(key) = v
        case None => sys.props -= key
      }
    }
  }

  test("sampled route equals the full pair set restricted to sampled " +
    "smaller-ids, and the full form stays reachable") {
    // The sf0.001 fixture has a single pair above the 0.44 threshold,
    // so a sampled run there is legitimately (and vacuously) empty —
    // synthesize a PAIR-DENSE embeddings table instead: 120 vectors,
    // 3 labels, three distinct unit directions per label placed so
    // same-direction pairs score cos 1 and cross-direction pairs
    // land under the threshold. 40 rows/label ⇒ hundreds of pairs on
    // both sides of the sample predicate.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("embed_cos_sample").toString
    val rows = (0L until 120L).map { id =>
      val label = (id % 3).toInt
      val direction = ((id / 3) % 3).toInt
      val v = Array.fill(8)(0.05f)
      v(label) = 1.0f
      v(3 + direction) = 0.9f
      (id, v.toSeq, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = 120L
    // limit 40 ⇒ mod = 3 (real sampling); a huge limit ⇒ mod = 1
    // (the forced full quadratic form)
    val mod = math.ceil(n.toDouble / 40).toLong
    assert(mod > 1, s"fixture too small to exercise sampling (n=$n)")
    def runDir(limit: String) = {
      val saved = sys.props.get(key)
      try {
        sys.props(key) = limit
        VectorQueries.defs("dedup_embed_cosine").fn(spark, dir)
      } finally {
        saved match {
          case Some(v) => sys.props(key) = v
          case None => sys.props -= key
        }
      }
    }
    val full = runDir(Long.MaxValue.toString).collect().map(_.toSeq)
    val sampled = runDir("40").collect().map(_.toSeq).toSet
    val expect = full.filter(r =>
      r.head.asInstanceOf[Long] % mod == 0).toSet
    assert(full.nonEmpty && sampled.nonEmpty,
      "sample comparison must not be vacuous")
    assert(sampled.size < full.length,
      "sampling must actually drop pairs on this fixture")
    val onlyS = sampled -- expect
    val onlyE = expect -- sampled
    assert(onlyS.isEmpty && onlyE.isEmpty,
      s"sample divergence: ${onlyS.take(3)} only-sampled, " +
        s"${onlyE.take(3)} only-expected")
  }

  test("a malformed force value fails loudly") {
    val saved = sys.props.get(key)
    try {
      sys.props(key) = "0"
      val e = intercept[IllegalArgumentException](
        VectorQueries.defs("dedup_embed_cosine").fn(spark, sfDir))
      assert(e.getMessage.contains("maxExactRows"))
    } finally {
      saved match {
        case Some(v) => sys.props(key) = v
        case None => sys.props -= key
      }
    }
  }
}
