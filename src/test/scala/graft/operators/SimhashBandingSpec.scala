package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the recall contract of [[Dedup.simhashPairs]]: with
  * block-permuted tables keyed on (d-h)-block combinations, EVERY pair
  * within the hamming budget is found — at every distance 1..maxHamming —
  * while the bucket keys stay selective enough that a realistic random
  * corpus produces no oversized buckets (the failure mode of the old
  * h+1-chunk construction, whose 5-6-bit keys overflowed every bucket at
  * corpus scale and silently zeroed recall).
  */
class SimhashBandingSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 64-bit pseudo-random value (splitmix64 finalizer). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Flip exactly `k` distinct bits of `sig`, positions derived
    * deterministically from `seed`. */
  private def flipBits(sig: Long, k: Int, seed: Long): Long = {
    var out = sig
    var chosen = Set.empty[Int]
    var i = 0
    while (chosen.size < k) {
      val b = (mix64(seed + i) >>> 8).toInt.abs % 64
      if (!chosen(b)) { chosen += b; out ^= (1L << b) }
      i += 1
    }
    out
  }

  /** Plant one partner at each distance 1..maxH (cycled over bases) and
    * assert every planted pair is found, at the exact distance. */
  private def assertFullRecall(maxH: Int, blocks: Int): Unit = {
    val rows = (0 until 40).flatMap { i =>
      val base = mix64(i * 7919L)
      val h = 1 + (i % maxH)
      Seq((i * 2L, base), (i * 2L + 1, flipBits(base, h, i * 104729L)))
    }
    val sigs = rows.toDF("id", "simhash")
    val found = Dedup.simhashPairs(sigs, maxHamming = maxH,
        blocks = blocks)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, hm) => (math.min(a, b), math.max(a, b), hm) }
      .toSet
    (0 until 40).foreach { i =>
      val h = 1 + (i % maxH)
      assert(found.exists(p => p._1 == i * 2L && p._2 == i * 2L + 1),
        s"planted pair at hamming $h (base $i) not found")
      val hm = found.find(p => p._1 == i * 2L && p._2 == i * 2L + 1).get._3
      assert(hm === h, s"planted distance $h reported as $hm")
    }
    // no false positives: every reported pair really is ≤ maxH
    assert(found.forall(_._3 <= maxH))
  }

  test("simhashPairs finds 100% of planted pairs at every hamming " +
    "1..3 (the registered budget, default blocks)") {
    assertFullRecall(maxH = 3, blocks = 0)
  }

  test("simhashPairs guarantee generalizes to large budgets " +
    "(h=10, explicit 11 blocks)") {
    assertFullRecall(maxH = 10, blocks = 11)
  }

  test("default block count gives selective keys for the registered " +
    "budget: no oversized bucket on a realistic 50k-signature corpus") {
    // 50k uniformly-mixed signatures — the shape of a real text corpus
    // after simhash64 (each bit is a majority vote, ~unbiased). With the
    // default d=5 layout (10 tables, 24-bit keys), the expected bucket
    // size is 50k/2^24 ≪ 1; the old 11-chunk layout had 5-6-bit keys
    // where EVERY bucket held ~1000+ docs and the cap dropped them all.
    val sigs = spark.range(50000).select(col("id"),
      xxhash64(col("id")).as("simhash"))
    assert(Dedup.defaultBlocks(3) === 5)
    val over = Dedup.simhashOversizedBuckets(sigs, maxHamming = 3,
      maxBucket = 100)
    assert(over.count() === 0,
      "random corpus must not overflow any bucket at the default layout")
  }

  test("simhashPairs equals the brute-force hamming join on a " +
    "clustered corpus (exact precision AND recall)") {
    // 80 clusters × 4 variants, each variant ≤ 2 bit-flips off its
    // base: within-cluster pair distances span 1..4, so the h=3 budget
    // must return exactly the ≤3 subset — recall misses AND spurious/
    // over-budget pairs both break set equality.
    val rows = (0 until 80).flatMap { c =>
      val base = mix64(c * 524287L)
      (0 until 4).map { j =>
        val flips = j match {
          case 0 => base
          case _ => flipBits(base, 1 + (j % 2), c * 7919L + j)
        }
        (c * 10L + j, flips)
      }
    }
    val sigs = rows.toDF("id", "simhash")
    val found = Dedup.simhashPairs(sigs, maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = sigs.as("a").join(sigs.as("b"),
        col("a.id") < col("b.id"))
      .where(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
        <= 3)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(found === exact,
      s"missed ${exact -- found}, spurious ${found -- exact}")
  }

  test("default block layout exists for every legal budget " +
    "(h up to 63 must not crash)") {
    Seq(0, 6, 31, 32, 40, 63).foreach { h =>
      val d = Dedup.defaultBlocks(h)
      assert(d > h && d <= 64, s"h=$h gave blocks=$d")
    }
    // and the pipeline runs at an extreme budget on a tiny corpus
    val sigs = Seq((1L, 0L), (2L, -1L), (3L, 0x0F0FL))
      .toDF("id", "simhash")
    assert(Dedup.simhashPairs(sigs, maxHamming = 40).count() >= 1)
  }

  test("bucket-size cap drops oversized buckets and is observable") {
    // 200 identical signatures → every combo bucket holds 200 docs.
    val sigs = (0L until 200L).map(i => (i, 0x0123456789ABCDEFL))
      .toDF("id", "simhash")
    val over = Dedup.simhashOversizedBuckets(sigs, maxHamming = 10,
      maxBucket = 50, blocks = 11)
    assert(over.count() === 11) // all 11 single-block combos overflow
    // with the cap, the quadratic 200×199/2 pair blow-up is suppressed
    assert(Dedup.simhashPairs(sigs, 10, maxBucket = 50,
      blocks = 11).count() === 0)
    // without pressure on the cap, the pairs come back
    assert(Dedup.simhashPairs(sigs, 10, maxBucket = 500,
      blocks = 11).count() === 200L * 199L / 2)
  }

  test("block decomposition covers all 64 bits exactly once " +
    "(reconstruction property)") {
    // If blocks tiled the word wrong (gap or overlap), two signatures
    // differing ONLY in an uncovered bit would collide on every combo
    // and surface as a hamming-1 pair... or a covered-twice bit would
    // break the pigeonhole count. Check: for each single-bit flip, the
    // pair is found and reported at hamming exactly 1.
    val base = 0x5A5A5A5AF0F0F0F0L
    val rows = (0 until 64).flatMap { b =>
      Seq((b * 2L, base ^ (1L << b)))
    } :+ (1000L, base)
    val sigs = rows.toDF("id", "simhash")
    val withBase = Dedup.simhashPairs(sigs, maxHamming = 1)
      .where(col("a_id") === 1000L || col("b_id") === 1000L)
    assert(withBase.count() === 64)
  }
}
