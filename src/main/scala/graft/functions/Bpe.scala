package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train merges on a corpus, tokenize
  * with them — the real form of the "BPE-ish" token counting the
  * training-data pipeline needs (cf. Sennrich et al., ACL'16).
  *
  * Scale shape: BPE statistics depend only on the WORD-FREQUENCY
  * histogram, not the corpus — so training is ONE distributed
  * groupBy over exploded words (map-side combined, capped at
  * `maxVocab` most frequent words), and the merge loop runs locally
  * on that histogram, exactly how production tokenizer trainers
  * work. The local loop is incremental: pair counts update only for
  * words containing the merged pair (tracked by a pair→word index)
  * and the argmax comes from a lazy-deletion max-heap — O(affected)
  * per merge, not O(vocab), so production-scale merge counts (~30k)
  * stay tractable. Tokenization broadcasts the merge ranks in the
  * task closure and is a narrow per-row pass.
  *
  * Unicode: symbols are CODE POINTS, not UTF-16 code units — astral
  * characters (emoji, rare CJK) stay whole instead of tearing into
  * lone surrogates. Words split on any whitespace run (`\s+`),
  * matching the corpus-cleaning convention elsewhere in the repo.
  *
  * Determinism: ties in pair counts break lexicographically, and the
  * histogram cap orders by (count desc, word asc) — same corpus,
  * same merges, on any cluster layout.
  */
object Bpe {

  /** One symbol per Unicode code point. */
  private def toSymbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy lowest-rank-first merge of one word's symbols — the
      * standard BPE inference loop. */
    def tokenizeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = toSymbols(word)
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          val merged = syms(bestIdx) + syms(bestIdx + 1)
          syms = (syms.take(bestIdx) :+ merged) ++
            syms.drop(bestIdx + 2)
        }
      }
      syms
    }
  }

  /** Train `numMerges` merges from the corpus's word histogram.
    * @param maxVocab cap on distinct words collected to the driver
    *                 (top by frequency; Zipf makes the tail irrelevant
    *                 to pair statistics) */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 50000): Model = {
    val hist = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The local merge loop over a (word, freq) histogram — incremental
    * counts + pair→word index + lazy-deletion max-heap. */
  private[functions] def trainFromHistogram(
      hist: Array[(String, Long)], numMerges: Int): Model = {
    import scala.collection.mutable
    val words = hist.map { case (w, _) => mutable.ArrayBuffer(
      toSymbols(w): _*) }
    val freqs = hist.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // heap entries are (count, pair) snapshots; stale ones (count no
    // longer current) are discarded on pop. Max count first; among
    // equal counts the lexicographically SMALLEST pair must pop first,
    // hence the reversed pair comparison.
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
                  y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val n = counts.getOrElse(p, 0L) + delta
      if (n <= 0L) counts.remove(p) else counts(p) = n
      // enqueue on EVERY change (not only increases): a pair whose
      // count only ever decreased would otherwise hold nothing but
      // stale heap entries and could never be popped again
      if (n > 0) heap.enqueue((n, p._1, p._2))
      if (delta > 0) where.getOrElseUpdate(p, mutable.Set.empty) += wi
    }
    words.indices.foreach { wi =>
      val w = words(wi)
      var i = 0
      while (i < w.length - 1) {
        bump((w(i), w(i + 1)), freqs(wi), wi)
        i += 1
      }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // pop to the first non-stale entry
      var best: Option[(String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (n, a, b) = heap.dequeue()
        if (counts.getOrElse((a, b), 0L) == n) best = Some((a, b))
      }
      best match {
        case None => exhausted = true
        case Some(p) =>
          merges += p
          val joined = p._1 + p._2
          val affected = where.getOrElse(p, mutable.Set.empty).toArray
          affected.foreach { wi =>
            val w = words(wi)
            val f = freqs(wi)
            // retract this word's pair contributions entirely...
            var i = 0
            while (i < w.length - 1) {
              bump((w(i), w(i + 1)), -f, wi)
              i += 1
            }
            // ...rewrite with the merge (left-to-right,
            // non-overlapping)...
            val out = mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < w.length) {
              if (i < w.length - 1 && w(i) == p._1 && w(i + 1) == p._2) {
                out += joined; i += 2
              } else { out += w(i); i += 1 }
            }
            words(wi) = out
            // ...and re-add the new contributions
            i = 0
            while (i < out.length - 1) {
              bump((out(i), out(i + 1)), f, wi)
              i += 1
            }
          }
          where.remove(p)
          counts.remove(p)
          m += 1
      }
    }
    Model(merges.toSeq)
  }

  /** Tokenize a text column: array of BPE tokens (whitespace
    * pre-split, merges applied per word). The model rides the task
    * closure — a narrow pass, no shuffle. */
  def tokenize(model: Model, text: Column): Column = {
    val tok = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else t.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(model.tokenizeWord)
    }
    tok(text)
  }

  /** Token count under the trained tokenizer — the measured quantity
    * a data pipeline budgets by. */
  def tokenCount(model: Model, text: Column): Column =
    size(tokenize(model, text))
}
