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
  * work. Tokenization broadcasts the merge ranks in the task closure
  * and is a narrow per-row pass.
  *
  * Determinism: ties in pair counts break lexicographically, and the
  * histogram cap orders by (count desc, word asc) — same corpus,
  * same merges, on any cluster layout.
  */
object Bpe {

  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy lowest-rank-first merge of one word's symbols — the
      * standard BPE inference loop. */
    def tokenizeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = word.map(_.toString).toVector
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
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The local merge loop over a (word, freq) histogram. */
  private[functions] def trainFromHistogram(
      hist: Array[(String, Long)], numMerges: Int): Model = {
    var words = hist.map { case (w, n) =>
      (w.map(_.toString).toVector, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable
        .HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then pair lexicographic
        val best = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toVector, n)
        }
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
      else t.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(model.tokenizeWord)
    }
    tok(text)
  }

  /** Token count under the trained tokenizer — the measured quantity
    * a data pipeline budgets by. */
  def tokenCount(model: Model, text: Column): Column =
    size(tokenize(model, text))
}
