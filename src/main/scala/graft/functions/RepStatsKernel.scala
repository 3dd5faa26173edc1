package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Typed kernel for the Gopher repetition-signal counts
  * ([[graft.operators.TextQueries.repStats]]) — the TokenCountKernel
  * recipe applied to the bigram-repetition family. The former
  * column form paid two interpreted higher-order walks per document
  * (`array_sort(bigrams)` then an `aggregate` run-length fold whose
  * lambda allocates a 3-field struct PER BIGRAM — ~40M interpreted
  * struct builds at the sf1 tier's 50k-doc corpus) plus an
  * `array_distinct` per signal. Here one pass over the word stream
  * counts everything; the fractions, divisions, and ROUND stay
  * Column-side in repStats, so the arithmetic the oracle replays is
  * untouched — the kernel only replaces HOF counting with integer
  * counting.
  *
  * Contracts that keep it oracle-exact:
  *  - words are `text.split(" ", -1)` — the same
  *    keep-all-empty-tokens semantics as Spark's `split(text, " ")`
  *    (limit −1) and DuckDB's `string_split`;
  *  - gram/text lengths are UNICODE CODE POINTS (Spark `length()` =
  *    `UTF8String.numChars`, DuckDB `length()` — NOT UTF-16 units);
  *  - the top-gram signal is max(count×len) over bigrams in INT
  *    arithmetic, exactly the old fold's `run * length(x)`.
  */
object RepStatsKernel {

  /** Per row: word/bigram repetition counts for `textCol`.
    *
    * @return input columns minus `textCol`, plus
    *         (__nw, __ndw, __nbg, __ndbg, __best, __nc) ints —
    *         narrow (map-only, no shuffle). Rows must have ≥ 2 words
    *         (filter upstream; enforced loudly here because __nbg = 0
    *         would divide to null downstream and silently drop the
    *         row from a hash gate).
    */
  def repCounts(df: DataFrame, textCol: String): DataFrame = {
    val schema = df.schema
    val textIdx = schema.fieldIndex(textCol)
    val keepIdx = schema.fields.indices.filter(_ != textIdx).toArray
    val outSchema = StructType(
      keepIdx.map(schema.fields(_)) ++ Seq(
        StructField("__nw", IntegerType, nullable = false),
        StructField("__ndw", IntegerType, nullable = false),
        StructField("__nbg", IntegerType, nullable = false),
        StructField("__ndbg", IntegerType, nullable = false),
        StructField("__best", IntegerType, nullable = false),
        StructField("__nc", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // reused per-task: cleared per doc, never reallocated
      val wordSet = new java.util.HashSet[String]()
      val bgCount = new java.util.HashMap[String, Int]()
      rows.map { r =>
        if (r.isNullAt(textIdx))
          throw new IllegalArgumentException(
            "repCounts: null text row - filter isNotNull upstream")
        val text = r.getString(textIdx)
        val words = text.split(" ", -1)
        val nw = words.length
        if (nw < 2)
          throw new IllegalArgumentException(
            "repCounts: document with < 2 words - filter upstream " +
              "(a 0/1-word doc has no bigram and its fractions are " +
              "undefined)")
        wordSet.clear()
        bgCount.clear()
        var i = 0
        while (i < nw) { wordSet.add(words(i)); i += 1 }
        var best = 0
        i = 0
        while (i < nw - 1) {
          val g = words(i) + " " + words(i + 1)
          val c = bgCount.merge(g, 1, Integer.sum)
          // same INT arithmetic as the old fold's run * length(x);
          // within a gram's occurrences count×len grows monotonically,
          // so maxing per occurrence captures each gram's final value
          val len = g.codePointCount(0, g.length)
          val cl = c * len
          if (cl > best) best = cl
          i += 1
        }
        val vals = new Array[Any](keepIdx.length + 6)
        var k = 0
        while (k < keepIdx.length) { vals(k) = r.get(keepIdx(k)); k += 1 }
        vals(k) = nw
        vals(k + 1) = wordSet.size()
        vals(k + 2) = nw - 1
        vals(k + 3) = bgCount.size()
        vals(k + 4) = best
        vals(k + 5) = text.codePointCount(0, text.length)
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc)
  }
}
