package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Typed byte kernel for per-document exact-token counting — the
  * dedup_spans recipe (one getBytes + one boundary scan per doc)
  * applied to the token-scan family (`bm25_score`, `lang_id`), whose
  * split+higher-order-function forms paid a JVM per-token price the
  * sf1 tier measured at 4-6× the columnar baseline: `split(text, " ")`
  * allocates an UTF8String per token and `filter`/`array_contains`
  * lambdas evaluate interpreted (Catalyst higher-order functions are
  * not codegen'd), so every document cost ~n_tokens allocations plus
  * ~n_tokens×n_terms interpreted comparisons. This kernel walks the
  * UTF-8 bytes once per document, compares in place, and allocates
  * only the output row.
  *
  * Tokenization contract (must stay bit-compatible with the oracle's
  * `string_split(text, ' ')`): tokens are the substrings between
  * SINGLE space bytes — consecutive spaces yield empty tokens, and
  * `dlCol` counts them all, so dl = (#spaces)+1 equals
  * `size(split(text, " "))` exactly (Spark's split keeps trailing
  * empties at limit -1; so does DuckDB). Matching on raw bytes is
  * UTF-8-safe because 0x20 never occurs in a continuation byte.
  */
object TokenCountKernel {

  /** Count, per input row, the occurrences of each `terms(i)` as a
    * whole token of `textCol`, plus the total token count.
    *
    * @param df      input; `textCol` must be a non-null string column
    *                (filter nulls upstream — a null text is a loud
    *                error here, not a silent zero row)
    * @param terms   distinct non-empty ASCII tokens to count
    * @param dlCol   output column for the token count (long)
    * @param outCols one output column name (long) per term
    * @return the input columns minus `textCol`, plus `dlCol` and
    *         `outCols` — narrow (map-only, no shuffle)
    */
  def tokenCounts(df: DataFrame, textCol: String, terms: Seq[String],
                  dlCol: String, outCols: Seq[String]): DataFrame = {
    require(terms.length == outCols.length,
      "one output column per term")
    require(terms.distinct.length == terms.length, "terms must be " +
      "distinct (a duplicate would double-count into one column)")
    require(terms.forall(t => t.nonEmpty && t.forall(_ < 128)),
      "terms must be non-empty ASCII tokens")
    val schema = df.schema
    val textIdx = schema.fieldIndex(textCol)
    val keepIdx = schema.fields.indices.filter(_ != textIdx).toArray
    val outSchema = StructType(
      keepIdx.map(schema.fields(_)) ++
        (StructField(dlCol, LongType, nullable = false) +:
          outCols.map(c => StructField(c, LongType, nullable = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val termBytes: Array[Array[Byte]] =
      terms.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .toArray
    df.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(textIdx))
          throw new IllegalArgumentException(
            "tokenCounts: null text row - filter isNotNull upstream")
        val bytes = r.getString(textIdx)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val counts = new Array[Long](termBytes.length)
        var dl = 1L
        var start = 0
        var i = 0
        // one pass: token boundaries at each space byte and at EOS
        while (i <= bytes.length) {
          if (i == bytes.length || bytes(i) == ' ') {
            val len = i - start
            var t = 0
            var matched = false
            while (t < termBytes.length && !matched) {
              val tb = termBytes(t)
              if (tb.length == len) {
                var j = 0
                while (j < len && tb(j) == bytes(start + j)) j += 1
                if (j == len) { counts(t) += 1; matched = true }
              }
              t += 1
            }
            if (i < bytes.length) dl += 1
            start = i + 1
          }
          i += 1
        }
        val vals = new Array[Any](keepIdx.length + 1 + counts.length)
        var k = 0
        while (k < keepIdx.length) { vals(k) = r.get(keepIdx(k)); k += 1 }
        vals(keepIdx.length) = dl
        var c = 0
        while (c < counts.length) {
          vals(keepIdx.length + 1 + c) = counts(c); c += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(vals))
      }
    }(enc)
  }

  /** Per-row corpus-quality stats in ONE token scan: total token
    * count, stopword-hit count (occurrences of any of `stopTerms`),
    * and EXACT distinct-token count — the three inputs of the C4-style
    * filter rules (`TextQueries.reasonFromCounts`). The HOF form paid
    * three independent interpreted passes per document (`size(split)`,
    * `filter(_.isin(stops))`, `array_distinct`) — the sf1 tier
    * measured `corpus_report` at 2.3× the columnar baseline on it;
    * this kernel walks the characters once, testing each token against
    * a hash set and inserting it into a per-row distinct set.
    *
    * Unlike [[tokenCounts]] this walks CHARS, not bytes: the distinct
    * set needs the token as a JVM String anyway (one substring per
    * token — the same allocation `split` would make, minus the
    * ArrayData/UTF8String wrappers and the three HOF re-walks), and
    * `String.substring` boundaries on ' ' coincide with the byte
    * walk's (0x20 never occurs inside a surrogate pair or continuation
    * byte). Distinctness by String equality is exactly
    * `array_distinct`'s element equality and the oracle's
    * `list_distinct`. Tokenization contract as [[tokenCounts]]:
    * nWords = (#spaces)+1 = `size(split(text, " "))`, empty tokens
    * (consecutive/trailing spaces) counted and distinct-tracked.
    *
    * @return input columns minus `textCol`, plus `nWordsCol`,
    *         `stopCol`, `distinctCol` (all long) — map-only, no
    *         shuffle.
    */
  def tokenStats(df: DataFrame, textCol: String, stopTerms: Seq[String],
                 nWordsCol: String, stopCol: String,
                 distinctCol: String): DataFrame = {
    require(stopTerms.distinct.length == stopTerms.length,
      "stop terms must be distinct")
    val schema = df.schema
    val textIdx = schema.fieldIndex(textCol)
    val keepIdx = schema.fields.indices.filter(_ != textIdx).toArray
    val outSchema = StructType(
      keepIdx.map(schema.fields(_)) ++ Seq(
        StructField(nWordsCol, LongType, nullable = false),
        StructField(stopCol, LongType, nullable = false),
        StructField(distinctCol, LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val stops = stopTerms.toArray
    df.mapPartitions { rows =>
      val stopSet = new java.util.HashSet[String](stops.length * 2)
      stops.foreach(stopSet.add)
      // reused across rows; sized for typical docs, grows as needed
      val seen = new java.util.HashSet[String](512)
      rows.map { r =>
        if (r.isNullAt(textIdx))
          throw new IllegalArgumentException(
            "tokenStats: null text row - filter isNotNull upstream")
        val s = r.getString(textIdx)
        seen.clear()
        var nW = 0L
        var stopCnt = 0L
        var start = 0
        var i = 0
        val n = s.length
        while (i <= n) {
          if (i == n || s.charAt(i) == ' ') {
            val tok = s.substring(start, i)
            nW += 1
            if (stopSet.contains(tok)) stopCnt += 1
            seen.add(tok)
            start = i + 1
          }
          i += 1
        }
        val vals = new Array[Any](keepIdx.length + 3)
        var k = 0
        while (k < keepIdx.length) { vals(k) = r.get(keepIdx(k)); k += 1 }
        vals(keepIdx.length) = nW
        vals(keepIdx.length + 1) = stopCnt
        vals(keepIdx.length + 2) = seen.size.toLong
        Row.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(vals))
      }
    }(enc)
  }
}
