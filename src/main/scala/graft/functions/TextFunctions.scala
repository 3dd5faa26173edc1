package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions for the training-data pipeline, all built from
  * codegen'd built-ins (no UDFs): fingerprinting, tokenization helpers,
  * character n-grams for language-ID. */
object TextFunctions {

  /** Polynomial rolling hash (base 31, mod 1e9+7) of the first
    * `prefixLen` characters — a locality-insensitive content fingerprint
    * computable identically in any engine with a fold. The empty
    * elements Spark's split-by-"" emits (leading/trailing) are filtered
    * before the fold: they would contribute a spurious ×31 step that
    * engines whose split drops empties wouldn't reproduce. */
  def rollingHash(text: Column, prefixLen: Int = 64): Column =
    aggregate(
      filter(split(substring(text, 1, prefixLen), ""), c => c =!= ""),
      lit(0L),
      (acc, c) => (acc * 31 + coalesce(ascii(c), lit(0))) % 1000000007L)

  /** Non-empty whitespace tokens — split('\s+') keeps an empty element
    * for leading whitespace and yields [""] for "", so the raw split is
    * NOT a token list; every counter here filters it. (Shared with
    * TextFeatures' tokenizer — one definition of "token".) */
  private[graft] def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Chunk-start indices for RAG-style overlapping token windows:
    * chunk i covers tokens [i·stride, i·stride + win); the last chunk
    * starts at the smallest multiple of `stride` that still reaches
    * the final token, so every token lands in ≥ 1 chunk and
    * consecutive chunks overlap by win − stride. Pure map-side
    * arithmetic (plain IEEE ops identical in any engine): the number
    * of chunks is ceil(max(n − win, 0)/stride) + 1, via the
    * floor((x + stride−1)/stride) form both engines compute the same
    * way. Pair with `slice` + `array_join` for the chunk text. */
  def chunkIndices(nTokens: Column, win: Int, stride: Int): Column = {
    require(win > 0, s"win must be positive, got $win")
    require(stride > 0 && stride <= win,
      s"stride must be in 1..win, got $stride")
    sequence(lit(0),
      floor((greatest(nTokens - lit(win), lit(0)) + lit(stride - 1)) /
        lit(stride)).cast("int"))
  }

  /** Character n-grams of a lowercased, space-normalized string.
    * Strings shorter than n yield an EMPTY array: the old
    * `sequence(1, greatest(len-(n-1), 0))` form produced the
    * descending sequence [1, 0] there (Spark's sequence steps -1 when
    * stop < start), emitting two spurious truncated grams per short
    * document. */
  def charNgrams(text: Column, n: Int): Column = {
    val s = lower(regexp_replace(text, "\\s+", " "))
    val cnt = length(s) - (n - 1)
    when(cnt < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt),
        i => s.substr(i, lit(n))))
  }

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Whitespace token count (empty tokens excluded — " a b" is 2,
    * "" is 0, matching Python's str.split()). */
  def tokenCountWs(text: Column): Column =
    size(wsTokens(text))

  /** Language score: fraction of the doc's words found in `markers`
    * (stopword profile for one language). argmax across profiles =
    * language-ID; see TextQueries.lang_id for the oracle-checked form.
    * Tokenized with [[wsTokens]] — a bare single-space split left
    * tab/newline-glued words unmatched and counted empty strings in
    * the denominator, systematically deflating whitespace-heavy docs. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val w = wsTokens(lower(text))
    size(filter(w, x => x.isin(markers.map(_.asInstanceOf[Any]): _*))) /
      greatest(size(w), lit(1))
  }
}
