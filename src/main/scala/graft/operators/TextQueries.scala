package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Training-data text-pipeline operators over the `documents` table:
  * dedup, token counting, quality scoring, language-ID heuristics,
  * fingerprinting. These go beyond the reference (which has no text
  * pipeline) per the build brief; all are expressed as codegen-friendly
  * built-in expression compositions — no UDFs in the hot path — with
  * ONE measured exception: `dedup_spans` hashes its ~n_tokens spans per
  * document in a typed byte-range kernel (see its comment; the
  * expression form's per-span string/digest allocations were the
  * query's dominant cost at the sf1 tier).
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Word 3-gram shingle set of a text column (for Jaccard dedup).
    * Pure expression, narrow (no shuffle). Implemented as three shifted
    * slices zipped pairwise — 5 array ops per row — instead of the
    * naive `transform(sequence)(i => slice(w, i, 3))`, which issues one
    * interpreted slice+concat per position (~100× per doc) and dominated
    * the dedup benchmarks. */
  def shingles3(text: Column): Column = {
    val w = split(text, " ")
    val n = greatest(size(w) - 2, lit(0)) // <3 words → empty set
    val w1 = slice(w, lit(1), n)
    val w2 = slice(w, lit(2), n)
    val w3 = slice(w, lit(3), n)
    array_distinct(zip_with(w1, zip_with(w2, w3,
      (b, c) => concat(b, lit(" "), c)),
      (a, bc) => concat(a, lit(" "), bc)))
  }

  /** Word-bigram array of a text column ("a b c" → ["a b", "b c"]) —
    * the single definition of the 2-gram construction shared by
    * [[repStats]], `ngram_topk`, and [[CorpusQueries]]' familiarity
    * op (two shifted slices zipped, same doctrine as [[shingles3]]).
    * <2 words → empty array. */
  private[operators] def wordBigrams(text: Column): Column = {
    val w = split(text, " ")
    zip_with(slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Within-document repetition signals (Gopher, Rae et al. 2021 §A1.1),
    * re-expressed over the word stream (the synthetic corpus is
    * single-line): duplicate-word fraction, duplicate-2-gram fraction,
    * and the fraction of characters covered by the most frequent 2-gram
    * (ties resolved by maxing count×length over all 2-grams — that max
    * is deterministic where "the" top gram under ties is not). One
    * narrow projection; per-row work is O(n log n) in doc words (a
    * sort + linear run-length fold — see topChars below), no shuffle,
    * pushes onto the scan. Rows
    * need ≥2 words (and non-null text) for a 2-gram to exist — callers
    * filter first; [[defs]]' `rep_stats` entry shows the canonical form. */
  def repStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Counting runs in [[graft.functions.RepStatsKernel]] (r9.6): the
    // former column form paid two interpreted HOF walks per doc — an
    // array_sort(bigrams) plus an aggregate run-length fold whose
    // lambda allocated a 3-field struct per bigram (~40M interpreted
    // struct builds at sf1) — and that form itself was already the
    // 10×-faster replacement for the naive
    // transform(distinct)(g → count(g)). The fractions, divisions,
    // and ROUND stay HERE as Column arithmetic, so the expressions
    // the DuckDB oracle replays are byte-identical — the kernel only
    // swaps HOF counting for integer counting (spec-pinned on
    // hand-computed fixtures and the random-corpus property).
    val k = graft.functions.RepStatsKernel.repCounts(
      df.select(col(idCol), col(textCol)), textCol)
    k.select(col(idCol), col("__nw").as("n_words"),
      round(lit(1) - col("__ndw") / col("__nw"), 6)
        .as("dup_word_frac"),
      round(lit(1) - col("__ndbg") / col("__nbg"), 6)
        .as("dup_2gram_frac"),
      round(col("__best") / col("__nc"), 6)
        .as("top_2gram_char_frac"))
  }

  /** Per-doc word-3-gram digest stream: (keep columns…, h = md5 of
    * each distinct shingle). The ONE construction every contamination
    * surface shares — exact form, Bloom form, and the scale harness —
    * so a change to the digest (e.g. md5 → xxhash64 at deployment) or
    * the ≥3-word rule cannot desynchronize them. Docs under 3 words
    * carry no shingle and are excluded. */
  private[graft] def shingleDigests(df: DataFrame, textCol: String,
                                    keep: Seq[String]): DataFrame =
    df.where(col(textCol).isNotNull &&
        size(split(col(textCol), " ")) >= 3)
      .select(keep.map(col) :+
        explode(shingles3(col(textCol))).as("sh"): _*)
      .select(keep.map(col) :+ md5(col("sh")).as("h"): _*)

  /** Train/eval contamination check (GPT-3 App. C / PaLM-style n-gram
    * overlap): for each eval document, how many of its word-3-gram
    * shingles appear anywhere in the training corpus. The shape is the
    * scalable one — both sides explode to shingles and join on a
    * fixed-width digest (md5 so the DuckDB oracle can replay it;
    * xxhash64 at deployment), so the shuffle carries 16-byte keys, never
    * text, and the train side is distinct-ed before the join. At 100 TB
    * a broadcast Bloom filter of train digests prefilters the join.
    * Docs under 3 words carry no shingle and are excluded on both sides. */
  def contaminationCheck(evalDocs: DataFrame, trainDocs: DataFrame,
                         evalIdCol: String, textCol: String): DataFrame = {
    val evalSh = shingleDigests(
      evalDocs.select(col(evalIdCol).as("eval_id"), col(textCol)),
      textCol, Seq("eval_id"))
    val trainSh = shingleDigests(trainDocs, textCol, Seq.empty)
      .distinct().withColumn("hit", lit(1))
    evalSh.join(trainSh, Seq("h"), "left")
      .groupBy("eval_id")
      .agg(count("*").as("n_shingles"),
        count(col("hit")).as("n_hits"))
      .select(col("eval_id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits") / col("n_shingles"), 6).as("contam_frac"),
        (col("n_hits") > 0).cast("int").as("is_contaminated"))
  }

  /** [[contaminationCheck]]'s 100 TB shape: a Bloom filter over the
    * train digests is built in one train-side pass and broadcast, and
    * eval shingles are pruned map-side BEFORE the exact join — the
    * shuffle then carries only candidate digests (true hits + the fpp
    * sliver) instead of every eval shingle. Bloom filters have no
    * false negatives, and the exact join still verifies every
    * candidate, so the output is IDENTICAL to the exact form — the
    * filter changes cost, never answers (asserted by
    * TextPipelineSpec). Per-doc shingle totals are counted before the
    * prune so `n_shingles`/`contam_frac` stay exact. `expectedItems`
    * sizes the filter (train-side distinct-digest estimate; ~1.2 GB
    * per 10⁹ digests at 1% fpp — driver-resident, the standard
    * broadcast-sketch trade; UNDER-sizing degrades fpp silently, so
    * estimate high — bits are cheap, a saturated filter is not).
    *
    * Lifecycle: both digest relations are persisted MEMORY_AND_DISK —
    * train feeds the BF build (an action, runs now) AND the
    * candidate-verify join; eval feeds the totals aggregate AND the
    * pruned join (the prune must happen BEFORE the join's exchange to
    * save the shuffle, so totals/hits are genuinely two consumers).
    * Without the persists each second use would re-scan its corpus —
    * the double-scan shape ivfIndex was rightly dinged for. This
    * convenience form leaves the blocks to session LRU (fine for
    * one-shot driver runs); a service looping over many corpora should
    * use [[contaminationCheckBloomManaged]] and release() after its
    * terminal action. */
  def contaminationCheckBloom(evalDocs: DataFrame, trainDocs: DataFrame,
                              evalIdCol: String, textCol: String,
                              expectedItems: Long,
                              fpp: Double = 0.01): DataFrame =
    contaminationCheckBloomManaged(evalDocs, trainDocs, evalIdCol,
      textCol, expectedItems, fpp).df

  /** [[contaminationCheckBloom]] with an explicit cache-lifecycle
    * handle — see [[graft.operators.ManagedResult]]. */
  def contaminationCheckBloomManaged(
      evalDocs: DataFrame, trainDocs: DataFrame,
      evalIdCol: String, textCol: String, expectedItems: Long,
      fpp: Double = 0.01): ManagedResult = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val evalSh = shingleDigests(
      evalDocs.select(col(evalIdCol).as("eval_id"), col(textCol)),
      textCol, Seq("eval_id")).persist(disk)
    val trainSh = shingleDigests(trainDocs, textCol, Seq.empty)
      .distinct().persist(disk)
    val bf = buildBloom(trainSh, "h", expectedItems, fpp)
    val bc = trainDocs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => bc.value.mightContainString(s))
    val totals = evalSh.groupBy("eval_id")
      .agg(count("*").as("n_shingles"))
    val hits = evalSh.where(mightContain(col("h")))
      .join(trainSh, Seq("h"))
      .groupBy("eval_id").agg(count("*").as("n_hits"))
    val out = totals.join(hits, Seq("eval_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("eval_id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits") / col("n_shingles"), 6).as("contam_frac"),
        (col("n_hits") > 0).cast("int").as("is_contaminated"))
    ManagedResult(out, Seq(evalSh, trainSh))
  }

  /** Correctly-sized distributed Bloom filter over a string column.
    *
    * NOT `df.stat.bloomFilter`: in Spark 4 that routes through
    * `BloomFilterAggregate`, which silently clamps the bitset to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2^26 bits = 8 MB — sized for runtime join pruning, where a hot
    * filter beats an exact one). Past ~7M distinct items the clamped
    * filter saturates: at 31M items the measured fpp was 0.94 — the
    * prefilter silently stopped pruning (caught by TextScaleStress at
    * 10^6 docs; the 4×10^4 smoke corpus sat under the clamp and showed
    * nothing). This is the classic one-pass treeAggregate build at the
    * caller's requested size; each task pays one zero-filter copy
    * (~1.2 MB per 10^6 items at 1%), same as Spark's own pre-clamp
    * implementation. */
  private[graft] def buildBloom(df: DataFrame, colName: String,
                                expectedItems: Long, fpp: Double)
      : org.apache.spark.util.sketch.BloomFilter =
    df.select(col(colName)).rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems,
        fpp))(
      (f, row) => { f.putString(row.getString(0)); f },
      (a, b) => { a.mergeInPlace(b); a })

  /** C4/Gopher-style keep/drop decision composed from the individual
    * quality signals, with the FIRST failing rule recorded as the drop
    * reason (rule order is part of the contract — audits depend on
    * stable reason codes). One narrow projection, no shuffle; at 100 TB
    * this is a map-only pass and the downstream `.where(keep === 1)`
    * combines with it into the same codegen stage. Thresholds are
    * caller-supplied; [[defs]]' `corpus_filter` entry registers the
    * canonical ones (minWords=20, minStopRatio=0.03, maxDupFrac=0.65 —
    * chosen so the sf corpus exercises every branch). */
  /** First-failing-rule reason code for [[corpusFilter]] — shared with
    * the mixture report so thresholds live in exactly one expression. */
  def filterReason(textCol: Column, minWords: Int, minStopRatio: Double,
                   maxDupFrac: Double): Column = {
    val w = split(textCol, " ")
    reasonFromCounts(size(w),
      size(filter(w, x =>
        x.isin(stopwords.map(_.asInstanceOf[Any]): _*))),
      size(array_distinct(w)), minWords, minStopRatio, maxDupFrac)
  }

  /** The rule chain of [[filterReason]] over PRE-COMPUTED counts — the
    * single source of the thresholds for both the expression route
    * ([[filterReason]], pushdown-friendly) and the kernel route
    * ([[graft.functions.TokenCountKernel.tokenStats]] feeds this in
    * `corpus_filter`/`corpus_report`). Ratio divisions go through
    * Spark's `/` (always double, int or long inputs alike), matching
    * the oracle's BIGINT/BIGINT → double. */
  def reasonFromCounts(nW: Column, stopCnt: Column, nDistinct: Column,
                       minWords: Int, minStopRatio: Double,
                       maxDupFrac: Double): Column =
    when(nW < minWords, "too_short")
      .when(stopCnt / nW < minStopRatio, "low_stopword")
      .when(lit(1) - nDistinct / nW > maxDupFrac, "repetitive")
      .otherwise("kept")

  /** C4-style corpus filter verdict per doc. PRECONDITION (r9.3): rows
    * with null `textCol` must be filtered upstream — the token-stats
    * kernel fails loudly on them, where the pre-r9.3 expression route
    * silently passed a null-countered row through as "kept". */
  def corpusFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int, minStopRatio: Double,
                   maxDupFrac: Double): DataFrame = {
    // kernel route: one char scan per doc for all three counts (the
    // expression route re-walked the token array three times — split +
    // interpreted filter + array_distinct); thresholds still live only
    // in reasonFromCounts. Stays map-only (PlanShapeSpec pin: 0
    // shuffles).
    val st = graft.functions.TokenCountKernel.tokenStats(
      df.select(col(idCol), col(textCol)), textCol, stopwords,
      "__nw", "__sc", "__nd")
    val reason = reasonFromCounts(col("__nw"), col("__sc"), col("__nd"),
      minWords, minStopRatio, maxDupFrac)
    st.select(col(idCol), col("__nw").cast("int").as("n_words"),
      reason.as("reason"),
      (reason === "kept").cast("int").as("keep"))
  }

  /** (id, line_hash) pairs for C4-style line dedup, as a typed byte
    * kernel (the dedup_spans recipe): one getBytes + one boundary scan
    * + one reused MD5 digest per doc replaces regexp split + explode +
    * per-line md5 expression evaluation, each of which allocated the
    * line as a row value before hashing it. Semantics are EXACTLY
    * `md5(explode(split(textCol, "\\. ")))` filtered to lines of
    * ≥ `minCp` code points: the byte scan cuts at each '.'+' ' pair
    * and resumes AFTER the separator, reproducing split's
    * leftmost-first non-overlapping matches (both separator bytes are
    * ASCII, so they never alias a UTF-8 continuation byte), and the
    * code-point count — non-continuation bytes of the slice — equals
    * Spark `length()` (numChars) and DuckDB `length`. Lines never
    * leave the kernel: only (16-byte hash, id) pairs flow downstream
    * (PropertySpec pins byte-kernel ≡ expression route on generated
    * unicode corpora). Null text rows must be filtered upstream.
    *
    * @return (idCol long, "line_hash" string) — map-only, no shuffle
    */
  private[operators] def lineHashPairs(df: DataFrame, idCol: String,
                                       textCol: String,
                                       minCp: Int): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val textIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("line_hash", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = java.util.HexFormat.of() // lowercase by default
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getString(textIdx)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        var start = 0
        var i = 0
        while (i <= bytes.length) {
          val atSep = i < bytes.length - 1 &&
            bytes(i) == '.' && bytes(i + 1) == ' '
          if (i == bytes.length || atSep) {
            // code points = bytes that are not 10xxxxxx
            var cp = 0
            var j = start
            while (j < i) {
              if ((bytes(j) & 0xC0) != 0x80) cp += 1
              j += 1
            }
            if (cp >= minCp) {
              md.reset()
              md.update(bytes, start, i - start)
              out += org.apache.spark.sql.Row(id,
                hex.formatHex(md.digest()))
            }
            if (atSep) { start = i + 2; i += 2 } else i += 1
          } else i += 1
        }
        out.iterator
      }
    }(enc)
  }

  /** Deterministic per-source downsampling — the mixture-reweighting
    * step of a pre-training pipeline (hold back over-represented web
    * sources, keep books/reference at full rate). Keep decision is
    * `mixKey(id) mod 1e6 < rate(source)·1e6`: pure integer arithmetic
    * (RelationalOps.mixKey), so the SAME rows survive in any engine, on
    * any partitioning, under any retry — no `rand()`, no RNG state.
    * Map-only; the rate lookup is an expression over the source name
    * (callers with a source→rate dim table broadcast-join it instead). */
  def sourceMixSample(df: DataFrame, idCol: String,
                      rateMillionths: Column): DataFrame =
    df.where(RelationalOps.mixKey(col(idCol)) % lit(1000000L)
      < rateMillionths)

  /** Planted eval set for the contamination gates (pii_scrub pattern,
    * negative ids disjoint from real doc_ids at any scale): every 25th
    * doc's 12-word prefix re-enters as a CONTAMINATED eval doc (a
    * prefix's 3-grams are a subset of the source doc's), and docs ≡7
    * (mod 25) contribute a CLEAN eval doc of id-derived tokens that
    * exist nowhere in the corpus — both branches of the measurement
    * exercised and hash-checked. */
  private[graft] def plantedEval(base: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val contam = base.where(col("doc_id") % 25 === 0)
      .select((-col("doc_id") - 1).as("eval_id"),
        concat_ws(" ", slice(w, lit(1), lit(12))).as("text"))
    val clean = base.where(col("doc_id") % 25 === 7)
      .select((-col("doc_id") - 1).as("eval_id"),
        concat_ws(" ", (0 until 8).map(i =>
          concat(lit("q"), col("doc_id").cast("string"),
            lit(s"x$i"))): _*).as("text"))
    contam.unionByName(clean)
  }

  /** DuckDB replay of [[plantedEval]] + [[contaminationCheck]] — shared
    * verbatim by the exact and Bloom gate entries (their outputs are
    * identical by construction; the shared oracle enforces it). */
  private val contamOracleSql: String =
    "WITH ev AS (SELECT -doc_id - 1 AS eval_id, " +
      "array_to_string(string_split(text, ' ')[1:12], ' ') AS text " +
      "FROM documents WHERE text IS NOT NULL AND doc_id % 25 = 0 " +
      "UNION ALL SELECT -doc_id - 1, " +
      (0 until 8).map(i => s"'q' || doc_id || 'x$i'")
        .mkString("", " || ' ' || ", " ") +
      "FROM documents WHERE text IS NOT NULL AND doc_id % 25 = 7), " +
      "evw AS (SELECT eval_id, string_split(text, ' ') AS w FROM ev " +
      "WHERE len(string_split(text, ' ')) >= 3), " +
      "evs AS (SELECT eval_id, md5(unnest(list_distinct(" +
      "[array_to_string(w[x:x+2], ' ') FOR x IN range(1, len(w) - 1)]" +
      "))) AS h FROM evw), " +
      "tw AS (SELECT string_split(text, ' ') AS w FROM documents " +
      "WHERE text IS NOT NULL " +
      "AND len(string_split(text, ' ')) >= 3), " +
      "ts AS (SELECT DISTINCT md5(unnest(list_distinct(" +
      "[array_to_string(w[x:x+2], ' ') FOR x IN range(1, len(w) - 1)]" +
      "))) AS h FROM tw) " +
      "SELECT eval_id, COUNT(*) AS n_shingles, COUNT(ts.h) AS n_hits, " +
      "ROUND(COUNT(ts.h) / COUNT(*), 6) AS contam_frac, " +
      "CAST(COUNT(ts.h) > 0 AS INT) AS is_contaminated " +
      "FROM evs LEFT JOIN ts ON evs.h = ts.h GROUP BY eval_id"

  val defs: Map[String, QDef] = Map(

    // Exact dedup: hash-groupBy on content hash; keep lowest doc_id.
    // At 100 TB the md5 shuffles 16 bytes/row instead of the document.
    "dedup_exact" -> QDef(
      (s, d) => docs(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
          count("*").as("dup_count")),
      "SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, " +
        "COUNT(*) AS dup_count FROM documents GROUP BY md5(text)"),

    // Sub-document exact dedup (the C4 pipeline's line-level pass:
    // boilerplate sentences recur VERBATIM across pages — nav text,
    // disclaimers, licenses — and doc-level dedup never sees them).
    // Sentences that appear in ≥ 2 DISTINCT documents, with counts:
    // explode is map-side; the one shuffle groups 16-byte md5 keys,
    // never sentence text; distinct doc attribution via a pre-distinct
    // (sentence, doc) projection so a sentence repeated within one doc
    // doesn't inflate n_docs. A removal pass is then a broadcast
    // semi-join of this (small) relation against the exploded corpus.
    // The synthetic corpus has no naturally repeated sentences, which
    // would make this a vacuous 0-row green — so every 10th document
    // re-enters under a negative id (the standard probe construction):
    // each of its ≥20-char sentences then provably crosses documents,
    // and the oracle replays the identical union, keeping the full
    // (not closed-form) check non-empty.
    "dedup_lines" -> QDef(
      (s, d) => {
        val base = docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val probes = base.where(col("doc_id") % 10 === 0)
          .select((-col("doc_id") - 1).as("doc_id"), col("text"))
        lineHashPairs(base.unionByName(probes), "doc_id", "text", 20)
          .groupBy(col("line_hash"))
          .agg(count_distinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"))
          .where(col("n_docs") >= 2)
      },
      "SELECT md5(line) AS line_hash, COUNT(DISTINCT doc_id) AS " +
        "n_docs, MIN(doc_id) AS first_doc FROM (SELECT doc_id, " +
        "UNNEST(string_split_regex(text, '\\. ')) AS line FROM (" +
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL " +
        "UNION ALL SELECT -doc_id - 1, text FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 10 = 0)) " +
        "WHERE length(line) >= 20 " +
        "GROUP BY md5(line) HAVING COUNT(DISTINCT doc_id) >= 2"),

    // Exact duplicated-SPAN detection (the exact-substring-dedup idea of
    // Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    // Better", re-expressed distributed): every 15-token window (stride
    // 1) is hashed; windows whose hash appears in ≥ 2 DISTINCT documents
    // are reported. Stride 1 makes detection shift-invariant — a copied
    // run ≥ 15 tokens is caught at ANY offset. The planted probes
    // re-enter every 10th doc MINUS ITS FIRST 3 TOKENS under a negative
    // id to prove exactly that: dedup_lines' whole-sentence pass misses
    // such spliced copies, this pass provably catches them. Cost is the
    // documented trade vs a single-machine suffix array: ~n_tokens
    // exploded rows, but each shuffled row is a (16-byte md5, doc_id)
    // pair — the span TEXT never shuffles — with map-side partial
    // aggregation on the hash key. A removal pass is then a broadcast
    // semi-join of this (small) relation against the re-exploded corpus,
    // exactly as in dedup_lines.
    "dedup_spans" -> QDef(
      (s, d) => {
        val k = 15
        // Span hashing as a typed byte kernel, not
        // md5(array_join(slice(...))): joining a contiguous slice of
        // split(text, " ") with " " reproduces EXACTLY the substring
        // of the original text between the corresponding space
        // positions (split-on-a-char/rejoin identity — empty tokens
        // from repeated spaces included), so each span's md5 can be
        // computed over a byte RANGE of the document's UTF-8 bytes
        // (space = 0x20 never occurs in continuation bytes). One
        // getBytes + one boundary scan + one reused MessageDigest per
        // doc replaces ~n_tokens slice/join/md5 expression
        // evaluations, each of which allocated a span string and a
        // fresh digest — measured 7.9 s -> 4.6 s at the sf1 tier
        // (the remainder is the distinct-agg shuffle, which carries
        // (16-byte hash, doc_id) pairs and scales as designed).
        // skip=3 implements the spliced-copy probe (drop the first 3
        // tokens) by starting the boundary walk at word 4 — the same
        // bytes the old slice(w, 4, ...) path hashed.
        val base = docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), col("text"), lit(0).as("skip"))
        // negative probe ids: disjoint from real doc_ids at any scale
        val probes = base.where(col("doc_id") % 10 === 0)
          .select((-col("doc_id") - 1).as("doc_id"), col("text"),
            lit(3).as("skip"))
        val outSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("span_hash",
            org.apache.spark.sql.types.StringType)))
        val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
          .encoderFor(outSchema)
        val hashes = base.unionByName(probes).mapPartitions { rows =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = java.util.HexFormat.of() // lowercase by default
          rows.flatMap { r =>
            val id = r.getLong(0)
            val bytes = r.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val skip = r.getInt(2)
            // word j (0-based) spans [starts(j), ends(j)) in bytes.
            // Primitive Array[Int] (count pass + fill pass), not an
            // ArrayBuffer[Int]: the buffer boxes every boundary index
            // — one Integer per token — in the loop this kernel
            // exists to make allocation-free.
            var spaces = 0
            var i = 0
            while (i < bytes.length) {
              if (bytes(i) == ' ') spaces += 1
              i += 1
            }
            val starts = new Array[Int](spaces + 1)
            starts(0) = 0
            var j = 1
            i = 0
            while (i < bytes.length) {
              if (bytes(i) == ' ') { starts(j) = i + 1; j += 1 }
              i += 1
            }
            val n = starts.length - skip // tokens after the probe skip
            if (n < k) Iterator.empty
            else (0 to n - k).iterator.map { w0 =>
              val from = starts(skip + w0)
              val until = if (skip + w0 + k < starts.length)
                starts(skip + w0 + k) - 1 // up to the separating space
              else bytes.length
              md.reset()
              md.update(bytes, from, until - from)
              org.apache.spark.sql.Row(id, hex.formatHex(md.digest()))
            }
          }
        }(enc)
        hashes
          .groupBy(col("span_hash"))
          .agg(count_distinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"),
            count("*").as("n_occ"))
          .where(col("n_docs") >= 2)
      },
      "WITH b AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents WHERE text IS NOT NULL " +
        "UNION ALL SELECT -doc_id - 1, w[4:len(w)] FROM (" +
        "SELECT doc_id, string_split(text, ' ') AS w FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 10 = 0)), " +
        "e AS (SELECT doc_id, md5(array_to_string(w[i:i+14], ' ')) " +
        "AS span_hash FROM (SELECT doc_id, w, " +
        "UNNEST(range(1, len(w) - 15 + 2)) AS i FROM b " +
        "WHERE len(w) >= 15)) " +
        "SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs, " +
        "MIN(doc_id) AS first_doc, COUNT(*) AS n_occ FROM e " +
        "GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2"),

    // Near-dup detection: word-3-gram Jaccard with (lang, length-bucket)
    // blocking. Blocking bounds the pair count — the all-pairs join is
    // replaced by a per-bucket join, which is the scalable shape (same
    // idea as LSH banding; MinHashLSH in Dedup.scala is the probabilistic
    // variant for when buckets are still too big).
    "dedup_ngram_jaccard" -> QDef(
      (s, d) => {
        val base = docs(s, d)
          .where(size(split(col("text"), " ")) >= 3)
          .select(col("doc_id").as("id"), col("lang"),
            floor(col("n_chars") / 50).as("len_bucket"),
            shingles3(col("text")).as("sh"))
          .withColumn("n", size(col("sh")))
        // Inverted-index exact join (Dedup.pairIntersectionCounts):
        // intersection sizes come from a codegen'd join+count over the
        // exploded shingles, then |A∪B| = |A|+|B|-i. Pairs sharing no
        // shingle never materialize (they can't pass j ≥ 0.6 anyway).
        Dedup.pairIntersectionCounts(base, Seq("lang", "len_bucket"))
          .withColumn("jac",
            col("i") / (col("a_n") + col("b_n") - col("i")))
          .where(col("jac") >= 0.6)
          .select(col("a_id"), col("b_id"), round(col("jac"), 6)
            .as("jaccard"))
      },
      "WITH docs AS (SELECT doc_id, lang, n_chars // 50 AS len_bucket, " +
        "string_split(text, ' ') AS w FROM documents " +
        "WHERE len(string_split(text, ' ')) >= 3), " +
        "sh AS (SELECT doc_id, lang, len_bucket, " +
        "list_distinct([array_to_string(w[x:x+2], ' ') " +
        "FOR x IN range(1, len(w) - 1)]) AS s FROM docs), " +
        "p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "len(list_intersect(a.s, b.s)) / " +
        "len(list_distinct(list_concat(a.s, b.s))) AS jac " +
        "FROM sh a JOIN sh b ON a.lang = b.lang " +
        "AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id) " +
        "SELECT a_id, b_id, ROUND(jac, 6) AS jaccard FROM p " +
        "WHERE jac >= 0.6"),

    // Token counting: whitespace tokens + BPE-ish regex token count.
    // The NOT NULL guard (here and in quality_score/lang_id) pins a
    // latent engine divergence: with ANSI off, Spark's size(NULL)
    // returns -1 where DuckDB's len(NULL) is NULL — a null text row
    // would hash-mismatch three queries at once. Null docs carry no
    // token signal; excluding them is also the right pipeline
    // semantics.
    // RAG/pretraining document chunking: overlapping windows of 50
    // single-space tokens at stride 40 — one row per (doc, chunk),
    // entirely map-side (explode of a computed index range + slice;
    // no shuffle, no UDF, survives any corpus size). Single-space
    // split (not \s+) is the SQL-parity tokenization, as in
    // token_count's n_tokens_ws.
    "doc_chunk" -> QDef(
      (s, d) => {
        val win = 50
        val stride = 40
        docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.chunkIndices(
              size(col("w")), win, stride)).as("chunk_idx"),
            col("w"))
          .select(col("doc_id"), col("chunk_idx"),
            array_join(slice(col("w"),
              col("chunk_idx") * stride + 1, lit(win)), " ")
              .as("chunk_text"))
      },
      "WITH d AS (SELECT doc_id, string_split(text, ' ') AS w " +
        "FROM documents WHERE text IS NOT NULL), " +
        "c AS (SELECT doc_id, w, UNNEST(range(0, " +
        "CAST(FLOOR((GREATEST(len(w) - 50, 0) + 39) / 40.0) AS INT) " +
        "+ 1)) AS i FROM d) " +
        "SELECT doc_id, CAST(i AS INT) AS chunk_idx, " +
        "array_to_string(w[i*40 + 1 : i*40 + 50], ' ') AS chunk_text " +
        "FROM c"),

    "token_count" -> QDef(
      (s, d) => docs(s, d).where(col("text").isNotNull).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens_ws"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .as("n_tokens_re"),
        length(col("text")).as("n_chars_calc")),
      "SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_ws, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) " +
        "AS INT) AS n_tokens_re, " +
        "CAST(length(text) AS INT) AS n_chars_calc FROM documents " +
        "WHERE text IS NOT NULL"),

    // Quality scoring: length + stopword-ratio heuristic
    // (C4/Gopher-style rules re-expressed as one projection).
    // Quality signals: length, stopword ratio, and word-repetition
    // ratio (distinct/total — low values flag boilerplate/spam), the
    // C4/Gopher-style rules as one projection.
    "quality_score" -> QDef(
      (s, d) => {
        val w = split(col("text"), " ")
        val nWords = size(w)
        val stopCnt = size(filter(w, x =>
          x.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
        val stopRatio = stopCnt / nWords
        val repRatio = size(array_distinct(w)) / nWords
        val quality = least(lit(1.0), nWords / lit(200.0)) * 0.4 +
          stopRatio * 0.3 + repRatio * 0.3
        docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), nWords.as("n_words"),
          stopCnt.as("stop_cnt"),
          round(stopRatio, 6).as("stop_ratio"),
          round(repRatio, 6).as("rep_ratio"),
          round(quality, 6).as("quality"))
      },
      "WITH q AS (SELECT doc_id, " +
        "len(string_split(text, ' ')) AS n_words, " +
        "len(list_filter(string_split(text, ' '), x -> x IN " +
        stopwords.mkString("('", "','", "')") + ")) AS stop_cnt, " +
        "len(list_distinct(string_split(text, ' '))) AS n_distinct " +
        "FROM documents WHERE text IS NOT NULL) " +
        "SELECT doc_id, CAST(n_words AS INT) AS n_words, " +
        "CAST(stop_cnt AS INT) AS stop_cnt, " +
        "ROUND(stop_cnt / n_words, 6) AS stop_ratio, " +
        "ROUND(n_distinct / n_words, 6) AS rep_ratio, " +
        "ROUND(LEAST(1.0, n_words / 200.0) * 0.4 + " +
        "(stop_cnt / n_words) * 0.3 + (n_distinct / n_words) * 0.3, 6) " +
        "AS quality FROM q"),

    // Gopher HARD document-filter rules (Rae et al. 2021, Table A1) as
    // one narrow projection of per-rule flags plus the measured signals
    // — the rule gate that runs before any model-based quality scoring
    // (quality_classifier_probe is the model half; this is the rule
    // half). Published constants are kept even where this synthetic
    // corpus cannot fail them (mean-word-length in [3,10], ≥80%
    // alphabetic words): their VALUES still vary per row and are
    // hash-checked, so the arithmetic is gated either way; the
    // word-count (≥25) and ≥2-stopword rules genuinely split this
    // corpus. Mean word length is (chars − spaces) / words — exact
    // under single-space tokenization, pure int→double arithmetic in
    // both engines. Map-only: pushes onto the scan, survives any
    // corpus size; the keep column makes the removal pass a trivial
    // filter.
    "gopher_filter" -> QDef(
      (s, d) => {
        val w = split(col("text"), " ")
        val nW = size(w)
        val meanLen = (length(col("text")) - (nW - 1)) / nW
        val alphaFrac = size(filter(w, x => x.rlike("[A-Za-z]"))) / nW
        val stopCnt = size(filter(w, x =>
          x.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
        val rLen = nW >= 25 && nW <= 100000
        val rMean = meanLen >= 3 && meanLen <= 10
        val rAlpha = alphaFrac >= 0.8
        val rStop = stopCnt >= 2
        docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"), nW.as("n_words"),
            round(meanLen, 6).as("mean_word_len"),
            round(alphaFrac, 6).as("alpha_frac"),
            stopCnt.as("stop_cnt"),
            rLen.cast("int").as("r_len"),
            rMean.cast("int").as("r_mean_len"),
            rAlpha.cast("int").as("r_alpha"),
            rStop.cast("int").as("r_stop"),
            (rLen && rMean && rAlpha && rStop).cast("int").as("keep"))
      },
      "WITH q AS (SELECT doc_id, length(text) AS nc, " +
        "string_split(text, ' ') AS w FROM documents " +
        "WHERE text IS NOT NULL), " +
        "r AS (SELECT doc_id, len(w) AS n_words, " +
        "(nc - (len(w) - 1)) / len(w) AS mean_word_len, " +
        "len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) " +
        "/ len(w) AS alpha_frac, " +
        "len(list_filter(w, x -> x IN " +
        stopwords.mkString("('", "','", "')") + ")) AS stop_cnt " +
        "FROM q) " +
        "SELECT doc_id, CAST(n_words AS INT) AS n_words, " +
        "ROUND(mean_word_len, 6) AS mean_word_len, " +
        "ROUND(alpha_frac, 6) AS alpha_frac, " +
        "CAST(stop_cnt AS INT) AS stop_cnt, " +
        "CAST(n_words >= 25 AND n_words <= 100000 AS INT) AS r_len, " +
        "CAST(mean_word_len >= 3 AND mean_word_len <= 10 AS INT) " +
        "AS r_mean_len, " +
        "CAST(alpha_frac >= 0.8 AS INT) AS r_alpha, " +
        "CAST(stop_cnt >= 2 AS INT) AS r_stop, " +
        "CAST(n_words >= 25 AND n_words <= 100000 AND " +
        "mean_word_len >= 3 AND mean_word_len <= 10 AND " +
        "alpha_frac >= 0.8 AND stop_cnt >= 2 AS INT) AS keep " +
        "FROM r"),

    // PII scrubbing (C4/Dolma-style cleaning): emails and URLs are
    // replaced with placeholder tokens and the replacement counts kept
    // for audit — the standard pre-training redaction pass. Patterns
    // are restricted to syntax with identical semantics in Java regex
    // and RE2 (no backrefs/lookaround) so the DuckDB oracle replays
    // them exactly. The synthetic corpus contains no natural emails or
    // URLs, which would make the gate vacuous — so every 20th doc
    // re-enters with planted PII built from its id (same construction
    // in both engines), giving the scrub real positives to hash-check.
    // One narrow projection; at 100 TB this is a map-only pass that
    // pushes straight down onto the scan.
    "pii_scrub" -> QDef(
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val url = "https?://[^\\s]+"
        // negative probe ids: disjoint from real doc_ids at any scale
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val probes = base.where(col("doc_id") % 20 === 0)
          .select((-col("doc_id") - 1).as("doc_id"),
            concat(lit("mail u"), col("doc_id").cast("string"),
              lit("@example.com or see https://ex.org/d/"),
              col("doc_id").cast("string"), lit(" now")).as("text"))
        base.unionByName(probes).select(
          col("doc_id"),
          regexp_count(col("text"), lit(email)).as("n_emails"),
          regexp_count(col("text"), lit(url)).as("n_urls"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            url, "<URL>").as("clean_text"))
      },
      "WITH u AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT -doc_id - 1, " +
        "'mail u' || doc_id || '@example.com or see https://ex.org/d/' " +
        "|| doc_id || ' now' FROM documents WHERE doc_id % 20 = 0) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) " +
        "AS n_emails, " +
        "CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS INT) " +
        "AS n_urls, " +
        "regexp_replace(regexp_replace(text, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', " +
        "'g'), 'https?://[^\\s]+', '<URL>', 'g') AS clean_text " +
        "FROM u"),

    // Language-ID: stopword-marker scoring with deterministic argmax.
    // (The heuristic library version with char n-grams lives in
    // functions.TextFunctions; this is the SQL-checkable core.)
    // Marker counting is the [[graft.functions.TokenCountKernel]]
    // byte kernel — the old split + filter(x.isin(...)) HOF form
    // evaluated ~n_tokens interpreted lambdas per doc per language
    // (6× the sf1 columnar baseline); one byte pass counts all 12
    // markers. A set score is the exact integer sum of its (distinct)
    // members' token counts, so s_en..s_es and the argmax are
    // value-identical to the filter form. Map-only, zero shuffle.
    "lang_id" -> QDef(
      (s, d) => {
        val sets = Seq(
          Seq("the", "a", "of"), Seq("le", "la", "et"),
          Seq("der", "und", "die"), Seq("el", "y", "los"))
        val terms = sets.flatten
        val counted = graft.functions.TokenCountKernel.tokenCounts(
          docs(s, d).where(col("text").isNotNull)
            .select(col("doc_id"), col("lang"), col("text")),
          "text", terms, "__dl", terms.indices.map(i => s"__c$i"))
        val offs = sets.scanLeft(0)(_ + _.length)
        def score(k: Int) =
          (offs(k) until offs(k + 1)).map(i => col(s"__c$i"))
            .reduce(_ + _).cast("int")
        val sEn = score(0); val sFr = score(1)
        val sDe = score(2); val sEs = score(3)
        val m = greatest(sEn, sFr, sDe, sEs)
        val pred = when(sEn === m, "en").when(sFr === m, "fr")
          .when(sDe === m, "de").otherwise("es")
        counted.select(col("doc_id"), sEn.as("s_en"), sFr.as("s_fr"),
          sDe.as("s_de"), sEs.as("s_es"), pred.as("pred_lang"),
          (pred === col("lang")).cast("int").as("is_correct"))
      },
      "WITH sc AS (SELECT doc_id, lang, " +
        "len(list_filter(string_split(text,' '), x -> x IN " +
        "('the','a','of'))) AS s_en, " +
        "len(list_filter(string_split(text,' '), x -> x IN " +
        "('le','la','et'))) AS s_fr, " +
        "len(list_filter(string_split(text,' '), x -> x IN " +
        "('der','und','die'))) AS s_de, " +
        "len(list_filter(string_split(text,' '), x -> x IN " +
        "('el','y','los'))) AS s_es " +
        "FROM documents WHERE text IS NOT NULL), " +
        "p AS (SELECT *, GREATEST(s_en, s_fr, s_de, s_es) AS m, " +
        "CASE WHEN s_en = GREATEST(s_en,s_fr,s_de,s_es) THEN 'en' " +
        "WHEN s_fr = GREATEST(s_en,s_fr,s_de,s_es) THEN 'fr' " +
        "WHEN s_de = GREATEST(s_en,s_fr,s_de,s_es) THEN 'de' " +
        "ELSE 'es' END AS pred_lang FROM sc) " +
        "SELECT doc_id, CAST(s_en AS INT) AS s_en, " +
        "CAST(s_fr AS INT) AS s_fr, CAST(s_de AS INT) AS s_de, " +
        "CAST(s_es AS INT) AS s_es, pred_lang, " +
        "CAST(pred_lang = lang AS INT) AS is_correct FROM p"),

    // Within-document repetition signals (see [[repStats]]): high values
    // flag boilerplate/template spam for the quality filter.
    "rep_stats" -> QDef(
      (s, d) => repStats(
        docs(s, d).where(col("text").isNotNull &&
          size(split(col("text"), " ")) >= 2),
        "doc_id", "text"),
      "WITH q AS (SELECT doc_id, string_split(text, ' ') AS w, " +
        "length(text) AS nc FROM documents WHERE text IS NOT NULL " +
        "AND len(string_split(text, ' ')) >= 2), " +
        "b AS (SELECT doc_id, w, nc, " +
        "[array_to_string(w[x:x+1], ' ') FOR x IN range(1, len(w))] " +
        "AS bg FROM q) " +
        "SELECT doc_id, CAST(len(w) AS INT) AS n_words, " +
        "ROUND(1 - len(list_distinct(w)) / len(w), 6) AS dup_word_frac, " +
        "ROUND(1 - len(list_distinct(bg)) / len(bg), 6) " +
        "AS dup_2gram_frac, " +
        "ROUND(list_max([len(list_filter(bg, x -> x = g)) * length(g) " +
        "FOR g IN list_distinct(bg)]) / nc, 6) AS top_2gram_char_frac " +
        "FROM b"),

    // Train/eval contamination check (see [[contaminationCheck]]). The
    // synthetic corpus has no natural eval set, so the gate plants one
    // (pii_scrub pattern, negative ids): every 25th doc's 12-word prefix
    // re-enters as a CONTAMINATED eval doc (a prefix's 3-grams are a
    // subset of the source doc's), and docs ≡7 (mod 25) contribute a
    // CLEAN eval doc of id-derived tokens that exist nowhere in the
    // corpus — both branches of the measurement exercised and
    // hash-checked.
    "contamination_check" -> QDef(
      (s, d) => {
        val base = docs(s, d).where(col("text").isNotNull)
        contaminationCheck(plantedEval(base), base, "eval_id", "text")
      },
      contamOracleSql),

    // The Bloom-prefiltered scale path ([[contaminationCheckBloom]])
    // under the SAME oracle as the exact form — the gate hash-checks
    // that the prefilter changed cost, not answers, on the full
    // planted corpus.
    "contamination_check_bloom" -> QDef(
      (s, d) => {
        val base = docs(s, d).where(col("text").isNotNull)
        // Filter sizing from a one-pass aggregate of the true word
        // count: distinct train shingles ≤ total words, always — the
        // previous sum(n_chars)/4 proxy assumed words average >4
        // chars, which silently UNDERSIZES the filter on short-token
        // corpora (codes, CJK-style segmentation) and reopens the
        // saturating-filter trap buildBloom documents.
        val hint = math.max(1000000L,
          base.agg(coalesce(
            sum(size(split(col("text"), " ")).cast("long")), lit(0L)))
            .head.getLong(0))
        contaminationCheckBloom(plantedEval(base), base, "eval_id",
          "text", expectedItems = hint)
      },
      contamOracleSql),

    // FUZZY train/eval contamination ([[Dedup.crossMinhashMatches]]):
    // the near-duplicate form real decontamination needs — an eval doc
    // lightly edited from a training doc slips past the exact n-gram
    // check above, but not past word-3-gram Jaccard ≥ 0.8. Planted
    // eval set (negative-id pattern): every 25th doc re-enters MINUS
    // ITS LAST TWO WORDS — Jaccard (W−4)/(W−2) against its source, so
    // the corpus's own word-count spread puts some evals above 0.8
    // (W ≥ 12) and some below (W ≤ 11), exercising both branches;
    // docs ≡7 (mod 25) plant clean never-matching evals. The oracle
    // recomputes the EXACT all-cross-pairs answer, so the hash gate
    // checks LSH recall (16 bands × 2 rows: θ=0.8 miss p ≈ 9·10⁻⁸)
    // and the verify math at once — same doctrine as
    // dedup_minhash_lsh.
    "contamination_minhash" -> QDef(
      (s, d) => {
        val base = docs(s, d).where(col("text").isNotNull)
        val w = split(col("text"), " ")
        val contam = base.where(col("doc_id") % 25 === 0)
          .select((-col("doc_id") - 1).as("eval_id"),
            // greatest(...,0): slice throws on negative length, so a
            // 1-word doc must clamp to the empty plant (the oracle
            // clamps identically — DuckDB's l[1:-1] would otherwise
            // keep the WHOLE list on that input)
            concat_ws(" ",
              slice(w, lit(1), greatest(size(w) - 2, lit(0))))
              .as("text"))
        val clean = base.where(col("doc_id") % 25 === 7)
          .select((-col("doc_id") - 1).as("eval_id"),
            concat_ws(" ", (0 until 8).map(i =>
              concat(lit("q"), col("doc_id").cast("string"),
                lit(s"x$i"))): _*).as("text"))
        Dedup.crossMinhashMatches(contam.unionByName(clean),
          base.select(col("doc_id"), col("text")),
          "eval_id", "doc_id", "text", threshold = 0.8)
          .select(col("eval_id"), col("train_id").as("doc_id"),
            round(col("jaccard"), 6).as("jaccard"))
      },
      "WITH base AS (SELECT doc_id, text FROM documents " +
        "WHERE text IS NOT NULL), " +
        "ev AS (SELECT -doc_id - 1 AS eval_id, " +
        "array_to_string(ww[1:greatest(len(ww)-2, 0)], ' ') AS text " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS ww " +
        "FROM base) WHERE doc_id % 25 = 0 " +
        "UNION ALL SELECT -doc_id - 1, " +
        (0 until 8).map(i => s"'q' || doc_id || 'x$i'")
          .mkString("", " || ' ' || ", " ") +
        "FROM base WHERE doc_id % 25 = 7), " +
        "evs AS (SELECT eval_id, list_distinct(" +
        "[array_to_string(w[x:x+2], ' ') FOR x IN " +
        "range(1, len(w) - 1)]) AS s FROM (SELECT eval_id, " +
        "string_split(text, ' ') AS w FROM ev) WHERE len(w) >= 3), " +
        "ts AS (SELECT doc_id, list_distinct(" +
        "[array_to_string(w[x:x+2], ' ') FOR x IN " +
        "range(1, len(w) - 1)]) AS s FROM (SELECT doc_id, " +
        "string_split(text, ' ') AS w FROM base) WHERE len(w) >= 3), " +
        "p AS (SELECT eval_id, doc_id, " +
        "len(list_intersect(e.s, t.s)) AS i, len(e.s) AS na, " +
        "len(t.s) AS nb FROM evs e CROSS JOIN ts t) " +
        "SELECT eval_id, doc_id, ROUND(i / (na + nb - i), 6) " +
        "AS jaccard FROM p WHERE i / (na + nb - i) >= 0.8"),

    // Composed C4-style filter chain (see [[corpusFilter]]): every doc
    // gets a keep flag + stable first-failing-rule reason code.
    "corpus_filter" -> QDef(
      (s, d) => corpusFilter(docs(s, d).where(col("text").isNotNull),
        "doc_id", "text", 20, 0.03, 0.65),
      "WITH q AS (SELECT doc_id, " +
        "len(string_split(text, ' ')) AS n_words, " +
        "len(list_filter(string_split(text, ' '), x -> x IN " +
        stopwords.mkString("('", "','", "')") + ")) AS stop_cnt, " +
        "len(list_distinct(string_split(text, ' '))) AS n_distinct " +
        "FROM documents WHERE text IS NOT NULL), " +
        "r AS (SELECT doc_id, n_words, " +
        "CASE WHEN n_words < 20 THEN 'too_short' " +
        "WHEN stop_cnt / n_words < 0.03 THEN 'low_stopword' " +
        "WHEN 1 - n_distinct / n_words > 0.65 THEN 'repetitive' " +
        "ELSE 'kept' END AS reason FROM q) " +
        "SELECT doc_id, CAST(n_words AS INT) AS n_words, reason, " +
        "CAST(reason = 'kept' AS INT) AS keep FROM r"),

    // Source-mixture downsampling (see [[sourceMixSample]]): rate
    // derived from the numeric source suffix (n%4+1)/4 so the gate
    // exercises four distinct rates incl. keep-all; the keep set is
    // closed-form integer arithmetic, bit-identical in DuckDB.
    "source_mix_sample" -> QDef(
      (s, d) => {
        val srcNum = substring(col("source"), 4, 10).cast("int")
        sourceMixSample(docs(s, d), "doc_id",
          (srcNum % 4 + 1).cast("long") * lit(250000L))
          .select(col("doc_id"), col("source"),
            ((srcNum % 4 + 1).cast("double") / 4).as("rate"))
      },
      "SELECT doc_id, source, " +
        "CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) / 4 " +
        "AS rate FROM documents " +
        "WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 " +
        "% 1000000 < (CAST(substr(source, 4) AS INT) % 4 + 1) * 250000"),

    // Corpus mixture report: per-(source, lang) doc/token counts and
    // the post-filter survival rate — the reporting step that drives
    // mixture-rate decisions ([[sourceMixSample]]). One scan, one
    // partial-aggregated shuffle of (source, lang) rows; thresholds
    // shared with corpus_filter via [[reasonFromCounts]], counts from
    // the one-pass [[graft.functions.TokenCountKernel.tokenStats]]
    // kernel (the HOF form re-walked each doc's token array three
    // times — 2.3× the sf1 columnar baseline; the kernel also folds
    // the separate n_tokens split into the same scan).
    "corpus_report" -> QDef(
      (s, d) => {
        val st = graft.functions.TokenCountKernel.tokenStats(
          docs(s, d).where(col("text").isNotNull)
            .select(col("source"), col("lang"), col("text")),
          "text", stopwords, "__nw", "__sc", "__nd")
        val keep = (reasonFromCounts(col("__nw"), col("__sc"),
          col("__nd"), 20, 0.03, 0.65) === "kept").cast("int")
        st.groupBy(col("source"), col("lang"))
          .agg(count("*").as("n_docs"),
            sum(col("__nw")).as("n_tokens"),
            sum(keep).as("n_kept"),
            round(sum(keep) / count("*"), 6).as("kept_frac"))
      },
      "WITH q AS (SELECT source, lang, " +
        "len(string_split(text, ' ')) AS n_words, " +
        "len(list_filter(string_split(text, ' '), x -> x IN " +
        stopwords.mkString("('", "','", "')") + ")) AS stop_cnt, " +
        "len(list_distinct(string_split(text, ' '))) AS n_distinct " +
        "FROM documents WHERE text IS NOT NULL), " +
        "k AS (SELECT source, lang, n_words, " +
        "CASE WHEN n_words < 20 THEN 0 " +
        "WHEN stop_cnt / n_words < 0.03 THEN 0 " +
        "WHEN 1 - n_distinct / n_words > 0.65 THEN 0 " +
        "ELSE 1 END AS keep FROM q) " +
        "SELECT source, lang, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_words) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(keep) AS BIGINT) AS n_kept, " +
        "ROUND(SUM(keep) / COUNT(*), 6) AS kept_frac " +
        "FROM k GROUP BY source, lang"),

    // Vocabulary building: top-100 words by corpus frequency with a
    // fully deterministic order (freq desc, then word — a bare LIMIT
    // over ties is engine-dependent). The tokenizer-training entry
    // point (functions.Bpe trains from exactly this histogram). Plan:
    // explode → map-side partial count → one shuffle → TakeOrdered;
    // the result is vocabulary-sized regardless of corpus size.
    "vocab_topk" -> QDef(
      (s, d) => docs(s, d).where(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count("*").as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(100),
      "SELECT word, freq FROM (SELECT word, COUNT(*) AS freq FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS word " +
        "FROM documents WHERE text IS NOT NULL) u GROUP BY word) c " +
        "ORDER BY freq DESC, word LIMIT 100"),

    // Bigram vocabulary: top-100 word 2-grams by corpus frequency with
    // the same deterministic (freq desc, gram) order as vocab_topk —
    // the n>1 companion the contamination/repetition ops build on.
    // Explode → partial-aggregated shuffle → TakeOrdered; result is
    // vocabulary-sized regardless of corpus size.
    "ngram_topk" -> QDef(
      (s, d) => {
        docs(s, d)
          .where(col("text").isNotNull &&
            size(split(col("text"), " ")) >= 2)
          .select(explode(wordBigrams(col("text"))).as("bigram"))
          .groupBy("bigram").agg(count("*").as("freq"))
          .orderBy(col("freq").desc, col("bigram"))
          .limit(100)
      },
      "WITH q AS (SELECT string_split(text, ' ') AS w FROM documents " +
        "WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2), " +
        "b AS (SELECT unnest([array_to_string(w[x:x+1], ' ') " +
        "FOR x IN range(1, len(w))]) AS bigram FROM q) " +
        "SELECT bigram, COUNT(*) AS freq FROM b GROUP BY bigram " +
        "ORDER BY freq DESC, bigram LIMIT 100"),

    // Document fingerprinting: content-hash prefix (the rolling-hash
    // variant is functions.TextFunctions.rollingHash, scalatest-checked).
    "doc_fingerprint" -> QDef(
      (s, d) => docs(s, d).select(
        col("doc_id"),
        substring(md5(col("text")), 1, 16).as("fp16")),
      "SELECT doc_id, substring(md5(text), 1, 16) AS fp16 FROM documents"),

    // Sequence packing for training shards (GPT-style concatenate-and-
    // chunk): every doc's tokens are laid out on one global token
    // stream in doc_id order; tok_offset is the doc's start position
    // and shard the 4096-token context window its first token lands
    // in. Registered as the DISTRIBUTED prefix sum
    // ([[PackingOps.packTokens]]: range partition → per-partition
    // totals → broadcast prefix → narrow cumulative pass — no
    // single-reducer window stage), hash-checked against the oracle's
    // window form; PackingSpec additionally proves the two forms equal
    // row-for-row.
    "seq_pack" -> QDef(
      (s, d) => {
        val counted = docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        PackingOps.packTokens(counted, "doc_id", "n_tokens", 4096L)
      },
      "WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) " +
        "AS BIGINT) AS n_tokens FROM documents WHERE text IS NOT " +
        "NULL), o AS (SELECT doc_id, n_tokens, CAST(SUM(n_tokens) " +
        "OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens " +
        "AS BIGINT) AS tok_offset FROM t) " +
        "SELECT doc_id, n_tokens, tok_offset, " +
        "CAST(tok_offset // 4096 AS BIGINT) AS shard FROM o"),

    // Corpus-frequency quality filter (the unigram-LM signal made
    // integer-exact): the fraction of a doc's tokens occurring < 3
    // times corpus-wide. The synthetic vocabulary is 31 words with
    // min frequency 26, so rarity is PLANTED per doc_id — every 7th
    // doc gains a unique `junkN` token (corpus frequency exactly 1)
    // and both engines replicate the construction, so the join and
    // both aggregations are exercised genuinely. The frequency side is
    // corpus-derived and unbounded at scale (rare tokens dominate a
    // 100 TB vocabulary), so the join is written as a plain equi-join
    // and the strategy left to Catalyst: a small vocabulary broadcasts
    // (as it does at test scale), an unbounded one falls back to a
    // shuffle of short tokens + counts — never documents. No forced
    // broadcast(): that would collect the vocabulary to the driver
    // unconditionally.
    "rare_token_filter" -> QDef(
      (s, d) => {
        val planted = docs(s, d).where(col("text").isNotNull)
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" junk"), col("doc_id")))
              .otherwise(col("text")).as("text"))
        val tok = planted.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        val freq = tok.groupBy("w").agg(count("*").as("freq"))
        tok.join(freq, "w")
          .groupBy("doc_id")
          .agg(count("*").as("n_tokens"),
            sum(when(col("freq") < 3, 1L).otherwise(0L)).as("n_rare"))
          .select(col("doc_id"), col("n_tokens"), col("n_rare"),
            round(col("n_rare") / col("n_tokens"), 6).as("rare_frac"))
      },
      "WITH p AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN " +
        "text || ' junk' || doc_id ELSE text END AS text " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w " +
        "FROM p), " +
        "freq AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w) " +
        "SELECT doc_id, COUNT(*) AS n_tokens, " +
        "CAST(SUM(CASE WHEN freq < 3 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_rare, ROUND(CAST(SUM(CASE WHEN freq < 3 THEN 1 ELSE 0 " +
        "END) AS BIGINT) / COUNT(*), 6) AS rare_frac " +
        "FROM tok JOIN freq USING (w) GROUP BY doc_id"),

    // Driver-gate probe for the BPE trainer + tokenizer (functions.Bpe):
    // the corpus is PLANTED per doc_id so the learned merge table is
    // closed-form for ANY corpus size — doc d contributes
    // "abab"×(d%4+3) + "abcd abcd xy", making the pair statistics
    //   (a,b) = 2·Σk+2N  >  (ab,ab) = Σk ≥ 3N  >  (ab,c) = (c,d) = 2N
    // so 3 merges are provably [(a,b), (ab,ab), (ab,c)] — the third via
    // the lexicographic tie-break ((ab,c) < (c,d) at equal count), which
    // this probe deliberately exercises along with cascaded merges and
    // the unranked-pair fallthrough ("xy" stays 2 tokens, "abcd" stops
    // at [abc, d]). Token count per doc is then k·1 + 2·2 + 2 =
    // d%4 + 9: a closed-form DuckDB oracle over the full distributed
    // histogram → local incremental trainer → broadcast tokenize path.
    "bpe_token_count" -> QDef(
      (s, d) => {
        val planted = docs(s, d).select(col("doc_id"),
          concat_ws(" ", flatten(array(
            array_repeat(lit("abab"),
              (col("doc_id") % 4 + 3).cast("int")),
            array(lit("abcd"), lit("abcd"), lit("xy"))))).as("text"))
        val model = graft.functions.Bpe.train(planted, "text",
          numMerges = 3)
        planted.select(col("doc_id"),
          graft.functions.Bpe.tokenCount(model, col("text"))
            .as("n_tokens"))
      },
      "SELECT doc_id, CAST(doc_id % 4 + 9 AS INT) AS n_tokens " +
        "FROM documents")
  )
}
