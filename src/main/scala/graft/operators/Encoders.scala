package graft.operators

import org.apache.spark.ml.linalg.{SparseVector, Vectors, Vector => MlVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's feature encoders (SURVEY.md §2.6) as Spark transforms.
  *
  * E2/MHE (`cms_preprocess.py:330-336`): per claim a 366×W grid, all zeros
  * except row `DayOfYear-1` = the claim's W-dim indicator vector. Dense is
  * 366·W doubles/row (≈1.5 MB at W=516) — sparse is mandatory at scale, so
  * the canonical output is a `SparseVector(366*W)` with one index per
  * active code. E1/AOV (`cms_preprocess.py:267-297`) flattens a patient's
  * per-year indicator rows into one `years × (demo + W)` vector.
  *
  * Everything up to the final vector assembly is built-in expressions
  * (codegen'd); only the `indices → SparseVector` step is a UDF, applied
  * once per output row on already-aggregated data.
  */
object Encoders {

  /** Frozen sorted vocabulary → index map. The reference iterates a Python
    * `set` (nondeterministic across runs, cms_preprocess.py:227); we freeze
    * sorted order — documented divergence (SURVEY §2.6 E3). */
  def freezeVocab(df: DataFrame, codeCol: String): Seq[String] =
    df.select(col(codeCol).cast("string")).na.drop().distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Map a code column to its frozen vocabulary index (-1 = OOV), via a
    * broadcast literal map — the reference's `dict.get(x, 0)` recode. */
  def codeIndex(code: Column, vocab: Seq[String]): Column = {
    val m = typedlit(vocab.zipWithIndex.toMap)
    coalesce(try_element_at(m, code.cast("string")), lit(-1))
  }

  // Boxed Integer elements, not Seq[Int]: a NULL element (e.g. a flat
  // index computed from a NULL day-of-year) would silently unbox to 0
  // and ghost-set cell 0; boxed, it is visible and dropped. A NULL
  // array yields the empty vector.
  private val toSparse =
    udf { (width: Int, idx: Seq[java.lang.Integer]) =>
      val uniq = (if (idx == null) Seq.empty[java.lang.Integer] else idx)
        .filter(i => i != null && i >= 0 && i < width)
        .map(_.toInt).distinct.sorted
      Vectors.sparse(width, uniq.toArray,
        Array.fill(uniq.length)(1.0)): MlVector
    }

  /** Multi-hot indicator vector (E3): per row, the set of vocabulary
    * indices present in `codeIdxs` (array of int, -1 ignored) → sparse
    * 0/1 vector of `width`. Narrow, no shuffle. */
  def multiHot(codeIdxs: Column, width: Int): Column =
    toSparse(lit(width), codeIdxs)

  /** MHE day-grid scatter (E2): flat index (day-1)*width + codeIdx into a
    * 366*width sparse vector. `dayOfYear` in 1..366. OOV sentinels (-1
    * from [[codeIndex]]) are dropped BEFORE the flat-index transform:
    * (doy-1)*width - 1 is in-range for doy ≥ 2 and would silently set
    * the previous day's last cell — toSparse's bounds guard can't see
    * it once flattened. The symmetric overflow (an index ≥ `width`,
    * i.e. a vocabulary/width mismatch) fails LOUDLY instead: it would
    * scatter into the NEXT day's block, inside toSparse's 366·width
    * bound, corrupting features with no witness. */
  def mheVector(dayOfYear: Column, codeIdxs: Column, width: Int): Column =
    toSparse(lit(366 * width),
      transform(filter(codeIdxs, i => i >= 0),
        i => when(i >= width, raise_error(concat(
            lit(s"mheVector: code index >= width $width: "),
            i.cast("string"))))
          .otherwise((dayOfYear - 1) * width + i)))

  /** M4 pooling-first GRU approximation (SURVEY §2.7): pool the day axis
    * of an MHE grid (366×W flat sparse vector) into [max | mean | min]
    * blocks of width W — the reference RNN's global max/avg/min pooling
    * over time (`rnn_model.ipynb:216-226`), computed directly from the
    * grid instead of a recurrent pass. Narrow per-row transform. */
  def poolDayGrid(grid: Column, width: Int): Column = {
    val pool = udf { (v: MlVector) =>
      val counts = new Array[Int](width)
      // foreachActive + nonzero filter for EVERY representation: a
      // SparseVector can carry explicit 0.0 entries (legal output of
      // generic slicing/assembly), and counting stored indices would
      // pool a never-occurred code differently sparse vs dense.
      v.foreachActive((ix, value) =>
        if (value != 0.0) counts(ix % width) += 1)
      val idx = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      var w = 0
      while (w < width) {
        if (counts(w) > 0) {
          idx += ((w, 1.0))                            // max over days
          idx += ((width + w, counts(w) / 366.0))      // mean over days
          if (counts(w) == 366) idx += ((2 * width + w, 1.0)) // min
        }
        w += 1
      }
      val sorted = idx.sortBy(_._1)
      Vectors.sparse(3 * width, sorted.map(_._1).toArray,
        sorted.map(_._2).toArray): MlVector
    }
    pool(grid)
  }

  /** M4 fidelity step beyond [[poolDayGrid]]: WINDOWED time pooling.
    * Whole-axis pooling collapses all ordering within the year — the one
    * signal the reference GRU (`rnn_model.ipynb:216-226`) consumes that
    * the pooled head cannot see. This form keeps coarse order: the
    * 366-day axis splits into `windows` contiguous spans (window of day
    * d = d·windows/366, so 12 windows ≈ calendar months), each span
    * pools to its own [max | mean | min] W-blocks, and the blocks
    * concatenate in TIME ORDER — a 3·W·`windows` vector whose layout
    * encodes when-in-the-year a code occurred, the per-day-window
    * sequence a recurrent head would consume. `windows = 1` reduces
    * exactly to [[poolDayGrid]]'s semantics (same pools, same layout).
    * Still a narrow per-row transform on already-assembled grids. */
  def poolDayGridWindows(grid: Column, width: Int,
                         windows: Int): Column = {
    require(windows >= 1 && windows <= 366,
      s"windows must be in 1..366, got $windows")
    // days in window w: |{d ∈ [0,366) : d*windows/366 == w}| — the
    // mean/min denominators, precomputed once on the driver
    val daysIn = Array.tabulate(windows)(w =>
      (0 until 366).count(d => d * windows / 366 == w))
    val pool = udf { (v: MlVector) =>
      val counts = new Array[Int](windows * width)
      def bump(ix: Int): Unit = {
        val day = ix / width
        val w = day * windows / 366
        counts(w * width + ix % width) += 1
      }
      // same explicit-zero rule as poolDayGrid: only truly nonzero
      // cells count, whatever the vector representation
      v.foreachActive((ix, value) => if (value != 0.0) bump(ix))
      val idx = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      var w = 0
      while (w < windows) {
        val base = w * 3 * width
        var c = 0
        while (c < width) {
          val n = counts(w * width + c)
          if (n > 0) {
            idx += ((base + c, 1.0))                       // max
            idx += ((base + width + c, n.toDouble / daysIn(w))) // mean
            if (n == daysIn(w)) idx += ((base + 2 * width + c, 1.0)) // min
          }
          c += 1
        }
        w += 1
      }
      val sorted = idx.sortBy(_._1)
      Vectors.sparse(3 * width * windows, sorted.map(_._1).toArray,
        sorted.map(_._2).toArray): MlVector
    }
    pool(grid)
  }

  /** M4 fidelity step beyond [[poolDayGridWindows]]: exponential-decay
    * day-weighted pooling — the final state of a FIXED-WEIGHT linear
    * recurrence over the day axis, the closest thing to a recurrent
    * pass expressible without a DL framework. Per code c the forward
    * block is
    *
    *   h_c = Σ_d  α^(365−d) · x[d,c]   (= h after h_d = α·h_{d−1} + x_d
    *                                      over all 366 day rows)
    *
    * — a GRU with its gates frozen at a constant update rate α: recent
    * days dominate, old days decay geometrically, and unlike ANY
    * windowed pooling two occurrence patterns with the same window
    * histogram but different day order now encode differently. The
    * backward block (α^d weights) carries the symmetric early-history
    * memory, so the head sees both ends of the year. Output is
    * [fwd | bwd], size 2·width, sparse on codes that occur at all.
    * Closed pow() form, not 366 multiplies — same value up to float
    * ulps (ExtensionsAndPoolingSpec pins agreement with an explicit
    * recurrence loop). Narrow per-row transform like its siblings. */
  def poolDayGridDecay(grid: Column, width: Int,
                       alpha: Double = 0.97): Column = {
    require(alpha > 0.0 && alpha < 1.0,
      s"alpha must be in (0, 1), got $alpha")
    val pool = udf { (v: MlVector) =>
      val fwd = new Array[Double](width)
      val bwd = new Array[Double](width)
      // same explicit-zero rule as poolDayGrid: only truly nonzero
      // cells contribute, whatever the vector representation
      v.foreachActive((ix, value) => if (value != 0.0) {
        val day = ix / width // 0..365
        val c = ix % width
        fwd(c) += math.pow(alpha, (365 - day).toDouble)
        bwd(c) += math.pow(alpha, day.toDouble)
      })
      val idx = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      var c = 0
      while (c < width) {
        if (fwd(c) != 0.0) idx += ((c, fwd(c)))
        if (bwd(c) != 0.0) idx += ((width + c, bwd(c)))
        c += 1
      }
      val sorted = idx.sortBy(_._1)
      Vectors.sparse(2 * width, sorted.map(_._1).toArray,
        sorted.map(_._2).toArray): MlVector
    }
    pool(grid)
  }

  /** AOV flatten (E1): given per-(key, year) rows with an indicator-index
    * array and demographic columns, emit one row per key with a
    * `years.size * (demos.size + width)` sparse vector, year-major —
    * exactly the reference's `3 × (2 + 516)` layout
    * (cms_preprocess.py:291-293). Single hash aggregate (one shuffle);
    * the per-year offset arithmetic happens map-side. */
  /** @param carryAggs extra aggregate columns computed in the SAME
    *        per-key aggregation (e.g. a label max). Without this, a
    *        caller needing one more per-key aggregate joins a second
    *        aggregation of the same input — and because column
    *        pruning specializes each branch's partial aggregate,
    *        exchange reuse misses and the ENTIRE upstream pipeline
    *        runs twice (measured on the CMS AOV plan: 6 exchanges and
    *        a duplicated 2.7M-claim CSV pipeline; folding the label
    *        in dropped both). */
  def aovFlatten(df: DataFrame, keyCol: String, yearCol: String,
                 demoCols: Seq[String], idxCol: String,
                 width: Int, years: Seq[Int],
                 carryAggs: Seq[Column] = Nil): DataFrame = {
    val span = demoCols.size + width
    val yearOff = years.zipWithIndex.toMap
    val offExpr = element_at(typedlit(yearOff), col(yearCol)) * span
    // demo value at slot j goes to offset + j; indicator i to
    // offset + demos + i. Demo values ride along as (index, value) pairs.
    val demoPairs = array(demoCols.zipWithIndex.map { case (c, j) =>
      struct((offExpr + j).as("i"), col(c).cast("double").as("v"))
    }: _*)
    // An indicator index ≥ width would slide into the NEXT year block
    // (same silent-corruption mode as mheVector's overflow) — reject.
    val indPairs = transform(col(idxCol), i =>
      struct(when(i >= width, raise_error(concat(
          lit(s"aovFlatten: indicator index >= width $width: "),
          i.cast("string"))))
        .otherwise(offExpr + lit(demoCols.size) + i).as("i"),
        lit(1.0).as("v")))
    val pairs = concat(demoPairs, indPairs)
    val toVec = udf { (ps: Seq[org.apache.spark.sql.Row]) =>
      // null demo values (e.g. an absent demographic) contribute no slot
      val m = ps.iterator
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => r.getInt(0) -> r.getDouble(1))
        .filter(_._1 >= 0).toSeq.distinct.sortBy(_._1)
      // precondition, surfaced clearly: the input grain must be one row
      // per (key, year) — two rows with different demo values for the
      // same year collide on a slot, and SparseVector would otherwise
      // throw an opaque 'Found duplicate indices' mid-job
      require(m.map(_._1).distinct.size == m.size,
        "aovFlatten requires one row per (key, year): conflicting " +
          "values target the same vector slot — pre-aggregate first")
      Vectors.sparse(years.size * span, m.map(_._1).toArray,
        m.map(_._2).toArray): MlVector
    }
    val agged = df
      .where(col(yearCol).isin(years.map(Integer.valueOf): _*))
      .groupBy(keyCol)
      .agg(flatten(collect_list(pairs)).as("__pairs"), carryAggs: _*)
    val carryNames = agged.columns
      .filterNot(c => c == keyCol || c == "__pairs")
    agged.select(col(keyCol) +:
      toVec(col("__pairs")).as("features") +:
      carryNames.map(col): _*)
  }
}
