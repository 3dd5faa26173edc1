package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.apache.spark.sql.functions._

/** SURVEY §7 risk, measured (round-3 verdict #7): "516-wide projections:
  * watch codegen size; fall back to UDF-vectorizer." The shipped
  * encoders already choose the UDF-vectorizer shape (multiHot/mheVector
  * assemble ONE SparseVector per row instead of 516 indicator columns);
  * this spec pins the decision with numbers at the real width — the
  * full 16-slot × 516-category recode + both vector encoders must stay
  * inside WholeStageCodegen with every generated method under the JVM's
  * 64 KB limit (and compile at all: codegen fallback is disabled for
  * the duration, so a too-large method would throw instead of silently
  * interpreting). The naive 516-column A4 alternative SURVEY considered
  * is measured alongside for the record.
  */
class CodegenWidthSpec extends SparkSpec {

  private val width = 516
  private val vocab: Seq[String] = (0 until width).map(i => f"C$i%03d")

  /** Claims-shaped frame: 16 code slots (some OOV beyond the vocab) and
    * a day-of-year, 2000 rows. */
  private def base = {
    val slots = (0 until 16).map { k =>
      concat(lit("C"), lpad(((col("id") * (k + 3) + k) % 550)
        .cast("string"), 3, "0")).as(s"slot_$k")
    }
    spark.range(2000).select(
      (col("id") +: ((col("id") % 366) + 1).cast("int").as("doy") +:
        slots): _*)
  }

  private def maxMethodSize(df: org.apache.spark.sql.DataFrame): Int = {
    val subtrees = codegenStringSeq(df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "no WholeStageCodegen subtree generated")
    subtrees.map(_._3.maxMethodCodeSize).max
  }

  private def withNoFallback[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("full 516-category 16-slot recode + multiHot + mheVector stays " +
    "codegen'd with no 64KB method blow-up") { withNoFallback {
    val idxArr = array((0 until 16).map(k =>
      Encoders.codeIndex(col(s"slot_$k"), vocab)): _*)
    val out = base.select(col("id"),
      Encoders.multiHot(idxArr, width).as("mh"),
      Encoders.mheVector(col("doy"), idxArr, width).as("grid"))
    // evaluates correctly end-to-end (OOV slots dropped, grid offsets
    // bounded by 366*width)
    val rows = out.collect()
    assert(rows.length === 2000)
    rows.foreach { r =>
      val mh = r.getAs[org.apache.spark.ml.linalg.SparseVector]("mh")
      val g = r.getAs[org.apache.spark.ml.linalg.SparseVector]("grid")
      assert(mh.size === width && g.size === 366 * width)
      assert(mh.indices.forall(i => i >= 0 && i < width))
      assert(mh.numNonzeros <= 16) // all-OOV rows legitimately empty
      assert(g.numNonzeros === mh.numNonzeros)
    }
    assert(rows.count(_.getAs[org.apache.spark.ml.linalg.SparseVector](
      "mh").numNonzeros > 0) > 1500, "vocab hits should dominate")
    // the projection sits inside a WholeStageCodegen span...
    val spans = out.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, "516-wide projection fell out of codegen")
    // ...and no generated method approaches the JVM 64KB ceiling (the
    // 16 literal 516-entry maps are referenced objects, not unrolled
    // code — that is WHY this shape was chosen)
    val worst = maxMethodSize(out)
    info(s"shipped encoders: max generated method = $worst bytes")
    assert(worst > 0 && worst < 65535,
      s"generated method $worst bytes breaches the 64KB JVM limit")
  }}

  test("the naive 516-indicator-column A4 alternative is measured for " +
    "the record (the shape SURVEY chose NOT to ship)") { withNoFallback {
    val codes = array((0 until 16).map(k => col(s"slot_$k")): _*)
    val wide = base.select(
      (col("id") +: vocab.take(width).map(c =>
        array_contains(codes, c).cast("int").as(s"cat_$c"))): _*)
    assert(wide.columns.length === width + 1)
    // it does run — the risk was never wrongness, it was method size
    val row = wide.orderBy("id").limit(1).collect().head
    assert((1 to width).map(row.getInt).sum <= 16)
    val worst = maxMethodSize(wide)
    info(s"naive 516-column projection: max generated method = " +
      s"$worst bytes")
    // document the measurement; 8000 bytes is HotSpot's JIT ceiling
    // (-XX:-DontCompileHugeMethods threshold) — above it the method
    // runs interpreted even when codegen succeeds
    assert(worst > 0, "naive wide projection failed to compile")
  }}
}
