package graft.operators

import graft.{GraftExtensions, SparkSpec}
import graft.cms.CmsPipeline
import graft.ml.Models
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsAndPoolingSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions registers double_dot_product for SQL users") {
    // getOrCreate reuses any active session (ignoring withExtensions), so
    // clear the default first — the new session shares the SparkContext
    // but gets its own state with the extensions applied — then restore.
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally ()
    try testBody(s2) finally {
      old.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }

  private def testBody(s2: SparkSession): Unit = {
    val df = s2.range(1).select(
      array(lit(1.0), lit(2.0)).as("a"), array(lit(3.0), lit(4.0)).as("b"))
    df.createOrReplaceTempView("pairs_ext")
    val r = s2.sql(
      "SELECT double_dot_product(a, b) AS d FROM pairs_ext").head()
    assert(r.getDouble(0) === 11.0)

    // The advertised pure-SQL use case on the engine's OWN vector
    // table: embeddings is array<float>, so the expression must accept
    // implicit casts (ImplicitCastInputTypes) — with plain
    // ExpectsInputTypes this threw DATATYPE_MISMATCH on the only
    // vector table the engine ships.
    graft.Tables.load(s2, sfDir, "embeddings")
      .createOrReplaceTempView("emb_ext")
    val norm = s2.sql("SELECT double_dot_product(embedding, " +
      "embedding) AS n FROM emb_ext LIMIT 1").head()
    assert(norm.getDouble(0) > 0.0)

    // YearRangePushdown: year(ts) predicates become pushed scan ranges
    val orders = graft.Tables.load(s2, sfDir, "orders")
    val filtered = orders.where(year(col("o_orderdate")) === 1996 ||
      (year(col("o_orderdate")) >= 1997 &&
        year(col("o_orderdate")) <= 1998))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      filtered.explain("formatted")
    }
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r
      .findFirstIn(out.toString).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"), pushed)
    assert(pushed.contains("LessThan(o_orderdate"), pushed)
    // rewrite must not change results
    val baseline = graft.Tables.load(spark, sfDir, "orders")
      .where(year(col("o_orderdate")).between(1996, 1998)).count()
    assert(filtered.count() === baseline)
  }

  test("YearRangePushdown on a TimestampType column: pushed range, " +
    "results unchanged") {
    // orders.o_orderdate is timestamp[ms] — year(ts) analyzes as
    // Year(Cast(ts, DateType, tz)); the rewrite must anchor the range
    // literal in the same timezone. SparkSpec wires GraftExtensions, so
    // the shared session exercises the rule end-to-end.
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val ruled = orders.where(year(col("o_orderdate")) === 1997)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      ruled.explain("formatted")
    }
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r
      .findFirstIn(out.toString).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"), pushed)
    assert(pushed.contains("LessThan(o_orderdate"), pushed)
    // baseline evaluated without the rewrite: raw range, then re-check
    // year() row by row via the hand-written range helper
    val baseline = orders.where(
      RelationalOps.yearRange(col("o_orderdate"), 1997, 1997)).count()
    assert(ruled.count() === baseline)
  }

  test("YearRangePushdown leaves StringType children alone " +
    "(lexicographic range is NOT year())") {
    // '1996-99-99' sorts inside the string range '1996-01-01'..'1997-01-01'
    // but casts to null in year(cast(c as date)) — a rewrite would
    // resurrect the row. The rule must not fire on string children.
    val df = Seq("1996-05-01", "1996-99-99", "1997-03-04").toDF("ds")
    val kept = df.where(year(col("ds")) === 1996)
    assert(kept.count() === 1)
    assert(kept.head().getString(0) === "1996-05-01")
  }

  test("YearRangePushdown leaves extreme year literals to the original " +
    "predicate (Int overflow / non-4-digit formatting)") {
    // year(c) <= Int.MaxValue would overflow yr+1 in the rewrite, and
    // year(c) = -5 would build '-005-01-01' which casts to null and
    // drops every row; both must fall through unrewritten.
    val df = Seq(java.sql.Date.valueOf("1996-05-01"),
      java.sql.Date.valueOf("2001-02-03")).toDF("d")
    assert(df.where(year(col("d")) <= Int.MaxValue).count() === 2)
    assert(df.where(year(col("d")) > -5).count() === 2)
    assert(df.where(year(col("d")) === 10000).count() === 0)
  }

  test("saltedAgg tolerates MapType columns (excluded from the salt)") {
    val df = (1 to 100).map(i => (i % 3, i.toDouble, Map("a" -> i)))
      .toDF("k", "v", "m")
    val out = RelationalOps.saltedAgg(df, Seq("k"), salts = 4,
      partials = Seq(count("*").as("pn")),
      merges = Seq(sum("pn").as("n")))
      .as[(Int, Long)].collect().toSet
    assert(out === Set((0, 33L), (1, 34L), (2, 33L)))
  }

  test("saltedAgg matches the plain aggregation") {
    val df = (1 to 1000).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count("*").as("n"), max("v").as("mx"))
      .as[(Int, Long, Double)].collect().toSet
    val salted = RelationalOps.saltedAgg(df, Seq("k"), salts = 8,
      partials = Seq(count("*").as("pn"), max("v").as("pmx")),
      merges = Seq(sum("pn").as("n"), max("pmx").as("mx")))
      .as[(Int, Long, Double)].collect().toSet
    assert(salted === plain)
  }

  test("poolDayGrid computes max/mean/min blocks from the MHE grid") {
    val w = 4
    // code 1 active on day 10, code 3 active on days 10 and 20
    val grid = Vectors.sparse(366 * w,
      Array(9 * w + 1, 9 * w + 3, 19 * w + 3), Array(1.0, 1.0, 1.0))
    val out = Seq(Tuple1(grid)).toDF("grid")
      .select(Encoders.poolDayGrid(col("grid"), w).as("p"))
      .head().getAs[SparseVector]("p")
    assert(out.size === 3 * w)
    assert(out(1) === 1.0 && out(3) === 1.0)          // max block
    assert(out(w + 1) === 1.0 / 366)                  // mean block
    assert(out(w + 3) === 2.0 / 366)
    assert((2 * w until 3 * w).forall(out(_) === 0.0)) // min block
  }

  test("poolDayGridWindows: windows=1 reduces to poolDayGrid, and " +
    "windowed pooling separates days that whole-axis pooling conflates") {
    val w = 4
    def gridOn(day: Int, code: Int) = Vectors.sparse(366 * w,
      Array((day - 1) * w + code), Array(1.0))
    // same (code) multiset on day 10 vs day 300: whole-axis pooling
    // cannot tell them apart — the windowed layout must
    val early = Seq(Tuple1(gridOn(10, 1))).toDF("grid")
    val late = Seq(Tuple1(gridOn(300, 1))).toDF("grid")
    def pooledW(df: org.apache.spark.sql.DataFrame, windows: Int) =
      df.select(Encoders.poolDayGridWindows(col("grid"), w, windows)
        .as("p")).head().getAs[SparseVector]("p")
    def pooled1(df: org.apache.spark.sql.DataFrame) =
      df.select(Encoders.poolDayGrid(col("grid"), w).as("p"))
        .head().getAs[SparseVector]("p")
    // windows=1 ≡ poolDayGrid
    for (df <- Seq(early, late))
      assert(pooledW(df, 1) === pooled1(df))
    assert(pooled1(early) === pooled1(late)) // the conflation
    val pe = pooledW(early, 12)
    val pl = pooledW(late, 12)
    assert(pe !== pl)
    assert(pe.size === 3 * w * 12 && pl.size === 3 * w * 12)
    // the active block sits at the day's window: day-1 maps via
    // (d*12)/366 on the 0-based day index
    val we = (9 * 12) / 366
    val wl = (299 * 12) / 366
    assert(pe(we * 3 * w + 1) === 1.0)  // max cell, window of day 10
    assert(pl(wl * 3 * w + 1) === 1.0)  // max cell, window of day 300
    assert(pe(wl * 3 * w + 1) === 0.0)
    // mean uses the WINDOW's day count, not 366
    val daysInWe = (0 until 366).count(d => d * 12 / 366 === we)
    assert(pe(we * 3 * w + w + 1) === 1.0 / daysInWe)
  }

  test("poolDayGridDecay equals the explicit linear recurrence, " +
    "keeps day ORDER (not just window histograms), and carries both " +
    "directions") {
    val w = 3
    val alpha = 0.97
    // code 0 on days 1 and 366 (0-based 0 and 365); code 1 on day 101
    val grid = Vectors.sparse(366 * w,
      Array(0 * w + 0, 100 * w + 1, 365 * w + 0), Array(1.0, 1.0, 1.0))
    val out = Seq(Tuple1(grid)).toDF("grid")
      .select(Encoders.poolDayGridDecay(col("grid"), w, alpha).as("p"))
      .head().getAs[SparseVector]("p")
    assert(out.size === 2 * w)
    // explicit recurrence h_d = alpha*h_{d-1} + x_d over the 366 rows
    def recur(days: Seq[Int]): Double = {
      var h = 0.0
      (0 until 366).foreach { d =>
        h = alpha * h + (if (days.contains(d)) 1.0 else 0.0)
      }
      h
    }
    assert(math.abs(out(0) - recur(Seq(0, 365))) < 1e-9)   // fwd code 0
    assert(math.abs(out(1) - recur(Seq(100))) < 1e-9)      // fwd code 1
    // backward block: same recurrence over reversed days
    assert(math.abs(out(w + 0) - (1.0 + math.pow(alpha, 365))) < 1e-12)
    assert(math.abs(out(w + 1) - math.pow(alpha, 100)) < 1e-12)
    // order sensitivity: one occurrence on day 10 vs day 300 — same
    // count, same month-window histogram would differ only by window;
    // decay separates ANY reordering
    def one(day: Int) = Seq(Tuple1(Vectors.sparse(366 * w,
      Array((day - 1) * w), Array(1.0)))).toDF("grid")
      .select(Encoders.poolDayGridDecay(col("grid"), w, alpha).as("p"))
      .head().getAs[SparseVector]("p")
    assert(one(10)(0) !== one(300)(0))
    assert(one(10)(0) < one(300)(0), "later day must carry MORE " +
      "forward weight (recency)")
  }

  test("M3/M4 paths: MLP on the raw grid and LR on pooled features " +
    "train on the CMS fixture MHE output") {
    def res(n: String) = getClass.getResource(s"/cms/$n.csv").getPath
    val dxMap = CmsPipeline.crosswalkMap(
      CmsPipeline.loadCrosswalk(spark, res("dx")))
    val pcsMap = CmsPipeline.crosswalkMap(
      CmsPipeline.loadCrosswalk(spark, res("pcs")))
    val w = CmsPipeline.vocabOf(dxMap).size +
      CmsPipeline.vocabOf(pcsMap).size
    val claims = CmsPipeline.withLabel(CmsPipeline.recodeClaims(
      CmsPipeline.arthritisPatientData(
        CmsPipeline.loadBen(spark, res("ben")),
        CmsPipeline.loadIp(spark, res("ip")), CmsPipeline.CmsConfig()),
      dxMap, pcsMap), CmsPipeline.CmsConfig())
    val mhe = CmsPipeline.mhe(claims, w, rows = 60)
    // M4: pooled features + demographics → linear head
    val pooled = mhe.select(col("label").cast("double").as("label"),
      Encoders.poolDayGrid(col("grid"), w).as("pooled"),
      col("demographics"))
      .withColumn("demo_vec", udf((d: Seq[Double]) =>
        Vectors.dense(d.toArray)).apply(col("demographics")))
    val assembled = new VectorAssembler()
      .setInputCols(Array("pooled", "demo_vec"))
      .setOutputCol("features").transform(pooled)
    val lr = Models.lasso(regParam = 0.0001).fit(assembled)
    val scored = lr.transform(assembled)
      .select(col("label").cast("int").as("label"), col("score"))
    assert(scored.count() === 60)
    // M3: MLP on the raw flattened grid (CNN-equivalent dense head)
    val gridDf = mhe.select(col("label").cast("double").as("label"),
      col("grid").as("features"))
    val mlp = Models.mlp(inputSize = 366 * w, hidden = 8).fit(gridDf)
    val preds = mlp.transform(gridDf)
    assert(preds.select("prediction").distinct().count() <= 2)
  }
}
