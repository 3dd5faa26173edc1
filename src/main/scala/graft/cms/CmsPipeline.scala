package graft.cms

import graft.operators.{Encoders, RelationalOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's end-to-end preprocessing pipeline
  * (`cms_preprocess.py` in sfu-bigdata/orx-surgical), re-expressed as a
  * lazy Spark DataFrame DAG. Stage-by-stage citations are inline; SURVEY.md
  * §3.1-3.2 maps the call graph.
  *
  * Semantics preserved exactly:
  *  - `pd.to_numeric(errors='coerce')` → `try_cast` (bad → null) then
  *    `dropna` (cms_preprocess.py:72-76);
  *  - unknown ICD-9 codes recode to a value outside the vocabulary and
  *    therefore light no indicator (`dict.get(x, 0)` where 0 is never a
  *    CCS category, :191-195 + :229-236);
  *  - the enrollment set-containment filter (:92-93);
  *  - early-TJR claim removal (:89) and the 469/470 label (:202);
  *  - AOV = patient-year max then fixed-year flatten (:267-297);
  *  - MHE = per-claim 366×W day-grid scatter (:300-342).
  *
  * Documented divergence: vocabulary order is frozen sorted (the reference
  * iterates a Python `set` — nondeterministic across runs, :227).
  */
object CmsPipeline {

  val dxSlots: Seq[String] = (1 to 10).map(i => s"ICD9_DGNS_CD_$i")
  val pcsSlots: Seq[String] = (1 to 6).map(i => s"ICD9_PRCDR_CD_$i")

  /** @param startYear  first claim year kept (ref: start_year)
    * @param fullYears  years a patient must cover to be "fully enrolled"
    * @param tjrDrg     DRG codes defining the target procedure */
  final case class CmsConfig(
      startYear: Int = 2008,
      endYear: Int = 2010,
      tjrDrg: Seq[String] = Seq("469", "470")) {
    def fullYears: Seq[Int] = (startYear to endYear).toSeq
  }

  // ---- S1: CSV scans with fixed schemas (SURVEY §1.3: the reference
  // infers schemas per-read; we pin StructTypes) -------------------------

  private def benSchema = StructType(Seq(
    StructField("DESYNPUF_ID", StringType),
    StructField("SP_RA_OA", IntegerType),
    StructField("BENE_BIRTH_DT", StringType),
    StructField("BENE_SEX_IDENT_CD", IntegerType)))

  private def ipSchema = StructType(
    Seq(StructField("DESYNPUF_ID", StringType),
      StructField("CLM_ID", StringType),
      StructField("CLM_FROM_DT", StringType),
      StructField("CLM_DRG_CD", StringType)) ++
      (dxSlots ++ pcsSlots).map(c => StructField(c, StringType)))

  def loadBen(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(benSchema).csv(path)

  def loadIp(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(ipSchema).csv(path)

  /** Crosswalk CSV: quote-wrapped header and values (ref :119-130). */
  def loadCrosswalk(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumnRenamed(c, c.replace("'", ""))
    }
    renamed
  }

  // ---- P10-P14: crosswalk cleaning (ref :119-130, :155-167) ------------

  /** Strip wrapping quotes, truncate at '.', trim whitespace, blank →
    * 'None' sentinel; rename to canonical (ICD9, CCS). */
  def cleanCrosswalk(xw: DataFrame): DataFrame = {
    def clean(c: Column): Column =
      regexp_replace(
        substring_index(trim(regexp_replace(c, "^'|'$", "")), ".", 1),
        "^\\s*$", "None")
    xw.select(
      clean(col("ICD-9-CM CODE")).as("ICD9"),
      clean(col("CCS CATEGORY")).as("CCS"))
  }

  /** The reference's broadcast dictionary (`dict(zip(ICD9, CCS))`, :158).
    * The crosswalk is a small dimension — collecting it mirrors the
    * reference and becomes a broadcast literal map in the plan.
    *
    * Duplicate cleaned keys (dot-truncation can collapse distinct raw
    * codes) resolve to the MIN CCS value — a deterministic choice
    * regardless of partition/collect order, where the reference's
    * file-order dict last-wins depends on row order we don't preserve
    * (documented divergence; no committed crosswalk has conflicting
    * duplicates). */
  def crosswalkMap(xw: DataFrame): Map[String, String] =
    cleanCrosswalk(xw)
      .where(col("ICD9") =!= "None")
      .groupBy("ICD9").agg(min("CCS").as("CCS"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Frozen sorted CCS vocabulary (divergence note in the scaladoc). */
  def vocabOf(m: Map[String, String]): Seq[String] =
    m.values.toSeq.distinct.sorted

  // ---- stage 1: get_arthritis_patient_data (ref :54-101) ---------------

  /** J1 join + date coercion + year/range/flag/TJR filters + enrollment +
    * age derivation. Output grain: one row per kept claim. */
  def arthritisPatientData(ben: DataFrame, ip: DataFrame,
                           cfg: CmsConfig): DataFrame = {
    // P1/P2/P3: to_numeric(coerce) → dropna → int (ref :72-76). Dates
    // arrive as mixed "yyyyMMdd"/"yyyyMMdd.0"/garbage strings.
    val dtNum = expr("try_cast(try_cast(CLM_FROM_DT AS DOUBLE) AS BIGINT)")
    // P4: to_datetime(format='%Y%m%d') (ref :79).
    val clmDate = to_date(dtNum.cast("string"), "yyyyMMdd")
    val joined = ip
      // J1: inner equi-join, dim side broadcast (ref :69).
      .join(broadcast(ben), Seq("DESYNPUF_ID"))
      .withColumn("__dtnum", dtNum)
      .na.drop(Seq("__dtnum"))
      .withColumn("clm_date", clmDate)
      .na.drop(Seq("clm_date"))
      .withColumn("Year", year(col("clm_date")))
      // P6: claim-year range (ref :83).
      .where(col("Year").between(cfg.startYear, cfg.endYear))
      // P7: chronic RA/OA flag (ref :86).
      .where(col("SP_RA_OA") === 1)
      // P8: drop TJR claims in the first two years (ref :89). The
      // coalesce matters: a NULL CLM_DRG_CD makes the inner conjunct
      // NULL and three-valued `where` would drop the row, while the
      // reference's pandas isin treats NaN as False and KEEPS it.
      .where(!coalesce(
        col("Year").isin(cfg.startYear, cfg.startYear + 1) &&
          col("CLM_DRG_CD").isin(cfg.tjrDrg: _*), lit(false)))
    // A2: full-enrollment semi-join (ref :92-93).
    val enrolled = RelationalOps.filterEnrolled(
      joined, joined.select(col("DESYNPUF_ID"), col("Year")),
      "DESYNPUF_ID", col("Year"), cfg.fullYears)
    // P9: Age in years (ref :96-99).
    enrolled.withColumn("Age",
      datediff(col("clm_date"),
        to_date(col("BENE_BIRTH_DT"), "yyyyMMdd")) / lit(365.0))
      .drop("__dtnum", "SP_RA_OA")
  }

  // ---- stage 2: recode + binarize (ref :172-236) -----------------------

  /** J2+E3: recode each of the 16 code slots through the crosswalk maps
    * and collapse to one array of combined-vocabulary indices. Unknown
    * codes map to -1 and are dropped — identical observable behavior to
    * the reference's `dict.get(x, 0)` + `np.isin(unique_ccs, row)`.
    * The combined layout is [dx vocab ++ pcs vocab], matching the
    * reference's horizontal concat of the two indicator blocks (:356-357).
    */
  def recodeClaims(df: DataFrame, dxMap: Map[String, String],
                   pcsMap: Map[String, String]): DataFrame = {
    val dxVocab = vocabOf(dxMap)
    val pcsVocab = vocabOf(pcsMap)
    def slotIdx(slots: Seq[String], m: Map[String, String],
                vocab: Seq[String], offset: Int): Seq[Column] = {
      // vocab = m.values sorted-distinct, so every value has an index;
      // prebuilt index map instead of per-entry indexOf scans
      val vocabIdx = vocab.zipWithIndex.toMap
      val codeToIdx = m.map { case (k, v) =>
        k -> (vocabIdx(v) + offset)
      }
      val lookup = typedlit(codeToIdx)
      slots.map(c => coalesce(try_element_at(lookup, col(c)), lit(-1)))
    }
    val idxs = array(
      slotIdx(dxSlots, dxMap, dxVocab, 0) ++
        slotIdx(pcsSlots, pcsMap, pcsVocab, dxVocab.size): _*)
    df.withColumn("code_idxs",
      array_distinct(filter(idxs, i => i >= 0)))
  }

  /** P15/P16: claim-level binary label (ref :202) + projection. */
  def withLabel(df: DataFrame, cfg: CmsConfig): DataFrame =
    df.withColumn("label",
      when(col("CLM_DRG_CD").isin(cfg.tjrDrg: _*), 1).otherwise(0))

  // ---- stage 3a: AOV (ref :267-297) ------------------------------------

  /** Patient-year max aggregation (A1) then fixed-year flatten (E1) into
    * a `|fullYears| × (2 + W)` sparse vector; label = patient's max label
    * in the final year (ref :295 takes the target from the label year).
    * Two shuffles total: the (patient, year) agg and the patient
    * flatten (which share one patient exchange at scale, where the
    * enrollment semi-join already hash-partitioned the claims by
    * patient — the ClusteredDistribution subset rule) — and the label
    * rides the flatten aggregation as a carried max (r10): a separate
    * labels aggregate + join let column pruning specialize the two
    * branches' partial aggs, exchange reuse missed, and the whole
    * claims pipeline ran TWICE (one CSV pipeline pass and its
    * exchanges deleted; 100k-patient e2e 4.4 → 4.0 s — the duplicated
    * pass was mostly-parallel CSV scanning, so the time win is modest
    * but the scan volume halves; census in docs/CMS_SCALE.md).
    */
  def aov(claims: DataFrame, width: Int, cfg: CmsConfig): DataFrame = {
    val perYear = claims.groupBy("DESYNPUF_ID", "Year").agg(
      max(col("Age")).as("age"),
      max(col("BENE_SEX_IDENT_CD")).as("sex"),
      array_distinct(flatten(collect_list(col("code_idxs"))))
        .as("code_idxs"),
      max(when(col("Year") === cfg.endYear, col("label"))
        .otherwise(0)).as("__ylabel"))
    Encoders.aovFlatten(
      perYear.select(col("DESYNPUF_ID"), col("Year"), col("age"),
        col("sex"), col("code_idxs"), col("__ylabel")),
      "DESYNPUF_ID", "Year", Seq("age", "sex"), "code_idxs", width,
      cfg.fullYears,
      carryAggs = Seq(max(col("__ylabel")).as("label")))
  }

  // ---- stage 3b: MHE (ref :300-342) ------------------------------------

  /** Class rebalance (sort label desc + limit, ref :313-314 — compiles to
    * TakeOrderedAndProject), deterministic shuffle (:317), then the
    * per-claim day-grid scatter (E2) plus the demographics vector. Narrow
    * after the limit — no further shuffle. */
  def mhe(claims: DataFrame, width: Int, rows: Int): DataFrame = {
    val doy = dayofyear(col("clm_date"))
    claims
      .orderBy(col("label").desc, col("CLM_ID"))
      .limit(rows)
      .orderBy(RelationalOps.mixKey(crc32(col("CLM_ID"))), col("CLM_ID"))
      .select(
        col("DESYNPUF_ID"), col("CLM_ID"), col("label"),
        array(col("Age"), col("BENE_SEX_IDENT_CD").cast("double"))
          .as("demographics"),
        Encoders.mheVector(doy, col("code_idxs"), width).as("grid"))
  }

  /** pde events per patient — the commented ben⋈pde⋈ip variant
    * (`modelling CNN.ipynb` cell 3): prescription-event counts join the
    * claim stream as an extra demographic-style feature. pde is a fact
    * table keyed by patient, so it pre-aggregates to one row per patient
    * before the (broadcastable) join. */
  def loadPde(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("DESYNPUF_ID", StringType),
        StructField("PROD_SRVC_ID", StringType))))
      .csv(path)

  def withPdeCounts(claims: DataFrame, pde: DataFrame): DataFrame = {
    val counts = pde.groupBy("DESYNPUF_ID")
      .agg(count("*").as("n_rx"),
        countDistinct(col("PROD_SRVC_ID")).as("n_rx_distinct"))
    claims.join(broadcast(counts), Seq("DESYNPUF_ID"), "left")
      .na.fill(0L, Seq("n_rx", "n_rx_distinct"))
  }

  /** Convenience: full AOV pipeline from raw fixture paths. */
  def aovPipeline(spark: SparkSession, benPath: String, ipPath: String,
                  dxPath: String, pcsPath: String,
                  cfg: CmsConfig = CmsConfig()): DataFrame = {
    val dxMap = crosswalkMap(loadCrosswalk(spark, dxPath))
    val pcsMap = crosswalkMap(loadCrosswalk(spark, pcsPath))
    val width = vocabOf(dxMap).size + vocabOf(pcsMap).size
    val claims = withLabel(
      recodeClaims(
        arthritisPatientData(loadBen(spark, benPath),
          loadIp(spark, ipPath), cfg),
        dxMap, pcsMap), cfg)
    aov(claims, width, cfg)
  }
}
