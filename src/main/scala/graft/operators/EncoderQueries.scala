package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Encoder queries (SURVEY.md §2.6). `mhe_encode` exposes the day-grid
  * scatter in exploded (row, flat-index) form so DuckDB can verify the
  * index arithmetic exactly; the SparseVector assembly itself is
  * `aov_vector` / [[Encoders]] (vector types aren't SQL-comparable →
  * rows-only driver check + scalatest).
  */
object EncoderQueries {

  private val eventTypes = Seq("click", "error", "purchase", "signup",
    "view")

  val defs: Map[String, QDef] = Map(

    // E2 index arithmetic: flat_idx = (doy-1)*W + code_idx, W = 5 event
    // types standing in for the 516 CCS categories.
    "mhe_encode" -> QDef(
      (s, d) => {
        val typeIdx = eventTypes.zipWithIndex
          .foldLeft(lit(-1)) { case (acc, (t, i)) =>
            when(col("event_type") === t, i).otherwise(acc)
          }
        Tables.load(s, d, "events").select(
          col("event_id"),
          dayofyear(col("ts")).as("doy"),
          typeIdx.as("type_idx"),
          ((dayofyear(col("ts")) - 1) * eventTypes.size + typeIdx)
            .as("flat_idx"))
      },
      "SELECT event_id, CAST(dayofyear(ts) AS INT) AS doy, " +
        "CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 " +
        "ELSE -1 END AS INT) AS type_idx, " +
        "CAST((dayofyear(ts) - 1) * 5 + " +
        "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 " +
        "ELSE -1 END AS INT) AS flat_idx FROM events"),

    // E1 end-to-end: per-user AOV SparseVector over 3 fixed years of
    // events — layout years × (1 demo + 5 indicators). Vector output →
    // rows-only driver check; exact content is scalatest-verified.
    "aov_vector" -> QDef.noOracle(
      (s, d) => {
        val ev = Tables.load(s, d, "events").select(
          col("user_id"),
          year(col("ts")).as("y"),
          col("value"),
          array(eventTypes.zipWithIndex.map { case (t, i) =>
            when(col("event_type") === t, i).otherwise(-1)
          }: _*).as("idxs"))
        val perYear = ev.groupBy("user_id", "y").agg(
          max(col("value")).as("max_value"),
          array_distinct(flatten(collect_list(col("idxs"))))
            .as("code_idxs"))
          .select(col("user_id"), col("y"), col("max_value"),
            filter(col("code_idxs"), i => i >= 0).as("code_idxs"))
        Encoders.aovFlatten(perYear, "user_id", "y",
          Seq("max_value"), "code_idxs", eventTypes.size,
          Seq(2024, 2025, 2026))
          .select(col("user_id"), col("features").cast("string")
            .as("features_str"))
      })
  )
}
