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
    // events — layout years × (1 demo + 5 indicators), year-major.
    // The REAL assembled SparseVector is exploded back into
    // (user_id, idx, val) cells, which DuckDB recomputes from the
    // layout arithmetic — a full hash oracle over the vector CONTENT
    // (r2 carried this rows-only; the vector type itself isn't
    // SQL-comparable, but its cells are).
    "aov_vector" -> QDef(
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
        val flat = Encoders.aovFlatten(perYear, "user_id", "y",
          Seq("max_value"), "code_idxs", eventTypes.size,
          Seq(2024, 2025, 2026))
        val toCells = udf { (v: org.apache.spark.ml.linalg.Vector) =>
          v match {
            case sv: org.apache.spark.ml.linalg.SparseVector =>
              sv.indices.zip(sv.values).toSeq
            case dv =>
              dv.toArray.zipWithIndex
                .collect { case (x, i) if x != 0.0 => (i, x) }.toSeq
          }
        }
        flat.select(col("user_id"),
            explode(toCells(col("features"))).as("cell"))
          .select(col("user_id"), col("cell._1").as("idx"),
            col("cell._2").as("val"))
      },
      // span = 1 demo + 5 indicators = 6; year offsets 2024→0, 2025→6,
      // 2026→12. Demo cell at offset+0 = max(value); indicator cell at
      // offset+1+type_idx = 1.0 per distinct event type in the year.
      "WITH ev AS (SELECT user_id, CAST(year(ts) AS INT) AS y, value, " +
        "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 " +
        "ELSE -1 END AS tidx FROM events), " +
        "py AS (SELECT user_id, y, MAX(value) AS max_value FROM ev " +
        "WHERE y IN (2024, 2025, 2026) GROUP BY user_id, y), " +
        "offs AS (SELECT *, (CASE y WHEN 2024 THEN 0 WHEN 2025 THEN 1 " +
        "ELSE 2 END) * 6 AS off FROM py), " +
        "ind AS (SELECT DISTINCT user_id, y, tidx FROM ev " +
        "WHERE y IN (2024, 2025, 2026) AND tidx >= 0), " +
        "cells AS (" +
        "SELECT user_id, off + 0 AS idx, max_value AS val FROM offs " +
        "UNION ALL " +
        "SELECT user_id, (CASE y WHEN 2024 THEN 0 WHEN 2025 THEN 1 " +
        "ELSE 2 END) * 6 + 1 + tidx AS idx, 1.0 AS val FROM ind) " +
        "SELECT user_id, CAST(idx AS INT) AS idx, " +
        "CAST(val AS DOUBLE) AS val FROM cells")
  )
}
