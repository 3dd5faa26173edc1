package graft.multimodal

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Driver-gated entries for the multimodal plumbing (r7 verdict item 3):
  * [[MultimodalOps]] was spec-gated only, the one pipeline family
  * without a CORRECTNESS row. These route the documents table through
  * the REAL media-column code paths — [[MultimodalOps.toMediaSchema]]
  * (ingest projection: surrogate id, format sniff) and
  * [[MultimodalOps.sampleVideoFrames]] (UDF + posexplode frame
  * sampling) — and gate the byte-level surface against a DuckDB oracle
  * that recomputes every column from scratch.
  *
  * Binary fixtures without binary testdata: the payloads are the
  * documents' text bytes. Text is sanitized to printable ASCII first
  * (`[^ -~]` → `_`, both engines) so the oracle's VARCHAR char math
  * (length, substring, md5) is exactly the engine's byte math — DuckDB
  * has no BLOB substring/md5, and without the sanitize a regenerated
  * multi-byte testdata row would silently desync char vs byte slicing.
  *
  * Out of gate scope (spec-gated in MultimodalOpsSpec + MediaScale):
  * StubCodec.features' wrapping-multiply rolling hash (BIGINT overflow
  * is an error, not a wrap, in DuckDB), binaryFile-source listing
  * semantics, packMediaDir sizing, id-collision gate. `media_id`
  * (xxhash64) is projected off the gated surface — DuckDB has no
  * xxhash64; `media_path` is the identity column by design
  * (MultimodalOps.mediaSchema scaladoc).
  */
object MediaQueries {

  /** documents → (path, content) in the binaryFile-source shape
    * [[MultimodalOps.toMediaSchema]] ingests: a deterministic URI with
    * an extension derived from doc_id (exercising the format regex on
    * all three), payload = sanitized-ASCII text bytes. */
  private def mediaRaw(s: org.apache.spark.sql.SparkSession, d: String,
                       onlyMp4: Boolean) = {
    val docs = Tables.load(s, d, "documents")
      .where(col("text").isNotNull)
    val picked = if (onlyMp4) docs.where(pmod(col("doc_id"), lit(3)) === 2)
      else docs
    picked.select(
      concat(lit("mem://corpus/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(3)) === 0, ".jpg")
          .when(pmod(col("doc_id"), lit(3)) === 1, ".png")
          .otherwise(".mp4")).as("path"),
      regexp_replace(col("text"), "[^ -~]", "_").cast("binary")
        .as("content"))
  }

  val defs: Map[String, QDef] = Map(

    // Ingest manifest: per-file identity, kind routing (mp4 → video —
    // the post-ingest refinement a mixed-media drop needs), sniffed
    // format, byte size, and full-content digest. Map-only over the
    // scan; at 100 TB this is the audit record a packMediaDir run
    // emits before payloads ever shuffle.
    "media_manifest" -> QDef(
      (s, d) => {
        val media = MultimodalOps.toMediaSchema(
            mediaRaw(s, d, onlyMp4 = false), "image")
          .withColumn("kind", when(col("format") === "mp4", "video")
            .otherwise("image"))
        media.select(col("media_path"), col("kind"), col("format"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("content_md5"))
      },
      "WITH m AS (SELECT 'mem://corpus/' || doc_id || " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.jpg' " +
        "WHEN 1 THEN '.png' ELSE '.mp4' END AS media_path, " +
        "regexp_replace(text, '[^ -~]', '_', 'g') AS atext " +
        "FROM documents WHERE text IS NOT NULL), " +
        "t AS (SELECT media_path, atext, " +
        "regexp_extract(media_path, '\\.([A-Za-z0-9]+)$', 1) " +
        "AS format FROM m) " +
        "SELECT media_path, CASE WHEN format = 'mp4' THEN 'video' " +
        "ELSE 'image' END AS kind, format, " +
        "CAST(length(atext) AS BIGINT) AS n_bytes, " +
        "md5(atext) AS content_md5 FROM t",
    ),

    // Frame sampling: 4 pseudo-frames per video payload through the
    // real UDF + posexplode path. The oracle replays StubCodec
    // .sampleFrames' slice arithmetic in SQL — slice = len/4 (integer
    // div), frame k = bytes [k*slice, k*slice + max(slice,1)) clamped
    // to len, so the degenerate payloads (len < 4: every frame is the
    // first byte; len = 0: four empty frames) are pinned, not just the
    // happy path — and digests each frame independently. Explode AFTER
    // the narrow sample: a payload never duplicates across a shuffle.
    "media_frames" -> QDef(
      (s, d) => {
        val media = MultimodalOps.toMediaSchema(
          mediaRaw(s, d, onlyMp4 = true), "video")
        MultimodalOps.sampleVideoFrames(media, nFrames = 4)
          .select(col("media_path"), col("frame_idx"),
            length(col("frame_bytes")).cast("long").as("frame_len"),
            md5(col("frame_bytes")).as("frame_md5"))
      },
      "WITH m AS (SELECT 'mem://corpus/' || doc_id || '.mp4' " +
        "AS media_path, regexp_replace(text, '[^ -~]', '_', 'g') " +
        "AS atext FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 3 = 2), " +
        "f AS (SELECT media_path, atext, " +
        "CAST(length(atext) AS BIGINT) AS len, " +
        "CAST(length(atext) // 4 AS BIGINT) AS s FROM m), " +
        "k AS (SELECT media_path, atext, len, s, " +
        "UNNEST([0, 1, 2, 3]) AS frame_idx FROM f), " +
        "b AS (SELECT media_path, frame_idx, atext, " +
        "frame_idx * s AS frm, " +
        "LEAST(frame_idx * s + GREATEST(s, 1), len) - " +
        "LEAST(frame_idx * s, len) AS flen FROM k) " +
        "SELECT media_path, CAST(frame_idx AS INT) AS frame_idx, " +
        "flen AS frame_len, " +
        "md5(substring(atext, CAST(frm + 1 AS BIGINT), flen)) " +
        "AS frame_md5 FROM b",
    ))
}
