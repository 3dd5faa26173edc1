package graft.streaming

import org.apache.spark.sql.DataFrame

/** Shared mtime-ordered file staging for AvailableNow replays — used by
  * both the driver-gate queries ([[StreamGateQueries]]) and the scale
  * proof (`graft.examples.StreamScale`), so a future fix to file
  * ordering or sentinel semantics lands in exactly one place.
  *
  * Why it exists at all: the file source orders micro-batches by file
  * modification time, so a replay that needs "all real data first, then
  * the watermark-advancing sentinel(s)" must control both the file
  * boundaries (one file per intended batch, hence coalesce(1)) and the
  * mtimes. */
private[graft] object StreamStage {

  /** Write `df` as ONE parquet file `name.parquet` inside `srcDir`
    * with the given modification time. */
  def stageFile(df: DataFrame, srcDir: String, name: String,
                mtime: Long): Unit = {
    val tmp = s"${srcDir}_stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val d = new java.io.File(srcDir)
    d.mkdirs()
    val dst = new java.io.File(d, s"$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(mtime)
  }
}
