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
    val tmpDir = new java.io.File(tmp)
    val part = tmpDir.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val d = new java.io.File(srcDir)
    d.mkdirs()
    val dst = new java.io.File(d, s"$name.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    // the mtime IS the batch order — a filesystem that refuses the
    // update would scramble the replay; fail loudly, not confusingly
    require(dst.setLastModified(mtime),
      s"stageFile: could not set mtime on $dst - file-source batch " +
        "order would be undefined")
    // the staging dir holds only commit markers + empty part shells
    // after the move; leaving one per staged file litters tmp
    tmpDir.listFiles().foreach(_.delete())
    tmpDir.delete()
  }
}
