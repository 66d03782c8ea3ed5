package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Exactly-once epoch publication for foreachBatch sinks that write
  * plain parquet directories: stage under a dot-dir (invisible to
  * readers), then commit the whole epoch with ONE atomic rename to
  * `<root>/epoch=<batchId>`. A foreachBatch replay that finds the
  * committed dir skips recomputation; one that crashed mid-stage simply
  * overwrites its own debris. Readers see `epoch` as a partition column
  * and never observe a half-written epoch.
  *
  * Shared by [[IngestDedup]] (the ingest gate's survivor/reject roots)
  * and [[AnnServeStream]] (served top-k results) — any stateless
  * per-batch computation gets exactly-once output from this alone,
  * because the result of a replayed batch is recomputed from frozen
  * inputs (the stored index) and lands in the same epoch dir.
  */
object EpochCommit {

  /** Stage `df` under `<root>/.staging/e<batchId>`, then commit it as
    * `<root>/epoch=<batchId>` with one atomic rename. Idempotent: an
    * already-committed epoch is left untouched (and any staging debris
    * from the losing attempt removed).
    */
  def commitEpoch(df: DataFrame, root: String, batchId: Long): Unit = {
    val dest = Paths.get(root, s"epoch=$batchId")
    val staging = Paths.get(root, ".staging", s"e$batchId")
    if (!Files.exists(dest)) {
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      Files.createDirectories(dest.getParent)
      try Files.move(staging, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    if (Files.exists(staging))
      org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
  }
}
