package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Exactly-once epoch publication for foreachBatch sinks that write
  * plain parquet directories: stage under a dot-dir (invisible to
  * readers), then commit the whole epoch with ONE atomic rename to
  * `<root>/epoch=<batchId>`. A foreachBatch replay that finds the
  * committed dir skips recomputation; one that crashed mid-stage simply
  * overwrites its own debris. Readers see `epoch` as a partition column
  * and never observe a half-written epoch.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]]
  * resolved from the root path's scheme, so the choreography carries to
  * HDFS unchanged (HDFS rename IS atomic). On a POSIX local FS the
  * rename is `renameTo` — equally atomic. Object stores without atomic
  * rename (S3A) get copy+rename semantics from their connector: a
  * reader could then observe a partially-copied epoch, so on such
  * stores point the epoch roots at an HDFS-semantics tier (or wrap the
  * root in a transactional table format) — same constraint as every
  * rename-based Spark committer.
  *
  * Shared by [[IngestDedup]] / [[SemanticIngestGate]] (the ingest
  * gates' survivor/reject roots) and [[AnnServeStream]] (served top-k
  * results) — any stateless per-batch computation gets exactly-once
  * output from this alone, because the result of a replayed batch is
  * recomputed from frozen inputs (the stored index) and lands in the
  * same epoch dir.
  */
object EpochCommit {

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Stage `df` under `<root>/.staging/e<batchId>`, then commit it as
    * `<root>/epoch=<batchId>` with one atomic rename. Idempotent: an
    * already-committed epoch is left untouched (and any staging debris
    * from the losing attempt removed).
    *
    * `maxFiles` caps the files per epoch (post-shuffle coalesce, no
    * extra exchange). Streaming epochs are batch-sized — without the
    * cap a 64-row serve epoch writes one ~2-row file per shuffle
    * partition, the small-files failure mode AND ~32 file commits of
    * per-epoch latency (AQE can't rescue this: it's disabled inside
    * micro-batches). Raise it for pipelines whose epochs are large
    * enough that a single write task would bottleneck.
    */
  def commitEpoch(df: DataFrame, root: String, batchId: Long,
      maxFiles: Int = 1): Unit = {
    val (fs, rootP) = fsFor(df.sparkSession, root)
    val dest = new Path(rootP, s"epoch=$batchId")
    val staging = new Path(new Path(rootP, ".staging"), s"e$batchId")
    if (!fs.exists(dest)) {
      // uncompressed: epoch files are trigger-sized and short-lived
      // downstream (read once, compacted/consumed); codec init +
      // compression is measurable per-epoch latency for no storage win
      // that matters at these sizes
      df.coalesce(maxFiles).write.mode(SaveMode.Overwrite)
        .option("compression", "none").parquet(staging.toString)
      fs.mkdirs(dest.getParent)
      // a false return with dest present = a concurrent replay won the
      // commit, which is fine; false with no dest is a real failure
      if (!fs.rename(staging, dest) && !fs.exists(dest))
        throw new java.io.IOException(
          s"epoch commit rename failed: $staging -> $dest")
    }
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  /** Has `epoch=<batchId>` committed under `root`? The replay fast-path
    * for stateless sinks ([[AnnServeStream]]).
    */
  def epochExists(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (fs, rootP) = fsFor(spark, root)
    fs.exists(new Path(rootP, s"epoch=$batchId"))
  }

  /** Does the committed epoch contain any data files? An all-filtered
    * epoch commits a dir with only writer metadata — callers that feed
    * the epoch onward (index appends) skip those.
    */
  def epochHasData(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (fs, rootP) = fsFor(spark, root)
    val dir = new Path(rootP, s"epoch=$batchId")
    fs.exists(dir) && fs.listStatus(dir).exists { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
  }

  /** Does ANY committed epoch under `root` contain data files? Guards
    * whole-root reads (a refresh pass re-reading every epoch) against
    * the zero-part-file wedge: a root whose epochs are all empty would
    * die in schema inference.
    */
  def anyEpochData(spark: SparkSession, root: String): Boolean = {
    val (fs, rootP) = fsFor(spark, root)
    fs.exists(rootP) && fs.listStatus(rootP).exists { d =>
      d.isDirectory && d.getPath.getName.startsWith("epoch=") &&
        fs.listStatus(d.getPath).exists { st =>
          st.isFile && st.getPath.getName.endsWith(".parquet")
        }
    }
  }

  /** Read a fast-path epoch marker (highest fully-landed batch id).
    * Markers are an optimization only — correctness never depends on
    * them; a lost marker just means the epoch dirs get re-checked.
    */
  def readMarker(spark: SparkSession, markerPath: String): Option[Long] = {
    val (fs, p) = fsFor(spark, markerPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Overwrite the fast-path marker with `batchId`. */
  def writeMarker(spark: SparkSession, markerPath: String, batchId: Long): Unit = {
    val (fs, p) = fsFor(spark, markerPath)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
  }
}
