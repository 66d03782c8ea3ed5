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
    *
    * `partitionBy` writes hive-partitioned subdirs INSIDE the epoch
    * (`epoch=k/<col>=v/…`) — the rename still commits the whole epoch
    * atomically, and readers of the root see both `epoch` and the
    * inner column as partition columns. This is how a consumer gets
    * directory-pruned selective re-reads of an append-only epoch log
    * ([[MixtureGate]]'s hash-band refresh) without a second store.
    *
    * `sideFiles` (name → contents) land inside the staged epoch before
    * the rename, so they commit atomically WITH the data — the slot
    * for trigger-frozen scalars a later trigger must re-read exactly
    * (e.g. the rates a sample epoch was decided under). Names must
    * start with `_` or `.` so parquet readers ignore them.
    */
  def commitEpoch(df: DataFrame, root: String, batchId: Long,
      maxFiles: Int = 1, partitionBy: Seq[String] = Nil,
      sideFiles: Map[String, String] = Map.empty): Unit = {
    require(sideFiles.keys.forall(n => n.startsWith("_") || n.startsWith(".")),
      "epoch side files must be underscore/dot-prefixed (hidden from parquet readers)")
    val (fs, rootP) = fsFor(df.sparkSession, root)
    val dest = new Path(rootP, s"epoch=$batchId")
    val staging = new Path(new Path(rootP, ".staging"), s"e$batchId")
    if (!fs.exists(dest)) {
      // uncompressed: epoch files are trigger-sized and short-lived
      // downstream (read once, compacted/consumed); codec init +
      // compression is measurable per-epoch latency for no storage win
      // that matters at these sizes
      val w = df.coalesce(maxFiles).write.mode(SaveMode.Overwrite)
        .option("compression", "none")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(staging.toString)
      sideFiles.foreach { case (name, contents) =>
        val out = fs.create(new Path(staging, name), true)
        try out.write(contents.getBytes("UTF-8")) finally out.close()
      }
      fs.mkdirs(dest.getParent)
      // a false return with dest present = a concurrent replay won the
      // commit, which is fine; false with no dest is a real failure
      if (!fs.rename(staging, dest) && !fs.exists(dest))
        throw new java.io.IOException(
          s"epoch commit rename failed: $staging -> $dest")
    }
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  /** Read a side file committed with an epoch ([[commitEpoch]]'s
    * `sideFiles`); None if the epoch or the file is absent.
    */
  def readSideFile(spark: SparkSession, root: String, batchId: Long,
      name: String): Option[String] = {
    val (fs, rootP) = fsFor(spark, root)
    val p = new Path(new Path(rootP, s"epoch=$batchId"), name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Highest committed epoch id under `root` strictly below `bound`;
    * None if there is none. FS-metadata only (no Spark job).
    */
  def latestEpochBefore(spark: SparkSession, root: String,
      bound: Long): Option[Long] = {
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) None
    else fs.listStatus(rootP).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong)
      .filter(_ < bound)
      .sorted.lastOption
  }

  /** Has `epoch=<batchId>` committed under `root`? The replay fast-path
    * for stateless sinks ([[AnnServeStream]]).
    */
  def epochExists(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (fs, rootP) = fsFor(spark, root)
    fs.exists(new Path(rootP, s"epoch=$batchId"))
  }

  /** Any `.parquet` data file under `dir`, descending into hive
    * partition subdirs (epochs written with `partitionBy` nest their
    * files one level down).
    */
  private def hasParquet(fs: FileSystem, dir: Path): Boolean =
    fs.listStatus(dir).exists { st =>
      (st.isFile && st.getPath.getName.endsWith(".parquet")) ||
        (st.isDirectory && !st.getPath.getName.startsWith(".") &&
          hasParquet(fs, st.getPath))
    }

  /** Does the committed epoch contain any data files? An all-filtered
    * epoch commits a dir with only writer metadata — callers that feed
    * the epoch onward (index appends) skip those.
    */
  def epochHasData(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (fs, rootP) = fsFor(spark, root)
    val dir = new Path(rootP, s"epoch=$batchId")
    fs.exists(dir) && hasParquet(fs, dir)
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
        hasParquet(fs, d.getPath)
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
