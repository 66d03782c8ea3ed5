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

  private[streaming] def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
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

  /** Highest committed epoch id under `root` (folded runs count by
    * their upper bound). On a root whose writer freezes EVERY batch id
    * in order, coverage is contiguous — `maxEpoch ≥ k` means batch k's
    * data is already in the root even if its own dir was folded away.
    */
  def maxEpoch(spark: SparkSession, root: String): Option[Long] = {
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) None
    else fs.listStatus(rootP).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong)
      .maxOption
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

  /** [[latestEpochBefore]] with a marker fast path: a root whose writer
    * maintains `<root>/<markerName>` (last committed epoch id) resolves
    * in two FS metadata calls instead of an O(epochs) root listing.
    * The marker stays an optimization: unusable (≥ bound, missing
    * epoch, absent) falls back to the listing, and a STALE-but-valid
    * marker returns an OLDER committed epoch than the true latest —
    * callers' algebra must tolerate that ([[RateGate]]'s does: any
    * committed sample epoch is a correct refresh base; the emitted
    * epoch is boundary-independent).
    */
  def latestEpochBeforeFast(spark: SparkSession, root: String, bound: Long,
      markerName: String): Option[Long] =
    readMarker(spark, s"$root/$markerName") match {
      case Some(v) if v < bound && epochExists(spark, root, v) => Some(v)
      case _ => latestEpochBefore(spark, root, bound)
    }

  /** [[anyEpochData]] with a marker fast path: once any epoch under
    * `root` has data it stays true forever (compaction folds, never
    * drops), so the writer sets `<root>/<markerName>` once and every
    * later check is a single FS read instead of a recursive walk over
    * every epoch dir.
    */
  def anyEpochDataFast(spark: SparkSession, root: String,
      markerName: String): Boolean =
    readMarker(spark, s"$root/$markerName").isDefined || anyEpochData(spark, root)

  // ——— compacted runs: the epoch-log lifetime bound ———
  //
  // A gate's seen root gains one `epoch=k` dir per trigger forever; at
  // a 5 s cadence that is ~120k dirs/week, and every whole-root read
  // (Spark's file listing, anyEpochData's walk) pays O(triggers) FS
  // metadata. compactRuns folds committed epochs into larger RUNS —
  // `epoch=<hi>` covering (previous run's hi, hi], recorded by a
  // `_graft_run_lo` side file — with the binary-counter merge policy
  // (merge the newest adjacent pair where the older run's span doesn't
  // exceed the newer's), so the root holds O(log triggers) dirs and
  // each doc is rewritten O(log triggers) times over the stream's
  // lifetime. Readers are unchanged: a folded run keeps the inner
  // `__band=` layout (directory pruning intact) and adopts `hi` as its
  // `epoch` partition value, which is semantics-preserving as long as
  // no reader ever splits the root at a boundary strictly inside a
  // folded range — callers guarantee that by passing `upTo` ≤ every
  // future refresh boundary (RateGate: the latest emitted sample
  // epoch, which is monotone).

  private val RunLoFile = "_graft_run_lo"
  private val MergedPrefix = ".merged_e"

  private[streaming] final case class Run(hi: Long, lo: Long, hasData: Boolean)

  private def readRunLo(fs: FileSystem, dir: Path, hi: Long): Long = {
    val p = new Path(dir, RunLoFile)
    if (!fs.exists(p)) hi
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    }
  }

  /** Committed runs under `root`, oldest first (a plain trigger epoch
    * is a span-1 run). O(|dirs|) FS metadata — cheap once the root is
    * compacted.
    */
  private[streaming] def listRuns(spark: SparkSession, root: String): Seq[Run] = {
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) Seq.empty
    else fs.listStatus(rootP).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("epoch="))
      .map { d =>
        val hi = d.getPath.getName.stripPrefix("epoch=").toLong
        Run(hi, readRunLo(fs, d.getPath, hi), hasParquet(fs, d.getPath))
      }.sortBy(_.hi)
  }

  /** Phase 2+3 of a merge swap: delete the visible source runs the
    * hidden merged dir supersedes ([lo, hi]), then take the visible
    * name. Idempotent — safe to re-drive after a crash at any point.
    */
  private def finishSwap(fs: FileSystem, rootP: Path, merged: Path,
      hi: Long, lo: Long): Unit = {
    fs.listStatus(rootP).toSeq
      .filter { d =>
        d.isDirectory && d.getPath.getName.startsWith("epoch=") && {
          val k = d.getPath.getName.stripPrefix("epoch=").toLong
          k >= lo && k <= hi
        }
      }
      .foreach(d => fs.delete(d.getPath, true))
    if (!fs.rename(merged, new Path(rootP, s"epoch=$hi")))
      throw new java.io.IOException(s"run swap rename failed: $merged")
  }

  /** Finish any merge swap that crashed between its commit rename and
    * the visible swap. MUST run before reading a root that is being
    * compacted: between the hidden `.merged_e<hi>` commit and the
    * visible rename, the root can be missing source runs. No-op (one
    * root listing) when nothing crashed.
    */
  def recoverRuns(spark: SparkSession, root: String): Unit = {
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) return
    fs.listStatus(rootP).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(MergedPrefix))
      .foreach { d =>
        val hi = d.getPath.getName.stripPrefix(MergedPrefix).toLong
        finishSwap(fs, rootP, d.getPath, hi, readRunLo(fs, d.getPath, hi))
      }
  }

  /** Fold committed runs with `hi ≤ upTo` until every run's span
    * exceeds the combined span of everything newer than it (the
    * Bentley-Saxe / logarithmic-method invariant): per pass, merge the
    * longest suffix of runs whose oldest member no longer dominates the
    * rest — ONE multi-source merge per pass, so a first-enable backlog
    * of N trigger epochs folds in a single job instead of N cascading
    * pair merges, and steady state does amortized O(1) merges per
    * trigger with each doc rewritten O(log triggers) times total.
    *
    * Each merge is two-phase: stage the combined run (re-partitioned
    * on `bandCol` so file count stays ≤ bands per run) → atomic rename
    * to hidden `.merged_e<hi>` (the commit point) → [[finishSwap]].
    * Returns the number of merges performed. Callers own the `upTo`
    * boundary contract (see the section comment above).
    */
  def compactRuns(spark: SparkSession, root: String, upTo: Long,
      bandCol: String = "__band", bands: Int = 32): Int = {
    recoverRuns(spark, root)
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) return 0
    var merges = 0
    var go = true
    while (go) {
      val runs = listRuns(spark, root).filter(_.hi <= upTo)
      val spans = runs.map(r => r.hi - r.lo + 1)
      val tailSums = spans.scanRight(0L)(_ + _).drop(1) // sum of spans after j
      // oldest run whose span no longer dominates everything newer —
      // merge it and the whole suffix in one pass
      val at = runs.indices.dropRight(1).find(j => spans(j) <= tailSums(j))
      at match {
        case None => go = false
        case Some(j) =>
          val suffix = runs.drop(j)
          val (lo, hi) = (suffix.head.lo, suffix.last.hi)
          val staging = new Path(new Path(rootP, ".staging"), s"m$hi")
          val srcs = suffix.filter(_.hasData).map(r => s"$root/epoch=${r.hi}")
          if (srcs.nonEmpty)
            // merged runs are long-lived corpus record (unlike trigger
            // epochs) — default codec, not "none". basePath = root so
            // the epoch dirs read as one partitioned table; the epoch
            // partition column is dropped (the merged run adopts `hi`
            // via its dir name).
            spark.read.option("basePath", root).parquet(srcs: _*)
              .drop("epoch")
              .repartition(bands, org.apache.spark.sql.functions.col(bandCol))
              .write.mode(SaveMode.Overwrite).partitionBy(bandCol)
              .parquet(staging.toString)
          else {
            fs.delete(staging, true); fs.mkdirs(staging)
          }
          val out = fs.create(new Path(staging, RunLoFile), true)
          try out.write(lo.toString.getBytes("UTF-8")) finally out.close()
          val merged = new Path(rootP, s"$MergedPrefix$hi")
          if (fs.exists(merged)) fs.delete(merged, true)
          if (!fs.rename(staging, merged))
            throw new java.io.IOException(s"run merge rename failed: $staging")
          finishSwap(fs, rootP, merged, hi, lo)
          merges += 1
      }
    }
    merges
  }
}
