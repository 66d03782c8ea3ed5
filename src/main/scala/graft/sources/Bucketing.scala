package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange. The 100 TB
  * pattern for fact⋈fact joins that recur every pipeline run (e.g.
  * lineitem⋈orders on orderkey): pay the shuffle once, reuse forever.
  */
object Bucketing {

  /** Collision-safe table-name suffix for a dataset directory: 12 hex
    * chars of md5 (48 bits) — managed tables are global to the
    * warehouse, and the 32-bit `String.hashCode` this replaces made two
    * datasets silently share (and overwrite) one index table on a
    * collision.
    */
  def dirSuffix(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** Make `table` writable by CTAS: drop any catalog entry AND delete a
    * leftover location. A fresh session's in-memory catalog doesn't
    * know about directories a PREVIOUS JVM left in the warehouse, so a
    * bare Overwrite saveAsTable fails with LOCATION_ALREADY_EXISTS on
    * every re-run. The location is resolved through the catalog
    * (existing table metadata, else the default path for the parsed
    * identifier) and deleted via the Hadoop FileSystem — correct for
    * qualified names and non-local warehouses, where reconstructing
    * `warehouse.dir/<name>` would silently miss.
    */
  def resetTable(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc: java.net.URI =
      if (catalog.tableExists(ident)) catalog.getTableMetadata(ident).location
      else catalog.defaultTablePath(ident)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
    // a compacted table's location is a `__v<NNN>` sibling of the
    // default path ([[compactTable]]'s pointer flip); clear the default
    // dir and any other versions too, or a rebuild leaks them
    val base = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    if (fs.exists(base) && base != path) fs.delete(base, true)
    val verPat = versionDirPattern(base.getName)
    if (fs.exists(base.getParent))
      fs.listStatus(base.getParent).foreach { st =>
        if (verPat.pattern.matcher(st.getPath.getName).matches())
          fs.delete(st.getPath, true)
      }
  }

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    resetTable(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append rows to an EXISTING bucketed table, inheriting its bucket
    * spec from the catalog (a hand-passed spec that drifted from the
    * table's would corrupt bucket pruning silently). The appended files
    * hash into the same buckets, so reads keep the exchange-free join
    * property; ingest batches pay one O(|batch|) bucketed write, never
    * a table rewrite — the index-append primitive
    * ([[AnnIndex]]/[[DedupIndex]] `append*`).
    */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table has no bucket spec to inherit"))
    val w = df.write.mode(SaveMode.Append)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    val sorted =
      if (spec.sortColumnNames.isEmpty) w
      else w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    sorted.format("parquet").saveAsTable(table)
    // a session that scanned the table BEFORE this append holds a
    // cached file listing; standard Spark semantics, but within the
    // writing session we can invalidate it ourselves
    spark.catalog.refreshTable(table)
  }

  /** Fold an append-accumulated bucketed table back to ONE file per
    * bucket. Each [[appendBucketed]] lands a fresh file-set per bucket,
    * so N ingest batches → N×buckets files; the exchange-free join
    * property survives but every serve scan pays N× the per-file open
    * cost. SERVE-SAFE: concurrent readers see pre- or post-compact
    * rows, never an error or a partial set (spec-pinned in
    * `CompactTableSpec`). Appends remain single-writer with compaction
    * — both claim the scratch/ingest staging and the ingest pipeline
    * that runs appends is the natural place to schedule compaction.
    *
    * Mechanics: rewrite into a scratch table with the SAME
    * catalog-inherited bucket spec via a SHUFFLE-FREE bucketed scan —
    * with auto-bucketed-scan pinned on, the read yields one task per
    * bucket (all of the bucket's accumulated files), and the bucketed
    * writer emits exactly one file from each, so compaction moves bytes
    * once and never exchanges. (Left to the heuristic, the planner
    * elides the would-be repartition against the table's declared
    * hash partitioning and THEN downgrades the scan to size-grouped
    * file splits — producing tasks that straddle buckets; the pin
    * closes that trap.)
    *
    * Publish is a POINTER FLIP, not a directory swap: the compacted
    * copy renames (atomically) to an immutable versioned sibling
    * (`<table>__v<millis>`), then `ALTER TABLE … SET LOCATION` points
    * the catalog at it — the snapshot-store pattern applied to index
    * tables. A reader planned before the flip keeps scanning the
    * previous location, which stays on disk untouched; readers planned
    * after resolve the new one. The previous location is reclaimed by
    * the NEXT compaction's entry sweep (grace window = one compaction
    * cycle; any reader still holding a listing from before the
    * *previous* compact has long drained). Crash windows all degrade
    * to orphan directories the next run sweeps — no point loses rows:
    * before the rename → scratch leftovers ([[resetTable]] clears);
    * between rename and flip → an unreferenced version dir (swept);
    * after the flip → the stale previous location (swept).
    */
  def compactTable(spark: SparkSession, table: String): Unit = {
    val autoScanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAutoScan = spark.conf.getOption(autoScanKey)
    spark.conf.set(autoScanKey, "false")
    try compactTableInner(spark, table)
    finally prevAutoScan match {
      case Some(v) => spark.conf.set(autoScanKey, v)
      case None => spark.conf.unset(autoScanKey)
    }
  }

  /** `<default path>__v<NNN>` — the immutable home of one compacted
    * version. The default path (not the current location) anchors the
    * name so versions never nest.
    */
  private def versionDirPattern(baseName: String) =
    (java.util.regex.Pattern.quote(baseName) + "__v\\d+").r

  private def compactTableInner(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table has no bucket spec to compact"))
    val cur = new org.apache.hadoop.fs.Path(meta.location)
    val base = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    // legacy recovery (pre-pointer-flip layout): data stranded in ._old
    val old = new org.apache.hadoop.fs.Path(
      base.getParent, "." + base.getName + "._old")
    if (fs.exists(old)) {
      if (!fs.exists(cur)) fs.rename(old, cur)
      else fs.delete(old, true)
    }
    // entry sweep: every non-current version dir (and the non-current
    // default dir) is a previous version or a crash orphan whose grace
    // window has passed — reclaim before writing the next one
    val verPat = versionDirPattern(base.getName)
    fs.listStatus(base.getParent).foreach { st =>
      val n = st.getPath.getName
      val isOldVersion = verPat.pattern.matcher(n).matches() || st.getPath == base
      if (isOldVersion && st.getPath != cur) fs.delete(st.getPath, true)
    }
    val scratch = table + "__compacting"
    resetTable(spark, scratch)
    val w = spark.table(table)
      .repartition(spec.numBuckets, spec.bucketColumnNames.map(
        org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    val sorted =
      if (spec.sortColumnNames.isEmpty) w
      else w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    sorted.format("parquet").saveAsTable(scratch)
    val scratchLoc = new org.apache.hadoop.fs.Path(
      catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(scratch)).location)
    // publish: one atomic rename into the versioned home, then the
    // catalog pointer flip — the current location is never touched, so
    // a reader that planned against it keeps a consistent snapshot
    val next = fs.makeQualified(new org.apache.hadoop.fs.Path(
      base.getParent, base.getName + "__v" + System.currentTimeMillis()))
    fs.rename(scratchLoc, next)
    spark.sql(s"ALTER TABLE $table SET LOCATION '$next'")
    // the scratch table's directory moved out from under its catalog
    // entry; give DROP an empty dir to delete so it can't throw
    fs.mkdirs(scratchLoc)
    spark.sql(s"DROP TABLE IF EXISTS $scratch")
    spark.catalog.refreshTable(table)
  }

  /** [[appendBucketed]] made VALUE-IDEMPOTENT for replayable (streaming
    * epoch) appends: the batch's bucket files land under deterministic
    * names keyed by (`epochKey`, bucket id), so replaying the same
    * epoch overwrites its own files instead of accumulating duplicates
    * — the property that closes foreachBatch's crash-between-append-
    * and-marker window without a transactional table format. A crash
    * mid-append leaves a strict subset of the epoch's files; the replay
    * rewrites all of them (same batch + same stored trained state ⇒
    * byte-identical rows).
    *
    * Mechanics: NO scratch table — `repartition(numBuckets, bucketCols)`
    * IS the bucket function (`HashPartitioning.partitionIdExpression` =
    * `pmod(murmur3(bucketCols), n)`, the exact expression Spark's
    * bucketed writer evaluates per row), so after that shuffle the
    * task partition index EQUALS the bucket id and the batch writes as
    * plain parquet into a dot-prefixed staging dir INSIDE the table
    * location (invisible to scans). Each staged `part-<idx>-…` file
    * then renames to `part-00000-<epochKey>_<idx>.c000.snappy.parquet`
    * — the name whose `_<idx>.` suffix the bucketed scan reads the
    * bucket id from. The explicit partition COUNT pins the shuffle to
    * `REPARTITION_BY_NUM`, which AQE never coalesces — a coalesced
    * index↔bucket mismatch would mis-bucket silently, so the count is
    * load-bearing, not style. This path replaced a scratch-table CTAS
    * (create + drop + sweep per append): the catalog churn was ~2/3 of
    * the ingest gate's append wall time, for files that were renamed
    * away anyway. Crash debris is a dot-dir the same epoch's replay
    * overwrites (or the next compaction's location flip strands and
    * sweeps).
    */
  def appendBucketedEpoch(df: DataFrame, table: String, epochKey: String): Unit = {
    require(epochKey.matches("[A-Za-z0-9-]+"),
      s"epochKey must be filename-safe, got: $epochKey")
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table has no bucket spec to inherit"))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(loc, s".epoch-$epochKey")
    val bucketCols = spec.bucketColumnNames.map(
      org.apache.spark.sql.functions.col)
    val shaped = df.repartition(spec.numBuckets, bucketCols: _*)
    val sorted =
      if (spec.sortColumnNames.isEmpty) shaped
      else shaped.sortWithinPartitions(spec.sortColumnNames.map(
        org.apache.spark.sql.functions.col): _*)
    sorted.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val partPat = "^part-(\\d{5})-".r
    fs.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet"))
        partPat.findFirstMatchIn(n).foreach { m =>
          val dest = new org.apache.hadoop.fs.Path(
            loc, f"part-00000-${epochKey}_${m.group(1)}.c000.snappy.parquet")
          fs.delete(dest, false) // replay: replace this epoch's own file
          // a false rename (no exception) would leave the bucket file in
          // the staging dir that the cleanup below deletes recursively —
          // the epoch's rows for that bucket would vanish SILENTLY and
          // future near-dups of those docs would pass the gate undetected
          if (!fs.rename(st.getPath, dest))
            throw new java.io.IOException(
              s"appendBucketedEpoch: rename ${st.getPath} -> $dest " +
                s"returned false on ${fs.getClass.getSimpleName}")
        }
    }
    fs.delete(staging, true)
    spark.catalog.refreshTable(table)
  }

  /** Per-bucket data-file count histogram — the signal a maintenance
    * job watches to decide when [[compactTable]] is due. */
  def fileCount(spark: SparkSession, table: String): Int = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(loc)) 0
    else fs.listStatus(loc).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Join two bucketed tables on their shared bucket key — planner
    * recognizes compatible `HashClusteredDistribution`s and elides both
    * exchanges (verify with `.explain`: no Exchange under the join).
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
