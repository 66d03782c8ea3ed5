package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, hash, lit, max, pmod, struct, sum, to_date, when}
import org.apache.spark.sql.types.StructType
import graft.cdc.Apply

/** Versioned merge-on-read parquet store — the engine's local stand-in
  * for a MERGE-capable sink (Delta / JDBC MERGE in production, SURVEY
  * §2.8 ST5).
  *
  * Two kinds of committed version, in one monotonically increasing
  * sequence per table:
  *
  *  - `v<N>`: a full BASE snapshot (an explicit [[commit]], or a
  *    compaction).
  *  - `d<N>`: a DELTA — the batch's raw change events (`seq`,
  *    `operation`, pk, payload), appended by [[commitDelta]] in
  *    O(|batch|), never O(|table|).
  *
  * A read at version V reconstructs `base ⊕ deltas`: the latest base
  * `v<B>` with B ≤ V plus every delta in (B, V], replayed through
  * [[graft.cdc.Apply.applyBatch]] ordered by `(version, seq)` — the
  * same per-key sequential semantics the apply path defines, so
  * "commit the events, merge on read" and "merge then commit the
  * snapshot" produce identical tables (applyBatch's last-INSERT/DELETE
  * existence rule composes across batches). Every `compactEvery`-th
  * commit folds the outstanding deltas into a new base, bounding both
  * read fan-in and replay depth. Writes happen BEFORE the `_current`
  * pointer flips, so a snapshot read never races a write (the
  * read-version/write-new-version/commit protocol Delta uses, minus the
  * transaction log). Replaying a crashed micro-batch appends a
  * duplicate delta whose events are row-identical, which applyBatch's
  * max_by/last-op semantics absorb — delta commits are
  * value-idempotent. Audit rows append to `_audit` (CDC_SYNC_LOG).
  *
  * Scale: this is the fix for the full-snapshot-rewrite ceiling — per
  * 5 s trigger the sink now writes O(|batch|) bytes; the O(|table|)
  * cost moves to one columnar-pruned read (the apply's pk-membership
  * check) and an amortized 1/compactEvery compaction write.
  *
  * All filesystem access (pointer/meta/fingerprint/horizon markers,
  * version-dir lifecycle, audit compaction/publication) goes through
  * the Hadoop [[FileSystem]] resolved from `basePath`'s scheme — the
  * same seam as [[EpochCommit]] — so the store runs unchanged on
  * HDFS-semantics storage. The commit points are an atomic small-file
  * replace (`_current`, staged sibling + rename-with-overwrite) and a
  * single rename (epoch audit publish): atomic on POSIX and HDFS;
  * object stores without atomic rename need an HDFS-semantics tier or
  * a transactional table format underneath, same constraint as
  * EpochCommit documents.
  */
/** @param deltaWriteParts file count per delta version. Deltas are
  *   trigger-bounded (5 s of CDC traffic), so one file per version
  *   keeps the chain's total file count at O(#versions) — the
  *   membership read lists `compactEvery` files, not
  *   `compactEvery × shuffle.partitions` (the batch frame arrives
  *   32-way partitioned from the dedup stage, and writing it as-is
  *   produced 32 near-empty files per trigger). Raise it if a single
  *   trigger's volume outgrows one writer task.
  */
final class SnapshotStore(
    spark: SparkSession, basePath: String, compactEvery: Int = 8,
    deltaWriteParts: Int = 1) {

  // one FileSystem for the whole store: every path lives under
  // basePath, so a single scheme-resolved instance covers them all
  // (driver-side only — foreachBatch callbacks run on the driver).
  // On a local filesystem, use the RAW (non-checksummed) layer: the
  // checksummed wrapper renames a file and its .crc sidecar in two
  // steps, so a concurrent reader of a just-replaced marker can pair
  // new data with the old checksum and die with ChecksumException —
  // the markers' self-describing single-int content needs no sidecar.
  private val fs: FileSystem =
    new Path(basePath).getFileSystem(spark.sessionState.newHadoopConf()) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }

  private def tableDir(table: String) = s"$basePath/$table"
  private def pointer(table: String) = s"${tableDir(table)}/_current"
  private def baseDir(table: String, v: Int) = s"${tableDir(table)}/v$v"
  private def deltaDir(table: String, v: Int) = s"${tableDir(table)}/d$v"

  // FileContext supplies the one primitive FileSystem lacks: rename
  // WITH OVERWRITE — the atomic small-file replace the pointer flip
  // needs on strict-rename filesystems (HDFS refuses a plain rename
  // onto an existing destination). Lazy: the local raw FS replaces in
  // one File.renameTo and never takes this path.
  private lazy val fc: org.apache.hadoop.fs.FileContext =
    org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(basePath).toUri, spark.sessionState.newHadoopConf())

  /** Millisecond clock stamping committed versions (`_graft_ts`, read
    * by [[versionAsOf]]/[[snapshotAsOf]]/[[history]]). Overridable so
    * tests drive deterministic timelines; explicit markers rather than
    * file mtimes because mtime survives neither copies nor some object
    * stores' metadata handling.
    */
  private[streaming] var clock: () => Long = () => System.currentTimeMillis()

  private def exists(path: String): Boolean = fs.exists(new Path(path))

  private def readString(path: String): String = {
    val in = fs.open(new Path(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Atomic small-file write: stage a sibling tmp file, rename over the
    * destination. Readers see the old content or the new — never a
    * truncated in-between (a plain create(overwrite=true) truncates the
    * destination first; the managed refresh loop reads `_current` from
    * another thread and hit exactly that window). Used for every marker
    * the store writes (`_current`, `_horizon`, meta, fingerprints) so
    * no reader of a live table can observe a half-written marker.
    */
  private def writeString(path: String, s: String): Unit = {
    val dst = new Path(path)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
    // POSIX rename replaces the destination atomically; HDFS returns
    // false on an existing destination → overwrite-rename via fc
    if (!fs.rename(tmp, dst))
      fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def deleteIfExists(path: String): Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.delete(p, true)
  }

  private def renameOrFail(src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst)) throw new java.io.IOException(
      s"snapshot store rename failed: $src -> $dst")

  def currentVersion(table: String): Int =
    if (exists(pointer(table))) readString(pointer(table)).trim.toInt else 0

  private def flipPointer(table: String, next: Int): Int = {
    fs.mkdirs(new Path(tableDir(table)))
    writeString(pointer(table), next.toString)
    next
  }

  /** Version dirs at `next` with the pointer still below it are debris
    * from a crash between write and flip. They MUST go before reuse:
    * a stale base at `next` would otherwise shadow the delta committed
    * there (baseAtOrBefore prefers bases), silently dropping the batch.
    */
  private def clearUncommitted(table: String, next: Int): Unit = {
    deleteIfExists(baseDir(table, next))
    deleteIfExists(deltaDir(table, next))
  }

  /** Latest base version ≤ v (0 = none; bounded scan — bases recur at
    * least every `compactEvery` versions).
    */
  private def baseAtOrBefore(table: String, v: Int): Int =
    (v to 1 by -1).find(i => exists(baseDir(table, i))).getOrElse(0)

  // ---- schema-evolution contract ----------------------------------
  //
  // readDeltas unions the outstanding chain in ONE multi-path read and
  // recovers the (seq, op, pk) roles positionally — sound only while
  // every delta in a chain segment shares one layout. A target-schema
  // change mid-chain would otherwise SILENTLY mis-read (parquet's
  // name-based matching against whichever file's footer won the schema
  // race drops or null-fills columns nondeterministically). The
  // contract: each version dir carries a `_graft_schema` fingerprint
  // (tiny file — no parquet footer inference on the trigger path);
  // stageDelta compares the incoming layout against the chain's and
  //  * forces a COMPACTION BOUNDARY on a pure add-column change (the
  //    old-schema chain folds into a base, so no segment ever mixes
  //    layouts; the base's missing columns null-fill at read — correct,
  //    because the column genuinely had no value then), and
  //  * refuses anything else (drop / rename / reorder / type change)
  //    with an actionable error instead of a silent mis-bind.

  private def schemaFile(dir: String) = s"$dir/_graft_schema"

  private def fpString(schema: StructType): String =
    schema.fields.map(f => s"${f.name}:${f.dataType.catalogString}")
      .mkString("\n")

  private def parseFp(s: String): Seq[(String, String)] =
    s.split("\n").toSeq.filter(_.nonEmpty).map { l =>
      val i = l.indexOf(':'); (l.substring(0, i), l.substring(i + 1))
    }

  private def writeFingerprint(dir: String, schema: StructType): Unit =
    writeString(schemaFile(dir), fpString(schema))

  private def readFingerprint(dir: String): Option[Seq[(String, String)]] =
    if (!exists(schemaFile(dir))) None
    else Some(parseFp(readString(schemaFile(dir))))

  /** Table-level copy of the newest delta layout — version dirs (and
    * their fingerprints) are reclaimed by [[vacuum]], but the LAYOUT
    * must outlive them: a base-only chain (manual [[compact]] then
    * vacuum) still serves empty [[changeFeed]] ranges and appends new
    * [[mutateWhere]] deltas, both of which need the (seq, operation,
    * pk, data…) roles. Overwritten at every [[stageDelta]].
    */
  private def deltaLayoutFile(table: String) = s"${tableDir(table)}/_graft_delta_layout"

  private def deltaLayout(table: String): Option[Seq[(String, String)]] =
    if (!exists(deltaLayoutFile(table))) None
    else Some(parseFp(readString(deltaLayoutFile(table))))

  /** Incoming delta layout vs the chain's: identical → None; pure
    * add-column (same first-three roles, old layout a strict prefix) →
    * Some(()) meaning "compaction boundary required"; anything else →
    * loud error.
    */
  private def checkDeltaEvolution(table: String,
      prev: Seq[(String, String)], incoming: Seq[(String, String)]): Boolean = {
    if (prev == incoming) return false
    def fail(what: String) = throw new IllegalStateException(
      s"Schema change on snapshot table '$table' is not add-column evolution " +
      s"($what). Chain layout: ${prev.map(_._1).mkString(", ")}; incoming: " +
      s"${incoming.map(_._1).mkString(", ")}. Only appending new data columns " +
      "is supported on a live chain; for drops, renames, reorders or type " +
      "changes, rewrite the table explicitly (snapshot → transform → commit).")
    if (prev.take(3) != incoming.take(3)) fail("the (seq, operation, pk) roles differ")
    if (incoming.length <= prev.length || incoming.take(prev.length) != prev)
      fail("existing columns were dropped, renamed, reordered or retyped")
    true
  }

  /** The staged-on-top-of-a-base case: every base column must survive
    * into the new layout with its type — a vanished one means the
    * caller dropped/renamed/retyped, which null-fill-at-read would
    * silently turn into data loss.
    */
  private def checkBaseCompat(table: String, baseFp: Seq[(String, String)],
      incoming: Seq[(String, String)]): Unit = {
    val have = incoming.drop(2).toMap // pk + data columns of the delta layout
    val lost = baseFp.filterNot { case (n, t) => have.get(n).contains(t) }
    if (lost.nonEmpty) throw new IllegalStateException(
      s"Delta layout for snapshot table '$table' loses base column(s) " +
      s"${lost.map { case (n, t) => s"$n:$t" }.mkString(", ")} — a read would " +
      "silently null them. Only appending new data columns is supported; " +
      "rewrite the table explicitly (snapshot → transform → commit) instead.")
  }

  /** All delta versions in [from, to] as ONE read with a `__v` version
    * column. One multi-path `spark.read` instead of one per delta: each
    * separate read costs a driver-side file listing + footer schema
    * inference (~100-200 ms), which at a 5 s trigger with up to
    * `compactEvery-1` outstanding deltas was the bulk of the trigger's
    * fixed cost. Delta schemas are identical by the commitDelta layout
    * contract, so a positional union is safe; the version is recovered
    * from the file path (`…/d<N>/part-….parquet`).
    */
  private def readDeltas(table: String, from: Int, to: Int): DataFrame = {
    val paths = (from to to)
      .filter(i => exists(deltaDir(table, i)))
      .map(i => deltaDir(table, i))
    // mergeSchema: a range can cross an add-column evolution boundary
    // (deltas SURVIVE the compaction the boundary forces), and the
    // default single-footer inference would silently DROP the new
    // column whenever an old-layout file's footer wins. Add-column is
    // the only legal change (checkDeltaEvolution), appended at the
    // tail, so the merged schema keeps the positional (seq, operation,
    // pk) roles and old files read null in the new column — exactly
    // the withMissingAsNull semantics.
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .withColumn("__v",
        org.apache.spark.sql.functions.regexp_extract(
          col("_metadata.file_path"), "/d(\\d+)/[^/]+$", 1).cast("int"))
  }

  /** Current snapshot; empty DataFrame with the given schema at v0. */
  def snapshot(table: String, schema: StructType): DataFrame =
    snapshotAt(table, currentVersion(table), schema)

  /** Null-fill `want`ed columns a pre-evolution frame lacks — correct
    * for add-column evolution (the column genuinely had no value then);
    * every OTHER shape of change is refused at write time, so this is
    * the only reconciliation a read ever needs.
    */
  private def withMissingAsNull(df: DataFrame,
      want: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    val have = df.columns.toSet
    want.filterNot(f => have.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** Lowest version with full on-disk history (1 = nothing reclaimed).
    * Written by [[vacuum]]; [[snapshotAt]] and [[changeFeed]] refuse
    * reads below it LOUDLY — the alternative is silently-wrong results
    * from reconstruction over missing files.
    */
  def horizon(table: String): Int = {
    val p = s"${tableDir(table)}/_horizon"
    if (exists(p)) readString(p).trim.toInt else 1
  }

  /** Reclaim history: delete every version directory BELOW the newest
    * base (the current snapshot reconstructs from that base plus later
    * deltas, so nothing at or above it may go), and record the new
    * horizon so time-travel/change-feed reads below it are refused
    * instead of silently wrong. Returns the reclaimed version numbers.
    * Like [[compact]]: a maintenance operation under the single-writer
    * assumption — run on a quiesced table. A table whose chain has
    * never folded into a base (no compaction yet) reclaims nothing.
    */
  def vacuum(table: String): Seq[Int] = {
    val cur = currentVersion(table)
    val b = baseAtOrBefore(table, cur)
    if (b <= 1) return Seq.empty
    // horizon FIRST: a crash mid-delete must leave the guard in place,
    // not a half-deleted chain that reads below the old horizon would
    // silently mis-reconstruct (the exact failure the marker prevents)
    writeString(s"${tableDir(table)}/_horizon", b.toString)
    (1 until b).filter { v =>
      val deletedBase = deleteIfExists(baseDir(table, v))
      val deletedDelta = deleteIfExists(deltaDir(table, v))
      deletedBase || deletedDelta
    }
  }

  // ---- timestamp time travel ---------------------------------------

  private def tsFile(dir: String) = s"$dir/_graft_ts"

  private def writeCommitTs(dir: String): Unit =
    writeString(tsFile(dir), clock().toString)

  /** Commit wall-clock (epoch millis) of a live version, if recorded
    * (versions written before timestamp stamping existed have none; a
    * fold writes its base at the delta's version, so the delta marker
    * is checked first — one version, one instant).
    */
  def versionTimestamp(table: String, v: Int): Option[Long] =
    Seq(deltaDir(table, v), baseDir(table, v)).map(tsFile).find(exists)
      .flatMap(p => scala.util.Try(readString(p).trim.toLong).toOption)

  /** The latest version committed at or before `tsMillis` (0 = before
    * the table's first commit). Refuses when the answer sits below the
    * vacuum horizon: the reclaimed versions' dirs — and their
    * timestamps — are gone, so resolving past them would silently pin
    * the WRONG version (a ts between the last reclaimed commit and the
    * horizon base must error, not round up). Only stamped versions
    * participate — and when none resolves ≤ ts on a non-empty chain
    * that still carries UNSTAMPED versions (history written before
    * timestamp stamping existed), the answer is equally
    * unreconstructable: the unstamped commits may or may not predate
    * ts, so returning 0 would claim "the table was empty then" on no
    * evidence. Refuse, don't guess — 0 is reserved for chains whose
    * EARLIEST stamped commit provably lands after ts.
    */
  def versionAsOf(table: String, tsMillis: Long): Int = {
    val h = horizon(table)
    val cur = currentVersion(table)
    val stamped = (h to cur)
      .flatMap(v => versionTimestamp(table, v).map(v -> _))
    stamped.filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse {
      if (h > 1) throw new IllegalArgumentException(
        s"versionAsOf: no surviving version of $table at or before " +
          s"ts=$tsMillis — history below the vacuum horizon v$h was " +
          "reclaimed, so the version live at that instant cannot be " +
          "reconstructed")
      if (cur > 0 && stamped.size < (h to cur).size)
        throw new IllegalArgumentException(
          s"versionAsOf: $table carries ${(h to cur).size - stamped.size} " +
            s"pre-stamping version(s) with no commit timestamp — whether " +
            s"they predate ts=$tsMillis cannot be determined (refusing " +
            "rather than resolving to the empty table)")
      0
    }
  }

  /** [[snapshotAt]] resolved by commit timestamp: the table exactly as
    * it stood at `tsMillis` (a ts between two commits resolves to the
    * earlier one; a ts before the first commit is the empty table).
    */
  def snapshotAsOf(table: String, tsMillis: Long,
      schema: StructType = null): DataFrame =
    snapshotAt(table, versionAsOf(table, tsMillis), schema)

  /** Every change event committed AFTER `tsMillis` up to the current
    * version — [[changeFeed]] with its lower bound resolved by commit
    * timestamp (the "what changed since I last looked at the clock"
    * consumer).
    */
  def changeFeedSince(table: String, tsMillis: Long): DataFrame =
    changeFeed(table, versionAsOf(table, tsMillis), currentVersion(table))

  /** Time travel: reconstruct any committed version (0 = empty). */
  def snapshotAt(table: String, version: Int, schema: StructType = null): DataFrame = {
    refuseAdditive(table, "snapshotAt")
    if (version == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    require(version >= horizon(table),
      s"snapshotAt: v$version is below the vacuum horizon v${horizon(table)} " +
        s"of $table — its history was reclaimed")
    val b = baseAtOrBefore(table, version)
    if (b == version) {
      val base = spark.read.parquet(baseDir(table, b))
      return if (schema == null) base else withMissingAsNull(base, schema.fields.toSeq)
    }
    val deltas = readDeltas(table, b + 1, version)
    // delta layout contract (commitDelta): [seqCol, operation, pk, data…]
    // — uniform across the segment (stageDelta forces a compaction
    // boundary at any layout change)
    val fields = deltas.schema.fields.filterNot(_.name == "__v")
    val seqCol = fields(0).name
    val pk = fields(2).name
    val dataCols = fields.drop(3).map(_.name).toSeq
    val base =
      if (b == 0) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        if (schema != null) schema else StructType(fields.drop(2)))
      else spark.read.parquet(baseDir(table, b))
    // a pre-evolution base lacks columns added later in the chain
    val reconciled = withMissingAsNull(base, fields.drop(3).toSeq)
    val ordered = deltas.withColumn("__ord", struct(col("__v"), col(seqCol)))
    Apply.applyBatch(reconciled, ordered, pk, "__ord", dataCols).target
  }

  /** Change data feed (the lakehouse CDF analog): every change EVENT
    * applied in `(fromVersion, toVersion]`, read from the DELTA FILES
    * alone — O(|changes|), never a table reconstruction — so an
    * incremental consumer (view refresh, export, cache invalidation)
    * pays for what changed, not for the table. Columns:
    * `commit_version` then the delta layout `[seq, operation, pk,
    * data…]`; order with `(commit_version, seq)` for apply order.
    * Versions whose commit carried no data (compactions) contribute
    * nothing; delta files survive compaction, so ranges cross
    * compaction boundaries freely.
    */
  def changeFeed(table: String, fromVersion: Int, toVersion: Int): DataFrame = {
    refuseAdditive(table, "changeFeed")
    val cur = currentVersion(table)
    require(fromVersion >= 0 && fromVersion <= toVersion && toVersion <= cur,
      s"changeFeed: need 0 <= from <= to <= $cur, got [$fromVersion, $toVersion]")
    val h = horizon(table)
    require(fromVersion >= h - 1,
      s"changeFeed: versions below the vacuum horizon v$h were reclaimed — " +
        s"cannot read changes from v$fromVersion (missing deltas would make " +
        "the feed silently incomplete)")
    // an all-compaction (or empty) range still needs the layout: read
    // the nearest delta at or before the range bound, emptied — or,
    // when vacuum reclaimed EVERY delta dir (a manual compact folded
    // the whole chain into a base first), rebuild the empty feed from
    // the table-level layout marker, which survives reclamation. Found
    // by the store-op fuzzer: compact → vacuum → sync threw here on a
    // legitimately-empty range instead of returning no changes.
    val anyDelta = (1 to toVersion).reverse
      .find(i => exists(deltaDir(table, i)))
    val inRange = (fromVersion + 1 to toVersion)
      .exists(i => exists(deltaDir(table, i)))
    val feed =
      if (inRange) readDeltas(table, fromVersion + 1, toVersion)
      else anyDelta match {
        case Some(d) => readDeltas(table, d, d).limit(0)
        case None =>
          val layout = deltaLayout(table).getOrElse(
            throw new IllegalArgumentException(
              s"changeFeed: table $table has no delta history at or " +
                s"before v$toVersion"))
          val schema = StructType(layout.map { case (n, t) =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.DataType.fromDDL(t))
          })
          spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
            .withColumn("__v", lit(null).cast("int"))
      }
    val dataCols = feed.columns.filterNot(_ == "__v")
    feed.select((Seq(col("__v").as("commit_version")) ++ dataCols.map(col)): _*)
  }

  /** NET changes between two versions, with the ENGINE's own apply
    * semantics (an UPDATE on a key deleted earlier in the range is
    * TARGET_NOT_FOUND — not applied — exactly as the sync path decides
    * it): one row per pk whose existence or value the range touched —
    * `change_type` INSERT (absent before, present after, final values
    * carried), UPDATE (present both, final values carried), DELETE
    * (present before, absent after, data columns null). A pk inserted
    * AND deleted inside the range nets out to nothing. Cost:
    * O(|changes|) for the feed + ONE base-version scan restricted to
    * the feed's pks (the before-image the classification needs).
    */
  def netChanges(table: String, fromVersion: Int, toVersion: Int): DataFrame = {
    val (before, after, pkName, dataCols) = changedImages(table, fromVersion, toVersion)
    val beforePks = before.select(col(pkName)).withColumn("__before", lit(true))
    after.withColumn("__after", lit(true))
      .join(beforePks, Seq(pkName), "full_outer")
      .withColumn("change_type",
        when(col("__after").isNotNull && col("__before").isNull, "INSERT")
          .when(col("__after").isNotNull, "UPDATE")
          .otherwise("DELETE"))
      .select((Seq(col(pkName), col("change_type")) ++ dataCols.map(col)): _*)
  }

  /** The (before, after) row images of every pk the range touched —
    * before at `fromVersion`, after with the engine's apply semantics
    * folded over the feed — plus the pk/data column names. The shared
    * core of [[netChanges]] and the incremental view refresh
    * ([[MatView.refreshFromStore]]): consumers that maintain derived
    * state need BOTH images (retract the old contribution, add the
    * new), which the event feed alone cannot give for UPDATEs.
    */
  def changedImages(table: String, fromVersion: Int,
      toVersion: Int): (DataFrame, DataFrame, String, Seq[String]) = {
    val feed = changeFeed(table, fromVersion, toVersion)
    val f = feed.schema.fields.filterNot(_.name == "commit_version")
    val (seqName, pkName) = (f(0).name, f(2).name)
    val dataCols = f.drop(3).map(_.name).toSeq
    val feedPks = feed.select(col(pkName)).distinct()
    val before =
      (if (fromVersion == 0)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(f.drop(2)))
      else
        // a range crossing an add-column evolution: the before image
        // reconstructs at the PRE-evolution version and lacks columns
        // the feed's deltas carry — null-fill them (pre-evolution rows
        // genuinely had no value; same reconciliation snapshotAt runs
        // within a chain segment)
        withMissingAsNull(snapshotAt(table, fromVersion), f.drop(2).toSeq))
        .join(feedPks, Seq(pkName), "left_semi")
        .localCheckpoint(true) // read twice: apply base + before-pk set
    val after = Apply.applyBatch(before,
      feed.withColumn("__ord", struct(col("commit_version"), col(seqName))),
      pkName, "__ord", dataCols).target
    (before, after, pkName, dataCols)
  }

  /** Column-pruned pk membership at the current version: the set of
    * pks that exist, computed from the base's pk column plus the
    * outstanding deltas' (seq, operation, pk) columns ONLY — the
    * payload never leaves the parquet footer. This is the audit path's
    * per-trigger existence read: between compactions a full
    * [[snapshotAt]] reconstruction computes `max_by(struct(dataCols))`
    * and drags the whole base width through the scan; membership is
    * decidable from the existence algebra alone (last INSERT/DELETE op
    * wins; only-UPDATEs defer to base membership — the same state
    * machine [[graft.cdc.Apply.applyBatch]] runs).
    *
    * Scale: one pk-column base scan + O(|deltas|) slim delta scans +
    * one hash aggregate on pk — vs the full-width read this replaces.
    *
    * `pkBounds = Some((lo, hi))` further restricts membership to pks in
    * [lo, hi] — sound whenever the caller only consults pks inside the
    * range (the audit path passes the BATCH's min/max). The bound is a
    * pushed parquet filter, so row-group statistics prune the base scan
    * to the groups overlapping the batch's key range: on a big table
    * with clustered (e.g. recent) keys, the per-trigger read drops from
    * "whole pk column" to a handful of row groups.
    *
    * `atVersion` pins the read to an explicit committed version (the
    * audit path reads membership "as of before this batch" even after
    * the batch's own delta has been staged or committed); default is
    * the current pointer.
    */
  def existingPks(table: String, schema: StructType, pkName: String,
      pkBounds: Option[(Any, Any)] = None,
      atVersion: Option[Int] = None): DataFrame = {
    refuseAdditive(table, "existingPks")
    val pkOnly = StructType(schema.filter(_.name == pkName))
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pkOnly)
    def bounded(df: DataFrame): DataFrame = pkBounds match {
      case Some((lo, hi)) => df.filter(col(pkName).between(lit(lo), lit(hi)))
      case None => df
    }
    val version = atVersion.getOrElse(currentVersion(table))
    if (version == 0) return empty
    val b = baseAtOrBefore(table, version)
    val basePks =
      if (b == 0) empty
      else bounded(spark.read.parquet(baseDir(table, b)).select(col(pkName)))
    if (b == version) return basePks
    val all = readDeltas(table, b + 1, version)
    // delta layout contract (commitDelta): [seqCol, operation, pk, data…]
    val f = all.schema.fields.filterNot(_.name == "__v")
    val deltas = bounded(
      all.select(col(f(2).name).as(pkName), col(f(1).name).as("__op"),
        struct(col("__v"), col(f(0).name).as("__seq")).as("__ord")))
    // per pk: the last existence-deciding (non-UPDATE) op across the
    // outstanding chain, ordered by (version, seq) — null means only
    // UPDATEs touched it, so the base decides
    val decided = deltas.groupBy(col(pkName)).agg(
      max(when(col("__op") =!= "UPDATE", struct(col("__ord"), col("__op"))))
        .as("__last"))
    basePks.withColumn("__in_base", lit(true))
      .join(decided, Seq(pkName), "full_outer")
      .filter(
        when(col("__last").isNotNull,
          col("__last").getField("__op") === "INSERT")
        .otherwise(coalesce(col("__in_base"), lit(false))))
      .select(col(pkName))
  }

  /** Write a full base snapshot version and flip the pointer. `meta`
    * (e.g. a streaming epoch id) lands INSIDE the version directory
    * before the pointer flips, so version and marker commit atomically
    * — the underscore prefix keeps parquet reads blind to it.
    */
  def commit(table: String, df: DataFrame, meta: Option[String] = None): Int = {
    // symmetric with the reader guards: a full-base rewrite into an
    // additive chain would silently mix kinds mid-history — the next
    // additiveSnapshot would treat CDC payload rows as multiplicities
    refuseAdditive(table, "commit")
    val next = currentVersion(table) + 1
    clearUncommitted(table, next)
    df.write.mode(SaveMode.Overwrite).parquet(baseDir(table, next))
    writeFingerprint(baseDir(table, next), df.schema)
    writeCommitTs(baseDir(table, next))
    meta.foreach(m => writeString(s"${baseDir(table, next)}/_graft_meta", m))
    flipPointer(table, next)
  }

  /** The current version's commit marker, if any (delta or base). */
  def currentMeta(table: String): Option[String] = {
    val v = currentVersion(table)
    if (v == 0) None
    else Seq(deltaDir(table, v), baseDir(table, v))
      .map(d => s"$d/_graft_meta")
      .find(exists)
      .map(readString)
  }

  /** Append one batch of change events as a delta version — O(|batch|).
    *
    * `changes` must carry `seqCol`, `operation`, `pk`, `dataCols`; the
    * delta file stores them in exactly that order (readers recover the
    * roles positionally). Folds deltas into a fresh base when the chain
    * since the last base reaches `compactEvery`.
    */
  def commitDelta(
      table: String, changes: DataFrame,
      pk: String, seqCol: String, dataCols: Seq[String],
      meta: Option[String] = None): Int =
    finalizeDelta(table, stageDelta(table, changes, pk, seqCol, dataCols, meta))

  /** First half of [[commitDelta]]: write the delta's files (and epoch
    * marker) at the next version WITHOUT flipping the pointer — readers
    * still see the previous version. Lets the streaming sink run its
    * audit job between the delta write and the commit point (an
    * `observe` on `changes` yields the batch's count/pk-bounds for free
    * in the write job — no separate driver action). Crash before
    * [[finalizeDelta]] leaves debris that the next stage/commit at this
    * version clears.
    */
  def stageDelta(
      table: String, changes: DataFrame,
      pk: String, seqCol: String, dataCols: Seq[String],
      meta: Option[String] = None): Int = {
    refuseAdditive(table, "stageDelta")
    val selected = changes.select((Seq(seqCol, "operation", pk) ++ dataCols).map(col): _*)
    val incoming = selected.schema.fields.toSeq
      .map(f => f.name -> f.dataType.catalogString)
    // schema-evolution gate (two tiny marker-file reads, no Spark):
    // a layout change against the outstanding chain forces a compaction
    // boundary; a change that loses base columns refuses loudly
    val v = currentVersion(table)
    val outstanding = v > baseAtOrBefore(table, v)
    if (outstanding && readFingerprint(deltaDir(table, v))
        .exists(checkDeltaEvolution(table, _, incoming)))
      compact(table) // old-schema chain folds; segment stays uniform
    val base = baseAtOrBefore(table, currentVersion(table))
    if (base > 0)
      readFingerprint(baseDir(table, base))
        .foreach(checkBaseCompat(table, _, incoming))
    val next = currentVersion(table) + 1
    clearUncommitted(table, next)
    // repartition, not coalesce: coalesce(1) would drag the upstream
    // parse/transform into a single task; a round-robin shuffle of a
    // trigger-bounded batch is trivial and keeps the source parallel
    selected
      .repartition(deltaWriteParts)
      .write.mode(SaveMode.Overwrite).parquet(deltaDir(table, next))
    writeFingerprint(deltaDir(table, next), selected.schema)
    writeString(deltaLayoutFile(table), fpString(selected.schema))
    writeCommitTs(deltaDir(table, next))
    meta.foreach(m => writeString(s"${deltaDir(table, next)}/_graft_meta", m))
    next
  }

  /** Second half of [[commitDelta]]: fold the chain into a fresh base if
    * it reached `compactEvery`, then flip the pointer — the commit
    * point. `staged` must be the value [[stageDelta]] returned.
    */
  def finalizeDelta(table: String, staged: Int): Int = {
    refuseAdditive(table, "finalizeDelta") // direct calls bypass stageDelta's guard
    if (staged - baseAtOrBefore(table, staged - 1) >= compactEvery) {
      val snap = snapshotAt(table, staged) // d<staged> exists; pointer not yet flipped
      snap.write.mode(SaveMode.Overwrite).parquet(baseDir(table, staged))
      writeFingerprint(baseDir(table, staged), snap.schema)
    }
    flipPointer(table, staged)
  }

  /** Drop a staged-but-unfinalized delta (e.g. the batch turned out
    * empty): delete its directory so the version number is reusable.
    */
  def abortDelta(table: String, staged: Int): Unit =
    clearUncommitted(table, staged)

  /** Manual compaction — fold the current delta chain into a base NOW
    * (maintenance hook; the automatic path folds every `compactEvery`
    * commits). Runs as a NEW version so the pointer-flip protocol keeps
    * readers off the partially-written base. No-op at v0 or when the
    * current version already is a base.
    *
    * Single-writer assumption (same as every committing entry point):
    * not safe concurrent with an in-flight [[commit]]/[[commitDelta]]
    * on the same table — both would claim version `v+1`. Run it on a
    * quiesced table, like [[compactAudit]].
    *
    * The current version's `_graft_meta` epoch marker carries forward
    * into the new base: compaction changes the table's representation,
    * not its stream position, so a crash-restart right after a manual
    * compact must still see the last applied epoch (else the replay
    * guard re-applies it and duplicates audit rows).
    */
  def compact(table: String): Int = {
    val v = currentVersion(table)
    if (v == 0 || baseAtOrBefore(table, v) == v) v
    else {
      val next = v + 1
      val meta = currentMeta(table)
      clearUncommitted(table, next)
      val snap = snapshotAt(table, v)
      snap.write.mode(SaveMode.Overwrite).parquet(baseDir(table, next))
      writeFingerprint(baseDir(table, next), snap.schema)
      writeCommitTs(baseDir(table, next))
      meta.foreach(m => writeString(s"${baseDir(table, next)}/_graft_meta", m))
      flipPointer(table, next)
    }
  }

  /** Manual fold of an ADDITIVE chain — [[compact]]'s sibling (compact
    * itself refuses additive tables: CDC reconstruction would misparse
    * them). Writes the aggregated state as a delta-free base at a new
    * version; content-preserving, meta carried forward (the gates read
    * the latest meta as their replay fence — dropping it here would
    * make the next whole-batch replay double-charge). Beyond chain
    * hygiene this is a SCAN-SHAPE op: a bucketed chain's fold writes
    * one file per ~bucket (`repartition(n, __bkt)` + sort), so the
    * per-trigger state read parallelizes across n tasks instead of
    * decoding a few giant delta files in one — the 20M-line probe
    * measured the single-file layout costing 3.4× (204 vs ~700 docs/s).
    */
  def compactAdditive(table: String): Int = {
    val v = currentVersion(table)
    additiveCols(table).getOrElse(throw new IllegalStateException(
      s"compactAdditive: table '$table' is not an additive chain — " +
        "use compact()"))
    if (v == 0 || baseAtOrBefore(table, v) == v) v
    else {
      val next = v + 1
      val meta = currentMeta(table)
      clearUncommitted(table, next)
      val snap = additiveSnapshotAt(table, v, null)
      val base = bucketSpec(table) match {
        case Some(s) => withBucket(snap, s)
          .repartition(s._2, col("__bkt")).sortWithinPartitions(col("__bkt"))
        case None => snap.repartition(deltaWriteParts)
      }
      base.write.mode(SaveMode.Overwrite).parquet(baseDir(table, next))
      writeFingerprint(baseDir(table, next), base.schema)
      writeCommitTs(baseDir(table, next))
      meta.foreach(m => writeString(s"${baseDir(table, next)}/_graft_meta", m))
      flipPointer(table, next)
    }
  }

  /** Clone `table`@`version` as a NEW table `dest` (optionally in
    * another store — the backup/dev-fork maintenance op): the clone is
    * one compacted version with an independent chain, so vacuuming or
    * evolving either side never touches the other, and the clone's
    * history starts fresh (horizon 1, version 1). Works for both kinds:
    * a CDC/base table clones as a full base (`commit`), an additive
    * table as the folded state re-committed under the same measure
    * columns (sums ARE the state, so the fold loses nothing). Refuses
    * an existing destination — a clone is a CREATE, and silently
    * stacking a base onto an existing chain would be corruption.
    * The clone's meta records the provenance (`clone:<table>@<v>`).
    */
  def cloneAt(table: String, version: Int, dest: String,
      destStore: SnapshotStore = this): Int = {
    require(destStore.currentVersion(dest) == 0 &&
        destStore.tableKind(dest).isEmpty,
      s"cloneAt: destination '$dest' already exists — a clone is a CREATE")
    val provenance = Some(s"clone:$table@$version")
    additiveCols(table) match {
      case Some(cols) =>
        destStore.commitAdditive(dest,
          additiveSnapshotAt(table, version, null), meta = provenance,
          cntCols = cols, bucketBy = bucketSpec(table))
      case None =>
        destStore.commit(dest, snapshotAt(table, version), meta = provenance)
    }
  }

  /** The table's version history — the operational surface a
    * maintenance job (or an operator deciding what [[vacuum]] will
    * reclaim) reads: one row per live version with its kind
    * (`base`/`delta`), commit meta, data-file count and bytes, plus
    * whether it sits below the vacuum horizon. Pure file metadata —
    * O(versions) marker reads + one listStatus per version directory,
    * no data files opened. Built driver-side (a chain is
    * human-lifetime-bounded: thousands of versions, not billions).
    */
  def history(table: String): DataFrame = {
    val h = horizon(table)
    val rows = (1 to currentVersion(table)).flatMap { v =>
      val ts = versionTimestamp(table, v)
      Seq(baseDir(table, v) -> "base", deltaDir(table, v) -> "delta")
        .filter { case (d, _) => exists(d) }
        .map { case (d, kind) =>
          val files = fs.listStatus(new Path(d)).filter(st =>
            st.isFile && st.getPath.getName.endsWith(".parquet"))
          val metaP = s"$d/_graft_meta"
          (v, kind, if (exists(metaP)) readString(metaP) else null,
            files.length, files.map(_.getLen).sum, v >= h, ts)
        }
    }
    import spark.implicits._
    rows.toDF("version", "kind", "meta", "n_files", "bytes",
      "above_horizon", "commit_ts")
  }

  /** Row-level predicate delete — the retention/right-to-erasure
    * maintenance op: every current row matching `predicate` gets a
    * DELETE change appended as ONE delta version (O(|matching|)
    * written, never a table rewrite), flowing through the change feed,
    * [[netChanges]] and the JDBC sync like any other CDC delete — a
    * downstream serving copy erases the same rows on its next
    * incremental sync. `seq` orders the delete against the chain (a
    * batch id / epoch counter under the single-writer assumption);
    * `meta` gates replays exactly like a streaming commit. The DELETE
    * rows carry the deleted values (the change feed's before-image
    * flavor — auditable erasure). Returns the number of rows deleted;
    * an empty match commits NOTHING (no version churn on a no-op).
    */
  def deleteWhere(table: String, predicate: org.apache.spark.sql.Column,
      pk: String, seq: Long, meta: Option[String] = None): Long =
    mutateWhere(table, predicate, pk, seq, meta, "DELETE", Map.empty)

  /** Row-level predicate update — [[deleteWhere]]'s anonymize-in-place
    * sibling (the GDPR path that must KEEP the row): matching rows
    * append as ONE O(matching) UPDATE delta carrying their current
    * values with the `set` columns overwritten (each expression
    * evaluates against the matched row, so `set` can reference existing
    * columns — redaction, masking, recomputation). Unknown `set`
    * columns refuse loudly: an UPDATE cannot add columns, that is
    * write-time schema evolution. Returns the number of rows updated.
    */
  def updateWhere(table: String, predicate: org.apache.spark.sql.Column,
      pk: String, seq: Long, set: Map[String, org.apache.spark.sql.Column],
      meta: Option[String] = None): Long = {
    require(set.nonEmpty, "updateWhere: no columns to set")
    mutateWhere(table, predicate, pk, seq, meta, "UPDATE", set)
  }

  private def mutateWhere(table: String,
      predicate: org.apache.spark.sql.Column, pk: String, seq: Long,
      meta: Option[String], op: String,
      set: Map[String, org.apache.spark.sql.Column]): Long = {
    refuseAdditive(table, s"${op.toLowerCase}Where")
    if (currentVersion(table) == 0) return 0L
    val snap = snapshot(table, null)
    set.keys.foreach(k => require(snap.columns.contains(k),
      s"${op.toLowerCase}Where: '$k' is not a column of '$table' " +
        s"(${snap.columns.mkString(", ")}) — adding columns is schema " +
        "evolution, not an UPDATE"))
    require(!set.contains(pk),
      s"${op.toLowerCase}Where: cannot set the pk column '$pk' — a key " +
        "change is a DELETE + INSERT, not an UPDATE")
    val matching = snap.filter(predicate)
      .localCheckpoint(true) // one pass feeds the count AND the delta
    val n = matching.count()
    if (n == 0L) return 0L
    // the seq COLUMN NAME is part of the chain's recorded layout (the
    // evolution gate refuses a rename) — reuse the chain's own, from
    // the table-level layout marker that survives vacuum (a base-only
    // chain would otherwise silently switch names mid-history); a
    // never-delta'd table has no layout yet, any name seeds it
    val seqName = deltaLayout(table)
      .orElse((1 to currentVersion(table)).reverse
        .find(v => exists(deltaDir(table, v)))
        .flatMap(v => readFingerprint(deltaDir(table, v)))) // pre-marker chains
      .map(_.head._1).getOrElse("__seq")
    val dataCols = matching.columns.filterNot(_ == pk).toSeq
    val changes = matching.select(
      (Seq(lit(seq).as(seqName), lit(op).as("operation"), col(pk))
        ++ dataCols.map(c => set.getOrElse(c, col(c)).as(c))): _*)
    commitDelta(table, changes, pk, seqName, dataCols, meta)
    n
  }

  // ---- additive multiplicity tables --------------------------------
  //
  // The THIRD table kind next to full bases and CDC delta chains: rows
  // are (payload…, measures…) where every measure column is SIGNED and
  // summable — a commit APPENDS a batch's deltas (O(|batch|) written
  // per trigger, never a state rewrite) and a read sums each measure
  // per payload value and drops the all-zero rows (merge-on-read).
  // The default single measure `state_cnt` is the counting-IVM
  // multiplicity; MULTIPLE measures make the kind carry any
  // sufficient-statistic rollup whose merge is addition — e.g. an
  // aggregate view's per-group (state_cnt, state_qsum) pair
  // ([[JoinAggView]]). Every `compactEvery`-th commit folds the chain
  // into an aggregated base, bounding read fan-in.
  // This is the counting-IVM backing [[JoinView]] needs: its per-
  // trigger O(|state|) state-merge rewrite becomes a delta append,
  // while replay safety keeps the same shape as commitDelta (atomic
  // pointer flip per version; the caller's per-table batch-id meta
  // gates replays, and debris from a crash before the flip is cleared
  // at the next attempt).

  private def kindFile(table: String) = s"${tableDir(table)}/_graft_kind"

  private def tableKind(table: String): Option[String] =
    if (exists(kindFile(table))) Some(readString(kindFile(table)).trim) else None

  private def bucketFile(table: String) = s"${tableDir(table)}/_graft_bucket"

  /** An additive chain's bucket layout, from its `_graft_bucket` marker
    * (`<keyColumn>:<nBuckets>`, fixed at chain creation like the
    * measure columns): every commit derives an internal `__bkt` column
    * — pmod(hash(key), n) — and writes hash-clustered, bucket-sorted
    * files, so [[additiveSnapshotForKeys]] can push a ≤ n-value
    * `__bkt IN (…)` filter into the parquet scan and SKIP the row
    * groups (≈ files) of buckets the probe keys don't touch. This is
    * the layout that cuts the per-trigger state read from O(state)
    * bytes to O(state/n · |probe buckets|): the line gate's 20M-line
    * probe measured the un-pruned scan dominating trigger time
    * (687 → 244 docs/s from 2M → 20M seeded lines).
    */
  private def bucketSpec(table: String): Option[(String, Int)] =
    if (exists(bucketFile(table))) {
      val parts = readString(bucketFile(table)).trim.split(":")
      Some((parts(0), parts(1).toInt))
    } else None

  private def withBucket(df: DataFrame, spec: (String, Int)): DataFrame =
    df.withColumn("__bkt",
      pmod(hash(col(spec._1)), lit(spec._2)).cast("int"))

  /** An additive table's measure columns, from its kind marker:
    * `additive` = the classic single `state_cnt`; `additive:c1,c2` = a
    * multi-measure chain. None for CDC/base tables.
    */
  private def additiveCols(table: String): Option[Seq[String]] =
    tableKind(table).collect {
      case "additive"                       => Seq("state_cnt")
      case k if k.startsWith("additive:")   =>
        k.stripPrefix("additive:").split(",").toSeq.map(_.trim)
    }

  /** Refuse CDC-layout reads of an additive table LOUDLY: the CDC
    * reconstruction would bind (seq, operation, pk) roles onto join
    * payload columns and produce garbage — and right after a
    * compaction fold it would return the aggregated base, i.e.
    * plausible-looking data, making the misuse intermittent with the
    * version number. A marker file written at the table's first
    * additive commit turns that into an immediate error.
    */
  private def refuseAdditive(table: String, op: String): Unit =
    if (additiveCols(table).isDefined)
      throw new IllegalStateException(
        s"$op: table '$table' is an ADDITIVE multiplicity table — read " +
          "it with additiveSnapshot/additiveSnapshotAt (CDC-layout " +
          "reconstruction would misparse its columns)")

  /** Append one batch of signed-measure rows as a delta version.
    * `delta`'s layout must match the chain's exactly (additive rows
    * have no positional roles to re-derive — a drifting layout would
    * sum across misaligned columns); reconstruction keys measure
    * columns by NAME — `cntCols` at first commit fixes them for the
    * chain's lifetime (recorded in the kind marker), defaulting to the
    * single counting-IVM multiplicity `state_cnt`.
    */
  def commitAdditive(table: String, delta: DataFrame,
      meta: Option[String] = None,
      cntCols: Seq[String] = Seq("state_cnt"),
      bucketBy: Option[(String, Int)] = None): Int = {
    require(cntCols.nonEmpty && cntCols.forall(delta.columns.contains),
      s"commitAdditive: measure columns ${cntCols.mkString(", ")} must " +
        s"all exist in the delta (${delta.columns.mkString(", ")})")
    require(!delta.columns.contains("__bkt"),
      "commitAdditive: '__bkt' is reserved for the bucket layout")
    additiveCols(table) match {
      case Some(cols) =>
        if (cols != cntCols) throw new IllegalStateException(
          s"commitAdditive: table '$table' sums ${cols.mkString(", ")}; " +
            s"this commit declared ${cntCols.mkString(", ")} — measure " +
            "columns are fixed at the chain's first commit")
        // the bucket layout, like the measures, is fixed at creation:
        // a CONFLICTING later declaration is a config error; a matching
        // or absent one is a no-op (the marker rules)
        bucketBy.foreach { b =>
          bucketSpec(table).foreach { have =>
            if (have != b) throw new IllegalStateException(
              s"commitAdditive: table '$table' is bucketed by " +
                s"${have._1}:${have._2}; this commit declared " +
                s"${b._1}:${b._2} — the layout is fixed at creation")
          }
        }
      case None if tableKind(table).isDefined =>
        throw new IllegalStateException(
          s"commitAdditive: table '$table' has kind '${tableKind(table).get}'")
      case None =>
        if (currentVersion(table) > 0) throw new IllegalStateException(
          s"commitAdditive: table '$table' already holds CDC/base " +
            "versions — additive and CDC chains cannot mix in one table")
        fs.mkdirs(new Path(tableDir(table)))
        writeString(kindFile(table),
          if (cntCols == Seq("state_cnt")) "additive"
          else s"additive:${cntCols.mkString(",")}")
        bucketBy.foreach { case (k, n) =>
          require(delta.columns.contains(k) && !cntCols.contains(k),
            s"commitAdditive: bucket column '$k' must be a payload column")
          require(n > 0, "commitAdditive: bucket count must be positive")
          writeString(bucketFile(table), s"$k:$n")
        }
    }
    val spec = bucketSpec(table)
    val staged = spec.map(withBucket(delta, _)).getOrElse(delta)
    val incoming = staged.schema.fields.toSeq
      .map(f => f.name -> f.dataType.catalogString)
    val v = currentVersion(table)
    if (v > 0)
      Seq(deltaDir(table, v), baseDir(table, v)).find(exists)
        .flatMap(readFingerprint).foreach { prev =>
          if (prev != incoming) throw new IllegalStateException(
            s"Additive table '$table' layout drift: chain has " +
              s"${prev.map(_._1).mkString(", ")}; incoming " +
              s"${incoming.map(_._1).mkString(", ")}. Additive chains " +
              "must keep one exact layout; rewrite the table explicitly " +
              "for schema changes.")
        }
    val next = v + 1
    clearUncommitted(table, next)
    // bucketed chains cluster + sort by __bkt so every file covers few
    // buckets and its row-group stats carry tight __bkt ranges — what
    // the forKeys IN-filter prunes on
    (spec match {
      case Some(_) => staged.repartition(deltaWriteParts, col("__bkt"))
        .sortWithinPartitions(col("__bkt"))
      case None => staged.repartition(deltaWriteParts)
    }).write.mode(SaveMode.Overwrite).parquet(deltaDir(table, next))
    writeFingerprint(deltaDir(table, next), staged.schema)
    writeCommitTs(deltaDir(table, next))
    meta.foreach(m => writeString(s"${deltaDir(table, next)}/_graft_meta", m))
    if (next - baseAtOrBefore(table, v) >= compactEvery) {
      // fold BEFORE the flip: d<next> exists on disk, so the aggregated
      // base at the same version includes it (mirrors finalizeDelta)
      val snap = additiveSnapshotAt(table, next, delta.schema)
      val base = spec match {
        // the base is where pruning pays: one file per ~bucket
        case Some(s) => withBucket(snap, s)
          .repartition(s._2, col("__bkt")).sortWithinPartitions(col("__bkt"))
        case None => snap
      }
      base.write.mode(SaveMode.Overwrite).parquet(baseDir(table, next))
      writeFingerprint(baseDir(table, next), base.schema)
    }
    flipPointer(table, next)
  }

  /** Current contents of an additive table: Σ of each measure column
    * per payload value over base ⊕ outstanding deltas, all-zero rows
    * dropped. Read cost: one (possibly aggregated-base) scan +
    * O(|deltas|) — the merge-on-read trade that buys O(|batch|)
    * writes. Measure columns come from the chain's kind marker.
    */
  def additiveSnapshot(table: String, schema: StructType): DataFrame =
    additiveSnapshotAt(table, currentVersion(table), schema)

  /** [[additiveSnapshot]] restricted to the payload keys present in
    * `keys` — the semi-join runs against the RAW base ⊕ delta rows,
    * BEFORE the merge-on-read aggregation, so a consumer that only
    * needs a bounded key set's state (a streaming gate reconciling one
    * trigger's lines against a billion-line count table) aggregates
    * and shuffles O(|state rows matching keys|), never O(|state|).
    * Done here explicitly rather than by joining the full snapshot:
    * Catalyst's PushDownLeftSemiAntiJoin cannot sink a semi-join past
    * the not-all-zero filter that sits above the aggregate, so the
    * outside-in formulation silently keeps the state-sized shuffle.
    * `keys`' columns must be a subset of the payload columns; sound
    * because measures sum independently per payload value. `keys` is
    * broadcast — callers pass trigger/batch-sized frames.
    */
  def additiveSnapshotForKeys(table: String, schema: StructType,
      keys: DataFrame): DataFrame =
    additiveSnapshotCore(table, currentVersion(table), schema, Some(keys))

  /** [[additiveSnapshot]] at an explicit version (time travel; also the
    * compaction fold's input).
    */
  def additiveSnapshotAt(table: String, version: Int, schema: StructType): DataFrame =
    additiveSnapshotCore(table, version, schema, None)

  private def additiveSnapshotCore(table: String, version: Int,
      schema: StructType, pruneKeys: Option[DataFrame]): DataFrame = {
    if (version == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // the inverse misuse guard: a CDC/base chain summed per payload
    // value is equally silent garbage
    val measures = additiveCols(table).getOrElse(
      throw new IllegalStateException(
        s"additiveSnapshotAt: table '$table' is not an additive " +
          "multiplicity table — read it with snapshot/snapshotAt"))
    require(version >= horizon(table),
      s"additiveSnapshotAt: v$version is below the vacuum horizon " +
        s"v${horizon(table)} of $table — its history was reclaimed")
    val b = baseAtOrBefore(table, version)
    val base =
      if (b == 0) None else Some(spark.read.parquet(baseDir(table, b)))
    val deltas =
      if (b == version) None
      else Some(readDeltas(table, b + 1, version).drop("__v"))
    val raw = (base.toSeq ++ deltas.toSeq).reduce(_ unionByName _)
    // __bkt is layout, not payload: derived at write, dropped on read
    val payload = raw.columns.filterNot(measures.contains)
      .filterNot(_ == "__bkt")
    val all = pruneKeys match {
      case Some(keys) =>
        require(keys.columns.forall(payload.contains),
          s"additiveSnapshotForKeys: key columns ${keys.columns.mkString(", ")} " +
            s"must be payload columns of '$table' (${payload.mkString(", ")})")
        // bucketed chain + keys covering the bucket column: push the
        // ≤ n-value __bkt IN (…) filter below the union, into every
        // scan — row groups (≈ files, the write clusters by __bkt) of
        // untouched buckets never decode. The key set is caller-
        // contracted broadcast-sized, so the driver-side bucket-id
        // collect is bounded by min(|keys|, n).
        val pruned = bucketSpec(table) match {
          case Some((k, n)) if keys.columns.contains(k) =>
            val bks = keys
              .select(pmod(hash(col(k)), lit(n)).cast("int").as("__bkt"))
              .distinct().collect().map(_.getInt(0)).toSeq
            // a probe touching EVERY bucket prunes nothing — the IN
            // check would then be a pure per-row tax on the state scan
            if (bks.size < n) raw.filter(col("__bkt").isin(bks: _*))
            else raw
          case _ => raw
        }
        pruned.join(org.apache.spark.sql.functions.broadcast(keys),
          keys.columns.toSeq, "left_semi")
      case None => raw
    }
    // drop only ALL-zero rows: a multi-measure state like (count 0,
    // qsum ≠ 0) is a legitimate partial that must survive the fold
    // (MatView's group-moving-update argument)
    all.groupBy(payload.map(col): _*)
      .agg(measures.map(m => sum(col(m)).as(m)).head,
        measures.map(m => sum(col(m)).as(m)).tail: _*)
      .filter(measures.map(col(_) =!= 0L).reduce(_ || _))
  }

  /** Fold each audit date partition's append-per-trigger files into one
    * file — a 5 s trigger writes ~17k files/day, and monitoring scans
    * pay per-file open costs forever without this. Maintenance-window
    * operation: per-date rewrite (data lands in the replacement dir
    * BEFORE the original is removed), not safe concurrent with an
    * in-flight [[appendAudit]] on the same date — run it on closed
    * (past) dates or with the pipeline quiesced.
    */
  def compactAudit(): Unit = {
    val root = new Path(s"$basePath/_audit")
    if (!fs.exists(root)) return
    def children(prefix: String): Seq[Path] =
      fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(prefix))
    // recovery sweep: a crash between the two moves below leaves the
    // date only in its .…_old dir — restore it before compacting
    children(".log_date=").filter(_.getName.endsWith("._old"))
      .foreach { old =>
        val orig = new Path(old.getParent,
          old.getName.stripPrefix(".").stripSuffix("._old"))
        if (!fs.exists(orig)) renameOrFail(old, orig)
        else fs.delete(old, true)
      }
    children("log_date=").foreach { d =>
      // dot-prefixed dirs are invisible to Spark's partition discovery,
      // so no crash point double-counts the date: data lands in tmp
      // first, the original steps aside (recoverable, above), the
      // replacement moves in, and only then does the original die
      val name = d.getName
      val tmp = new Path(d.getParent, "." + name + "._compacting")
      val old = new Path(d.getParent, "." + name + "._old")
      spark.read.parquet(d.toString).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      renameOrFail(d, old)
      renameOrFail(tmp, d)
      fs.delete(old, true)
    }
  }

  /** Audit rows append partitioned by `log_date`: the audit table is
    * the one append-forever table in the system, so date partitioning
    * is what keeps `Monitoring.recent`/`statusBreakdown` scans pruned
    * when the log is 100× today's volume (`AuditPruneSpec` asserts the
    * partition filter reaches the scan).
    */
  /** Synchronized because the audit directory is the ONE path every
    * (mapping, direction) query appends to: Spark's FileOutputCommitter
    * stages every job writing to a directory under the SAME
    * `<dir>/_temporary/0`, so two concurrent appends clobber each
    * other's staging (observed as FileNotFoundException on commit —
    * `ConcurrentPipelineSpec` runs all six queries at once). All
    * queries against one store share this driver-side object, so a JVM
    * lock fully serializes the (tiny, per-trigger) audit jobs; data
    * deltas need no lock — each table writes its own version dir. A
    * multi-driver deployment would put the audit sink on a
    * transactional table format instead.
    */
  def appendAudit(df: DataFrame): Unit = synchronized {
    df.withColumn("log_date", to_date(col("log_time")))
      .write.mode(SaveMode.Append)
      .partitionBy("log_date").parquet(s"$basePath/_audit")
  }

  // ---- exactly-once per-epoch audit append -------------------------
  //
  // [[appendAudit]] is at-least-once under streaming replay (a crash
  // between append and epoch commit duplicates the epoch's rows) and
  // serialized under concurrency (every append to the directory shares
  // one FileOutputCommitter `_temporary/0`, hence the JVM lock above).
  // The epoch path fixes both: the epoch's rows land in a PRIVATE
  // dot-directory (invisible to readers and to partition discovery),
  // then ONE deterministically-named file moves into the date
  // partition. The move is the commit point — a replay that finds the
  // file already in place skips, and two pipelines never share a
  // staging path, so no lock. Epoch audit rows are all stamped with one
  // driver-side log_time, so an epoch spans exactly one log_date.

  private def epochStagingDir(key: String) = s"$basePath/_audit/.epochs/$key"

  /** Write one epoch's audit rows to its private staging dir
    * (Overwrite — a replayed crash simply rewrites it). One Spark job;
    * attach an `observe` to `df` to count rows in the same job.
    * `log_date` is NOT materialized in the file — the publish step's
    * partition directory supplies it on read, exactly like
    * [[appendAudit]]'s `partitionBy` files (a data column shadowing
    * the partition column would trip COLUMN_ALREADY_EXISTS).
    */
  def stageEpochAudit(df: DataFrame, key: String): Unit =
    df.repartition(1) // keep the audit join/window parallel upstream
      .write.mode(SaveMode.Overwrite).parquet(epochStagingDir(key))

  /** Commit a staged epoch: move its single part file to
    * `_audit/log_date=<d>/<key>.parquet`. Idempotent — if the
    * destination exists (replay after a crash right after the move),
    * the staged copy is discarded instead.
    */
  def publishEpochAudit(key: String, logDate: java.time.LocalDate): Unit = {
    val staging = new Path(epochStagingDir(key))
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"no staged audit file for epoch $key"))
    val destDir = new Path(s"$basePath/_audit/log_date=$logDate")
    fs.mkdirs(destDir)
    val dest = new Path(destDir, s"$key.parquet")
    if (!fs.exists(dest)) renameOrFail(part, dest)
    fs.delete(staging, true)
  }

  /** Did epoch `key`'s audit file ever publish? Replay-only check (the
    * normal path never calls it), so the directory walk across date
    * partitions — the file may have published under a different date
    * than a midnight-straddling replay would stamp — is off the
    * per-trigger path.
    */
  def auditEpochLanded(key: String): Boolean = {
    val root = new Path(s"$basePath/_audit")
    fs.exists(root) && fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("log_date="))
      .exists(d => fs.exists(new Path(d, s"$key.parquet")))
  }

  /** Drop a staged epoch that will never publish (empty batch). */
  def discardEpochAudit(key: String): Unit =
    deleteIfExists(epochStagingDir(key))

  def audit(): DataFrame = {
    val p = new Path(s"$basePath/_audit")
    // an all-blocked-free EMPTY micro-batch appends zero rows, leaving a
    // directory with no parquet files — treat that as "no audit yet"
    // rather than letting schema inference fail
    // dot-dirs (.epochs staging, compaction tmp) are invisible to the
    // Spark read below, so they must not count as "has audit" either
    // "hidden" = any path component BELOW the audit root is
    // dot-prefixed (checking the whole URI would misfire on a
    // dot-named ancestor of basePath itself)
    def hidden(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur.getName != "_audit") {
        if (cur.getName.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    def hasFiles: Boolean = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next().getPath
        found = f.getName.endsWith(".parquet") && !hidden(f)
      }
      found
    }
    if (fs.exists(p) && hasFiles) spark.read.parquet(p.toString)
    else spark.emptyDataFrame
  }
}
