package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental JOIN-view maintenance — the missing sibling of
  * [[MatView]]'s aggregate views: a materialized inner join
  * `J = A ⋈_keys B` kept current under insert/delete change streams on
  * BOTH sides, without ever re-running the join over the base tables.
  *
  * The algebra is the classic counting form of incremental view
  * maintenance (bag semantics, rows annotated with signed
  * multiplicities — the same ±1 algebra [[graft.ops.Incremental]] uses
  * for aggregates, generalized to join results where a delta row's
  * multiplicity MULTIPLIES with its join partners'):
  *
  * {{{
  *   ΔJ = ΔA ⋈ B_old  ⊕  A_new ⋈ ΔB            (A_new = A_old ⊕ ΔA,
  *                                               so the ΔA⋈ΔB cross
  *                                               term is already in
  *                                               the second join)
  * }}}
  *
  * Per-trigger JOIN cost is O(|batch| + |matching rows|): each delta
  * side is a value-aggregated micro-batch (tiny) BROADCAST against the
  * stored side, so computing ΔJ never shuffles a stored table. State
  * lands in the store's ADDITIVE tables
  * ([[SnapshotStore.commitAdditive]]): each trigger APPENDS the signed
  * side deltas and ΔJ — O(|batch| + |matching|) written, never a state
  * rewrite — and reads reconstruct by summing multiplicities
  * (merge-on-read, chain folded into an aggregated base every
  * `compactEvery` commits). A deleted `A` row still retracts every
  * join result it contributed to in one broadcast pass — the behavior
  * that makes the view trustworthy under CDC, where bag semantics and
  * deletes break naive "append the new matches" schemes.
  *
  * Exactly-once across THREE tables without a cross-table transaction:
  * the A-side state, the view, and the B-side state commit in that
  * fixed order, each gated on its own per-table batch-id meta (the
  * [[SnapshotStore]] atomic versioned commit). The view step always
  * reads A AFTER its update and B BEFORE its own, so a replay from any
  * crash window recomputes the identical ΔJ: crash after A → replay
  * skips A, recomputes ΔJ against (A_new, B_old); crash after the view
  * → replay skips A and the view and only lands B. `JoinViewSpec`
  * injects both windows.
  *
  * Column contract: `deltaA`/`deltaB` share exactly the join `keys`
  * plus an op column (`INSERT`/`DELETE`; an UPDATE is the standard
  * retract+insert pair); their other column names must be disjoint —
  * the view's schema is A's columns ++ B's non-key columns ++ the
  * multiplicity `state_cnt` (how many (a,b) row pairs produce that
  * joined value — collapses duplicates the way a bag join would).
  */
object JoinView {

  /** Value-aggregated signed multiplicities for one side of one batch:
    * group by every payload column, Σ(±1), zero-sum values vanish.
    */
  private[streaming] def sided(batch: DataFrame, opCol: String): DataFrame = {
    val sign = when(col(opCol) === "DELETE", -1L)
      .when(col(opCol) === "INSERT", 1L)
      .otherwise(raise_error(concat(
        lit("JoinView: unsupported op '"), col(opCol),
        lit("' — deliver UPDATEs as retract(DELETE) + insert(INSERT) pairs")))
        .cast("long"))
    val payload = batch.columns.filterNot(_ == opCol)
    batch.withColumn("__sign", sign)
      .groupBy(payload.map(col): _*)
      .agg(sum(col("__sign")).as("state_cnt"))
      .filter(col("state_cnt") =!= 0L)
  }

  /** One side's join contribution: the (small, value-aggregated) delta
    * broadcast against the stored other side; multiplicities multiply.
    */
  private[streaming] def joinMult(delta: DataFrame, stored: DataFrame,
      keys: Seq[String], deltaIsLeft: Boolean): DataFrame = {
    val d = broadcast(delta.withColumnRenamed("state_cnt", "__cd"))
    val s = stored.withColumnRenamed("state_cnt", "__cs")
    val joined = if (deltaIsLeft) d.join(s, keys) else s.join(d, keys)
    joined.withColumn("state_cnt", col("__cd") * col("__cs"))
      .drop("__cd", "__cs")
  }

  private def done(store: SnapshotStore, table: String, batchId: Long): Boolean =
    store.currentMeta(table).exists(_.toLong >= batchId)

  /** Fold one micro-batch of two-sided changes into the stored view
    * (idempotent per `batchId`; see the class doc for the crash-window
    * argument). `table` holds the view; side states live at
    * `<table>__A` / `<table>__B`.
    */
  def applyBatch(
      store: SnapshotStore, table: String, deltaA: DataFrame,
      deltaB: DataFrame, batchId: Long, keys: Seq[String],
      opCol: String): Unit = {
    val aT = s"${table}__A"
    val bT = s"${table}__B"
    if (done(store, bT, batchId) && done(store, table, batchId) &&
      done(store, aT, batchId)) return // fully landed epoch
    // localCheckpoint: each delta feeds two downstream plans (state
    // merge + view delta) and must not recompute differently
    val dA = sided(deltaA, opCol).localCheckpoint(true)
    val dB = sided(deltaB, opCol).localCheckpoint(true)
    // empty trigger (or all ops zero-sum): skip before ANY commit — the
    // state merge is O(|state|) per table, so an idle stream must not
    // rewrite three tables per tick. Replay-safe: meta stays behind,
    // and `done` gates on >= so later batches are unaffected.
    if (dA.isEmpty && dB.isEmpty) return
    if (!done(store, aT, batchId))
      store.commitAdditive(aT, dA, meta = Some(batchId.toString))
    if (!done(store, table, batchId)) {
      val aNew = store.additiveSnapshot(aT, dA.schema)
      val bOld = store.additiveSnapshot(bT, dB.schema)
      val dJ = joinMult(dA, bOld, keys, deltaIsLeft = true)
        .unionByName(joinMult(dB, aNew, keys, deltaIsLeft = false))
      store.commitAdditive(table, dJ, meta = Some(batchId.toString))
    }
    if (!done(store, bT, batchId))
      store.commitAdditive(bT, dB, meta = Some(batchId.toString))
  }

  /** Maintain `viewTable` = `tableA ⋈_keys tableB` over two STORE
    * tables from their CHANGE FEEDS — the lakehouse form of the
    * streaming view above, and simpler: the side states ARE the store
    * tables (their versions replace the A/B multiplicity tables), so
    * the whole refresh is ONE atomic view commit whose meta records
    * the `(versionA, versionB)` pair it reflects — no multi-table
    * crash window at all; a replay recomputes from the same pair.
    *
    * Algebra as in [[applyBatch]]: ΔJ = ΔA ⋈ B@vB ⊕ A@tA ⋈ ΔB, where
    * each side's Δ is the signed value-grouped difference of the
    * touched rows' (before, after) images
    * ([[SnapshotStore.changedImages]] — group-moving updates retract
    * correctly). Cost: O(|changes| + the two snapshot projections the
    * join terms touch); both tables must be delta-chain tables
    * (written via `commitDelta`) so their feeds exist. Returns the
    * `(versionA, versionB)` the view now reflects.
    */
  def refreshFromStore(
      store: SnapshotStore, viewTable: String, tableA: String, tableB: String,
      keys: Seq[String], aCols: Seq[String], bCols: Seq[String]): (Int, Int) = {
    val (tA, tB) = (store.currentVersion(tableA), store.currentVersion(tableB))
    val (vA, vB) = store.currentMeta(viewTable)
      .map { m => val p = m.split(":"); (p(0).toInt, p(1).toInt) }
      .getOrElse((0, 0))
    if (vA == tA && vB == tB) return (vA, vB)
    deltaJoinTerms(store, tableA, tableB, keys, keys ++ aCols, keys ++ bCols,
      vA, vB, tA, tB) match {
      case Seq() =>
        // one side changed but the other has never held a row: ΔJ = ∅.
        // Do NOT commit — the view keeps reflecting (vA, vB), and a
        // later refresh rebuilds the same (empty) term from the same
        // pair, so nothing is lost or double-counted.
        (vA, vB)
      case ts =>
        // ΔJ appends additively: each refresh writes O(|ΔJ|), and the
        // view reconstructs by multiplicity sum like the streaming path
        store.commitAdditive(viewTable, ts.reduce(_ unionByName _),
          meta = Some(s"$tA:$tB"))
        (tA, tB)
    }
  }

  /** The ΔJ terms of one store-to-store refresh step:
    * ΔA ⋈ B@vB ⊕ A@tA ⋈ ΔB, each side's Δ the signed value-grouped
    * difference of the touched rows' (before, after) images. Shared by
    * [[refreshFromStore]] and [[JoinAggView.refreshFromStore]]. Empty
    * when the only changed side has never had a partner row.
    */
  private[streaming] def deltaJoinTerms(
      store: SnapshotStore, tableA: String, tableB: String,
      keys: Seq[String], aProj: Seq[String], bProj: Seq[String],
      vA: Int, vB: Int, tA: Int, tB: Int): Seq[DataFrame] = {
    def grouped(df: DataFrame, cols: Seq[String]): DataFrame =
      df.select(cols.map(col): _*).groupBy(cols.map(col): _*)
        .agg(count(lit(1)).cast("long").as("state_cnt"))
    def sidedDelta(table: String, fromV: Int, toV: Int, cols: Seq[String]): DataFrame = {
      val (before, after, _, _) = store.changedImages(table, fromV, toV)
      after.select(cols.map(col): _*).withColumn("__sign", lit(1L))
        .unionByName(before.select(cols.map(col): _*).withColumn("__sign", lit(-1L)))
        .groupBy(cols.map(col): _*).agg(sum(col("__sign")).as("state_cnt"))
        .filter(col("state_cnt") =!= 0L)
    }
    val terms = Seq.newBuilder[DataFrame]
    if (vA < tA && vB > 0)
      terms += joinMult(sidedDelta(tableA, vA, tA, aProj),
        grouped(store.snapshotAt(tableB, vB), bProj), keys, deltaIsLeft = true)
    if (vB < tB && tA > 0)
      terms += joinMult(sidedDelta(tableB, vB, tB, bProj),
        grouped(store.snapshotAt(tableA, tA), aProj), keys, deltaIsLeft = false)
    terms.result()
  }

  /** Run the view over ONE tagged change stream (`sideCol` ∈ A|B; rows
    * carry the union of both sides' columns, the other side's null).
    * Each side's payload is carved out by name per batch — the
    * single-stream form every two-input `foreachBatch` maintenance
    * loop reduces to.
    */
  def start(
      changes: DataFrame, store: SnapshotStore, table: String,
      keys: Seq[String], aCols: Seq[String], bCols: Seq[String],
      sideCol: String, opCol: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val selA = (keys ++ aCols :+ opCol).map(col)
        val selB = (keys ++ bCols :+ opCol).map(col)
        applyBatch(store, table,
          b.filter(col(sideCol) === "A").select(selA: _*),
          b.filter(col(sideCol) === "B").select(selB: _*),
          id, keys, opCol)
        ()
      }
      .start()
}
