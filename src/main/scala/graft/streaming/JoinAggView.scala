package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Incremental

/** Incremental AGGREGATE-over-JOIN maintenance — the composition of
  * [[JoinView]]'s counting algebra with [[graft.ops.Incremental]]'s
  * retractable aggregate state: a materialized
  *
  * {{{
  *   SELECT gKeys, COUNT(*), SUM(value)
  *   FROM A JOIN B USING (keys)
  *   GROUP BY gKeys
  * }}}
  *
  * kept current under insert/delete change streams on BOTH base
  * relations, without materializing the join itself. This is the
  * classic IVM benchmark shape (revenue per nation over
  * orders ⋈ customer, maintained under CDC) and the view a 100 TB
  * warehouse actually serves: the full join is too big to store, but
  * its rollup is O(|groups|).
  *
  * Per trigger:
  *
  *  1. ΔJ = ΔA ⋈ B_old ⊕ A_new ⋈ ΔB exactly as [[JoinView]] computes
  *     it (signed multiplicities multiply; each tiny value-aggregated
  *     delta side broadcasts against the stored side — the stored
  *     tables never shuffle).
  *  2. ΔJ NEVER lands: it folds straight into the per-group aggregate
  *     delta (Σ m, Σ m·quantize(value)) — [[Incremental.aggState]]
  *     with ΔJ's multiplicity as the sign, since a joined row of
  *     multiplicity m contributes m times. O(|touched groups|) rows.
  *  3. The delta commits to a MULTI-MEASURE additive table
  *     ([[SnapshotStore.commitAdditive]] with
  *     `cntCols = (state_cnt, state_qsum)`) — sums are associative and
  *     commutative, so the rollup state is itself additive:
  *     per-trigger writes stay O(|touched groups|), reads merge-on-read
  *     and the chain folds at compaction boundaries like any additive
  *     chain. Fixed-point quantization (Incremental's ×scale trick)
  *     keeps every merge order bit-identical.
  *
  * Exactly-once mirrors [[JoinView.applyBatch]]: commit order
  * A → agg → B, each table gated on its own batch-id meta; the agg
  * step reads A AFTER its update and B BEFORE its own, so a replay
  * from either crash window recomputes the identical ΔJ (and hence
  * the identical aggregate delta). Fully-retracted groups vanish at
  * read time: exact retraction zeroes BOTH measures, and the additive
  * read drops all-zero rows.
  */
object JoinAggView {

  val MeasureCols: Seq[String] = Seq("state_cnt", "state_qsum")

  private def done(store: SnapshotStore, table: String, batchId: Long): Boolean =
    store.currentMeta(table).exists(_.toLong >= batchId)

  /** Fold one micro-batch of two-sided changes into the stored rollup
    * (idempotent per `batchId`). `table` holds the aggregate view;
    * side multiplicity states live at `<table>__A` / `<table>__B`.
    * `valueCol` must be a column of A or B (not a join key); `gKeys`
    * may come from either side.
    */
  def applyBatch(
      store: SnapshotStore, table: String, deltaA: DataFrame,
      deltaB: DataFrame, batchId: Long, keys: Seq[String],
      gKeys: Seq[String], valueCol: String, opCol: String,
      scale: Long = 100L): Unit = {
    val aT = s"${table}__A"
    val bT = s"${table}__B"
    if (done(store, bT, batchId) && done(store, table, batchId) &&
      done(store, aT, batchId)) return // fully landed epoch
    val dA = JoinView.sided(deltaA, opCol).localCheckpoint(true)
    val dB = JoinView.sided(deltaB, opCol).localCheckpoint(true)
    if (dA.isEmpty && dB.isEmpty) return // idle trigger: no commits at all
    if (!done(store, aT, batchId))
      store.commitAdditive(aT, dA, meta = Some(batchId.toString))
    if (!done(store, table, batchId)) {
      val aNew = store.additiveSnapshot(aT, dA.schema)
      val bOld = store.additiveSnapshot(bT, dB.schema)
      val dJ = JoinView.joinMult(dA, bOld, keys, deltaIsLeft = true)
        .unionByName(JoinView.joinMult(dB, aNew, keys, deltaIsLeft = false))
      val dAgg = Incremental.aggState(dJ, gKeys, valueCol, scale,
          signCol = Some("state_cnt"))
        .filter(col("state_cnt") =!= 0L || col("state_qsum") =!= 0L)
      store.commitAdditive(table, dAgg, meta = Some(batchId.toString),
        cntCols = MeasureCols)
    }
    if (!done(store, bT, batchId))
      store.commitAdditive(bT, dB, meta = Some(batchId.toString))
  }

  /** Maintain the rollup over two STORE tables from their CHANGE FEEDS
    * — the lakehouse form, mirroring [[JoinView.refreshFromStore]] and
    * simpler than the streaming path: the side states ARE the tables'
    * versions, so the whole refresh is ONE atomic additive commit
    * whose meta records the reflected `(versionA, versionB)` pair — no
    * multi-table crash window; a replay recomputes from the same pair.
    * Per refresh: the shared ΔJ terms ([[JoinView.deltaJoinTerms]],
    * O(|changes| + the touched snapshot projections)) fold into the
    * per-group aggregate delta and append O(|touched groups|) rows.
    * Returns the `(versionA, versionB)` the rollup now reflects.
    */
  def refreshFromStore(
      store: SnapshotStore, viewTable: String, tableA: String,
      tableB: String, keys: Seq[String], aCols: Seq[String],
      bCols: Seq[String], gKeys: Seq[String], valueCol: String,
      scale: Long = 100L): (Int, Int) = {
    val (tA, tB) = (store.currentVersion(tableA), store.currentVersion(tableB))
    val (vA, vB) = store.currentMeta(viewTable)
      .map { m => val p = m.split(":"); (p(0).toInt, p(1).toInt) }
      .getOrElse((0, 0))
    if (vA == tA && vB == tB) return (vA, vB)
    JoinView.deltaJoinTerms(store, tableA, tableB, keys,
      keys ++ aCols, keys ++ bCols, vA, vB, tA, tB) match {
      case Seq() => (vA, vB) // one-sided backlog vs an empty partner: ΔJ = ∅
      case ts =>
        val dAgg = Incremental.aggState(ts.reduce(_ unionByName _), gKeys,
            valueCol, scale, signCol = Some("state_cnt"))
          .filter(col("state_cnt") =!= 0L || col("state_qsum") =!= 0L)
        store.commitAdditive(viewTable, dAgg, meta = Some(s"$tA:$tB"),
          cntCols = MeasureCols)
        (tA, tB)
    }
  }

  /** The maintained rollup, presented as (gKeys, n_rows, total_value,
    * mean_value) — [[Incremental.finish]] over the additive snapshot.
    */
  def snapshot(store: SnapshotStore, table: String, gKeys: Seq[String],
      scale: Long = 100L): DataFrame =
    Incremental.finish(store.additiveSnapshot(table, null), gKeys, scale)

  /** Run the rollup over ONE tagged change stream ([[JoinView.start]]'s
    * contract: `sideCol` ∈ A|B, rows carry the union of both sides'
    * columns with the other side's null).
    */
  def start(
      changes: DataFrame, store: SnapshotStore, table: String,
      keys: Seq[String], aCols: Seq[String], bCols: Seq[String],
      gKeys: Seq[String], valueCol: String, sideCol: String, opCol: String,
      checkpoint: String, scale: Long = 100L,
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
          id, keys, gKeys, valueCol, opCol, scale)
        ()
      }
      .start()
}
