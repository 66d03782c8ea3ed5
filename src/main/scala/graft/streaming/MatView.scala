package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Incremental

/** Streaming materialized view — per-key aggregates maintained over a
  * CDC change stream: each micro-batch folds into the stored state via
  * [[Incremental]]'s mergeable/retractable algebra, O(|batch| + |keys|)
  * per trigger, never a base-table rescan. INSERTs add, DELETEs
  * retract; an UPDATE is the standard retract+insert pair (emit the
  * before-image as DELETE and the after-image as INSERT — exactly what
  * a Debezium `u` envelope carries).
  *
  * The state table is the AGGREGATE (O(|keys|) rows), so each epoch
  * commits a full tiny snapshot — the right call where the sync path's
  * data tables need the delta machinery. Exactly-once per epoch: the
  * batch id commits atomically with the version (inside the version
  * dir, before the pointer flip), so a crash-replayed `foreachBatch`
  * sees its own id and skips instead of double-counting.
  */
object MatView {

  /** Fold one micro-batch into the stored state (idempotent per
    * `batchId`). Batch columns: `opCol` (INSERT/UPDATE-as-pair/DELETE),
    * `keys`, `valueCol`.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      keys: Seq[String], valueCol: String, opCol: String): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    // Raw UPDATE envelopes would silently double-count (+1 with no
    // retraction of the before-image), so any op outside the documented
    // INSERT/DELETE contract fails the batch instead of corrupting state.
    val signed = batch.withColumn("__sign",
      when(col(opCol) === "DELETE", -1L)
        .when(col(opCol) === "INSERT", 1L)
        .otherwise(raise_error(concat(
          lit("MatView.applyBatch: unsupported op '"), col(opCol),
          lit("' — deliver UPDATEs as retract(DELETE) + insert(INSERT) pairs")))
          .cast("long")))
    val delta = Incremental.aggState(signed, keys, valueCol, signCol = Some("__sign"))
    val current = store.snapshot(table, delta.schema)
    store.commit(table, Incremental.merge(keys, current, delta),
      meta = Some(batchId.toString))
  }

  /** Incremental view refresh FROM a stored table's change feed — the
    * lakehouse form of view maintenance: the view (a per-key aggregate
    * over `srcTable`, grouped by `keys` which may be ANY columns, not
    * the pk) catches up from the version it last saw to the current
    * one by folding ONLY the touched rows. Both images matter: an
    * UPDATE retracts the before-row's contribution (its group may
    * differ from the after-row's!) and adds the after-row's — exactly
    * [[Incremental]]'s ±1 algebra, driven by
    * [[SnapshotStore.changedImages]] instead of a live stream. Cost
    * per refresh: O(|changes| + touched-pk before-image) — never a
    * source rescan. Idempotent: the refreshed-to version commits with
    * the view state, and a replay to the same version no-ops.
    */
  def refreshFromStore(
      store: SnapshotStore, srcTable: String, viewTable: String,
      keys: Seq[String], valueCol: String): Int = {
    val target = store.currentVersion(srcTable)
    val from = store.currentMeta(viewTable).map(_.toInt).getOrElse(0)
    if (from >= target) return from // already caught up
    val (before, after, _, _) = store.changedImages(srcTable, from, target)
    val afterState = Incremental.aggState(after, keys, valueCol)
    val beforeNeg = Incremental.aggState(
      before.withColumn("__sign", lit(-1L)), keys, valueCol,
      signCol = Some("__sign"))
    val current = store.snapshot(viewTable, afterState.schema)
    // ONE merge of all three states: a same-group UPDATE's delta is
    // (cnt 0, qsum ≠ 0), which a pre-merged delta would wrongly drop
    // at merge's fully-retracted (cnt == 0) filter — only the FINAL
    // count may decide retraction
    store.commit(viewTable,
      Incremental.merge(keys, current, afterState, beforeNeg),
      meta = Some(target.toString))
    target
  }

  /** Run [[refreshFromStore]] on a managed cadence: a rate-source
    * stream supplies checkpointed ticks (content ignored) and each
    * trigger catches the view up to the source table's current
    * version. The refresh is version-gated and idempotent, so replayed
    * or overlapping ticks are no-ops — the gain over a cron loop is
    * Spark-managed lifecycle: supervised restarts, `StreamingQuery`
    * status/stop, one checkpoint directory.
    */
  def startRefreshLoop(
      spark: org.apache.spark.sql.SparkSession, store: SnapshotStore,
      srcTable: String, viewTable: String, keys: Seq[String],
      valueCol: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refreshFromStore(store, srcTable, viewTable, keys, valueCol); ()
      }
      .start()

  /** Fold one micro-batch into a stored HLL register table — a
    * DISTINCT-COUNT view whose state is ≤256 rows no matter how many
    * ids the stream has ever carried: batch registers merge into the
    * stored table by bucket-wise max, so the estimate after any prefix
    * of the stream is BIT-IDENTICAL to a batch sketch over the same
    * data (the merge property `hll2` certifies). Same epoch-marker
    * idempotence as [[applyBatch]].
    */
  def applySketchBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      valueCol: String): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    val delta = graft.ops.Sketches.hllRegisters(batch, col(valueCol))
    val current = store.snapshot(table, delta.schema)
    store.commit(table,
      graft.ops.Sketches.hllMergeRegisters(current.unionByName(delta)),
      meta = Some(batchId.toString))
  }

  /** Fold one micro-batch into a stored PER-GROUP KMV sketch table —
    * state is ≤ k hash values per group forever, and unlike the HLL
    * registers the stored sketches also answer DISTINCT-INTERSECTION
    * questions across groups at read time
    * (`Sketches.thetaIntersect`). Merge = re-sketch of the exploded
    * union, which [[graft.ops.Sketches.kmvMergeAll]]'s spec proves
    * identical to a direct sketch — so the streamed state after any
    * prefix of the stream is BIT-IDENTICAL to a batch sketch over the
    * same data. Same epoch-marker idempotence as [[applyBatch]].
    */
  def applyKmvBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      groupCol: String, valueCol: String, k: Int): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    val delta = graft.ops.Sketches.kmvGroupedSketch(
      batch, col(groupCol), col(valueCol), k)
    val current = store.snapshot(table, delta.schema)
    val merged = current.unionByName(delta)
      .select(col("g"), explode(col("kmv")).as("h"))
      .groupBy(col("g"))
      .agg(graft.functions.MinK.minKDistinct(k)(col("h")).as("kmv"))
    store.commit(table, merged, meta = Some(batchId.toString))
  }

  /** Run a per-group distinct-sketch (KMV) view over a stream; read
    * per-group estimates with `Sketches.kmvEstimate` and cross-group
    * intersections with `Sketches.thetaIntersect` over
    * `store.snapshot(table, null)`.
    */
  def startKmvDistinct(
      stream: DataFrame, store: SnapshotStore, table: String,
      groupCol: String, valueCol: String, k: Int, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyKmvBatch(store, table, b, id, groupCol, valueCol, k); ()
      }
      .start()

  /** Run a distinct-count (HLL) view over a stream; read the estimate
    * with `Sketches.hllEstimate(store.snapshot(table, null))`.
    */
  def startDistinct(
      stream: DataFrame, store: SnapshotStore, table: String, valueCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applySketchBatch(store, table, b, id, valueCol); ()
      }
      .start()

  /** Run the view over a change stream. */
  def start(
      changes: DataFrame, store: SnapshotStore, table: String,
      keys: Seq[String], valueCol: String, opCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(store, table, b, id, keys, valueCol, opCol); ()
      }
      .start()
}
