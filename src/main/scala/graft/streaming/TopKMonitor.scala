package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming heavy-hitters monitor — the Misra-Gries summary
  * maintained ACROSS micro-batch triggers, the cross-trigger form of
  * [[graft.ops.Sketches]]' frequency sketching the way [[DriftMonitor]]
  * is cusumDrift's: per trigger, the batch's exact item counts merge
  * into a stored k-row summary, and the merge applies the classic MG
  * decrement (subtract the (k+1)-th largest merged count `d`, keep
  * strictly-positive survivors — at most k items can exceed the
  * (k+1)-th largest, so the state is ≤ k rows by construction).
  *
  * MG summaries are mergeable with no error amplification (Agarwal et
  * al. 2012, "Mergeable Summaries"), and this monitor additionally
  * tracks the EXACT cumulative decrement `dsum`, giving per-item
  * bounds with no distributional argument at all: a stored count `c`
  * brackets the true stream count in [c, c + dsum], and every item
  * whose true count exceeds dsum is guaranteed present (an absent
  * item was decremented away, losing at most dsum ≤ n/(k+1) total).
  * Both the coverage guarantee and the bracket are spec-pinned against
  * exact batch counts after every trigger prefix.
  *
  * Scale: the per-trigger work is ONE batch-sized exact count
  * (map-side partial aggregation) merged with a ≤ k-row table; the
  * decrement pivot is a top-(k+1) driver fetch (k is a small
  * parameter, never data-sized) and the commit writes ≤ k rows.
  * Exactly-once: (batchId, n, dsum) commit atomically with the state
  * version in the store meta, so a crash-replayed foreachBatch sees
  * its own id and skips instead of double-counting.
  */
object TopKMonitor {

  private def stateSchema(batch: DataFrame, itemCol: String): StructType =
    StructType(Seq(
      StructField("item", batch.schema(itemCol).dataType),
      StructField("c", LongType)))

  private def parseMeta(m: Option[String]): (Long, Long, Long) =
    m.map(_.split('|')) match {
      case Some(Array(b, n, d)) => (b.toLong, n.toLong, d.toLong)
      case _ => (-1L, 0L, 0L)
    }

  /** Fold one micro-batch's items into the stored MG summary
    * (idempotent per `batchId`). A trigger runs exactly THREE driver
    * actions: the merge checkpoint, the k+1-row pivot fetch, and the
    * ≤k-row state commit — the batch's mass (the `n` increment) rides
    * the merge checkpoint as an OBSERVED metric on the batch-count
    * side, so no separate scalar aggregation ever runs (the two extra
    * mass aggregations this replaces re-read materialized tables, but
    * four round-trips per 5 s trigger was still twice the driver
    * latency the fold needs). Budget is spec-pinned.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      itemCol: String, k: Int): Unit = {
    val (lastId, n0, dsum0) = parseMeta(store.currentMeta(table))
    if (lastId >= batchId) return // replay
    val obs = org.apache.spark.sql.Observation()
    val bc = batch.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("c"))
      // batch mass = Σ batch counts, collected as a metric of the SAME
      // job that materializes the merge — Observation.get returns it
      // after the checkpoint action with no extra query
      .observe(obs, coalesce(sum(col("c")), lit(0L)).as("mass"))
    val state = store.snapshot(table, stateSchema(batch, itemCol))
    val merged = bc.unionByName(state)
      .groupBy(col("item")).agg(sum(col("c")).cast("long").as("c"))
      .localCheckpoint(true) // pivot fetch + survivor write share one pass
    val batchMass = obs.get("mass").asInstanceOf[Long]
    // the decrement pivot: the (k+1)-th largest merged count (0 when
    // the summary already fits) — a k+1-row driver fetch, k-bounded
    val top = merged.orderBy(col("c").desc, col("item")).limit(k + 1).collect()
    val d = if (top.length <= k) 0L else top.last.getLong(1)
    val survivors =
      if (d == 0L) merged
      else merged.filter(col("c") > d)
        .select(col("item"), (col("c") - d).as("c"))
    store.commit(table, survivors,
      meta = Some(s"$batchId|${n0 + batchMass}|${dsum0 + d}"))
  }

  /** The monitor's queryable surface: each surviving item with its
    * count bracket [count_min, count_max] (true count is inside), plus
    * the stream totals the guarantee quotes — every item with true
    * count > error_bound (= cumulative decrement ≤ n/(k+1)) is here.
    */
  def report(spark: SparkSession, store: SnapshotStore, table: String): DataFrame = {
    val (_, n, dsum) = parseMeta(store.currentMeta(table))
    store.snapshot(table, null)
      .select(col("item"), col("c").as("count_min"),
        (col("c") + dsum).as("count_max"),
        lit(n).as("n_total"), lit(dsum).as("error_bound"))
      .orderBy(col("count_min").desc, col("item"))
  }

  /** Run the monitor over an item stream. */
  def start(
      rows: DataFrame, store: SnapshotStore, table: String,
      itemCol: String, k: Int, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(store, table, b, id, itemCol, k); ()
      }
      .start()
}
