package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming equal-width-bin quantile monitor — the qs1 histogram
  * sketch maintained across triggers on the store's ADDITIVE table
  * kind: bin counts are signed multiplicities, so each trigger commits
  * just the batch's own (bin, count) rows via `commitAdditive` and the
  * merge-on-read fold reconstructs exactly the bin table one batch
  * scan over the whole history would produce — incremental-equals-
  * batch is EXACT (integer addition is the whole merge), and that is
  * the spec'd contract against [[graft.ops.Sketches.binQuantiles]].
  *
  * The fifth cross-trigger maintainer, and the one that exercises the
  * additive chain: where DriftMonitor rewrites an O(|groups|) snapshot
  * and ComponentMonitor writes CDC deltas, this one writes O(|batch
  * bins|) additive rows and lets the store's fold-every-compactEvery
  * bound the read fan-in.
  *
  * Exactly-once: batch id in the commit meta, as the sibling
  * monitors. Bin width is a parameter of the MONITOR, not the state —
  * reading with a different width than was written is meaningless, so
  * pass the same width for the monitor's lifetime.
  */
object QuantileMonitor {

  private val stateSchema = StructType(Seq(
    StructField("bin", LongType), StructField("state_cnt", LongType)))

  /** Fold one micro-batch's values into the stored bin table
    * (idempotent per `batchId`).
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      valueCol: String, width: Double): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    val bins = batch
      .select(floor(col(valueCol).cast("double") / width).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("state_cnt"))
    store.commitAdditive(table, bins, meta = Some(batchId.toString))
  }

  /** Quantile estimates over everything seen: (p, estimate) per
    * requested p — [[graft.ops.Sketches.binQuantiles]]'s exact output
    * shape over the folded bins.
    */
  def quantiles(
      spark: SparkSession, store: SnapshotStore, table: String,
      width: Double, ps: Seq[Double]): DataFrame =
    graft.ops.Sketches.quantilesFromBins(
      store.additiveSnapshot(table, stateSchema)
        .select(col("bin"), col("state_cnt").as("c")),
      width, ps)

  /** The raw folded histogram: (bin, count), bin order. */
  def histogram(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.additiveSnapshot(table, stateSchema).orderBy(col("bin"))

  /** Run the monitor over a value stream. */
  def start(
      rows: DataFrame, store: SnapshotStore, table: String,
      valueCol: String, width: Double, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(store, table, b, id, valueCol, width); ()
      }
      .start()
}
