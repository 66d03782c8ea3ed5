package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming bottom-k distinct-sample monitor — the KMV sketch
  * ([[graft.ops.Sketches]]' km1 family) maintained ACROSS triggers,
  * completing the cross-trigger monitor trio ([[DriftMonitor]],
  * [[TopKMonitor]]): the state is the k smallest 60-bit hashes of the
  * distinct items seen, each carrying its item — simultaneously a
  * UNIFORM SAMPLE over the distinct population (hash order is
  * oblivious to arrival order and frequency) and the KMV
  * distinct-count estimator (k−1)·2⁶⁰ / h₍ₖ₎.
  *
  * Unlike the MG summary there is no error-accumulation story to
  * track: bottom-k is a DETERMINISTIC function of the distinct set
  * (bounded-prune merge is exact — sketch(A ∪ B) ≡
  * merge(sketch(A), sketch(B))), so incremental-equals-batch holds
  * BIT-EXACTLY after every trigger prefix, and that is the spec'd
  * contract.
  *
  * Scale: per trigger one batch-sized hash + distinct aggregation
  * (map-side partials), a union with ≤ k stored rows, and a
  * TakeOrdered k cut — the commit writes ≤ k rows. Exactly-once via
  * the batch id in the commit meta, as the sibling monitors.
  */
object SampleMonitor {

  private val stateSchema = StructType(Seq(
    StructField("h", LongType), StructField("item", StringType)))

  /** Fold one micro-batch into the stored bottom-k state (idempotent
    * per `batchId`). Items participate as strings (the batch KMV's
    * convention — hash60 of the cast); null items are dropped.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      itemCol: String, k: Int): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    val bc = batch
      .select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(graft.ops.Dedup.hash60(col("item")).as("h"), col("item"))
      .groupBy(col("h")).agg(min(col("item")).as("item"))
    val merged = bc.unionByName(store.snapshot(table, stateSchema))
      .groupBy(col("h")).agg(min(col("item")).as("item"))
      .orderBy(col("h")).limit(k)
    store.commit(table, merged, meta = Some(batchId.toString))
  }

  /** The uniform distinct-sample surface: (h, item) in hash order. */
  def sample(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.snapshot(table, stateSchema).orderBy(col("h"))

  /** The KMV distinct estimate: exact (= sample size) while the state
    * holds fewer than k items, (k−1)·2⁶⁰ / h₍ₖ₎ once saturated — the
    * batch sketch's formula, engine-exact to the bit.
    */
  def estimate(spark: SparkSession, store: SnapshotStore, table: String,
      k: Int): DataFrame = {
    val twoPow60 = math.pow(2.0, 60) // exactly representable
    store.snapshot(table, stateSchema).agg(
      count(lit(1)).as("n_sample"),
      when(count(lit(1)) < k, count(lit(1)).cast("double"))
        .otherwise(graft.ops.TextAnalysis.round6(
          lit((k - 1).toDouble * twoPow60) / max(col("h")).cast("double")))
        .as("distinct_estimate"))
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
