package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** Streaming CUSUM drift monitor — [[graft.ops.Stats.cusumDrift]]'s
  * cross-trigger form: per-group change-point state maintained over a
  * live metric stream, trigger by trigger, with the REFERENCE level
  * pre-trained (the production posture — an in-sample mean cancels the
  * very drift it should detect; see the batch op's scaladoc).
  *
  * The whole monitor state per group is a handful of running numbers:
  * CUSUM's prefix identity S_i = C_i − min(0, min_{j≤i} C_j) needs
  * only the last prefix sum `c_last` and the folded prefix min
  * `minc_last` to continue, plus the (n, n_alarms, max_s) tallies —
  * so each trigger commits an O(|groups|) snapshot via the store
  * ([[MatView]]'s argument: the state IS the aggregate), while the
  * per-batch work is one partitioned window pass over the batch rows
  * seeded by that state. Incremental-equals-batch is the correctness
  * contract: after any prefix of triggers, [[report]] equals the
  * batch operator over the concatenated input with the same
  * reference — spec-pinned, exactly like MatView vs re-aggregate.
  *
  * Exactly-once: the batch id commits atomically with the state
  * version ([[SnapshotStore.commit]] meta), so a crash-replayed
  * foreachBatch sees its own id and skips instead of double-folding.
  *
  * LATE DATA CAVEAT: CUSUM is order-sensitive by definition; rows
  * fold in (trigger, orderCols-within-batch) order. An out-of-order
  * arrival across triggers folds where it ARRIVES — feed the monitor
  * from an ordered/watermarked upstream if cross-trigger reordering
  * matters.
  */
object DriftMonitor {

  private val stateFields = Seq(
    StructField("c_last", DecimalType(38, 0)),
    StructField("minc_last", DecimalType(38, 0)),
    StructField("n", LongType),
    StructField("n_alarms", LongType),
    StructField("max_s", DecimalType(38, 0)))

  private def stateSchema(batch: DataFrame, groupCol: String): StructType =
    StructType(batch.schema(groupCol) +: stateFields)

  /** Fold one micro-batch into the stored monitor state (idempotent
    * per `batchId`). All CUSUM arithmetic is fixed-point at `scale`
    * with decimal(38,0) prefix sums — bit-identical to the batch op.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      groupCol: String, valueCol: String, orderCols: Seq[String],
      reference: Double, allowance: Double, h: Double,
      scale: Long = 1000000L): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val kQ = math.floor(reference * scale + 0.5).toLong +
      math.floor(allowance * scale + 0.5).toLong
    val hQ = math.floor(h * scale + 0.5).toLong
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // batch-local prefix sums first (the window needs no state); the
    // stored state joins AFTER — c_i = c_last + p_i, and the running
    // min folds the stored min (which already folds the leading 0)
    // with the batch prefix mins
    val prefixed = batch
      .select((col(groupCol) +: orderCols.map(col)) :+
        (floor(col(valueCol).cast("double") * scale.toDouble + 0.5)
          .cast("long") - kQ).cast(dec).as("dev"): _*)
      .withColumn("p", sum(col("dev")).over(w))
    val state = store.snapshot(table, stateSchema(batch, groupCol))
    val scored = prefixed
      .join(broadcast(state), Seq(groupCol), "left")
      .withColumn("c0", coalesce(col("c_last"), lit(0L).cast(dec)))
      .withColumn("m0", coalesce(col("minc_last"), lit(0L).cast(dec)))
      .withColumn("c", col("c0") + col("p"))
      .withColumn("s", col("c") - least(col("m0"), min(col("c")).over(w)))
    val folded = scored.groupBy(col(groupCol)).agg(
      // c at the group's LAST row = c0 + sum of ALL devs (NOT max(p):
      // prefixes dip under negative devs)
      (first(col("c0")) + sum(col("dev"))).cast(dec).as("c_last"),
      least(first(col("m0")), min(col("c"))).cast(dec).as("minc_last"),
      (coalesce(first(col("n")), lit(0L)) + count(lit(1))).as("n"),
      (coalesce(first(col("n_alarms")), lit(0L)) +
        count(when(col("s") > hQ, 1))).as("n_alarms"),
      greatest(coalesce(first(col("max_s")), lit(0L).cast(dec)),
        max(col("s"))).cast(dec).as("max_s"))
    // groups untouched by this batch carry forward unchanged
    val untouched = state.join(folded.select(col(groupCol)),
      Seq(groupCol), "left_anti")
    store.commit(table, folded.unionByName(untouched),
      meta = Some(batchId.toString))
  }

  /** The monitor's queryable surface, shaped like the batch operator's
    * output: (group, n_points, n_alarms, max_s in value units). The
    * group column is whichever state column isn't monitor bookkeeping.
    */
  def report(spark: SparkSession, store: SnapshotStore, table: String,
      scale: Long = 1000000L): DataFrame = {
    val names = stateFields.map(_.name).toSet
    val st = store.snapshot(table, null)
    val g = st.columns.filterNot(names.contains).head
    st.select(col(g), col("n").as("n_points"), col("n_alarms"),
      (col("max_s").cast("double") / scale.toDouble).as("max_s"))
  }

  /** Run the monitor over a metric stream. */
  def start(
      rows: DataFrame, store: SnapshotStore, table: String,
      groupCol: String, valueCol: String, orderCols: Seq[String],
      reference: Double, allowance: Double, h: Double,
      checkpoint: String, scale: Long = 1000000L,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(store, table, b, id, groupCol, valueCol, orderCols,
          reference, allowance, h, scale); ()
      }
      .start()
}
