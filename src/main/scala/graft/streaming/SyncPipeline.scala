package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc._

/** End-to-end CDC sync pipeline (SURVEY.md §3.1 restated Spark-first):
  *
  * Kafka-shaped source (`topic`, `value`) → Debezium envelope parse →
  * config-driven transform → post-transform loop hash → stateful
  * loop-dedup (5 min window / 10 min TTL, suppressed events audited) →
  * `foreachBatch`: ordered apply with upsert conversion +
  * TARGET_NOT_FOUND + audit append, on a 5-second trigger
  * (`Trigger.ProcessingTime`, mirroring the reference's DBMS_SCHEDULER
  * cadence, `asis…04:396`).
  *
  * One streaming query per (mapping, direction) — the reference runs one
  * Kafka listener per topic (`CdcKafkaConsumer.java:60-107`); per-query
  * isolation keeps per-table schemas static for Catalyst.
  *
  * Scale notes: parse/transform are narrow and codegen'd; the only wide
  * stages are the dedup state shuffle (by change_hash) and the apply's
  * pk-hash join+window — both partition by key and scale horizontally.
  * The snapshot store is the local stand-in for a MERGE sink.
  */
final class SyncPipeline(
    spark: SparkSession,
    store: SnapshotStore,
    trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
    watermarkDelay: String = "10 minutes",
    loopWindowMs: Long = LoopDedup.windowMsDefault,
    loopTtlMs: Long = LoopDedup.ttlMsDefault,
    /** transformWithState dedup (Spark 4's supported stateful API,
      * RocksDB-backed state with declarative TTL) is the default;
      * `false` falls back to the flatMapGroupsWithState variant.
      */
    useTws: Boolean = true) {

  private val codeDim = CodeMapping.dim(spark)

  /** Parse + transform + hash one table/direction slice of the source. */
  def transformed(
      source: DataFrame,
      mapping: TableMapping,
      direction: Direction.Value): DataFrame = {
    val topic = Registry.topicFor(direction, mapping)
    val side = mapping.sideFor(direction)
    val target = mapping.targetFor(direction)
    val routed =
      if (source.columns.contains("topic")) source.filter(col("topic") === topic)
      else source
    val parsed = Envelope.parse(routed, side)
    val tx = Transform(parsed, mapping, direction, codeDim)
    val targetCols = mapping.specsFor(direction).map(_._1)
    val valueCols = targetCols.filterNot(_ == target.pk)
    tx.withColumn("change_hash",
        Hashing.loopHash(target.table, col(target.pk), col("operation"),
          valueCols.map(col)))
      .withColumn("event_ts", col("source_ts"))
      .withColumn("seq", unix_micros(col("source_ts")))
  }

  /** Start the streaming query for one mapping+direction. */
  def start(
      source: DataFrame,
      mapping: TableMapping,
      direction: Direction.Value,
      checkpoint: String): StreamingQuery = {
    val tx = transformed(source, mapping, direction)
      .withWatermark("event_ts", watermarkDelay)
    // transformWithState requires the RocksDB provider; set it once at
    // query start (it serves every stateful operator equally well)
    if (useTws) spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val deduped =
      if (useTws) LoopDedupTws(tx, loopWindowMs, loopTtlMs)
      else LoopDedup(tx, loopWindowMs, loopTtlMs)

    deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyMicroBatch(batch, mapping, direction, id); ()
      }
      .start()
  }

  /** One micro-batch: split blocked/live, audit all events against the
    * pre-batch snapshot, then commit the live events as a DELTA —
    * O(|batch|) written per trigger, never O(|table|) (the snapshot
    * store merges on read and compacts in the background path). Also
    * the batch-replay entry point (processing a backlog parquet of
    * events uses exactly this code path).
    *
    * Per-trigger job budget: ONE audit append (whose `observe` metrics
    * double as the live/blocked counters, so no separate counting or
    * isEmpty job) plus one delta write when live events exist — the
    * audit's only O(|table|) touch is `SnapshotStore.existingPks`, a
    * pk/op-column-only membership read (pruned even between
    * compactions, when deltas are outstanding).
    */
  def applyMicroBatch(
      batch: DataFrame,
      mapping: TableMapping,
      direction: Direction.Value,
      batchId: Long = -1L): Unit = {
    val target = mapping.targetFor(direction)
    val targetCols = mapping.specsFor(direction).map(_._1)
    val valueCols = targetCols.filterNot(_ == target.pk)
    // foreachBatch is at-least-once: the epoch id commits atomically
    // with the delta version (inside the dir, before the pointer flip),
    // so a crash-replayed epoch that already landed skips entirely —
    // no duplicate delta, no duplicate audit. The only remaining
    // at-least-once window is a crash BETWEEN the audit append and the
    // delta commit, which can duplicate that epoch's audit rows (the
    // data table itself stays exact; deltas are value-idempotent).
    if (batchId >= 0 &&
      store.currentMeta(target.table).exists(_.toLong >= batchId)) return
    val cached = batch.cache()
    try {
      val blocked = cached.filter(col("loop_blocked"))
      val live = cached.filter(!col("loop_blocked"))

      val schema = org.apache.spark.sql.types.StructType(
        Registry.targetSchema(target).filter(f => targetCols.contains(f.name)))
      // audit statuses (TARGET_NOT_FOUND / upsert conversion) are
      // defined against the table as of BEFORE this batch; existingPks
      // pins the current version eagerly, so the later delta commit
      // can't leak into this frame. Membership comes from the
      // column-pruned pk/op read — the full base⊕delta reconstruction
      // never runs on the trigger path — RESTRICTED to the batch's pk
      // range (one tiny agg on the cached batch buys row-group pruning
      // of the base scan: only groups overlapping the batch's keys are
      // read, the zone-map property that keeps the 5 s trigger flat as
      // the table grows).
      val boundsRow = live.agg(
        min(col(target.pk)), max(col(target.pk))).head()
      val existing =
        if (boundsRow.isNullAt(0)) // no live events: nothing to look up
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(schema.filter(_.name == target.pk)))
        else store.existingPks(target.table, schema, target.pk,
          pkBounds = Some((boundsRow.get(0), boundsRow.get(1))))
      val liveAuditRaw = Apply.auditBatch(
        existing, live.select((Seq("seq", "operation") ++ targetCols :+ "change_hash").map(col): _*),
        target.pk, "seq", auditPassthrough = Seq("change_hash"))

      val dirName = if (direction == Direction.AsisToTobe) "ASIS_TO_TOBE" else "TOBE_TO_ASIS"
      // error-code taxonomy (docs/02-설계/05_에러코드_체계.md, designed-only
      // in the reference): E_001 missing target, E_002 pk-dup upsert,
      // I_001 loop suppression
      def errorCode(status: Column, converted: Column): Column =
        when(status === "TARGET_NOT_FOUND", "SYNC_E_001")
          .when(status === "LOOP_BLOCKED", "SYNC_I_001")
          .when(converted, "SYNC_E_002")
          .otherwise(lit(null).cast("string"))
      def auditCols(df: DataFrame, status: Column, converted: Column) = df.select(
        lit(dirName).as("direction"),
        lit(target.table).as("table_name"),
        col("operation"),
        col("pk_value"),
        status.as("status"),
        converted.as("upsert_converted"),
        errorCode(status, converted).as("error_code"),
        col("change_hash"),
        current_timestamp().as("log_time"))

      val liveAudit = auditCols(liveAuditRaw, col("status"), col("upsert_converted"))
      val blockedAudit = auditCols(
        blocked.withColumn("pk_value", col(target.pk).cast("string")),
        lit("LOOP_BLOCKED"), lit(false))
      val obs = org.apache.spark.sql.Observation()
      store.appendAudit(liveAudit.unionByName(blockedAudit).observe(obs,
        count(when(col("status") =!= "LOOP_BLOCKED", 1)).as("live"),
        count(lit(1)).as("events")))

      // any non-empty batch commits (a blocked-only batch commits an
      // empty delta) so the epoch marker always advances past it
      if (obs.get("events").asInstanceOf[Long] > 0L)
        store.commitDelta(target.table,
          live.select((Seq("seq", "operation") ++ targetCols).map(col): _*),
          target.pk, "seq", valueCols,
          meta = if (batchId >= 0) Some(batchId.toString) else None)
    } finally cached.unpersist()
  }
}
