package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming per-source token-quota gate —
  * [[graft.ops.Packing.tokenBudgetCut]]'s cross-trigger form, the way
  * [[LineDedupGate]] is lineDedup's: each source may contribute at most
  * `budget(source)` tokens to the curated output ACROSS the stream's
  * lifetime, with the per-source tokens-consumed state accumulating in
  * an additive store chain. A doc passes iff it fits WHOLE in its
  * source's remaining budget at its turn (turns ordered by `idCol`
  * within a batch — deterministic, so replays decide identically);
  * rejected docs land in `rejectDir` tagged QUOTA_EXHAUSTED, because a
  * corpus recipe must show what the budget excluded, not drop it
  * silently.
  *
  * Semantics note — this is tokenBudgetCut's hard-cut EXACTLY, spread
  * over triggers: within one trigger the prefix-sum argument applies
  * unchanged (once a doc of a source overflows, every later doc of
  * that source in that batch overflows too, since skipped docs' tokens
  * still count in the batch prefix); ACROSS triggers only KEPT tokens
  * persist into state, so a source whose budget is exhausted stays
  * exhausted — the remaining budget is monotonically non-increasing —
  * and a later trigger can never re-admit (state_used only grows,
  * and any doc needs state_used + tokens ≤ budget). The one
  * cross-trigger difference from the batch op: a batch-boundary
  * overflow doc does NOT burn quota (it was never kept), so a smaller
  * doc in a LATER trigger may still fit — the gate charges the budget
  * for what it admits, which is what a quota means operationally.
  *
  * Scale: per trigger ONE batch-sized prefix-sum pass
  * ([[graft.ops.Ranking.withGroupedPrefixSum]] — no per-source
  * single-task window even when one source dominates the trigger), a
  * broadcast join against the |sources|-row state and budget tables,
  * and an O(|sources touched|) additive delta. State is |sources|
  * rows — constant for any real source taxonomy.
  *
  * Exactly-once mirrors [[LineDedupGate]]: the split epochs publish
  * FIRST ([[EpochCommit]], atomic renames), the consumed-token delta
  * commits SECOND (batch id in the additive meta). A replay after a
  * crash between the two recomputes the split against the SAME state
  * (its own consumption hasn't landed), reproduces the identical
  * epochs (skipped by the epoch dirs), then lands the delta. The
  * reverse order would double-charge the replayed batch's tokens and
  * starve the source.
  */
object QuotaGate {

  private val stateSchema = StructType(Seq(
    StructField("source", StringType), StructField("state_cnt", LongType)))

  /** One micro-batch through the gate (idempotent per `batchId`).
    * `budgets` must be a small (source, budget) frame — sources absent
    * from it are REJECTED as QUOTA_UNBUDGETED (an unbudgeted source in
    * a budgeted corpus recipe is a configuration hole, surfaced per
    * doc, never silently admitted).
    *
    * `order` sets the in-batch priority (a real corpus recipe cuts
    * WORST-first so a binding budget keeps the best documents — e.g.
    * `dsir_score` descending from an upstream selection tier); `idCol`
    * ascending is always appended as the tie-break so the order stays
    * total and replays decide identically. Empty = arrival (id) order,
    * the plain Pile/Dolma construction.
    *
    * Returns the admitted frame when THIS call computed it fresh
    * (`None` on replay). The frame is a HANDOFF, not a durable
    * artifact: consume it within the producing trigger; anything
    * retained across triggers must re-read `admitDir/epoch=<batchId>`
    * (checkpoint blocks are session-held and unrecoverable if lost).
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String, nTokensCol: String,
      budgets: DataFrame, outDir: String, rejectDir: String,
      order: Seq[org.apache.spark.sql.Column] = Nil): Option[DataFrame] = {
    val spark = batch.sparkSession
    val epochDone = EpochCommit.epochExists(spark, outDir, batchId) &&
      EpochCommit.epochExists(spark, rejectDir, batchId)
    val countsDone = store.currentMeta(table)
      .flatMap(m => scala.util.Try(m.toLong).toOption).exists(_ >= batchId)
    if (epochDone && countsDone) return None // fully landed epoch

    // exclusive in-batch prefix sums per source (deterministic order),
    // then one broadcast join against state-consumed + budgets
    val prefixed = graft.ops.Ranking.withGroupedPrefixSum(
        batch, sourceCol, col(nTokensCol).cast("long"), "__before",
        order :+ col(idCol))
      .join(broadcast(store.additiveSnapshotForKeys(table, stateSchema,
          batch.select(col(sourceCol).as("source")).distinct())
        .withColumnRenamed("source", sourceCol)
        .withColumnRenamed("state_cnt", "__used")),
        Seq(sourceCol), "left")
      .join(broadcast(budgets.select(col(sourceCol), col("budget"))),
        Seq(sourceCol), "left")
      .withColumn("__used", coalesce(col("__used"), lit(0L)))
      .withColumn("__verdict",
        when(col("budget").isNull, lit("QUOTA_UNBUDGETED"))
          .when(col("__used") + col("__before") + col(nTokensCol) <= col("budget"),
            lit(null).cast("string"))
          .otherwise(lit("QUOTA_EXHAUSTED")))
      .localCheckpoint(true) // one pass feeds both epochs AND the delta

    val admitted =
      if (!epochDone) {
        EpochCommit.commitEpoch(
          prefixed.filter(col("__verdict").isNotNull)
            .withColumnRenamed("__verdict", "reason")
            .drop("__before", "__used", "budget"),
          rejectDir, batchId)
        val keep = prefixed.filter(col("__verdict").isNull)
          .drop("__verdict", "__before", "__used", "budget")
        EpochCommit.commitEpoch(keep, outDir, batchId)
        // a plan over the trigger's eager checkpoint, row-identical to
        // the committed epoch — composing callers skip the read-back
        Some(keep)
      } else None
    if (!countsDone) {
      // only KEPT tokens consume quota; O(|sources touched|) rows
      val delta = prefixed.filter(col("__verdict").isNull)
        .groupBy(col(sourceCol).as("source"))
        .agg(sum(col(nTokensCol)).cast("long").as("state_cnt"))
      store.commitAdditive(table, delta, meta = Some(batchId.toString))
    }
    admitted
  }

  /** Per-source consumed tokens so far — the gate's queryable state. */
  def consumed(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.additiveSnapshot(table, stateSchema)
      .withColumnRenamed("state_cnt", "tokens_used")

  /** Run the gate over a document stream. Session pins follow
    * [[IngestDedup.start]]'s contract.
    */
  def start(
      docs: DataFrame, store: SnapshotStore, table: String,
      idCol: String, sourceCol: String, nTokensCol: String,
      budgets: DataFrame, outDir: String, rejectDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      shufflePartitions: Option[Int] = Some(8),
      order: Seq[org.apache.spark.sql.Column] = Nil): StreamingQuery = {
    val spark = docs.sparkSession
    val release = ConfPins.acquireGatePins(spark, shufflePartitions,
      java.util.UUID.randomUUID())
    val query =
      try docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (b: DataFrame, id: Long) =>
          applyBatch(store, table, b, id, idCol, sourceCol, nTokensCol,
            budgets, outDir, rejectDir, order); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
