package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming epoch-upsample gate —
  * [[graft.ops.Packing.epochUpsample]]'s cross-trigger form, the
  * REPEAT direction of the recipe-to-rows family ([[QuotaGate]] cuts
  * over-budget sources; this repeats under-budget ones, the
  * data-constrained-scaling recipe): a source's repeat factor
  * epochs6 = clamp(10⁶, budget·10⁶ div total_tokens, maxEpochs·10⁶)
  * depends on the GLOBAL per-source token totals, so a stream must
  * maintain the totals in an additive chain and recompute the factors
  * every trigger as the corpus grows.
  *
  * epochs6 FALLS as a source's corpus grows (more tokens need fewer
  * repeats to fill the same budget), so earlier docs' repeat counts
  * shrink over time — the sampled multiset over a prefix is not
  * monotone, the same shape [[MixtureGate]] solves, and the same two
  * surfaces solve it: `sampleDir/epoch=k` (the FULL refreshed
  * upsampled corpus — row-for-row the batch epochUpsample over the
  * stream's prefix) and `admitDir/epoch=k` (THIS batch's docs
  * repeated under the current factors, decided once at arrival — what
  * a downstream consumer charging per-copy reads).
  *
  * The shared choreography (freeze-banded, additive delta, collect +
  * broadcast, side-file-carried levels, band-incremental refresh,
  * exactly-once, epoch-log compaction, marker fast-paths) is
  * [[RateGate]]'s; this object contributes the upsample algebra: a
  * doc's repeat count rep = epochs6 div 10⁶ + [h6 < epochs6 mod 10⁶]
  * (h6 = hash("up|id") mod 10⁶ — exactly the batch operator's
  * fractional-epoch Bernoulli) is MONOTONE in epochs6, so between two
  * refreshes a doc gains copies only if its source's factor rose —
  * and then only docs in the mod-band [old mod 10⁶, new mod 10⁶) (one
  * extra copy) unless the INTEGER part rose (every doc of that source
  * gains). Kept copies are exactly epoch_idx ≤ new rep — shrinks are
  * pure truncation of the previous sample, no corpus read at all (the
  * common direction as totals grow); grows explode just the GAINED
  * copies (epoch_idx in (old rep, new rep]) from the band-pruned seen
  * epochs. Factors are quantized with integral `div`, never `/`
  * (budget·10⁶ exceeds 2⁵³ where doubles stop being exact); budgets
  * are config — stable across replays, like [[QuotaGate]]'s.
  */
object UpsampleGate {

  /** Seen-layout hash-band count (see [[RateGate.Bands]]). */
  val Bands: Int = RateGate.Bands
  private val FactorsFile = "_graft_factors"

  private val stateSchema = StructType(Seq(
    StructField("source", StringType), StructField("state_cnt", LongType)))

  /** Per-source repeat factors from the gate's token totals —
    * quantized exactly like the batch operator, clamped to
    * [10⁶, maxEpochs·10⁶]. Inner join: only budgeted sources repeat
    * (the batch operator's contract).
    */
  def currentFactors(store: SnapshotStore, table: String,
      budgets: DataFrame, maxEpochs: Int): DataFrame =
    store.additiveSnapshot(table, stateSchema)
      .join(broadcast(budgets), Seq("source"))
      .select(col("source"),
        least(lit(maxEpochs * 1000000L),
          greatest(lit(1000000L),
            expr("CAST(budget AS BIGINT) * 1000000 div state_cnt")))
          .as("epochs6"))

  /** One micro-batch through the gate (idempotent per `batchId`);
    * parameters mirror [[MixtureGate.applyBatch]], plus the batch
    * operator's `budgets` (source, budget in tokens) and `maxEpochs`.
    *
    * Returns this batch's admit frame (None on replay) — valid ONLY
    * within the producing trigger: the plan reads `seen/epoch=<k>`,
    * which a later trigger's compaction may fold away. Consume it
    * synchronously or re-read `admitDir/epoch=<k>`.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String, nTokensCol: String,
      budgets: DataFrame, seenDir: String, sampleDir: String,
      admitDir: String, refreshEvery: Int = 1, incremental: Boolean = true,
      maxEpochs: Int = 4, compactSeen: Boolean = true,
      retainSamples: Int = 0, compactEvery: Int = 1): Option[DataFrame] = {
    // canonical output layout = the batch operator's, taken from its
    // own plan over an empty slice (schema-only, no job runs)
    val outCols = graft.ops.Packing.epochUpsample(
      batch.limit(0), sourceCol, idCol, nTokensCol, budgets, maxEpochs)
      .columns.toSeq
    // the upsample decision: rep copies per doc, exploded — works on
    // live batches (hash recomputed) and frozen reads (__h6 carried)
    def upsampled(df: DataFrame, levels: DataFrame): DataFrame = {
      val extra = when(RateGate.h6Of(df, "up", idCol) <
        pmod(col("epochs6"), lit(1000000L)), 1L).otherwise(0L)
      df.join(levels.withColumnRenamed("level", "epochs6"), Seq(sourceCol))
        .withColumn("__rep", expr("epochs6 div 1000000") + extra)
        .select(col("*"),
          explode(sequence(lit(1L), col("__rep"))).as("epoch_idx"))
        .drop("__rep")
    }
    RateGate.applyBatch(store, table, batch, batchId, idCol, sourceCol,
      salt = "up", sideFileName = FactorsFile,
      seenDir = seenDir, sampleDir = sampleDir, admitDir = admitDir,
      refreshEvery = refreshEvery, incremental = incremental,
      compactSeen = compactSeen, retainSamples = retainSamples,
      compactEvery = compactEvery,
      hooks = RateGate.Hooks(
        outCols = outCols,
        stateDelta = frozen => frozen.groupBy(col(sourceCol).as("source"))
          .agg(sum(col(nTokensCol)).cast("long").as("state_cnt")),
        collectLevels = () => currentFactors(store, table, budgets, maxEpochs)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
        decide = upsampled,
        // kept copies: epoch_idx ≤ rep under the NEW factor (rep is
        // monotone in epochs6, so shrinks truncate, never re-read)
        keep = (prev, levels) => {
          val keepExtra = when(RateGate.h6Expr("up", idCol) <
            pmod(col("epochs6"), lit(1000000L)), 1L).otherwise(0L)
          prev.drop("epochs6")
            .join(levels.withColumnRenamed("level", "epochs6"), Seq(sourceCol))
            .filter(col("epoch_idx") <=
              expr("epochs6 div 1000000") + keepExtra)
        },
        // integer-part rise → every band of that source; mod-band rise
        // → just the band dirs covering [old mod, new mod)
        grownBandIds = (o, n) =>
          if (n / 1000000L > o / 1000000L) 0L until RateGate.Bands.toLong
          else {
            val (om, nm) = (o % 1000000L, n % 1000000L)
            if (nm > om) (om / RateGate.BandWidth) to ((nm - 1) / RateGate.BandWidth)
            else Seq.empty[Long]
          },
        gained = (pruned, grownDf) => {
          val oldExtra = when(col("__h6") <
            pmod(col("__old6"), lit(1000000L)), 1L).otherwise(0L)
          val newExtra = when(col("__h6") <
            pmod(col("__new6"), lit(1000000L)), 1L).otherwise(0L)
          pruned.join(grownDf, Seq(sourceCol))
            .withColumn("__repOld", expr("__old6 div 1000000") + oldExtra)
            .withColumn("__repNew", expr("__new6 div 1000000") + newExtra)
            .filter(col("__repNew") > col("__repOld"))
            .withColumn("epochs6", col("__new6"))
            .select(col("*"), explode(sequence(
              col("__repOld") + 1L, col("__repNew"))).as("epoch_idx"))
            .drop("__old6", "__new6", "__repOld", "__repNew")
        }))
  }

  /** Per-source token totals — the gate's queryable state. */
  def totals(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.additiveSnapshot(table, stateSchema)
      .withColumnRenamed("state_cnt", "n_tokens")

  /** Run the gate over a document stream. Session pins follow
    * [[IngestDedup.start]]'s contract.
    */
  def start(
      docs: DataFrame, store: SnapshotStore, table: String,
      idCol: String, sourceCol: String, nTokensCol: String,
      budgets: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      shufflePartitions: Option[Int] = Some(8),
      refreshEvery: Int = 1, incremental: Boolean = true,
      maxEpochs: Int = 4, compactSeen: Boolean = true,
      retainSamples: Int = 0, compactEvery: Int = 1): StreamingQuery = {
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
            budgets, s"$root/up_seen", s"$root/upsampled",
            s"$root/up_admitted", refreshEvery, incremental, maxEpochs,
            compactSeen, retainSamples, compactEvery); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
