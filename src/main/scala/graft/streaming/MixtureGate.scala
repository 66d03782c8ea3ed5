package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming temperature-mixture gate —
  * [[graft.ops.Stats.temperatureSample]]'s cross-trigger form, closing
  * the recipe-to-rows family the way [[QuotaGate]] closes
  * tokenBudgetCut's: the α = 0.5 mixture's per-source keep rates
  * √(n_min/n_s) depend on GLOBAL per-source counts, so a stream must
  * maintain the counters in an additive store chain and recompute the
  * rates every trigger as the corpus (and therefore the recipe)
  * evolves.
  *
  * Because a source's rate can RISE as well as fall (a late-arriving
  * small source drags n_min down for everyone; a formerly-smallest
  * source catching up lifts everyone else), the sampled set over a
  * prefix of the stream is NOT monotone — no per-trigger increment can
  * represent it. The gate therefore emits two surfaces per trigger:
  *
  *  - `sampleDir/epoch=k` — the FULL refreshed sample: every document
  *    seen so far re-decided under the rates as of trigger k. This is
  *    a materialized-view refresh, row-for-row EQUAL to the batch
  *    [[graft.ops.Stats.temperatureSample]] over the stream's prefix
  *    (same md5-prefix Bernoulli hash, same quantized rates, and the
  *    additive counters equal the prefix's groupBy counts by
  *    construction) — the exact-mixture artifact a training run ships.
  *  - `admitDir/epoch=k` — THIS batch's documents admitted under the
  *    current rates, each document decided exactly once at arrival.
  *    This is what downstream cumulative-state tiers (the quota gate)
  *    consume: feeding them the refreshed sample would re-present
  *    documents admitted in earlier epochs and double-charge budgets.
  *    The union of admit epochs tracks the mixture up to rate drift
  *    between a document's arrival and the final rates.
  *
  * The freeze → count-delta → rates → hash-band incremental refresh →
  * admit choreography (including exactly-once semantics, the epoch-log
  * compaction that bounds the seen root over stream lifetime, and the
  * marker fast-paths) is [[RateGate]]'s — shared with [[UpsampleGate]];
  * this object contributes only the mixture algebra: a doc's verdict is
  * `hash(id) mod 10⁶ < rate6(source)`, so between two refreshes only
  * docs whose hash falls inside the per-source band
  * `[min(old6, new6), max(old6, new6))` can flip — keep = prev sample
  * re-filtered (O(|sample|)), gained = the grown bands' docs read
  * directory-pruned (O(|drift|)), plus the new epochs in full.
  *
  * Scale: counters are |sources| rows, collected once per trigger
  * (bounded — sources are dataset names) and re-broadcast from a
  * local relation; the admit path stays O(batch).
  *
  * Exactly-once: the batch lands in `seenDir` FIRST ([[EpochCommit]]
  * atomic rename — the frozen input every later refresh re-reads),
  * the count delta commits SECOND (batch id in the additive meta),
  * and both outputs derive from committed artifacts only; every step
  * is idempotent per `batchId`, so a crash anywhere replays to the
  * identical epochs (the rates side file rides the sample epoch's
  * rename, so sample + rates are atomic together).
  */
object MixtureGate {

  /** Seen-layout hash-band count (see [[RateGate.Bands]]). */
  val Bands: Int = RateGate.Bands
  private val RatesFile = "_graft_rates"

  private val stateSchema = StructType(Seq(
    StructField("source", StringType), StructField("state_cnt", LongType)))

  /** Per-source keep rates from the gate's additive counters —
    * quantized exactly like [[graft.ops.Stats.temperatureSample]]:
    * rate6 = ⌊√(n_min/n_s)·10⁶ + ½⌋. Broadcast-sized (|sources| rows).
    */
  def currentRates(store: SnapshotStore, table: String): DataFrame = {
    val counts = store.additiveSnapshot(table, stateSchema)
    val nMin = counts.agg(min(col("state_cnt")).as("n_min"))
    counts.crossJoin(broadcast(nMin))
      .select(col("source"),
        floor(sqrt(col("n_min").cast("double") / col("state_cnt").cast("double"))
          * 1000000.0 + 0.5).cast("long").as("rate6"))
  }

  /** One micro-batch through the gate (idempotent per `batchId`).
    *
    * `refreshEvery` is the cadence knob: the admit path (and the
    * counters) run EVERY trigger, but the full sample re-emits only
    * when `(batchId + 1) % refreshEvery == 0` — the emitted epochs
    * still satisfy the prefix contract exactly (each IS the batch
    * temperatureSample over its prefix; the contract is per emitted
    * epoch, so skipping epochs skips cost, not correctness). 1 =
    * refresh every trigger. `incremental = false` forces the
    * O(corpus) full re-decide (the oracle path the band refresh is
    * spec-proven equal to). `compactSeen`/`compactEvery`/
    * `retainSamples` bound the epoch logs over stream lifetime
    * ([[RateGate]]'s contract).
    *
    * Returns this batch's admit frame (None on replay) — valid ONLY
    * within the producing trigger: the plan reads `seen/epoch=<k>`,
    * which a later trigger's compaction may fold away. Consume it
    * synchronously or re-read `admitDir/epoch=<k>`.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String,
      seenDir: String, sampleDir: String, admitDir: String,
      refreshEvery: Int = 1, incremental: Boolean = true,
      compactSeen: Boolean = true, retainSamples: Int = 0,
      compactEvery: Int = 1): Option[DataFrame] = {
    // the mixture decision: keep iff hash < rate6 — works on live
    // batches (hash recomputed) and frozen/sample reads (__h6 carried)
    def sampled(df: DataFrame, levels: DataFrame): DataFrame =
      df.join(levels.withColumnRenamed("level", "rate6"), Seq(sourceCol))
        .filter(RateGate.h6Of(df, "mix3", idCol) < col("rate6"))
        .drop("rate6")
    RateGate.applyBatch(store, table, batch, batchId, idCol, sourceCol,
      salt = "mix3", sideFileName = RatesFile,
      seenDir = seenDir, sampleDir = sampleDir, admitDir = admitDir,
      refreshEvery = refreshEvery, incremental = incremental,
      compactSeen = compactSeen, retainSamples = retainSamples,
      compactEvery = compactEvery,
      hooks = RateGate.Hooks(
        outCols = batch.columns.toSeq,
        stateDelta = frozen => frozen.groupBy(col(sourceCol).as("source"))
          .agg(count(lit(1)).as("state_cnt")),
        collectLevels = () => currentRates(store, table)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
        decide = sampled,
        // a kept doc is just the mixture decision re-applied to the
        // previous sample under the new rates
        keep = sampled,
        grownBandIds = (o, n) =>
          (o / RateGate.BandWidth) to ((n - 1) / RateGate.BandWidth),
        gained = (pruned, grownDf) => pruned.join(grownDf, Seq(sourceCol))
          .filter(col("__h6") >= col("__old6") && col("__h6") < col("__new6"))
          .drop("__old6", "__new6")))
  }

  /** Per-source seen-document counters — the gate's queryable state. */
  def counts(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.additiveSnapshot(table, stateSchema)
      .withColumnRenamed("state_cnt", "n_docs")

  /** Run the gate over a document stream. Session pins follow
    * [[IngestDedup.start]]'s contract.
    */
  def start(
      docs: DataFrame, store: SnapshotStore, table: String,
      idCol: String, sourceCol: String, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      shufflePartitions: Option[Int] = Some(8),
      refreshEvery: Int = 1, incremental: Boolean = true,
      compactSeen: Boolean = true, retainSamples: Int = 0,
      compactEvery: Int = 1): StreamingQuery = {
    val spark = docs.sparkSession
    val release = ConfPins.acquireGatePins(spark, shufflePartitions,
      java.util.UUID.randomUUID())
    val query =
      try docs.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (b: DataFrame, id: Long) =>
          applyBatch(store, table, b, id, idCol, sourceCol,
            s"$root/seen", s"$root/sample", s"$root/admitted",
            refreshEvery, incremental, compactSeen, retainSamples,
            compactEvery); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
