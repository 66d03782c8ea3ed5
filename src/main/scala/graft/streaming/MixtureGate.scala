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
  * Scale: counters are |sources| rows; rates are a broadcast
  * |sources|-row join + one narrow deterministic-hash filter (mx3's
  * exact plan). The refresh pass re-scans the seen corpus — O(corpus
  * so far) per trigger, the honest price of an EXACT non-monotone
  * mixture; `refreshEvery` is the production cadence knob — the
  * O(batch) admit path and the counters run every trigger, the
  * refresh re-emits every Nth (each emitted epoch still exactly the
  * prefix sample). Both decisions are pure functions of committed
  * state, so replays reproduce epochs bit-for-bit.
  *
  * Exactly-once: the batch lands in `seenDir` FIRST ([[EpochCommit]]
  * atomic rename — the frozen input every later refresh re-reads),
  * the count delta commits SECOND (batch id in the additive meta),
  * and both outputs derive from committed artifacts only; every step
  * is idempotent per `batchId`, so a crash anywhere replays to the
  * identical epochs.
  */
object MixtureGate {

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
    * `refreshEvery` is the production cadence knob for the O(corpus)
    * refresh pass: the admit path (and the counters) run EVERY
    * trigger, but the full sample re-emits only when
    * `(batchId + 1) % refreshEvery == 0` — the emitted epochs still
    * satisfy the prefix contract exactly (each IS the batch
    * temperatureSample over its prefix; the contract is per emitted
    * epoch, so skipping epochs skips cost, not correctness). 1 =
    * refresh every trigger.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String,
      seenDir: String, sampleDir: String, admitDir: String,
      refreshEvery: Int = 1): Unit = {
    require(refreshEvery > 0, "refreshEvery must be positive")
    val spark = batch.sparkSession
    // 1. freeze the batch: the input record every refresh re-reads
    if (!EpochCommit.epochExists(spark, seenDir, batchId))
      EpochCommit.commitEpoch(batch, seenDir, batchId)
    // read the frozen epoch back (not the live batch) so steps 2-4
    // compute from the same bytes a crash replay would
    val frozen =
      if (EpochCommit.epochHasData(spark, seenDir, batchId))
        spark.read.parquet(s"$seenDir/epoch=$batchId")
      else batch.limit(0)
    // 2. count delta — O(|sources touched|) rows, idempotent via meta
    val countsDone = store.currentMeta(table)
      .flatMap(m => scala.util.Try(m.toLong).toOption).exists(_ >= batchId)
    if (!countsDone)
      store.commitAdditive(table,
        frozen.groupBy(col(sourceCol).as("source"))
          .agg(count(lit(1)).as("state_cnt")),
        meta = Some(batchId.toString))
    // 3. rates as of this trigger (counters now include the batch)
    val rates = currentRates(store, table)
      .withColumnRenamed("source", sourceCol).localCheckpoint(true)
    def sampled(df: DataFrame): DataFrame = df
      .join(broadcast(rates), Seq(sourceCol))
      .filter(pmod(graft.ops.Dedup.hash32(
          concat_ws("|", lit("mix3"), col(idCol).cast("string"))),
        lit(1000000L)) < col("rate6"))
      .drop("rate6")
    // 4. the FULL refreshed sample over everything seen (epoch dirs
    //    0..batchId — later epochs cannot exist yet by trigger order),
    //    on the configured cadence
    if ((batchId + 1) % refreshEvery == 0 &&
        !EpochCommit.epochExists(spark, sampleDir, batchId)) {
      val seen =
        if (EpochCommit.anyEpochData(spark, seenDir))
          spark.read.parquet(seenDir).drop("epoch")
        else frozen.limit(0)
      EpochCommit.commitEpoch(sampled(seen), sampleDir, batchId)
    }
    // 5. this batch's admissions — each doc decided once, at arrival
    if (!EpochCommit.epochExists(spark, admitDir, batchId))
      EpochCommit.commitEpoch(sampled(frozen), admitDir, batchId)
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
      refreshEvery: Int = 1): StreamingQuery = {
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
            refreshEvery); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
