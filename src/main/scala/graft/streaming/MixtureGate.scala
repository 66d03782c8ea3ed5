package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * == Incremental (hash-band) refresh ==
  *
  * A doc's verdict is `hash(id) mod 10⁶ < rate6(source)`, so between
  * two refreshes only docs whose hash value falls inside the
  * per-source band `[min(old6, new6), max(old6, new6))` can flip —
  * everything below min stays in, everything at/above max stays out.
  * The default refresh therefore never re-decides the seen corpus:
  *
  *  - frozen batches land hash-band partitioned
  *    (`seenDir/epoch=k/__band=b/`, band = __h6 / (10⁶/32)), so a
  *    band read is DIRECTORY-pruned — untouched bands are never
  *    listed into the scan;
  *  - each emitted sample epoch carries the rates it was decided
  *    under as a side file committed atomically with the epoch
  *    (`_graft_rates`), so the next refresh recovers them without a
  *    second store or an extra driver action;
  *  - refresh k = (previous sample re-filtered under the new rates —
  *    removes shrunk-band docs, O(|sample|)) ∪ (grown-band docs read
  *    from the pruned band dirs of epochs ≤ prev, O(|drift|)) ∪ (the
  *    epochs since prev, decided in full, O(|new docs|)).
  *
  * This replaces the old O(corpus-so-far) re-scan — the engine's one
  * corpus-sized per-trigger cost — with O(|sample| + |band drift| +
  * |new docs|): set algebra gives exactly `{h6 < new6}` over every
  * seen doc, so the emitted epoch is bit-identical to a full refresh
  * (spec-pinned per emitted epoch, and fuzzed against the full path).
  * The full refresh remains the oracle: `incremental = false`, the
  * first emission, and any prev epoch missing its rates side file
  * (a pre-band legacy root) all take it. A legacy root whose seen
  * epochs were written UN-banded cannot be read alongside banded ones
  * (inconsistent partition depth) — restart such a gate on a fresh
  * root. Residual per-refresh cost is the sample re-write itself,
  * which is the contract (each epoch IS the full prefix sample);
  * `refreshEvery` remains the cadence knob on top.
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

  /** Hash-band count for the seen layout: 32 directories per epoch —
    * wide enough that a typical rate drift (≪ 1/32 of hash space)
    * prunes to 1-2 bands, narrow enough that per-epoch file counts
    * stay trivial.
    */
  val Bands = 32
  private val BandWidth = 1000000L / Bands
  private val RatesFile = "_graft_rates"
  private val Internal = Seq("epoch", "__band", "__h6")

  private val stateSchema = StructType(Seq(
    StructField("source", StringType), StructField("state_cnt", LongType)))

  /** The mixture hash: pmod(md5-prefix-hash("mix3|id"), 10⁶) — the
    * exact expression [[graft.ops.Stats.temperatureSample]] filters on.
    */
  private def h6Expr(idCol: String): Column =
    pmod(graft.ops.Dedup.hash32(
      concat_ws("|", lit("mix3"), col(idCol).cast("string"))), lit(1000000L))

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

  private def encodeRates(rates: Seq[(String, Long)]): String =
    rates.sortBy(_._1).map { case (s, r) =>
      java.net.URLEncoder.encode(s, "UTF-8") + "\t" + r
    }.mkString("\n")

  private def decodeRates(text: String): Map[String, Long] =
    text.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(s, r) = line.split("\t")
      java.net.URLDecoder.decode(s, "UTF-8") -> r.toLong
    }.toMap

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
    * spec-proven equal to).
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String,
      seenDir: String, sampleDir: String, admitDir: String,
      refreshEvery: Int = 1, incremental: Boolean = true): Unit = {
    require(refreshEvery > 0, "refreshEvery must be positive")
    val spark = batch.sparkSession
    val outCols = batch.columns.toSeq
    def dropInternal(df: DataFrame): DataFrame =
      df.drop(Internal: _*).select(outCols.map(col): _*)
    // 1. freeze the batch — hash-band partitioned: the input record
    // every later refresh re-reads, band-prunable by construction
    if (!EpochCommit.epochExists(spark, seenDir, batchId))
      EpochCommit.commitEpoch(
        batch.withColumn("__h6", h6Expr(idCol))
          .withColumn("__band",
            expr(s"CAST(__h6 DIV $BandWidth AS INT)")),
        seenDir, batchId, partitionBy = Seq("__band"))
    // read the frozen epoch back (not the live batch) so steps 2-5
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
    // 3. rates as of this trigger (counters now include the batch) —
    // collected once (|sources| rows, bounded) and re-broadcast from a
    // local relation: one driver action serves the sample AND admit
    // paths, and the local rows are what the rates side file records
    val ratesLocal: Seq[(String, Long)] = currentRates(store, table)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ratesDf = broadcast(
      spark.createDataFrame(ratesLocal).toDF(sourceCol, "rate6"))
    def sampled(df: DataFrame): DataFrame = {
      val h = if (df.columns.contains("__h6")) col("__h6") else h6Expr(idCol)
      df.join(ratesDf, Seq(sourceCol)).filter(h < col("rate6")).drop("rate6")
    }
    // 4. the refreshed sample over everything seen, on the configured
    //    cadence (epochs ≤ batchId — later epochs cannot exist yet by
    //    trigger order; the filter also makes replays explicit-safe)
    if ((batchId + 1) % refreshEvery == 0 &&
        !EpochCommit.epochExists(spark, sampleDir, batchId)) {
      val seenOk = EpochCommit.anyEpochData(spark, seenDir)
      def emptyOut = dropInternal(batch.limit(0))
      val prevE = EpochCommit.latestEpochBefore(spark, sampleDir, batchId)
      val prevRates = prevE.flatMap(e =>
        EpochCommit.readSideFile(spark, sampleDir, e, RatesFile))
        .map(decodeRates)
      val sample = (prevE, prevRates) match {
        case (Some(e0), Some(old)) if incremental =>
          // band refresh: prevSample ∩ {h6 < new6}  ∪  grown-band docs
          // from epochs ≤ e0  ∪  epochs (e0, k] decided in full
          // = {h6 < new6} over every seen doc — exactly the full path
          val prevSample =
            if (EpochCommit.epochHasData(spark, sampleDir, e0))
              spark.read.parquet(s"$sampleDir/epoch=$e0")
            else emptyOut
          val keep = dropInternal(sampled(prevSample))
          val grown = ratesLocal.filter { case (s, n) => n > old.getOrElse(s, 0L) }
          val bandIn =
            if (grown.nonEmpty && seenOk) {
              val bandIds = grown.flatMap { case (s, n) =>
                val o = old.getOrElse(s, 0L)
                (o / BandWidth) to ((n - 1) / BandWidth)
              }.map(_.toInt).distinct
              val grownDf = broadcast(spark.createDataFrame(
                grown.map { case (s, n) => (s, old.getOrElse(s, 0L), n) })
                .toDF(sourceCol, "__old6", "__new6"))
              dropInternal(spark.read.parquet(seenDir)
                .filter(col("epoch") <= e0 && col("__band").isin(bandIds: _*))
                .join(grownDf, Seq(sourceCol))
                .filter(col("__h6") >= col("__old6") && col("__h6") < col("__new6"))
                .drop("__old6", "__new6"))
            } else emptyOut
          val newDocs =
            if (seenOk)
              dropInternal(sampled(spark.read.parquet(seenDir)
                .filter(col("epoch") > e0 && col("epoch") <= batchId)))
            else emptyOut
          keep.unionByName(bandIn).unionByName(newDocs)
        case _ =>
          // full refresh: first emission, incremental off, or a legacy
          // prev epoch without its rates side file
          if (seenOk)
            dropInternal(sampled(
              spark.read.parquet(seenDir).filter(col("epoch") <= batchId)))
          else emptyOut
      }
      // sample epochs are CORPUS-scale artifacts (unlike the
      // trigger-sized seen/admit epochs): write with task parallelism,
      // not the single-file default
      EpochCommit.commitEpoch(sample, sampleDir, batchId, maxFiles = 32,
        sideFiles = Map(RatesFile -> encodeRates(ratesLocal)))
    }
    // 5. this batch's admissions — each doc decided once, at arrival
    if (!EpochCommit.epochExists(spark, admitDir, batchId))
      EpochCommit.commitEpoch(dropInternal(sampled(frozen)), admitDir, batchId)
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
      refreshEvery: Int = 1, incremental: Boolean = true): StreamingQuery = {
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
            refreshEvery, incremental); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
