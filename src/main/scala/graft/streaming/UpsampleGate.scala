package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * == Incremental (hash-band) refresh ==
  *
  * A doc's repeat count rep = epochs6 div 10⁶ + [h6 < epochs6 mod 10⁶]
  * (h6 = hash("up|id") mod 10⁶ — exactly the batch operator's
  * fractional-epoch Bernoulli) is MONOTONE in epochs6, so between two
  * refreshes a doc gains copies only if its source's factor rose —
  * and then only docs in the mod-band [old mod 10⁶, new mod 10⁶) (one
  * extra copy) unless the INTEGER part rose (every doc of that source
  * gains). The default refresh therefore:
  *
  *  - re-filters the previous sample under the new factors (kept
  *    copies are exactly epoch_idx ≤ new rep — shrinks need no
  *    corpus read at all, the common direction as totals grow);
  *  - reads grown docs from the hash-band-partitioned seen epochs
  *    (directory-pruned to the mod band; whole-source only on an
  *    integer-part rise) and explodes just the GAINED copies
  *    (epoch_idx in (old rep, new rep]);
  *  - decides the epochs since the previous emission in full.
  *
  * Factors ride each sample epoch as a side file (atomic with the
  * epoch), the full path remains the oracle/fallback (first emission,
  * `incremental = false`, legacy epochs), and budgets are config —
  * stable across replays, like [[QuotaGate]]'s.
  */
object UpsampleGate {

  val Bands = 32
  private val BandWidth = 1000000L / Bands
  private val FactorsFile = "_graft_factors"
  private val Internal = Seq("epoch", "__band", "__h6")

  private val stateSchema = StructType(Seq(
    StructField("source", StringType), StructField("state_cnt", LongType)))

  /** The upsample hash: pmod(md5-prefix-hash("up|id"), 10⁶) — the
    * exact [[graft.ops.Packing.epochUpsample]] Bernoulli expression.
    */
  private def h6Expr(idCol: String): Column =
    pmod(graft.ops.Dedup.hash32(
      concat_ws("|", lit("up"), col(idCol).cast("string"))), lit(1000000L))

  /** Per-source repeat factors from the gate's token totals —
    * quantized exactly like the batch operator: integral `div`, never
    * `/` (budget·10⁶ exceeds 2⁵³ where doubles stop being exact),
    * clamped to [10⁶, maxEpochs·10⁶]. Inner join: only budgeted
    * sources repeat (the batch operator's contract).
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

  private def encodeFactors(fs: Seq[(String, Long)]): String =
    fs.sortBy(_._1).map { case (s, e) =>
      java.net.URLEncoder.encode(s, "UTF-8") + "\t" + e
    }.mkString("\n")

  private def decodeFactors(text: String): Map[String, Long] =
    text.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(s, e) = line.split("\t")
      java.net.URLDecoder.decode(s, "UTF-8") -> e.toLong
    }.toMap

  /** One micro-batch through the gate (idempotent per `batchId`);
    * parameters mirror [[MixtureGate.applyBatch]], plus the batch
    * operator's `budgets` (source, budget in tokens) and `maxEpochs`.
    */
  def applyBatch(
      store: SnapshotStore, table: String, batch: DataFrame, batchId: Long,
      idCol: String, sourceCol: String, nTokensCol: String,
      budgets: DataFrame, seenDir: String, sampleDir: String,
      admitDir: String, refreshEvery: Int = 1, incremental: Boolean = true,
      maxEpochs: Int = 4): Unit = {
    require(refreshEvery > 0, "refreshEvery must be positive")
    val spark = batch.sparkSession
    // canonical output layout = the batch operator's, taken from its
    // own plan over an empty slice (schema-only, no job runs)
    val outCols = graft.ops.Packing.epochUpsample(
      batch.limit(0), sourceCol, idCol, nTokensCol, budgets, maxEpochs)
      .columns.toSeq
    def dropInternal(df: DataFrame): DataFrame =
      df.drop(Internal: _*).select(outCols.map(col): _*)
    // 1. freeze the batch, hash-band partitioned on the upsample hash
    if (!EpochCommit.epochExists(spark, seenDir, batchId))
      EpochCommit.commitEpoch(
        batch.withColumn("__h6", h6Expr(idCol))
          .withColumn("__band", expr(s"CAST(__h6 DIV $BandWidth AS INT)")),
        seenDir, batchId, partitionBy = Seq("__band"))
    val frozen =
      if (EpochCommit.epochHasData(spark, seenDir, batchId))
        spark.read.parquet(s"$seenDir/epoch=$batchId")
      else batch.limit(0)
    // 2. token-total delta — O(|sources touched|), idempotent via meta
    val countsDone = store.currentMeta(table)
      .flatMap(m => scala.util.Try(m.toLong).toOption).exists(_ >= batchId)
    if (!countsDone)
      store.commitAdditive(table,
        frozen.groupBy(col(sourceCol).as("source"))
          .agg(sum(col(nTokensCol)).cast("long").as("state_cnt")),
        meta = Some(batchId.toString))
    // 3. factors as of this trigger — |budgeted sources| rows,
    // collected once and re-broadcast from a local relation
    val factorsLocal: Seq[(String, Long)] =
      currentFactors(store, table, budgets, maxEpochs)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val factorsDf = broadcast(
      spark.createDataFrame(factorsLocal).toDF(sourceCol, "epochs6"))
    def h6Of(df: DataFrame): Column =
      if (df.columns.contains("__h6")) col("__h6") else h6Expr(idCol)
    def upsampled(df: DataFrame): DataFrame = {
      val extra = when(h6Of(df) < pmod(col("epochs6"), lit(1000000L)), 1L)
        .otherwise(0L)
      df.join(factorsDf, Seq(sourceCol))
        .withColumn("__rep", expr("epochs6 div 1000000") + extra)
        .select(col("*"),
          explode(sequence(lit(1L), col("__rep"))).as("epoch_idx"))
        .drop("__rep")
    }
    // 4. the refreshed upsampled corpus, on the configured cadence
    if ((batchId + 1) % refreshEvery == 0 &&
        !EpochCommit.epochExists(spark, sampleDir, batchId)) {
      val seenOk = EpochCommit.anyEpochData(spark, seenDir)
      def emptyOut = dropInternal(upsampled(batch.limit(0)))
      val prevE = EpochCommit.latestEpochBefore(spark, sampleDir, batchId)
      val prevFactors = prevE.flatMap(e =>
        EpochCommit.readSideFile(spark, sampleDir, e, FactorsFile))
        .map(decodeFactors)
      val sample = (prevE, prevFactors) match {
        case (Some(e0), Some(old)) if incremental =>
          val prevSample =
            if (EpochCommit.epochHasData(spark, sampleDir, e0))
              spark.read.parquet(s"$sampleDir/epoch=$e0")
            else emptyOut
          // kept copies: epoch_idx ≤ rep under the NEW factor (rep is
          // monotone in epochs6, so shrinks truncate, never re-read)
          val keepExtra = when(h6Expr(idCol) <
            pmod(col("epochs6"), lit(1000000L)), 1L).otherwise(0L)
          val keep = prevSample.drop("epochs6")
            .join(factorsDf, Seq(sourceCol))
            .filter(col("epoch_idx") <=
              expr("epochs6 div 1000000") + keepExtra)
          val grown = factorsLocal.filter { case (s, n) =>
            n > old.getOrElse(s, 0L)
          }
          val gained =
            if (grown.nonEmpty && seenOk) {
              // integer-part rise → every band of that source; mod-band
              // rise → just the band dirs covering [old mod, new mod)
              val bandIds = grown.flatMap { case (s, n) =>
                val o = old.getOrElse(s, 0L)
                if (n / 1000000L > o / 1000000L) 0L until Bands.toLong
                else {
                  val (om, nm) = (o % 1000000L, n % 1000000L)
                  if (nm > om) (om / BandWidth) to ((nm - 1) / BandWidth)
                  else Seq.empty[Long]
                }
              }.map(_.toInt).distinct
              val grownDf = broadcast(spark.createDataFrame(
                grown.map { case (s, n) => (s, old.getOrElse(s, 0L), n) })
                .toDF(sourceCol, "__old6", "__new6"))
              val oldExtra = when(col("__h6") <
                pmod(col("__old6"), lit(1000000L)), 1L).otherwise(0L)
              val newExtra = when(col("__h6") <
                pmod(col("__new6"), lit(1000000L)), 1L).otherwise(0L)
              spark.read.parquet(seenDir)
                .filter(col("epoch") <= e0 && col("__band").isin(bandIds: _*))
                .join(grownDf, Seq(sourceCol))
                .withColumn("__repOld", expr("__old6 div 1000000") + oldExtra)
                .withColumn("__repNew", expr("__new6 div 1000000") + newExtra)
                .filter(col("__repNew") > col("__repOld"))
                .withColumn("epochs6", col("__new6"))
                .select(col("*"), explode(sequence(
                  col("__repOld") + 1L, col("__repNew"))).as("epoch_idx"))
                .drop("__old6", "__new6", "__repOld", "__repNew")
            } else emptyOut
          val newDocs =
            if (seenOk)
              upsampled(spark.read.parquet(seenDir)
                .filter(col("epoch") > e0 && col("epoch") <= batchId))
            else emptyOut
          dropInternal(keep).unionByName(dropInternal(gained))
            .unionByName(dropInternal(newDocs))
        case _ =>
          if (seenOk)
            dropInternal(upsampled(
              spark.read.parquet(seenDir).filter(col("epoch") <= batchId)))
          else emptyOut
      }
      // sample epochs are CORPUS-scale artifacts (unlike the
      // trigger-sized seen/admit epochs): write with task parallelism,
      // not the single-file default
      EpochCommit.commitEpoch(sample, sampleDir, batchId, maxFiles = 32,
        sideFiles = Map(FactorsFile -> encodeFactors(factorsLocal)))
    }
    // 5. this batch's copies — each doc decided once, at arrival
    if (!EpochCommit.epochExists(spark, admitDir, batchId))
      EpochCommit.commitEpoch(dropInternal(upsampled(frozen)), admitDir,
        batchId)
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
      maxEpochs: Int = 4): StreamingQuery = {
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
            s"$root/up_admitted", refreshEvery, incremental, maxEpochs); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
