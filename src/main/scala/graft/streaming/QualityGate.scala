package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming data-quality gate — the quarantine split a production
  * ingest runs in front of every sink: each micro-batch's rows are
  * checked against ROW-LOCAL constraints (violation predicates);
  * passing rows land in `outDir`, violating rows land in `rejectDir`
  * tagged with the FIRST failing constraint's name (constraint order
  * is the severity order), both exactly-once via [[EpochCommit]]'s
  * atomic epoch rename — a stateless per-batch computation, so the
  * epoch-dir idempotence is the whole replay story (the
  * [[AnnServeStream]] argument).
  *
  * Row-local on purpose: aggregate expectations (uniqueness, FK) need
  * corpus state and belong to the batch gate ([[graft.ops.Quality]])
  * or the ingest-dedup tier; a row predicate splits map-side with no
  * shuffle at all — the per-trigger cost is one narrow pass over the
  * batch, flat in corpus size and in constraint count.
  *
  * `enrich` relaxes row-local where a constraint needs derived columns
  * a projection can't produce — the canonical case is a perplexity
  * band: join the batch against a FROZEN trained-LM table
  * ([[graft.ops.TextQuality.scoreAgainstLm]]) and constrain on the
  * score. The enrichment MUST be deterministic and row-preserving
  * (joins against frozen reference tables, derived columns — never
  * against data that moves between a crash and its replay), because a
  * replayed batch recomputes it and must land identical epochs; its
  * output columns are part of the committed rows.
  */
object QualityGate {

  /** One micro-batch through the gate (idempotent per `batchId`).
    *
    * Returns the pass frame when THIS call computed it fresh — a plan
    * over the trigger's eager checkpoint, row-identical to the epoch
    * it just committed — so a composing caller ([[CurationStream]])
    * can hand it straight to the next tier instead of re-reading the
    * epoch dir (the dir stays the crash-replay record). `None` on a
    * replay skip: the epoch predates this call, read it back. The
    * frame is a HANDOFF, not a durable artifact — consume it within
    * the producing trigger; anything retained across triggers must
    * re-read the epoch dir (checkpoint blocks are session-held and
    * unrecoverable if lost).
    */
  def applyBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      constraints: Seq[(String, Column)], outDir: String,
      rejectDir: String,
      enrich: DataFrame => DataFrame = identity): Option[DataFrame] = {
    require(constraints.nonEmpty, "QualityGate: no constraints")
    val marker = s"$outDir/_graft_quality_epoch"
    if (EpochCommit.readMarker(spark, marker).exists(_ >= batchId)) return None
    val out =
      if (!EpochCommit.epochExists(spark, outDir, batchId)) {
        val firstViolated = coalesce(
          (constraints.map { case (n, viol) => when(viol, lit(n)) } :+
            lit(null).cast("string")): _*)
        val flagged = enrich(batch).withColumn("__violated", firstViolated)
          .localCheckpoint(true) // one pass feeds both epoch writes
        EpochCommit.commitEpoch(
          flagged.filter(col("__violated").isNotNull)
            .withColumnRenamed("__violated", "violated"),
          rejectDir, batchId)
        val pass = flagged.filter(col("__violated").isNull).drop("__violated")
        EpochCommit.commitEpoch(pass, outDir, batchId)
        Some(pass)
      } else None
    EpochCommit.writeMarker(spark, marker, batchId)
    out
  }

  /** Run the gate over a stream. */
  def start(
      rows: DataFrame, constraints: Seq[(String, Column)], outDir: String,
      rejectDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      enrich: DataFrame => DataFrame = identity): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, b, id, constraints, outDir, rejectDir,
          enrich); ()
      }
      .start()
}
