package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Similarity
import graft.sources.AnnIndex

/** Streaming SEMANTIC ingest dedup — [[IngestDedup]]'s embedding-space
  * sibling, gating a live vector stream against a persisted IVF index
  * ([[graft.sources.AnnIndex.buildIvf]]): each micro-batch probes the
  * stored inverted lists for its nearest indexed neighbor (reject at
  * cosine ≥ threshold), drops in-batch near-dups within stored-centroid
  * clusters (the [[Similarity.semDedup]] blocking, against FROZEN
  * centroids), and appends only the survivors — so the index
  * accumulates a semantically deduplicated corpus and every later
  * batch dedups against everything that ever survived.
  *
  * Per-trigger cost is flat in corpus size: probe selection scores
  * |batch|·C centroid dots map-side, the candidate scan touches only
  * the probed stored lists, the in-batch pair join is blocked per
  * cluster, and the append is O(|batch|) bucketed files. The one
  * exception is the optional id-collision gate (`checkIdCollisions`),
  * which semi-joins batch ids against the stored lists' `vec_id`
  * column — a column-pruned scan of the index, O(corpus ids) I/O per
  * trigger. It exists because the ANN probe alone CANNOT catch a
  * re-ingest under an already-indexed id (the serve tail drops
  * self-id pairs, and the stored copy may live in an unprobed list);
  * pipelines whose upstream guarantees globally-unique ids turn it off
  * and keep the flat-cost contract. Recall is otherwise bounded by
  * probe coverage (a true near-dup in an unprobed list escapes) —
  * `nProbe` is the recall/cost dial, exactly as in batch IVF serving.
  *
  * Exactly-once: [[IngestDedup]]'s round-9 choreography. Survivor and
  * reject dirs commit per epoch via [[EpochCommit]]'s atomic rename,
  * the index append lands via [[AnnIndex.appendIvfEpoch]]'s
  * deterministic epoch-keyed file names (replay replaces, never
  * duplicates), and ALL THREE writes overlap on threads: a replay's
  * RECOMPUTE is immune to a half-landed epoch append because every
  * index read in the reject plan EXCLUDES this epoch's own files (the
  * epoch key is embedded in each appended file's name — see
  * `exceptEpoch` below), so commit order stops mattering. The epoch
  * marker is only a fast-path.
  */
object SemanticIngestGate {

  /** One micro-batch through the gate. Rejections land in `rejectDir`
    * as (id, dup_of, similarity, reason ∈
    * ID_COLLISION|DUP_OF_CORPUS|DUP_IN_BATCH); survivors land in
    * `outDir` AND the index lists. For ID_COLLISION rows `dup_of` is
    * the id itself and `similarity` is null (the stored embedding is
    * deliberately not re-read just to score a row already rejected).
    * `dup_of`/`similarity` always describe ONE pair — the lowest
    * eligible partner id and the cosine of THAT pair.
    *
    * Per-trigger action budget: 5 root SQL executions — batch
    * checkpoint, unified-reject checkpoint, two epoch commits, one
    * index append (`SemanticIngestGateSpec` pins it).
    *
    * Returns the survivor frame when THIS call computed it fresh
    * (`None` on replay). The frame is a HANDOFF, not a durable
    * artifact: consume it within the producing trigger; anything
    * retained across triggers must re-read `outDir/epoch=<batchId>`
    * (checkpoint blocks are session-held and unrecoverable if lost).
    */
  def applyBatch(
      spark: SparkSession, table: String, batch: DataFrame, batchId: Long,
      idCol: String, embCol: String, outDir: String, rejectDir: String,
      threshold: Double = 0.9, nProbe: Int = 2,
      checkIdCollisions: Boolean = true): Option[DataFrame] = {
    val marker = s"$outDir/_graft_semingest_epoch"
    if (EpochCommit.readMarker(spark, marker).exists(_ >= batchId)) return None // replay
    val epochKey = s"semingest-e$batchId"
    // every index read below excludes THIS epoch's appended files by
    // name ([[graft.sources.Bucketing.appendBucketedEpoch]] embeds the
    // epoch key as `part-00000-<epochKey>_<bucket>…`): on the first
    // attempt the filter matches nothing (the epoch never appended
    // yet), and on a replay's recompute it hides a half-landed append —
    // so the recompute is bit-identical to the first attempt and the
    // append may overlap the epoch commits. The trailing '_' keeps
    // epoch 1 from matching epoch 10's files.
    val exceptEpoch = !input_file_name().contains(s"${epochKey}_")
    // gate on BOTH roots: the epoch commits run in parallel below, so
    // either may exist without the other after a crash — recompute
    // whenever one is missing and let commitEpoch's own idempotence
    // skip the half that landed
    val fresh = if (!(EpochCommit.epochExists(spark, outDir, batchId) &&
        EpochCommit.epochExists(spark, rejectDir, batchId))) {
      val b = TriggerTiming.timed("semingest", "checkpoint") {
        batch.localCheckpoint(true)
      }
      // ONE dataflow finds every rejecting pair — id collisions, probed
      // corpus pairs and in-batch cluster pairs union at PAIR level and
      // reduce in a SINGLE min_by: the trigger path pays per scheduled
      // stage, and the per-branch pre-aggregations this replaced (top-k
      // agg on the corpus branch, per-id_b min on the in-batch branch,
      // then a third cross-reason resolution agg) were three sequential
      // exchange rounds answering one question — which witness does
      // id_b report. The witness rule is the uniform lexicographic min
      // over (partner id, reason) across ALL qualifying pairs (the same
      // key the old resolution agg used), and `similarity` is the
      // cosine of exactly that pair; WHO is rejected is unchanged — a
      // row drops iff any qualifying pair exists.
      val rejected = TriggerTiming.timed("semingest", "probe+pairs") {
        // id collision: an id already in the stored lists denotes a
        // stored vector — reject BEFORE the ANN probe (which cannot see
        // it: self-id pairs are dropped and the copy may be unprobed).
        // Column-pruned scan of vec_id only; see the scaladoc trade-off.
        val idPairs =
          if (checkIdCollisions)
            b.join(spark.table(table).filter(exceptEpoch)
                .select(col("vec_id").as("_stored_id")),
                b(idCol) === col("_stored_id"), "left_semi")
              .select(col(idCol).as("id_b"), col(idCol).as("dup_of"),
                lit(null).cast("double").as("similarity"),
                lit("ID_COLLISION").as("reason"))
          else b.limit(0)
            .select(col(idCol).as("id_b"), col(idCol).as("dup_of"),
              lit(null).cast("double").as("similarity"),
              lit("ID_COLLISION").as("reason"))
        // ONE batch×cents scoring pass feeds BOTH centroid consumers —
        // the probe set (cross-batch branch) and the top-1 assignment
        // (in-batch blocking): [[Similarity.assignAndProbes]] replaces
        // two broadcast joins + a window exchange + a min_by exchange
        // with one broadcast join + one aggregation, identical
        // tie-breaks. Appends never touch `_cents`, so both derived
        // branches are replay-deterministic by construction.
        val perQuery = Similarity.assignAndProbes(b,
          spark.table(s"${table}_cents"), math.max(nProbe, 1), idCol, embCol)
        // cross-batch: every probed stored vector at or above threshold
        // is a qualifying pair (self-id pairs dropped — the collision
        // branch owns those); each (query, stored) pair appears at most
        // once because a stored vector lives in exactly one list and
        // the probe set holds distinct cents
        val lists = spark.table(table).filter(exceptEpoch).select(
          col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
          col("cent_id"))
        val probes = perQuery.select(col("query_id"), col("qe"),
          explode(col("top")).as("t")).select(
          col("query_id"), col("qe"), col("t.cent_id").as("cent_id"))
        val corpusPairs = broadcast(probes).join(lists, Seq("cent_id"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id").as("id_b"), col("neighbor_id").as("dup_of"),
            Similarity.cosineRounded(col("qe"), col("ce")).as("similarity"))
          .filter(col("similarity") >= threshold)
          .withColumn("reason", lit("DUP_OF_CORPUS"))
        // in-batch: semDedup blocking against the FROZEN stored
        // centroids — the higher id of every within-cluster qualifying
        // pair drops. The broadcast hint turns the per-cluster
        // self-join into a broadcast join: the batch is trigger-sized
        // by construction, and the two shuffle exchanges it replaces
        // are fixed-cost stages on this hot path.
        val assigned = broadcast(perQuery.select(
          col("query_id").as(idCol), col("qe").as(embCol),
          element_at(col("top"), 1).getField("cent_id").as("cent_id")))
        val batchPairs = Similarity.cosineNearDupPairs(assigned, threshold,
            "cent_id", idCol, embCol)
          .select(col("id_b"), col("id_a").as("dup_of"),
            col("cosine").as("similarity"), lit("DUP_IN_BATCH").as("reason"))
        idPairs.unionByName(corpusPairs).unionByName(batchPairs)
          .groupBy(col("id_b"))
          .agg(min_by(struct(col("dup_of"), col("similarity"), col("reason")),
            struct(col("dup_of"), col("reason"))).as("m"))
          .select(col("id_b"), col("m.dup_of").as("dup_of"),
            col("m.similarity").as("similarity"), col("m.reason").as("reason"))
          .localCheckpoint(true)
      }
      // the appended vectors are the batch's own filtered to the
      // survivor ids — row-identical to re-reading the frozen survivors
      // dir (both are b ⟂ rejected over frozen checkpoints), minus the
      // parquet round-trip. THREE independent writes overlap: the two
      // epoch commits (frozen inputs, different roots) and the index
      // append — the `exceptEpoch` exclusion above makes any crash
      // interleaving replay-correct, and the epoch-keyed append file
      // names make a re-append replace its own files.
      val survivors = b.join(rejected, b(idCol) === rejected("id_b"), "left_anti")
      TriggerTiming.timed("semingest", "commits+append") {
        graft.Par.run(
          () => EpochCommit.commitEpoch(
            b.join(rejected, b(idCol) === rejected("id_b"))
              .select(col(idCol), col("dup_of"), col("similarity"), col("reason")),
            rejectDir, batchId),
          () => EpochCommit.commitEpoch(survivors, outDir, batchId),
          () => AnnIndex.appendIvfEpoch(survivors, table, epochKey,
            idCol, embCol))
      }
      Some(survivors)
    } else {
      if (EpochCommit.epochHasData(spark, outDir, batchId))
        // replay with both epochs already committed: the batch was never
        // recomputed this attempt, so append the FROZEN survivors (the
        // append stays idempotent per epoch key)
        AnnIndex.appendIvfEpoch(spark.read.parquet(s"$outDir/epoch=$batchId"),
          table, epochKey, idCol, embCol)
      None
    }
    EpochCommit.writeMarker(spark, marker, batchId)
    fresh
  }

  /** Run the gate over an embedding stream against an EXISTING IVF
    * index (build it first with [[AnnIndex.buildIvf]]).
    *
    * `shufflePartitions` sizes the session's shuffle width to the
    * TRIGGER volume, same argument and same [[ConfPins]] contract as
    * [[IngestDedup.start]]: only ever LOWERS the session value, `None`
    * inherits it, and both pins (shuffle width + driver-side listing
    * threshold) release at query termination — the original restores
    * only when the last pinned stream on the session stops.
    */
  def start(
      vectors: DataFrame, table: String, idCol: String, embCol: String,
      outDir: String, rejectDir: String, checkpoint: String,
      threshold: Double = 0.9, nProbe: Int = 2,
      checkIdCollisions: Boolean = true,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      shufflePartitions: Option[Int] = Some(8)): StreamingQuery = {
    val spark = vectors.sparkSession
    val release = ConfPins.acquireGatePins(spark, shufflePartitions,
      java.util.UUID.randomUUID())
    val query =
      // a start() failure never reaches the termination listener — the
      // holder must release here or the session stays pinned forever
      try vectors.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch { (b: DataFrame, id: Long) =>
          applyBatch(b.sparkSession, table, b, id, idCol, embCol,
            outDir, rejectDir, threshold, nProbe, checkIdCollisions); ()
        }
        .start()
      catch { case e: Throwable => release(); throw e }
    QueryCleanup.onTermination(spark, query)(release)
    query
  }
}
