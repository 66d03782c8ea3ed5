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
  * Exactly-once: identical choreography to [[IngestDedup]] —
  * survivor/reject dirs commit per epoch via [[EpochCommit]]'s atomic
  * rename BEFORE the index append, the append reads the frozen
  * survivors and lands via [[AnnIndex.appendIvfEpoch]]'s deterministic
  * epoch-keyed file names (replay replaces, never duplicates), and the
  * epoch marker is only a fast-path.
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
    */
  def applyBatch(
      spark: SparkSession, table: String, batch: DataFrame, batchId: Long,
      idCol: String, embCol: String, outDir: String, rejectDir: String,
      threshold: Double = 0.9, nProbe: Int = 2,
      checkIdCollisions: Boolean = true): Unit = {
    val marker = s"$outDir/_graft_semingest_epoch"
    if (EpochCommit.readMarker(spark, marker).exists(_ >= batchId)) return // replay
    if (!EpochCommit.epochExists(spark, outDir, batchId)) {
      // appends run only after this dir commits, so the index is
      // guaranteed untouched by this epoch and recomputation on replay
      // is deterministic
      val b = batch.localCheckpoint(true)
      // id collision: an id already in the stored lists denotes a
      // stored vector — reject BEFORE the ANN probe (which cannot see
      // it: self-id pairs are dropped and the copy may be unprobed).
      // Column-pruned scan of vec_id only; see the scaladoc trade-off.
      val idHits =
        if (checkIdCollisions)
          b.join(spark.table(table).select(col("vec_id").as("_stored_id")),
              b(idCol) === col("_stored_id"), "left_semi")
            .select(col(idCol).as("id_b"), col(idCol).as("dup_of"),
              lit(null).cast("double").as("similarity"),
              lit("ID_COLLISION").as("reason"))
        else b.limit(0)
          .select(col(idCol).as("id_b"), col(idCol).as("dup_of"),
            lit(null).cast("double").as("similarity"),
            lit("ID_COLLISION").as("reason"))
      // cross-batch: nearest INDEXED neighbor at or above threshold.
      // dup_of = the most similar stored vector (k=1 top by score).
      val crossHits = AnnIndex.ivfServe(spark, table, b, k = 1, nProbe,
          idCol, embCol)
        .filter(col("score") >= threshold)
        .select(col("query_id").as("id_b"), col("neighbor_id").as("dup_of"),
          col("score").as("similarity"), lit("DUP_OF_CORPUS").as("reason"))
      // in-batch: semDedup blocking against the FROZEN stored centroids
      // — drop the higher id of every within-cluster pair; dup_of and
      // similarity both come from the lowest-id pair (min_by on the
      // struct, never independent min/max)
      val assigned = Similarity.assignToCentroids(b,
        spark.table(s"${table}_cents"), idCol, embCol, idCol, embCol)
      val inBatchHits = Similarity.cosineNearDupPairs(assigned, threshold,
          "cent_id", idCol, embCol)
        .groupBy(col("id_b"))
        .agg(min_by(struct(col("id_a").as("dup_of"),
          col("cosine").as("similarity")), col("id_a")).as("p"))
        .select(col("id_b"), col("p.dup_of").as("dup_of"),
          col("p.similarity").as("similarity"),
          lit("DUP_IN_BATCH").as("reason"))
      val rejected = idHits.unionByName(crossHits).unionByName(inBatchHits)
        .groupBy(col("id_b"))
        .agg(min_by(struct(col("dup_of"), col("similarity"), col("reason")),
          struct(col("dup_of"), col("reason"))).as("m"))
        .select(col("id_b"), col("m.dup_of").as("dup_of"),
          col("m.similarity").as("similarity"), col("m.reason").as("reason"))
      EpochCommit.commitEpoch(
        b.join(rejected, b(idCol) === rejected("id_b"))
          .select(col(idCol), col("dup_of"), col("similarity"), col("reason")),
        rejectDir, batchId)
      EpochCommit.commitEpoch(
        b.join(rejected, b(idCol) === rejected("id_b"), "left_anti"),
        outDir, batchId)
    }
    // survivors are frozen now; the append is value-idempotent per
    // epoch key. An all-rejected epoch commits a dir with no data files.
    if (EpochCommit.epochHasData(spark, outDir, batchId))
      AnnIndex.appendIvfEpoch(spark.read.parquet(s"$outDir/epoch=$batchId"),
        table, epochKey = s"semingest-e$batchId", idCol, embCol)
    EpochCommit.writeMarker(spark, marker, batchId)
  }

  /** Run the gate over an embedding stream against an EXISTING IVF
    * index (build it first with [[AnnIndex.buildIvf]]).
    */
  def start(
      vectors: DataFrame, table: String, idCol: String, embCol: String,
      outDir: String, rejectDir: String, checkpoint: String,
      threshold: Double = 0.9, nProbe: Int = 2,
      checkIdCollisions: Boolean = true,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, table, b, id, idCol, embCol,
          outDir, rejectDir, threshold, nProbe, checkIdCollisions); ()
      }
      .start()
}
