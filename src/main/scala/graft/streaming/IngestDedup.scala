package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Dedup
import graft.sources.DedupIndex

/** Streaming ingest dedup — the reason the persisted dedup index
  * exists: a document stream is gated micro-batch by micro-batch
  * against the stored corpus ([[graft.sources.DedupIndex.probe]] —
  * only the batch hashes; the index side reads its stored buckets),
  * and the SURVIVORS append to both the curated output and the index
  * ([[graft.sources.DedupIndex.append]], O(|batch|)), so every later
  * batch dedups against everything that ever survived — the streaming
  * form of `cp1`'s curation gate, and the cdc-sync dedup loop
  * re-expressed for document ingest (reference behavior:
  * `poc/.../CdcEventProcessor.java`'s hash-gate, generalized from
  * exact change-hashes to near-dup similarity).
  *
  * Per-trigger cost: O(|batch|) signature hashing + a bucket-pruned
  * band join against the index + one bucketed append — the corpus is
  * never re-hashed, so the trigger cost is flat in corpus size (the
  * property that survives a 100 TB corpus).
  */
object IngestDedup {

  /** One micro-batch through the gate — EXACTLY-ONCE under foreachBatch
    * replay, for the outputs and the index alike:
    *
    *  1. Outputs commit per epoch by ATOMIC DIRECTORY RENAME: rows are
    *     staged under a dot-dir (invisible to readers), then the whole
    *     staging dir moves to `<dir>/epoch=<batchId>` in one rename.
    *     A replay that finds the epoch dir skips recomputation; one
    *     that doesn't recomputes from scratch (staging debris from the
    *     crashed attempt is simply overwritten).
    *  2. The index append runs ONLY after the survivors dir committed,
    *     and reads the FROZEN survivors — so a replay never recomputes
    *     the probe against an index this epoch already half-touched —
    *     and lands via [[DedupIndex.appendEpoch]]'s deterministic
    *     epoch-keyed file names, so re-appending the same epoch
    *     replaces its own files instead of duplicating band rows.
    *
    * The epoch marker is a fast-path only (skip fully-landed epochs
    * without touching Spark); correctness never depends on it.
    *
    * Rejections (near-dup of an indexed doc, or in-batch near-dup of a
    * lower-id survivor) land in `rejectDir` with the duplicate's id and
    * similarity; survivors land in `outDir` AND the index. Readers see
    * `epoch` as a partition column on both output roots.
    */
  def applyBatch(
      spark: SparkSession, table: String, batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, outDir: String, rejectDir: String,
      threshold: Double = 0.9): Unit = {
    val marker = s"$outDir/_graft_ingest_epoch"
    if (EpochCommit.readMarker(spark, marker).exists(_ >= batchId)) return // replay
    if (!EpochCommit.epochExists(spark, outDir, batchId)) {
      // the index is guaranteed untouched by this epoch (appends happen
      // only after this dir commits), so recomputation is deterministic
      val b = batch.localCheckpoint(true) // probe + pairs + 2 writes reuse it
      // cross-batch: anything near-dup of an already-indexed doc.
      // dup_of and similarity come from ONE pair (the lowest indexed
      // id), never mixed across pairs
      val crossHits = DedupIndex.probe(spark, table, b, idCol, textCol,
          threshold = threshold)
        .groupBy(col("id_b"))
        .agg(min_by(struct(col("id_a").as("dup_of"),
          col("jaccard").as("similarity")), col("id_a")).as("p"))
        .select(col("id_b"), col("p.dup_of").as("dup_of"),
          col("p.similarity").as("similarity"))
      // in-batch: drop the higher id of every in-batch near-dup pair
      // (id_a < id_b by construction, so the kept side is deterministic)
      val inBatchHits = Dedup.minHashNearDupPairs(b, idCol, textCol,
          threshold = threshold)
        .groupBy(col("id_b"))
        .agg(min_by(struct(col("id_a").as("dup_of"),
          col("jaccard").as("similarity")), col("id_a")).as("p"))
        .select(col("id_b"), col("p.dup_of").as("dup_of"),
          col("p.similarity").as("similarity"))
      val rejected = crossHits.withColumn("reason", lit("DUP_OF_CORPUS"))
        .unionByName(inBatchHits.withColumn("reason", lit("DUP_IN_BATCH")))
        .groupBy(col("id_b"))
        .agg(min_by(struct(col("dup_of"), col("similarity"), col("reason")),
          struct(col("dup_of"), col("reason"))).as("m"))
        .select(col("id_b"), col("m.dup_of").as("dup_of"),
          col("m.similarity").as("similarity"), col("m.reason").as("reason"))
      commitEpoch(
        b.join(rejected, b(idCol) === rejected("id_b"))
          .select(col(idCol), col("dup_of"), col("similarity"), col("reason")),
        rejectDir, batchId)
      commitEpoch(
        b.join(rejected, b(idCol) === rejected("id_b"), "left_anti"),
        outDir, batchId)
    }
    // survivors are frozen now; the append is idempotent per epoch key.
    // An all-rejected epoch commits a dir with no data files — nothing
    // to append (and nothing for schema inference to choke on).
    if (EpochCommit.epochHasData(spark, outDir, batchId))
      DedupIndex.appendEpoch(spark, table,
        spark.read.parquet(s"$outDir/epoch=$batchId"), idCol, textCol,
        epochKey = s"ingest-e$batchId")
    EpochCommit.writeMarker(spark, marker, batchId)
  }

  private def commitEpoch(df: DataFrame, root: String, batchId: Long): Unit =
    EpochCommit.commitEpoch(df, root, batchId)

  /** Run the gate over a document stream against an EXISTING index
    * (build it first with [[graft.sources.DedupIndex.build]]).
    */
  def start(
      docs: DataFrame, table: String, idCol: String, textCol: String,
      outDir: String, rejectDir: String, checkpoint: String,
      threshold: Double = 0.9,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, table, b, id, idCol, textCol,
          outDir, rejectDir, threshold); ()
      }
      .start()
}
