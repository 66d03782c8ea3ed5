package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.AnnIndex

/** Streaming similarity serving: a stream of query embeddings is
  * answered micro-batch by micro-batch against a PERSISTED ANN index
  * ([[graft.sources.AnnIndex]]) — the query side of the index
  * lifecycle, completing build → append → compact → serve for live
  * traffic. Per-trigger cost is the batch-serve cost on |batch|
  * queries: probe selection against the stored centroids/planes plus a
  * scan of only the probed stored lists — the corpus is never
  * re-scored, so trigger cost is flat in corpus size.
  *
  * Serving is STATELESS per batch (result = f(batch, stored index)),
  * so exactly-once output needs only [[EpochCommit]]'s atomic epoch
  * rename: a replayed batch recomputes the same rows from the same
  * frozen index and lands in the same `epoch=<batchId>` dir.
  *
  * Concurrent index appends: serves read the index tables through the
  * session catalog snapshot at batch start; an [[IngestDedup]]-style
  * pipeline appending between triggers just means later epochs see the
  * newer corpus — exactly the semantics a production serving tier
  * wants.
  */
object AnnServeStream {

  /** One micro-batch of queries → top-k results under
    * `<outDir>/epoch=<batchId>`. Skips fully-committed epochs (replay).
    */
  def applyBatch(batch: DataFrame, batchId: Long, outDir: String,
      serve: (SparkSession, DataFrame) => DataFrame): Unit = {
    if (EpochCommit.epochExists(batch.sparkSession, outDir, batchId)) return // replay
    EpochCommit.commitEpoch(serve(batch.sparkSession, batch), outDir, batchId)
  }

  /** Serve a query-embedding stream against the stored IVF×PQ index
    * `table` (see [[AnnIndex.buildIvfPq]] / [[AnnIndex.ivfPqServe]]).
    */
  def startIvfPq(
      queries: DataFrame, table: String, outDir: String, checkpoint: String,
      k: Int, nProbe: Int, m: Int, dims: Int,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    start(queries, outDir, checkpoint, trigger) { (s, b) =>
      AnnIndex.ivfPqServe(s, table, b, k, nProbe, m, dims)
    }

  /** Serve a query-embedding stream against the stored IVF index.
    *
    * `pinSnapshot = true` resolves and PERSISTS the index frames once
    * at stream start, so each trigger skips catalog resolution and the
    * parquet scan — the latency posture a real serving tier runs. The
    * trade is snapshot semantics: appends committed after stream start
    * stay invisible until the stream restarts (default `false` keeps
    * the read-latest-at-each-batch behavior documented above).
    */
  def startIvf(
      queries: DataFrame, table: String, outDir: String, checkpoint: String,
      k: Int, nProbe: Int,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
      pinSnapshot: Boolean = false): StreamingQuery =
    if (!pinSnapshot)
      start(queries, outDir, checkpoint, trigger) { (s, b) =>
        AnnIndex.ivfServe(s, table, b, k, nProbe)
      }
    else {
      val s0 = queries.sparkSession
      val cents = s0.table(s"${table}_cents").persist()
      val lists = s0.table(table).select(
        org.apache.spark.sql.functions.col("vec_id").as("neighbor_id"),
        org.apache.spark.sql.functions.col("embedding").as("ce"),
        org.apache.spark.sql.functions.col("cent_id")).persist()
      cents.count(); lists.count() // materialize before the first trigger
      start(queries, outDir, checkpoint, trigger) { (_, b) =>
        AnnIndex.ivfServeFrames(cents, lists, b, k, nProbe)
      }
    }

  /** Serve a query-embedding stream against the stored multi-probe LSH
    * index (the recall-critical serve variant).
    */
  def startLshMultiProbe(
      queries: DataFrame, table: String, outDir: String, checkpoint: String,
      k: Int, planes: Int, dims: Int, extraProbes: Int,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    start(queries, outDir, checkpoint, trigger) { (s, b) =>
      AnnIndex.lshServeMultiProbe(s, table, b, k, planes, dims, extraProbes)
    }

  /** Generic epoch-committed streaming serve over any batch-serve
    * function — the composition point for custom index shapes.
    */
  def start(queries: DataFrame, outDir: String, checkpoint: String,
      trigger: Trigger)(
      serve: (SparkSession, DataFrame) => DataFrame): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, outDir, serve); ()
      }
      .start()
}
