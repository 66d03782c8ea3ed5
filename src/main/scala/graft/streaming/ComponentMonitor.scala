package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incremental connected components across triggers — streaming
  * maintenance of the near-dup clustering: pair batches arrive (e.g.
  * the ingest gate's accepted near-dup pairs), and after every trigger
  * the store holds each seen node's component minimum, exactly as the
  * batch operator would compute over ALL pairs ever seen.
  *
  * The incremental step leans on a graph identity instead of an
  * approximation: a component may be replaced by ANY spanning
  * structure on the same vertex set without changing connectivity, so
  * each trigger contracts (batch pairs ∪ the stored labelling's STAR
  * EDGES label→id) with [[graft.ops.Dedup.alternatingStarComponents]]
  * — which runs to a CONVERGENCE-DETECTED fixpoint, not a fixed round
  * count — and the result is the exact min-label components of the
  * full edge history. Incremental-equals-batch is therefore EXACT and
  * is the spec'd contract (including the hard case: one bridge edge
  * merging two large components, which relabels every member of the
  * losing component).
  *
  * State is a CDC table keyed on id, so the per-trigger WRITE is
  * O(|changed labels| + |new nodes|) via `commitDelta` — delta-sized
  * except when components genuinely merge (then the relabelled
  * members ARE the delta; `changeFeed` exposes exactly them, spec-
  * asserted). The per-trigger COMPUTE is O(|V| + |batch|) — the star
  * edges rebuild connectivity from the V-row state — which is the
  * honest floor for min-label maintenance (a merge can relabel
  * arbitrarily many nodes); on the near-clique graphs this pipeline
  * produces, contraction converges in 2-3 rounds.
  *
  * Exactly-once: the batch id rides the delta commit's meta; a
  * replayed trigger recomputes the same labels, finds zero changes,
  * and is skipped by the meta gate before any work.
  */
object ComponentMonitor {

  private val stateSchema = StructType(Seq(
    StructField("id", LongType), StructField("label", LongType)))

  /** Fold one micro-batch of (id_a, id_b) pairs into the stored
    * labelling (idempotent per `batchId`). Node ids are longs, the
    * graph family's convention.
    *
    * The contraction never sees the V-sized graph: batch endpoints
    * first map through the current labels (two keyed joins), turning
    * each pair into an edge between component REPRESENTATIVES — pairs
    * whose endpoints already share a component drop out right there
    * (the cheap no-op path) — and the fixpoint contraction runs on
    * that BATCH-SIZED representative graph. Because every stored
    * label is its component's minimum, the contracted minimum over
    * (reps ∪ new ids) is the true minimum over all members, so
    * relabelling moved components through the rep→rep mapping
    * reproduces the batch operator exactly.
    */
  def applyBatch(
      store: SnapshotStore, table: String, pairs: DataFrame,
      batchId: Long): Unit = {
    if (store.currentMeta(table).exists(_.toLong >= batchId)) return // replay
    val batch = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val state = store.snapshot(table, stateSchema).localCheckpoint(true)
    // batch edges between current representatives; same-component
    // pairs vanish here, so an all-duplicate trigger contracts nothing
    val repEdges = batch
      .join(state.select(col("id").as("id_a"), col("label").as("__la")),
        Seq("id_a"), "left")
      .join(state.select(col("id").as("id_b"), col("label").as("__lb")),
        Seq("id_b"), "left")
      .select(coalesce(col("__la"), col("id_a")).as("__ra"),
        coalesce(col("__lb"), col("id_b")).as("__rb"))
      .filter(col("__ra") =!= col("__rb"))
      // the contraction's star steps assume CANONICAL pairs
      // (id_a < id_b); rep-mapping can flip an edge's order
      .select(least(col("__ra"), col("__rb")).as("id_a"),
        greatest(col("__ra"), col("__rb")).as("id_b"))
      // the checkpoint is ALSO a constraint barrier: the Apply-
      // reconstructed snapshot's origin constraints otherwise poison
      // the contraction's self-unions (UnionBase.rewriteConstraints
      // key-not-found on a pruned attribute)
      .localCheckpoint(true)
    val repIds = repEdges.select(col("id_a").as("id"))
      .unionByName(repEdges.select(col("id_b").as("id"))).distinct()
    // rep -> new component minimum, batch-sized fixpoint contraction
    val m = graft.ops.Dedup.alternatingStarComponents(repEdges, repIds, "id")
      .filter(col("id") =!= col("canonical_id"))
      .select(col("id").as("__rep"), col("canonical_id").as("__new"))
      .localCheckpoint(true)
    // members of moved components relabel through the rep mapping
    val updates = state
      .join(m.withColumnRenamed("__rep", "label"), Seq("label"))
      .select(lit(batchId).as("seq"), lit("UPDATE").as("operation"),
        col("id"), col("__new").as("label"))
    // endpoints never seen before insert with their contracted label
    // (or themselves, when their rep did not move)
    val inserts = batch.select(col("id_a").as("id"))
      .unionByName(batch.select(col("id_b").as("id"))).distinct()
      .join(state.select(col("id")), Seq("id"), "left_anti")
      .join(m.withColumnRenamed("__rep", "id"), Seq("id"), "left")
      .select(lit(batchId).as("seq"), lit("INSERT").as("operation"),
        col("id"), coalesce(col("__new"), col("id")).as("label"))
    val changes = updates.unionByName(inserts).localCheckpoint(true)
    // an unchanged trigger commits nothing — replay of a no-op trigger
    // recomputes the same no-op, so skipping keeps idempotence
    if (!changes.isEmpty)
      store.commitDelta(table, changes, pk = "id", seqCol = "seq",
        dataCols = Seq("label"), meta = Some(batchId.toString))
  }

  /** Current labelling: (id, label = component minimum), ordered. */
  def components(spark: SparkSession, store: SnapshotStore, table: String): DataFrame =
    store.snapshot(table, stateSchema).orderBy(col("id"))

  /** Run the monitor over a stream of (id_a, id_b) pair batches. */
  def start(
      rows: DataFrame, store: SnapshotStore, table: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(store, table, b, id); ()
      }
      .start()
}
