package graft.streaming

import graft.SparkSpec
import graft.sources.AnnIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The semantic curation gate: each micro-batch probes the persisted
  * IVF index, rejects near-dups of the indexed corpus (and in-batch
  * near-dups within frozen-centroid clusters), and appends only the
  * survivors — so a near-dup arriving in a LATER batch is blocked by a
  * survivor from an EARLIER one, and the index grows by exactly the
  * survivor set. Mirrors `IngestDedupSpec` (the token-tier gate with
  * the identical exactly-once choreography), plus the id-collision
  * gate the ANN probe cannot provide on its own.
  *
  * Fixture geometry (2-D unit-ish vectors, threshold 0.9, nProbe = 2 =
  * full probe coverage so recall is deterministic): stored seeds are
  * the unit axes; (0.6, 0.8) has cosine 0.8/0.6 against them (below
  * threshold) but 1.0 against its own duplicates.
  */
class SemanticIngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val ex = Array(1f, 0f)
  private val ey = Array(0f, 1f)
  private val diag = Array(0.6f, 0.8f) // near nothing stored, cos ≤ 0.8
  private val anti = Array(0.8f, -0.6f) // near nothing at all

  private def buildIdx(table: String): Unit =
    AnnIndex.buildIvf(Seq((1L, ex), (2L, ey)).toDF("vec_id", "embedding"),
      table, nCentroids = 2, refine = 0, buckets = 2)

  test("cross-batch and in-batch near-dups are blocked; the index grows only by survivors") {
    val dir = Files.createTempDirectory("graft-semingest").toString
    buildIdx("semgate_idx")
    val baseRows = spark.table("semgate_idx").count()

    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = SemanticIngestGate.start(mem.toDF().toDF("vec_id", "embedding"),
      "semgate_idx", "vec_id", "embedding",
      s"$dir/out", s"$dir/reject", s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      // batch 1: 10 = dup of stored 1 (blocked), 11 = new (survives),
      // 12 = in-batch dup of 11 (blocked, same frozen cluster)
      mem.addData((10L, ex), (11L, diag), (12L, diag))
      q.processAllAvailable()
      // batch 2: 20 = dup of batch-1 SURVIVOR 11 (the cross-batch case
      // the index exists for), 21 = new
      mem.addData((20L, diag), (21L, anti))
      q.processAllAvailable()

      val out = spark.read.parquet(s"$dir/out")
        .select("vec_id").as[Long].collect().toSet
      assert(out == Set(11L, 21L), s"survivors drifted: $out")

      val rejects = spark.read.parquet(s"$dir/reject")
        .select("vec_id", "dup_of", "reason").as[(Long, Long, String)]
        .collect().toSet
      assert(rejects == Set(
        (10L, 1L, "DUP_OF_CORPUS"),
        (12L, 11L, "DUP_IN_BATCH"),
        (20L, 11L, "DUP_OF_CORPUS")), s"rejects drifted: $rejects")
      // dup_of and similarity must describe the SAME pair: both
      // rejected-as-dup-of-11 rows carry cosine(·, 11) = 1.0 exactly
      val sims = spark.read.parquet(s"$dir/reject")
        .filter(col("dup_of") === 11L)
        .select("similarity").as[Double].collect().toSeq
      assert(sims == Seq(1.0, 1.0), s"pair-consistent similarity drifted: $sims")

      // index grew by exactly one list row per survivor. The appends
      // ran in foreachBatch's CLONED session — refresh this session's
      // cached file listing first.
      spark.catalog.refreshTable("semgate_idx")
      assert(spark.table("semgate_idx").count() - baseRows == 2,
        "index must grow by survivors only")
      // and a replayed epoch is a no-op (marker fast-path)
      SemanticIngestGate.applyBatch(spark, "semgate_idx",
        Seq((21L, anti)).toDF("vec_id", "embedding"),
        batchId = 1, "vec_id", "embedding", s"$dir/out", s"$dir/reject")
      assert(spark.table("semgate_idx").count() - baseRows == 2,
        "replayed batch must not re-append")
    } finally q.stop()
  }

  test("crash between survivor commit and index append replays without duplicates") {
    val dir = Files.createTempDirectory("graft-semingest-crash").toString
    buildIdx("semcrash_idx")
    val baseRows = spark.table("semcrash_idx").count()

    def run(id: Long, vecs: Seq[(Long, Array[Float])]): Unit =
      SemanticIngestGate.applyBatch(spark, "semcrash_idx",
        vecs.toDF("vec_id", "embedding"), id, "vec_id", "embedding",
        s"$dir/out", s"$dir/reject")

    run(0, Seq((10L, diag), (11L, ex))) // 10 survives, 11 rejected
    assert(spark.table("semcrash_idx").count() - baseRows == 1)

    // epoch 1: land it fully, then recreate the two crash states a
    // foreachBatch replay can observe and replay into each of them
    run(1, Seq((20L, anti)))
    val outRows = spark.read.parquet(s"$dir/out")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val idxRows = spark.table("semcrash_idx").count()
    val marker = java.nio.file.Paths.get(s"$dir/out", "_graft_semingest_epoch")

    // crash state A: survivors committed, index append PARTIAL (the
    // epoch's deterministic file deleted), marker never written
    Files.delete(marker)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("semcrash_idx"))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val e1Files = fs.listStatus(loc).map(_.getPath)
      .filter(_.getName.contains("semingest-e1"))
    assert(e1Files.nonEmpty, "epoch-keyed index files must exist")
    fs.delete(e1Files.head, false)
    spark.catalog.refreshTable("semcrash_idx")

    run(1, Seq((20L, anti))) // replay
    spark.catalog.refreshTable("semcrash_idx")
    assert(spark.table("semcrash_idx").count() == idxRows,
      "replay after partial index append must restore, not duplicate")
    assert(spark.read.parquet(s"$dir/out")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == outRows,
      "replay must not duplicate output rows")

    // crash state B: staging debris from an attempt that died before
    // the atomic rename — the replay must overwrite it and commit once
    Files.delete(marker)
    val staging = java.nio.file.Paths.get(s"$dir/out", ".staging", "e2")
    Files.createDirectories(staging)
    Files.write(staging.resolve("debris"), "junk".getBytes)
    run(2, Seq((30L, Array(-0.6f, -0.8f))))
    assert(!Files.exists(staging), "staging debris must be swept on commit")
    val afterB = spark.read.parquet(s"$dir/out")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(afterB == (outRows :+ 30L).sorted,
      s"epoch 2 must commit exactly once: $afterB")
    // duplicated epoch column must not appear as data (partition only)
    assert(spark.read.parquet(s"$dir/out").columns.count(_ == "epoch") == 1)
  }

  test("appendIvfEpoch replayed twice equals a single appendIvf (value idempotence)") {
    val corpus = Seq((1L, ex), (2L, ey)).toDF("vec_id", "embedding")
    val batch = Seq((10L, diag), (11L, anti)).toDF("vec_id", "embedding")
    buildIdx("semidem_a")
    buildIdx("semidem_b")
    AnnIndex.appendIvf(batch, "semidem_a")
    AnnIndex.appendIvfEpoch(batch, "semidem_b", epochKey = "e7")
    AnnIndex.appendIvfEpoch(batch, "semidem_b", epochKey = "e7") // replay
    def rows(t: String) = spark.table(t)
      .select(col("vec_id"), col("cent_id"),
        col("embedding").cast("array<double>").as("e"))
      .as[(Long, Long, Seq[Double])].collect().toSet
    assert(rows("semidem_b") == rows("semidem_a"),
      "replayed epoch append must equal a single plain append row-for-row")
    // and serving over either index returns identical results
    val served = AnnIndex.ivfServe(spark, "semidem_a", corpus, k = 2, nProbe = 2)
    val servedB = AnnIndex.ivfServe(spark, "semidem_b", corpus, k = 2, nProbe = 2)
    assert(served.collect().toSet == servedB.collect().toSet)
  }

  test("id collision is rejected before the ANN probe (the probe alone cannot see it)") {
    val dir = Files.createTempDirectory("graft-semingest-idc").toString
    buildIdx("semidc_idx")
    // re-ingest of stored id 1 (same vector) + a genuinely new vector.
    // The ANN probe drops self-id pairs, so only the collision gate
    // stands between this batch and a duplicated vec_id in the index.
    SemanticIngestGate.applyBatch(spark, "semidc_idx",
      Seq((1L, ex), (3L, diag)).toDF("vec_id", "embedding"),
      batchId = 0, "vec_id", "embedding", s"$dir/out", s"$dir/reject")
    val rejects = spark.read.parquet(s"$dir/reject")
      .select("vec_id", "dup_of", "reason").as[(Long, Long, String)]
      .collect().toSet
    assert(rejects == Set((1L, 1L, "ID_COLLISION")), s"rejects drifted: $rejects")
    assert(spark.read.parquet(s"$dir/reject")
      .filter(col("reason") === "ID_COLLISION")
      .filter(col("similarity").isNull).count() == 1,
      "collision rows carry null similarity (stored copy not re-scored)")
    spark.catalog.refreshTable("semidc_idx")
    val ids = spark.table("semidc_idx").select("vec_id").as[Long].collect().toSeq
    assert(ids.distinct.length == ids.length && ids.toSet == Set(1L, 2L, 3L),
      s"index must stay duplicate-free: $ids")

    // negative control: with the gate off the duplicate SURVIVES —
    // proving the assertion above is non-vacuous and the documented
    // unique-ids-upstream trade-off is real
    val dir2 = Files.createTempDirectory("graft-semingest-idc-off").toString
    buildIdx("semidc_off")
    SemanticIngestGate.applyBatch(spark, "semidc_off",
      Seq((1L, ex)).toDF("vec_id", "embedding"),
      batchId = 0, "vec_id", "embedding", s"$dir2/out", s"$dir2/reject",
      checkIdCollisions = false)
    spark.catalog.refreshTable("semidc_off")
    val offIds = spark.table("semidc_off").select("vec_id").as[Long].collect().toSeq
    assert(offIds.count(_ == 1L) == 2,
      s"without the gate the same-id duplicate must slip through: $offIds")
  }

  test("a fresh data trigger runs exactly 5 actions (the per-trigger budget)") {
    // the signature gate's round-9 treatment applied here: 1 batch
    // checkpoint, 1 unified-reject checkpoint (id collisions + corpus
    // probe + in-batch pairs, ONE plan), 2 epoch commits, 1 index
    // append — counted as root SQL executions so the pin survives AQE's
    // nested re-posts. A regression that re-introduces the
    // per-consumer reject recompute (the pre-round-10 shape: both
    // commits re-ran all three branches) or splits the probe into
    // separate actions shows up here before it shows up in the bench.
    val dir = Files.createTempDirectory("graft-semingest-budget").toString
    buildIdx("sembudget_idx")

    val actions = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
            if e.rootExecutionId.forall(_ == e.executionId) =>
            actions.incrementAndGet(); ()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SemanticIngestGate.applyBatch(spark, "sembudget_idx",
        Seq((10L, diag), (11L, anti)).toDF("vec_id", "embedding"),
        batchId = 0, "vec_id", "embedding", s"$dir/out", s"$dir/reject")
      var last = -1
      var stable = 0
      val deadline = System.currentTimeMillis() + 10000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        val now = actions.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(actions.get() == 5,
      s"semantic per-trigger action budget is 5 (batch checkpoint, " +
        s"unified-reject checkpoint, 2 epoch commits, 1 index append), " +
        s"saw ${actions.get()}")
  }
}
