package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming epoch-upsample gate: per-source token totals in an
  * additive chain, repeat factors recomputed every trigger, and the
  * PREFIX CONTRACT — the refreshed sample epoch after trigger k is
  * row-for-row the batch [[graft.ops.Packing.epochUpsample]] over the
  * stream's first k batches (exact integral-div factors + the
  * deterministic md5-Bernoulli fractional epoch make this exact).
  * Factors FALL as totals grow, so earlier docs lose copies — the
  * re-emit (and the hash-band incremental refresh) is load-bearing.
  */
class UpsampleGateSpec extends SparkSpec {
  import spark.implicits._

  private val budgets =
    Seq(("a", 400L), ("b", 300L)).toDF("source", "budget")

  private def docs(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("doc_id", "source", "n_tokens")

  // batches chosen so factors MOVE: a starts tiny (clamps at
  // maxEpochs), b starts mid; both fall as tokens accumulate, and a
  // batch-2 burst pushes a below 1 full repeat (fractional band)
  private val b0 = docs((1L, "a", 30L), (2L, "a", 25L), (100L, "b", 80L),
    (101L, "b", 95L), (900L, "z", 50L)) // z: unbudgeted, must not repeat
  private val b1 = docs((3L, "a", 60L), (102L, "b", 120L))
  private val b2 = docs((4L, "a", 200L), (5L, "a", 150L), (103L, "b", 40L))

  private def rows(dir: String, e: Long): Set[(Long, String, Long, Long, Long)] =
    spark.read.parquet(s"$dir/epoch=$e")
      .select("doc_id", "source", "n_tokens", "epochs6", "epoch_idx")
      .as[(Long, String, Long, Long, Long)].collect().toSet

  private def want(prefix: DataFrame): Set[(Long, String, Long, Long, Long)] =
    graft.ops.Packing.epochUpsample(prefix, "source", "doc_id", "n_tokens",
      budgets)
      .select("doc_id", "source", "n_tokens", "epochs6", "epoch_idx")
      .as[(Long, String, Long, Long, Long)].collect().toSet

  test("prefix contract: sample epoch k equals batch epochUpsample over the first k batches") {
    val dir = Files.createTempDirectory("graft-up").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    var prefix: DataFrame = null
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, k) =>
      UpsampleGate.applyBatch(store, "U", b, k.toLong, "doc_id", "source",
        "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
      prefix = if (prefix == null) b else prefix.unionByName(b)
      assert(rows(s"$dir/sample", k.toLong) == want(prefix),
        s"sample epoch $k drifted from the batch upsample")
      assert(UpsampleGate.totals(spark, store, "U")
        .as[(String, Long)].collect().toMap ==
        prefix.groupBy("source").agg(
          org.apache.spark.sql.functions.sum("n_tokens")).as[(String, Long)]
          .collect().toMap)
    }
    // the non-monotone direction is REAL here: a doc present with
    // epoch_idx = n in sample 0 must LOSE copies by sample 2 (a's
    // factor fell), and z never appears (unbudgeted)
    val s0 = rows(s"$dir/sample", 0L).filter(_._2 == "a").map(_._5).max
    val s2 = rows(s"$dir/sample", 2L).filter(r => r._2 == "a" && r._1 <= 2L)
      .map(_._5).max
    assert(s2 < s0, "expected a's early docs to lose copies as totals grew")
    assert(!rows(s"$dir/sample", 2L).exists(_._2 == "z"))
  }

  test("hash-band refresh commits epochs identical to the full re-decide, including across a cadence jump") {
    for (cadence <- Seq(1, 2)) {
      val dir = Files.createTempDirectory(s"graft-up-ab$cadence").toString
      val storeF = new SnapshotStore(spark, s"$dir/storeF")
      val storeI = new SnapshotStore(spark, s"$dir/storeI")
      val batches = Seq(b0, b1, b2, docs((6L, "a", 10L), (104L, "b", 10L)))
      batches.zipWithIndex.foreach { case (b, k) =>
        UpsampleGate.applyBatch(storeF, "UF", b, k.toLong, "doc_id", "source",
          "n_tokens", budgets, s"$dir/fseen", s"$dir/fsample", s"$dir/fadmit",
          refreshEvery = cadence, incremental = false)
        UpsampleGate.applyBatch(storeI, "UI", b, k.toLong, "doc_id", "source",
          "n_tokens", budgets, s"$dir/iseen", s"$dir/isample", s"$dir/iadmit",
          refreshEvery = cadence, incremental = true)
        if ((k + 1) % cadence == 0)
          assert(rows(s"$dir/isample", k.toLong) == rows(s"$dir/fsample", k.toLong),
            s"band refresh diverged from full at epoch $k (cadence $cadence)")
        assert(rows(s"$dir/iadmit", k.toLong) == rows(s"$dir/fadmit", k.toLong))
      }
    }
  }

  test("admit epochs repeat each arriving doc once, under that trigger's factors") {
    val dir = Files.createTempDirectory("graft-up-admit").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, k) =>
      UpsampleGate.applyBatch(store, "UA", b, k.toLong, "doc_id", "source",
        "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
      val batchIds = b.select("doc_id").as[Long].collect().toSet
      assert(rows(s"$dir/admit", k.toLong) ==
        rows(s"$dir/sample", k.toLong).filter(r => batchIds.contains(r._1)))
    }
    // admit epochs are per-arrival disjoint (docs arrive once)
    val all = (0 to 2).map(k => rows(s"$dir/admit", k.toLong).map(_._1))
    assert(all.map(_.size).sum == all.reduce(_ ++ _).size)
  }

  test("crash between epochs and state commit replays to identical epochs, then lands state") {
    val dir = Files.createTempDirectory("graft-up-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    UpsampleGate.applyBatch(store, "UC", b0, 0L, "doc_id", "source",
      "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
    val sample0 = rows(s"$dir/sample", 0L)
    val store2 = new SnapshotStore(spark, s"$dir/store2")
    UpsampleGate.applyBatch(store2, "UC", b0, 0L, "doc_id", "source",
      "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
    assert(rows(s"$dir/sample", 0L) == sample0,
      "replay must not rewrite a published sample epoch")
    assert(UpsampleGate.totals(spark, store2, "UC")
      .as[(String, Long)].collect().toMap ==
      Map("a" -> 55L, "b" -> 175L, "z" -> 50L),
      "the replay must land the missing token delta")
    val v = store2.currentVersion("UC")
    UpsampleGate.applyBatch(store2, "UC", b0, 0L, "doc_id", "source",
      "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
    assert(store2.currentVersion("UC") == v)
  }

  test("a fresh data trigger runs exactly 5 actions (the per-trigger budget)") {
    // seen epoch, token delta, factors collect, sample epoch, admit
    // epoch — the MixtureGate budget, pinned the same way: a
    // regression that re-derives factors per consumer or adds a
    // state-sized read shows up here before it shows in any bench
    val dir = Files.createTempDirectory("graft-up-budget").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    UpsampleGate.applyBatch(store, "UB", b0, 0L, "doc_id", "source",
      "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
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
      UpsampleGate.applyBatch(store, "UB", b1, 1L, "doc_id", "source",
        "n_tokens", budgets, s"$dir/seen", s"$dir/sample", s"$dir/admit")
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
      s"upsample-gate per-trigger action budget is 5, saw ${actions.get()}")
  }

  test("streaming start maintains the upsample over a live stream") {
    val dir = Files.createTempDirectory("graft-up-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(Long, String, Long)](spark)
    val q = UpsampleGate.start(
      mem.toDF().toDF("doc_id", "source", "n_tokens"),
      store, "US", "doc_id", "source", "n_tokens", budgets,
      root = dir, checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(b0.as[(Long, String, Long)].collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(b1.as[(Long, String, Long)].collect().toSeq: _*)
      q.processAllAvailable()
      assert(rows(s"$dir/upsampled", 1L) == want(b0.unionByName(b1)))
    } finally q.stop()
  }
}
