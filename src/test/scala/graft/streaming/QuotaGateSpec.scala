package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming per-source token-quota gate: budgets enforce across
  * triggers through additive state; a doc passes iff it fits whole in
  * its source's remaining budget at its turn; rejects are visible and
  * tagged; only KEPT tokens consume quota; replays are idempotent
  * across both crash windows.
  */
class QuotaGateSpec extends SparkSpec {
  import spark.implicits._

  private def budgets = Seq(("a", 20L), ("b", 10L)).toDF("source", "budget")

  private def epoch(dir: String, e: Long): Map[Long, String] =
    spark.read.parquet(s"$dir/epoch=$e")
      .select("doc_id", "source").as[(Long, String)].collect()
      .map(r => r._1 -> r._2).toMap

  test("cross-trigger quota: in-batch hard cut, later smaller docs admit, exhausted stays exhausted") {
    val dir = Files.createTempDirectory("graft-quota").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val out = s"$dir/keep"
    val rej = s"$dir/reject"

    // trigger 0: a = 7+7+7 against budget 20 → a1, a2 keep (0, 7),
    // a3 overflows (14+7); b = 9 against 10 → keeps
    val b0 = Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L), (4L, "b", 9L))
      .toDF("doc_id", "source", "n_tokens")
    QuotaGate.applyBatch(store, "Q", b0, 0L, "doc_id", "source", "n_tokens",
      budgets, out, rej)
    assert(epoch(out, 0L).keySet == Set(1L, 2L, 4L))
    assert(epoch(rej, 0L).keySet == Set(3L))
    assert(QuotaGate.consumed(spark, store, "Q")
      .as[(String, Long)].collect().toMap == Map("a" -> 14L, "b" -> 9L))

    // trigger 1: the trigger-0 overflow did NOT burn quota, so a
    // smaller doc still fits (14+5 ≤ 20); the next overflows in-batch
    // (19+2 > 20); b is exhausted (9+2 > 10); c is unbudgeted
    val b1 = Seq((10L, "a", 5L), (11L, "a", 2L), (12L, "b", 2L), (13L, "c", 3L))
      .toDF("doc_id", "source", "n_tokens")
    QuotaGate.applyBatch(store, "Q", b1, 1L, "doc_id", "source", "n_tokens",
      budgets, out, rej)
    assert(epoch(out, 1L).keySet == Set(10L))
    val reasons = spark.read.parquet(s"$rej/epoch=1")
      .select("doc_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons == Map(11L -> "QUOTA_EXHAUSTED", 12L -> "QUOTA_EXHAUSTED",
      13L -> "QUOTA_UNBUDGETED"))
    assert(QuotaGate.consumed(spark, store, "Q")
      .as[(String, Long)].collect().toMap == Map("a" -> 19L, "b" -> 9L))

    // full replay of a landed trigger: no state growth, epochs intact
    val v = store.currentVersion("Q")
    QuotaGate.applyBatch(store, "Q", b1, 1L, "doc_id", "source", "n_tokens",
      budgets, out, rej)
    assert(store.currentVersion("Q") == v)
    assert(epoch(out, 1L).keySet == Set(10L))
  }

  test("quality-ordered cut: a binding budget admits the best-scored docs and rejects the tail") {
    val dir = Files.createTempDirectory("graft-quota-ord").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    // source a, budget 20, three 10-token docs: arrival order would
    // keep docs 1 and 2; score order (9, 7, 5) must keep 2 and 3
    val b0 = Seq((1L, "a", 10L, 5L), (2L, "a", 10L, 9L), (3L, "a", 10L, 7L))
      .toDF("doc_id", "source", "n_tokens", "score")
    val order = Seq(org.apache.spark.sql.functions.col("score").desc)
    QuotaGate.applyBatch(store, "QO", b0, 0L, "doc_id", "source", "n_tokens",
      budgets, s"$dir/keep", s"$dir/reject", order)
    assert(epoch(s"$dir/keep", 0L).keySet == Set(2L, 3L),
      "the binding budget must keep the HIGHEST-scored docs")
    assert(epoch(s"$dir/reject", 0L).keySet == Set(1L))
    // the priority order is part of the replay contract: a replayed
    // trigger decides identically (same order, same epochs, no growth)
    val v = store.currentVersion("QO")
    QuotaGate.applyBatch(store, "QO", b0, 0L, "doc_id", "source", "n_tokens",
      budgets, s"$dir/keep", s"$dir/reject", order)
    assert(store.currentVersion("QO") == v)
    assert(epoch(s"$dir/keep", 0L).keySet == Set(2L, 3L))
  }

  test("crash between epoch publish and state commit replays to the same epochs, then lands state") {
    val dir = Files.createTempDirectory("graft-quota-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val b0 = Seq((1L, "a", 7L), (2L, "a", 15L)).toDF("doc_id", "source", "n_tokens")
    // simulate the crash window: epochs landed, state delta did not —
    // exactly what publishing-first leaves behind
    QuotaGate.applyBatch(store, "QC", b0, 0L, "doc_id", "source", "n_tokens",
      budgets, s"$dir/keep", s"$dir/reject")
    val keepBefore = epoch(s"$dir/keep", 0L)
    // wipe ONLY the state (as if the additive commit never happened)
    val store2 = new SnapshotStore(spark, s"$dir/store2")
    QuotaGate.applyBatch(store2, "QC", b0, 0L, "doc_id", "source", "n_tokens",
      budgets, s"$dir/keep", s"$dir/reject")
    assert(epoch(s"$dir/keep", 0L) == keepBefore,
      "replay must not rewrite a published epoch")
    assert(QuotaGate.consumed(spark, store2, "QC")
      .as[(String, Long)].collect().toMap == Map("a" -> 7L),
      "the replay must land the missing state delta (kept tokens only)")
  }

  test("single-trigger gate equals the batch tokenBudgetCut (incremental-equals-batch)") {
    // the corpus arriving in ONE trigger must admit exactly what the
    // batch construction admits — the gate's in-batch hard-cut prefix
    // semantics ARE tokenBudgetCut's
    val dir = Files.createTempDirectory("graft-quota-eq").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val rnd = new scala.util.Random(42)
    val corpus = (1 to 300)
      .map(i => (i.toLong, if (rnd.nextBoolean()) "a" else "b", (1 + rnd.nextInt(9)).toLong))
      .toDF("doc_id", "source", "n_tokens")
    QuotaGate.applyBatch(store, "QE", corpus, 0L, "doc_id", "source",
      "n_tokens", budgets, s"$dir/keep", s"$dir/reject")
    val streamed = spark.read.parquet(s"$dir/keep/epoch=0")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.ops.Packing.tokenBudgetCut(corpus, "source", "n_tokens",
        Seq(org.apache.spark.sql.functions.col("doc_id")), budgets)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "single-trigger gate drifted from the batch cut")
  }

  test("a fresh data trigger runs exactly 5 actions (the per-trigger budget)") {
    // prefix-sum checkpoint, split checkpoint, keep epoch, reject
    // epoch, additive state delta — a regression that re-derives the
    // prefix sums per consumer or sneaks a state-sized read in shows
    // up here before it shows in any bench
    val dir = Files.createTempDirectory("graft-quota-budget").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    QuotaGate.applyBatch(store, "QB",
      Seq((1L, "a", 5L)).toDF("doc_id", "source", "n_tokens"),
      0L, "doc_id", "source", "n_tokens", budgets, s"$dir/keep", s"$dir/reject")
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
      QuotaGate.applyBatch(store, "QB",
        Seq((2L, "a", 5L), (3L, "b", 4L)).toDF("doc_id", "source", "n_tokens"),
        1L, "doc_id", "source", "n_tokens", budgets, s"$dir/keep", s"$dir/reject")
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
      s"quota-gate per-trigger action budget is 5, saw ${actions.get()}")
  }

  test("streaming start enforces the quota over a live stream") {
    val dir = Files.createTempDirectory("graft-quota-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(Long, String, Long)](spark)
    val q = QuotaGate.start(mem.toDF().toDF("doc_id", "source", "n_tokens"),
      store, "QS", "doc_id", "source", "n_tokens", budgets,
      s"$dir/keep", s"$dir/reject", checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData((1L, "a", 12L))
      q.processAllAvailable()
      mem.addData((2L, "a", 8L), (3L, "a", 1L))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/keep")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L), s"quota drifted: $kept") // 12+8 = 20 exactly
      val rej = spark.read.parquet(s"$dir/reject")
        .select("doc_id").as[Long].collect().toSet
      assert(rej == Set(3L))
    } finally q.stop()
  }
}
