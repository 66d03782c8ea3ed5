package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming temperature-mixture gate: per-source counters in an
  * additive chain, rates recomputed every trigger, and the PREFIX
  * CONTRACT — the refreshed sample epoch after trigger k is row-for-row
  * the batch temperatureSample over the stream's first k batches (the
  * deterministic md5-Bernoulli hash makes this exact, not statistical).
  */
class MixtureGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "source")

  private def ids(dir: String, e: Long): Set[Long] =
    spark.read.parquet(s"$dir/epoch=$e").select("doc_id").as[Long]
      .collect().toSet

  // batches chosen so rates MOVE in both directions: b catching up to a
  // RAISES a's rate (√(n_min/n_a) with n_min = n_b), then a brand-new
  // tiny source drags n_min — and every rate — down
  private val b0 = docs((1 to 9).map(i => (i.toLong, "a")) :+ (100L, "b"): _*)
  private val b1 = docs((101 to 105).map(i => (i.toLong, "b")): _*)
  private val b2 = docs((11 to 14).map(i => (i.toLong, "a")) :+ (200L, "c"): _*)

  test("prefix contract: sample epoch k equals batch temperatureSample over the first k batches") {
    val dir = Files.createTempDirectory("graft-mix").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val batches = Seq(b0, b1, b2)
    var prefix: DataFrame = null
    batches.zipWithIndex.foreach { case (b, k) =>
      MixtureGate.applyBatch(store, "M", b, k.toLong, "doc_id", "source",
        s"$dir/seen", s"$dir/sample", s"$dir/admit")
      prefix = if (prefix == null) b else prefix.unionByName(b)
      val want = graft.ops.Stats.temperatureSample(prefix, "source", "doc_id")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      val got = spark.read.parquet(s"$dir/sample/epoch=$k")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      assert(got == want, s"sample epoch $k drifted from the batch mixture")
      // the counters equal the prefix's per-source counts
      assert(MixtureGate.counts(spark, store, "M")
        .as[(String, Long)].collect().toMap ==
        prefix.groupBy("source").count().as[(String, Long)].collect().toMap)
    }
    // non-monotonicity is REAL here: b catching up raises a's rate, so
    // some a-doc absent from sample 0 must appear in sample 1 — the
    // re-emit semantics are load-bearing, not defensive
    val s0 = ids(s"$dir/sample", 0L)
    val s1 = ids(s"$dir/sample", 1L)
    val aIds = (1 to 9).map(_.toLong).toSet
    assert(((s1 -- s0) & aIds).nonEmpty,
      "expected a previously-excluded a-doc to enter the sample as a's rate rose")
  }

  test("admit epochs decide each arriving doc once, under that trigger's rates") {
    val dir = Files.createTempDirectory("graft-mix-admit").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, k) =>
      MixtureGate.applyBatch(store, "MA", b, k.toLong, "doc_id", "source",
        s"$dir/seen", s"$dir/sample", s"$dir/admit")
      val batchIds = b.select("doc_id").as[Long].collect().toSet
      // admitted ⊆ this batch, and = the refreshed sample's slice of
      // this batch (both sides computed under the same trigger-k rates)
      assert(ids(s"$dir/admit", k.toLong) ==
        (ids(s"$dir/sample", k.toLong) & batchIds))
    }
    // a doc admitted at arrival is never re-presented downstream: the
    // admit epochs are disjoint (each doc arrives in exactly one batch)
    val all = (0 to 2).map(k => ids(s"$dir/admit", k.toLong))
    assert(all.map(_.size).sum == all.reduce(_ ++ _).size)
  }

  test("crash between epochs and state commit replays to identical epochs, then lands state") {
    val dir = Files.createTempDirectory("graft-mix-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    MixtureGate.applyBatch(store, "MC", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    val sample0 = ids(s"$dir/sample", 0L)
    // crash window: every epoch landed, the count delta did not — a
    // fresh store replays the trigger against empty state
    val store2 = new SnapshotStore(spark, s"$dir/store2")
    MixtureGate.applyBatch(store2, "MC", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    assert(ids(s"$dir/sample", 0L) == sample0,
      "replay must not rewrite a published sample epoch")
    assert(MixtureGate.counts(spark, store2, "MC")
      .as[(String, Long)].collect().toMap == Map("a" -> 9L, "b" -> 1L),
      "the replay must land the missing count delta")
    // full replay of a landed trigger: no state growth
    val v = store2.currentVersion("MC")
    MixtureGate.applyBatch(store2, "MC", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    assert(store2.currentVersion("MC") == v)
  }

  test("refreshEvery cadence: admit path every trigger, prefix-exact samples on the Nth") {
    val dir = Files.createTempDirectory("graft-mix-cadence").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val batches = Seq(b0, b1, b2,
      docs((15 to 17).map(i => (i.toLong, "a")): _*))
    batches.zipWithIndex.foreach { case (b, k) =>
      MixtureGate.applyBatch(store, "MR", b, k.toLong, "doc_id", "source",
        s"$dir/seen", s"$dir/sample", s"$dir/admit", refreshEvery = 2)
      // the admit epoch lands EVERY trigger regardless of cadence
      assert(EpochCommit.epochExists(spark, s"$dir/admit", k.toLong))
    }
    // samples only at batch ids 1 and 3 — and each emitted epoch is
    // still EXACTLY the batch mixture over its prefix
    assert(!EpochCommit.epochExists(spark, s"$dir/sample", 0L))
    assert(!EpochCommit.epochExists(spark, s"$dir/sample", 2L))
    Seq(1, 3).foreach { k =>
      val prefix = batches.take(k + 1).reduce(_ unionByName _)
      val want = graft.ops.Stats.temperatureSample(prefix, "source", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(ids(s"$dir/sample", k.toLong) == want,
        s"cadenced sample epoch $k drifted from the prefix contract")
    }
  }

  test("a fresh data trigger runs exactly 5 actions (the per-trigger budget)") {
    // seen epoch, count delta, rates checkpoint, sample epoch, admit
    // epoch — a regression that re-derives rates per consumer or adds
    // a state-sized read shows up here before it shows in any bench
    val dir = Files.createTempDirectory("graft-mix-budget").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    MixtureGate.applyBatch(store, "MB", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
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
      MixtureGate.applyBatch(store, "MB", b1, 1L, "doc_id", "source",
        s"$dir/seen", s"$dir/sample", s"$dir/admit")
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
      s"mixture-gate per-trigger action budget is 5, saw ${actions.get()}")
  }

  test("hash-band refresh commits epochs identical to the full re-decide, including across a cadence jump") {
    // same batches through two gates: one full (the oracle path), one
    // incremental (the default); rates move BOTH directions across the
    // sequence, so the band path exercises grown-band reads, shrunk-
    // band drops, and a brand-new source — and with refreshEvery = 2
    // the incremental refresh at epoch 3 recovers its old rates from
    // epoch 1 (a cadence jump, not just k-1)
    for (cadence <- Seq(1, 2)) {
      val dir = Files.createTempDirectory(s"graft-mix-ab$cadence").toString
      val storeF = new SnapshotStore(spark, s"$dir/storeF")
      val storeI = new SnapshotStore(spark, s"$dir/storeI")
      val batches = Seq(b0, b1, b2,
        docs((15 to 19).map(i => (i.toLong, "a")): _*))
      batches.zipWithIndex.foreach { case (b, k) =>
        MixtureGate.applyBatch(storeF, "MF", b, k.toLong, "doc_id", "source",
          s"$dir/fseen", s"$dir/fsample", s"$dir/fadmit",
          refreshEvery = cadence, incremental = false)
        MixtureGate.applyBatch(storeI, "MI", b, k.toLong, "doc_id", "source",
          s"$dir/iseen", s"$dir/isample", s"$dir/iadmit",
          refreshEvery = cadence, incremental = true)
        if ((k + 1) % cadence == 0) {
          val full = spark.read.parquet(s"$dir/fsample/epoch=$k")
            .select("doc_id", "source").as[(Long, String)].collect().toSet
          val band = spark.read.parquet(s"$dir/isample/epoch=$k")
            .select("doc_id", "source").as[(Long, String)].collect().toSet
          assert(band == full,
            s"band refresh diverged from full refresh at epoch $k (cadence $cadence)")
        }
        assert(ids(s"$dir/iadmit", k.toLong) == ids(s"$dir/fadmit", k.toLong))
      }
    }
  }

  test("a prev sample epoch without its rates side file falls back to the full path, then the band path resumes") {
    val dir = Files.createTempDirectory("graft-mix-legacy").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    MixtureGate.applyBatch(store, "ML", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    // simulate a legacy epoch: published before the side file existed
    val rates0 = new java.io.File(s"$dir/sample/epoch=0/_graft_rates")
    assert(rates0.exists, "sample epochs must carry their rates side file")
    assert(rates0.delete())
    var prefix = b0
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val k = i + 1L
      MixtureGate.applyBatch(store, "ML", b, k, "doc_id", "source",
        s"$dir/seen", s"$dir/sample", s"$dir/admit")
      prefix = prefix.unionByName(b)
      val want = graft.ops.Stats.temperatureSample(prefix, "source", "doc_id")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      val got = spark.read.parquet(s"$dir/sample/epoch=$k")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      assert(got == want, s"epoch $k drifted (legacy fallback then band resume)")
      // the emitted epoch re-establishes the side file either way
      assert(new java.io.File(s"$dir/sample/epoch=$k/_graft_rates").exists)
    }
  }

  test("the banded seen layout directory-prunes band reads") {
    // pins the layout, not Spark: frozen epochs must land as
    // __band=<b> partition dirs (a regression to flat epochs would
    // silently turn every band read into a corpus scan)
    val dir = Files.createTempDirectory("graft-mix-prune").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    MixtureGate.applyBatch(store, "MP", b0, 0L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    MixtureGate.applyBatch(store, "MP", b1, 1L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit")
    val all = spark.read.parquet(s"$dir/seen")
    val bands = all.select("__band").distinct().as[Int].collect().toSet
    assert(bands.size > 1, "fixture must span multiple bands")
    val probe = bands.head
    // inputFiles ignores filters — the honest witness is the physical
    // scan's SELECTED partitions under the pushed partition filter
    def selectedDirs(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
      }.flatten
    val pruned = selectedDirs(all.filter(col("__band") === probe))
    assert(pruned.nonEmpty &&
      pruned.forall(_.contains(s"__band=$probe/")),
      s"band read must touch only __band=$probe dirs: $pruned")
    assert(pruned.size < selectedDirs(all).size,
      "band read must select strictly fewer files than the corpus")
  }

  test("streaming start maintains the mixture over a live stream") {
    val dir = Files.createTempDirectory("graft-mix-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(Long, String)](spark)
    val q = MixtureGate.start(mem.toDF().toDF("doc_id", "source"),
      store, "MS", "doc_id", "source", root = dir,
      checkpoint = s"$dir/ckpt", trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(b0.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(b1.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val want = graft.ops.Stats
        .temperatureSample(b0.unionByName(b1), "source", "doc_id")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      val got = spark.read.parquet(s"$dir/sample/epoch=1")
        .select("doc_id", "source").as[(Long, String)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }
}
