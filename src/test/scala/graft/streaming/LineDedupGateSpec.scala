package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming line-dedup gate's three contracts: (1) cross-trigger
  * blocking — a line's doc count accumulates across triggers and strips
  * from the first batch where it crosses minDocs; (2) the count state
  * is EXACTLY the batch recount after any trigger prefix; (3) replay
  * idempotence across both crash windows (epoch landed / counts not,
  * and fully landed).
  */
class LineDedupGateSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOf(outDir: String, epoch: Long): Map[Long, (Long, Long, String)] =
    spark.read.parquet(s"$outDir/epoch=$epoch")
      .select("doc_id", "n_lines", "n_dropped", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cross-trigger blocking, in-batch blocking, count state exact, replay idempotent") {
    val dir = Files.createTempDirectory("graft-ldg").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val out = s"$dir/clean"

    // trigger 0: docs 1/2 share "SUBSCRIBE NOW" (in-batch cross-doc →
    // stripped immediately); "rare line" appears only in doc 1 (kept)
    val b0 = Seq(
      (1L, "rare line\nSUBSCRIBE NOW\nbody a"),
      (2L, "SUBSCRIBE NOW\nbody b")).toDF("doc_id", "text")
    LineDedupGate.applyBatch(store, "LD", b0, 0L, "doc_id", "text", out)
    val e0 = cleanOf(out, 0L)
    assert(e0(1L) == ((3L, 1L, "rare line\nbody a")))
    assert(e0(2L) == ((2L, 1L, "body b")))

    // trigger 1: doc 3 carries "SUBSCRIBE NOW" (count already 2 →
    // stripped from a SINGLE occurrence, the cross-trigger block) and
    // "rare line" (count reaches 2 WITH this batch → stripped here,
    // but trigger 0's epoch is immutable and keeps its copy)
    val b1 = Seq((3L, "rare line\nSUBSCRIBE NOW\nbody c")).toDF("doc_id", "text")
    LineDedupGate.applyBatch(store, "LD", b1, 1L, "doc_id", "text", out)
    assert(cleanOf(out, 1L)(3L) == ((3L, 2L, "body c")))
    assert(cleanOf(out, 0L)(1L)._3 == "rare line\nbody a",
      "earlier epochs are immutable")

    // count state == batch recount over everything fed so far
    val expected = graft.ops.Dedup
      .explodeLines(b0.unionByName(b1), "doc_id", "text")
      .groupBy("line").agg(count_distinct(col("id")).as("n_docs"))
      .as[(String, Long)].collect().toMap
    val got = LineDedupGate.lineCounts(spark, store, "LD")
      .as[(String, Long)].collect().toMap
    assert(got == expected, "count state drifted from the batch recount")

    // replay of a fully-landed trigger: no new store version, epoch kept
    val v = store.currentVersion("LD")
    LineDedupGate.applyBatch(store, "LD", b1, 1L, "doc_id", "text", out)
    assert(store.currentVersion("LD") == v)
    assert(cleanOf(out, 1L)(3L) == ((3L, 2L, "body c")))
  }

  test("narrowState: hash60-keyed state commits identical epochs; counts key by the hash") {
    // same batches through the text-keyed gate (the exactness default)
    // and the hash60-keyed gate (the measured 3-4x narrow layout for
    // billion-line states): epochs must be identical on any
    // non-colliding corpus, and the narrow counts are the text counts
    // re-keyed by hash60 — including the cross-trigger strip landing
    // at the same trigger in both modes
    val dir = Files.createTempDirectory("graft-ldg-narrow").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val b0 = Seq(
      (1L, "rare line\nSUBSCRIBE NOW\nbody a"),
      (2L, "SUBSCRIBE NOW\nbody b")).toDF("doc_id", "text")
    val b1 = Seq((3L, "rare line\nSUBSCRIBE NOW\nbody c")).toDF("doc_id", "text")
    Seq(b0, b1).zipWithIndex.foreach { case (b, k) =>
      LineDedupGate.applyBatch(store, "LT", b, k.toLong, "doc_id", "text",
        s"$dir/text_out")
      LineDedupGate.applyBatch(store, "LN", b, k.toLong, "doc_id", "text",
        s"$dir/narrow_out", narrowState = true)
      assert(cleanOf(s"$dir/narrow_out", k.toLong) ==
        cleanOf(s"$dir/text_out", k.toLong),
        s"narrow-state epoch $k diverged from the text-keyed gate")
    }
    // driver-side hash60 = first 15 md5 hex chars as a long — the
    // narrow counts must be the text counts under that key
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    val text = LineDedupGate.lineCounts(spark, store, "LT")
      .as[(String, Long)].collect().toMap
    val narrow = LineDedupGate.lineCounts(spark, store, "LN",
        narrowState = true)
      .as[(Long, Long)].collect().toMap
    assert(narrow == text.map { case (l, n) => h60(l) -> n },
      "narrow counts drifted from the text counts under hash60")
  }

  test("crash between epoch publish and count commit replays to the same epoch") {
    val dir = Files.createTempDirectory("graft-ldg-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val out = s"$dir/clean"
    val b0 = Seq(
      (1L, "shared\nkeep a"),
      (2L, "shared\nkeep b")).toDF("doc_id", "text")
    LineDedupGate.applyBatch(store, "LD", b0, 0L, "doc_id", "text", out)

    // simulate the crash window: publish trigger 1's epoch exactly as
    // the gate would (against state WITHOUT its own counts), but die
    // before commitAdditive
    val b1 = Seq((3L, "shared\nlate line"), (4L, "late line")).toDF("doc_id", "text")
    val lines = graft.ops.Dedup.explodeLines(b1, "doc_id", "text")
    val dups = lines.groupBy(col("line"))
      .agg(count_distinct(col("id")).cast("long").as("state_cnt"))
      .unionByName(store.additiveSnapshot("LD", null))
      .groupBy(col("line")).agg(sum(col("state_cnt")).as("n"))
      .filter(col("n") >= 2).select(col("line"))
    EpochCommit.commitEpoch(
      b1.drop("text").join(
        graft.ops.Dedup.rewriteDroppingLines(lines, dups)
          .withColumnRenamed("id", "doc_id")
          .withColumnRenamed("clean_text", "text"), Seq("doc_id")),
      out, 1L)
    val before = cleanOf(out, 1L)
    assert(before(3L) == ((2L, 2L, "")), "shared + late line both stripped")
    val vBefore = store.currentVersion("LD")

    // the replay: must leave the epoch bit-identical and land the counts
    LineDedupGate.applyBatch(store, "LD", b1, 1L, "doc_id", "text", out)
    assert(cleanOf(out, 1L) == before, "replay changed a published epoch")
    assert(store.currentVersion("LD") == vBefore + 1, "counts must land")
    assert(store.currentMeta("LD").contains("1"))
  }

  test("a fresh data trigger runs exactly 4 actions (the per-trigger budget)") {
    // 1 line-explode checkpoint, 1 count checkpoint, 1 epoch write,
    // 1 additive delta write — counted as root SQL executions
    // (IngestDedupSpec's pin): a regression that recomputes the explode
    // per consumer or sneaks a state-sized rewrite in shows up here as
    // a 5th action before it shows up in the bench.
    val dir = Files.createTempDirectory("graft-ldg-budget").toString
    val store = new SnapshotStore(spark, s"$dir/store")
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
      LineDedupGate.applyBatch(store, "LB",
        Seq((1L, "one\ntwo"), (2L, "two\nthree")).toDF("doc_id", "text"),
        0L, "doc_id", "text", s"$dir/clean")
      var last = -1
      var stable = 0
      val deadline = System.currentTimeMillis() + 10000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        val now = actions.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(actions.get() == 4,
      s"line-gate per-trigger action budget is 4 (explode checkpoint, " +
        s"count checkpoint, epoch write, count delta write), saw ${actions.get()}")
  }

  test("a null-text doc flows through as empty text — it never vanishes") {
    // split(null) yields null and posexplode generates zero rows, so
    // before the coalesce fix the doc dropped out of the inner join
    // back and DISAPPEARED from the tier-0 epoch with no reject record
    val dir = Files.createTempDirectory("graft-ldg-null").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val b0 = Seq(
      (1L, Some("shared\nkeep a")),
      (2L, Some("shared")),
      (3L, None: Option[String])).toDF("doc_id", "text")
    LineDedupGate.applyBatch(store, "LN", b0, 0L, "doc_id", "text", s"$dir/clean")
    val e0 = cleanOf(s"$dir/clean", 0L)
    assert(e0.contains(3L), "null-text doc must not vanish from the epoch")
    assert(e0(3L) == ((1L, 0L, "")),
      "null text reads as one empty line, judged like any other")
    assert(e0(1L) == ((2L, 1L, "keep a")))
  }

  test("the threshold aggregation's state-side input is batch-pruned (semi-join below every aggregate)") {
    // the 100 TB contract: per trigger, only the state's occurrences of
    // the BATCH's lines may reach an exchange — the semi-join against
    // the batch's distinct lines must sit BELOW additiveSnapshot's
    // merge-on-read aggregate (PushDownLeftSemiAntiJoin sinks it to the
    // scans), never above it, where the full O(distinct-lines) state
    // would be aggregated first and the prune would be cosmetic.
    val dir = Files.createTempDirectory("graft-ldg-prune").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    LineDedupGate.applyBatch(store, "LP",
      Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text"),
      0L, "doc_id", "text", s"$dir/clean")
    LineDedupGate.applyBatch(store, "LP",
      Seq((3L, "c\nd")).toDF("doc_id", "text"),
      1L, "doc_id", "text", s"$dir/clean")
    val bc = graft.ops.Dedup
      .explodeLines(Seq((9L, "b\nzz")).toDF("doc_id", "text"), "doc_id", "text")
      .groupBy(col("line"))
      .agg(count_distinct(col("id")).cast("long").as("state_cnt"))
      .localCheckpoint(true)
    val dups = LineDedupGate.thresholdDups(store, "LP", bc, 2)
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = dups.queryExecution.optimizedPlan
    val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"state side must semi-join the batch's lines:\n$plan")
    assert(semis.forall(_.collect { case a: Aggregate => a }.isEmpty),
      s"semi-join must be pushed BELOW the merge-on-read aggregate " +
        s"(state-sized shuffle otherwise):\n$plan")
    // and the pruned plan still computes the right threshold set:
    // 'b' has state count 2 (+1 in batch), 'zz' is new
    assert(dups.as[String].collect().toSet == Set("b"))

    // the SCAN is pruned too: the count table is line-hash BUCKETED, so
    // the state read pushes a __bkt IN (…) filter into every parquet
    // scan — row groups of buckets the batch doesn't touch never decode
    // (the O(state)-bytes residual the 20M-line probe showed dominating)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan) // AQE wraps; descend into the live plan
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(allScans)
    }
    val scans = allScans(dups.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/store/")))
    assert(scans.nonEmpty, "expected parquet scans of the count table")
    scans.foreach { s =>
      assert(s.metadata.get("PushedFilters").exists(_.contains("In(__bkt")),
        s"state scan must carry the bucket IN-filter:\n${s.metadata}")
    }
  }

  test("streaming start drives the gate over a live stream") {
    val dir = Files.createTempDirectory("graft-ldg-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val out = s"$dir/clean"
    val mem = MemoryStream[(Long, String)](spark)
    val q = LineDedupGate.start(mem.toDF().toDF("doc_id", "text"),
      store, "LS", "doc_id", "text", out, checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData((1L, "banner\nalpha"), (2L, "banner\nbeta"))
      q.processAllAvailable()
      mem.addData((3L, "banner\ngamma"))
      q.processAllAvailable()
      val all = spark.read.parquet(out)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(all == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
      val counts = LineDedupGate.lineCounts(spark, store, "LS")
        .as[(String, Long)].collect().toMap
      assert(counts("banner") == 3L)
    } finally q.stop()
  }
}
