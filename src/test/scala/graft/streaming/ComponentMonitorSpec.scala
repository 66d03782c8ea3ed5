package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming components monitor's contract is EXACT
  * incremental-equals-batch: after any prefix of pair triggers, the
  * stored labelling equals alternatingStarComponents over the
  * concatenated pairs — the spanning-star replacement identity, not an
  * approximation. The merge case (one bridge relabelling a whole
  * component) and the delta-sized write are asserted via changeFeed.
  */
class ComponentMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def batchLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val p = pairs.toDF("id_a", "id_b")
    val ids = p.select(col("id_a").as("id"))
      .unionByName(p.select(col("id_b").as("id"))).distinct()
    graft.ops.Dedup.alternatingStarComponents(p, ids, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def monitorLabels(store: SnapshotStore, table: String): Map[Long, Long] =
    ComponentMonitor.components(spark, store, table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labels equal the batch operator after every trigger prefix; bridge merge relabels") {
    val dir = Files.createTempDirectory("graft-compmon").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    // trigger 0: component {1,2,3}; trigger 1: disjoint {10,11,12};
    // trigger 2: ONE bridge edge 3-10 merges them — the losing
    // component's every member must relabel to 1
    val batches = Seq(
      Seq((1L, 2L), (2L, 3L)),
      Seq((10L, 11L), (11L, 12L)),
      Seq((3L, 10L)))
    batches.zipWithIndex.foreach { case (pairs, bi) =>
      ComponentMonitor.applyBatch(store, "CM", pairs.toDF("id_a", "id_b"),
        bi.toLong)
      assert(monitorLabels(store, "CM") ==
        batchLabels(batches.take(bi + 1).flatten),
        s"prefix through trigger $bi drifted from the batch operator")
    }
    assert(monitorLabels(store, "CM") ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))

    // the merge trigger's delta is exactly the relabelled component
    // (10, 11, 12 flip to label 1) — never the whole state
    val v = store.currentVersion("CM")
    val feed = store.changeFeed("CM", v - 1, v)
      .select(col("id"), col("label")).as[(Long, Long)].collect().toSet
    assert(feed == Set((10L, 1L), (11L, 1L), (12L, 1L)),
      s"merge delta must be the losing component only, got $feed")

    // replayed trigger: meta gate skips before any commit
    ComponentMonitor.applyBatch(store, "CM",
      batches(2).toDF("id_a", "id_b"), 2L)
    assert(store.currentVersion("CM") == v, "a replayed trigger must not commit")
  }

  test("random clustered pairs over 3 triggers match batch; no-op trigger commits nothing") {
    val dir = Files.createTempDirectory("graft-compmon-rand").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val rnd = new scala.util.Random(23)
    // chains within 30 clusters, edges arriving in random trigger order
    val all = (0 until 120).map { i =>
      val c = rnd.nextInt(30); val base = c * 100L
      (base + rnd.nextInt(4), base + 4 + rnd.nextInt(4))
    }
    val batches = Seq(all.take(40), all.slice(40, 80), all.drop(80))
    batches.zipWithIndex.foreach { case (pairs, bi) =>
      ComponentMonitor.applyBatch(store, "CR", pairs.toDF("id_a", "id_b"),
        bi.toLong)
      assert(monitorLabels(store, "CR") ==
        batchLabels(batches.take(bi + 1).flatten))
    }
    // an already-seen batch re-sent under a NEW id changes no labels —
    // the monitor must skip the commit entirely (no version bump)
    val v = store.currentVersion("CR")
    ComponentMonitor.applyBatch(store, "CR",
      batches(0).toDF("id_a", "id_b"), 99L)
    assert(store.currentVersion("CR") == v,
      "an all-duplicate trigger must commit nothing")
  }

  test("streaming start maintains components over a live stream") {
    val dir = Files.createTempDirectory("graft-compmon-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(Long, Long)](spark)
    val q = ComponentMonitor.start(mem.toDF().toDF("id_a", "id_b"), store,
      "CS", checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      val b0 = Seq((1L, 2L), (3L, 4L))
      val b1 = Seq((2L, 3L)) // merges both
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      assert(monitorLabels(store, "CS") == batchLabels(b0 ++ b1))
      assert(monitorLabels(store, "CS").values.toSet == Set(1L))
    } finally q.stop()
  }
}
