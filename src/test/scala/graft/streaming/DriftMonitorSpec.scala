package graft.streaming

import graft.SparkSpec
import graft.ops.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming CUSUM monitor's correctness contract is incremental-
  * equals-batch: after ANY prefix of triggers, its report must equal
  * the batch operator run over the concatenated input with the same
  * pre-trained reference — the MatView argument applied to an
  * order-sensitive statistic (the state carries (c_last, minc_last),
  * which is exactly the sufficient statistic of the prefix identity).
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def batchReport(rows: Seq[(String, Long, Double)],
      allowance: Double = 15.0, h: Double = 250.0) =
    Stats.cusumDrift(rows.toDF("g", "i", "v"), "g", "v", Seq("i"),
        allowance, h, reference = Some(50.0))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  private def monitorReport(store: SnapshotStore, table: String) =
    DriftMonitor.report(spark, store, table).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("incremental fold equals the batch operator after every trigger prefix") {
    val dir = Files.createTempDirectory("graft-driftmon").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val rnd = new scala.util.Random(11)
    // batch 2 plants a +40 level shift on g1 — above the allowance, so
    // the monitor must alarm; g0 stays in-distribution
    val batches = (0 until 3).map { bi =>
      (0 until 200).map { i =>
        val g = s"g${i % 2}"
        val v = math.floor(rnd.nextDouble() * 10000) / 100.0 +
          (if (g == "g1" && bi == 2) 40.0 else 0.0)
        (g, (bi * 1000 + i).toLong, v)
      }
    }
    batches.zipWithIndex.foreach { case (rows, bi) =>
      DriftMonitor.applyBatch(store, "DM", rows.toDF("g", "i", "v"),
        bi.toLong, "g", "v", Seq("i"),
        reference = 50.0, allowance = 15.0, h = 250.0)
      assert(monitorReport(store, "DM") ==
        batchReport(batches.take(bi + 1).flatten),
        s"prefix through trigger $bi drifted from the batch operator")
    }
    val finalReport = monitorReport(store, "DM")
    assert(finalReport("g1")._2 > 0, "the planted level shift must alarm")
    assert(finalReport("g0")._2 == 0, "the in-distribution series must not")

    // replayed trigger (crash between commit and checkpoint): the
    // committed batch id gates the fold — state unchanged
    DriftMonitor.applyBatch(store, "DM",
      batches(2).toDF("g", "i", "v"), 2L, "g", "v", Seq("i"),
      reference = 50.0, allowance = 15.0, h = 250.0)
    assert(monitorReport(store, "DM") == finalReport,
      "a replayed trigger must not double-fold")
  }

  test("a group absent from a trigger carries its state forward unchanged") {
    val dir = Files.createTempDirectory("graft-driftmon-gap").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val b0 = Seq(("a", 1L, 80.0), ("a", 2L, 80.0), ("b", 3L, 50.0))
    val b1 = Seq(("b", 4L, 50.0)) // no 'a' rows this trigger
    DriftMonitor.applyBatch(store, "DG", b0.toDF("g", "i", "v"), 0L,
      "g", "v", Seq("i"), reference = 50.0, allowance = 0.0, h = 40.0)
    DriftMonitor.applyBatch(store, "DG", b1.toDF("g", "i", "v"), 1L,
      "g", "v", Seq("i"), reference = 50.0, allowance = 0.0, h = 40.0)
    assert(monitorReport(store, "DG") ==
      batchReport(b0 ++ b1, allowance = 0.0, h = 40.0))
  }

  test("streaming start maintains the monitor over a live stream") {
    val dir = Files.createTempDirectory("graft-driftmon-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(String, Long, Double)](spark)
    val q = DriftMonitor.start(mem.toDF().toDF("g", "i", "v"), store, "DS",
      "g", "v", Seq("i"), reference = 50.0, allowance = 15.0, h = 250.0,
      checkpoint = s"$dir/ckpt", trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      val b0 = (0 until 100).map(i => ("m", i.toLong, 55.0))
      val b1 = (100 until 200).map(i => ("m", i.toLong, 120.0)) // drift
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      assert(monitorReport(store, "DS") == batchReport(b0 ++ b1))
      assert(monitorReport(store, "DS")("m")._2 > 0, "drift must alarm")
    } finally q.stop()
  }
}
