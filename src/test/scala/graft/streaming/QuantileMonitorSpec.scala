package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming quantile monitor's contract is EXACT
  * incremental-equals-batch: bin counts are additive integers, so
  * after any prefix of triggers the quantile table must equal
  * binQuantiles over the concatenated values — no sketch error term.
  */
class QuantileMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val W = 5.0
  private val PS = Seq(0.5, 0.9, 0.99)

  private def batchQuantiles(values: Seq[Double]): Map[Double, Double] =
    graft.ops.Sketches.binQuantiles(values.toDF("v"), "v", W, PS)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  private def monitorQuantiles(store: SnapshotStore, table: String): Map[Double, Double] =
    QuantileMonitor.quantiles(spark, store, table, W, PS)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  test("quantiles equal the batch sketch after every trigger prefix; replay idempotent") {
    val dir = Files.createTempDirectory("graft-qmon").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val rnd = new scala.util.Random(31)
    // shifting distribution per trigger: the monitor must reflect the
    // MIXTURE of everything seen, not the latest batch
    val batches = (0 until 3).map { bi =>
      (0 until 500).map(_ => rnd.nextDouble() * 100.0 + bi * 40.0)
    }
    batches.zipWithIndex.foreach { case (vals, bi) =>
      QuantileMonitor.applyBatch(store, "QM", vals.toDF("v"), bi.toLong, "v", W)
      assert(monitorQuantiles(store, "QM") ==
        batchQuantiles(batches.take(bi + 1).flatten),
        s"prefix through trigger $bi drifted from the batch sketch")
    }
    val v = store.currentVersion("QM")
    QuantileMonitor.applyBatch(store, "QM", batches(2).toDF("v"), 2L, "v", W)
    assert(store.currentVersion("QM") == v, "a replayed trigger must not commit")
    // the histogram's total mass is the exact stream size
    val mass = QuantileMonitor.histogram(spark, store, "QM")
      .agg(org.apache.spark.sql.functions.sum("state_cnt"))
      .collect()(0).getLong(0)
    assert(mass == 1500L)
  }

  test("streaming start maintains quantiles over a live stream") {
    val dir = Files.createTempDirectory("graft-qmon-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[Double](spark)
    val q = QuantileMonitor.start(mem.toDF().toDF("v"), store, "QS",
      "v", W, checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      val b0 = (1 to 300).map(_.toDouble)
      val b1 = (301 to 400).map(_.toDouble)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      assert(monitorQuantiles(store, "QS") == batchQuantiles(b0 ++ b1))
    } finally q.stop()
  }
}
