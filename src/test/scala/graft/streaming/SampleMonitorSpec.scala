package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The streaming bottom-k monitor's contract is BIT-EXACT
  * incremental-equals-batch: bottom-k of hashes is a deterministic
  * function of the distinct set and the bounded-prune merge is exact,
  * so after any prefix of triggers the state must equal the batch
  * sketch of the concatenated input — no tolerance, no bound, equality.
  */
class SampleMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private def batchBottomK(items: Seq[String]): Seq[(Long, String)] =
    items.distinct.toDF("item")
      .select(graft.ops.Dedup.hash60(col("item")).as("h"), col("item"))
      .orderBy(col("h")).limit(K)
      .as[(Long, String)].collect().toSeq

  private def monitorState(store: SnapshotStore, table: String): Seq[(Long, String)] =
    SampleMonitor.sample(spark, store, table).as[(Long, String)].collect().toSeq

  test("bottom-k state equals the batch sketch bit-exactly after every prefix") {
    val dir = Files.createTempDirectory("graft-kmvmon").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    // heavy repetition + fresh tail per batch: frequency must not bias
    // the sample (hash order is frequency-oblivious)
    val batches = (0 until 3).map { bi =>
      (0 until 400).map(i => s"v${(i * 17 + bi * 131) % 260}")
    }
    batches.zipWithIndex.foreach { case (items, bi) =>
      SampleMonitor.applyBatch(store, "SM", items.toDF("item"), bi.toLong,
        "item", K)
      assert(monitorState(store, "SM") == batchBottomK(batches.take(bi + 1).flatten),
        s"prefix through trigger $bi drifted from the batch sketch")
    }
    // replayed trigger: no change
    val before = monitorState(store, "SM")
    SampleMonitor.applyBatch(store, "SM", batches(2).toDF("item"), 2L, "item", K)
    assert(monitorState(store, "SM") == before)
  }

  test("estimate: exact below k, the KMV formula at saturation") {
    val dir = Files.createTempDirectory("graft-kmvmon-est").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    SampleMonitor.applyBatch(store, "SE",
      Seq("a", "b", "a", "c").toDF("item"), 0L, "item", K)
    val (n0, e0) = SampleMonitor.estimate(spark, store, "SE", K)
      .as[(Long, Double)].collect().head
    assert(n0 == 3L && e0 == 3.0, "below k the estimate is the exact count")

    SampleMonitor.applyBatch(store, "SE",
      (0 until 500).map(i => s"x$i").toDF("item"), 1L, "item", K)
    val (n1, e1) = SampleMonitor.estimate(spark, store, "SE", K)
      .as[(Long, Double)].collect().head
    assert(n1 == K.toLong)
    // 503 true distincts; k=16 KMV is noisy but must land in the right
    // decade — and the value itself must equal the formula on the state
    assert(e1 > 100 && e1 < 2500, s"estimate $e1 implausible for 503 distincts")
    val hk = monitorState(store, "SE").last._1
    val expect = math.floor((K - 1).toDouble * math.pow(2.0, 60) / hk.toDouble
      * 1000000.0 + 0.5) / 1000000.0
    assert(e1 == expect, "estimate must equal the KMV formula on the stored state")
  }

  test("streaming start maintains the sample over a live stream") {
    val dir = Files.createTempDirectory("graft-kmvmon-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[String](spark)
    val q = SampleMonitor.start(mem.toDF().toDF("item"), store, "SS",
      "item", K, checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      val b0 = (0 until 200).map(i => s"s${i % 90}")
      val b1 = (0 until 200).map(i => s"t${i % 70}")
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      assert(monitorState(store, "SS") == batchBottomK(b0 ++ b1))
    } finally q.stop()
  }
}
