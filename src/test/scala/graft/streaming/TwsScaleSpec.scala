package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** State-scale characterization of the transformWithState dedup: drive
  * ~10⁵ distinct change hashes through the operator and pin the two
  * properties that make it viable at production state sizes:
  *
  *  1. per-batch cost stays flat as total state grows — RocksDB point
  *     lookups keyed by the batch's own hashes, never a scan of the
  *     full state (a scan-shaped regression would show batch time
  *     growing linearly with accumulated keys);
  *  2. event-time TTL timers actually evict — total state rows DROP
  *     once the watermark passes lastApplied + TTL, so state is
  *     bounded by the TTL horizon, not by corpus lifetime.
  *
  * Measured curve (local[4], RocksDB, 20k new keys/batch) is recorded
  * in PLANS.md — the evidence behind "state store behaves at scale".
  */
class TwsScaleSpec extends SparkSpec {
  import spark.implicits._

  test("1e5 keys: flat per-batch cost; TTL timers shrink state") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("graft-tws-scale").toString
      val input = MemoryStream[(String, java.sql.Timestamp)](spark)
      val deduped = LoopDedupTws(
        input.toDF().toDF("change_hash", "event_ts")
          .withWatermark("event_ts", "0 seconds"),
        windowMs = 60000L, ttlMs = 120000L)
      val q = deduped.writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try {
        val t0 = 1768284000000L
        val keysPerBatch = 20000
        def batch(i: Int): Seq[(String, java.sql.Timestamp)] =
          (0 until keysPerBatch).map(j =>
            (s"k${i}_$j", new java.sql.Timestamp(t0 + i * 60000L)))

        def stateRows: Long = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

        val times = (0 until 5).map { i =>
          val start = System.nanoTime()
          input.addData(batch(i))
          q.processAllAvailable()
          (System.nanoTime() - start) / 1000000L // ms
        }
        val peakState = stateRows
        info(s"per-batch ms (20k new keys each): ${times.mkString(", ")}")
        info(s"state rows at peak: $peakState")
        assert(peakState > 0L, "expected state rows to be reported")

        // flatness: the 5th batch runs against 80k accumulated keys vs
        // the 2nd batch's 20k — a full-state scan would be ~4× slower.
        // Generous noise floor: fail only on a clear linear blowup.
        val early = times(1)
        val late = times(4)
        assert(late <= math.max(3 * early, early + 3000),
          s"per-batch time grew with state size: ${times.mkString(" ms, ")} ms")

        // watermark is now t0+240000 (batch 4): batches 0..1 are past
        // lastApplied + TTL; one more watermark push fires their timers
        input.addData(Seq(("fresh", new java.sql.Timestamp(t0 + 600000L))))
        q.processAllAvailable()
        val after = stateRows
        assert(after < peakState,
          s"TTL timers did not evict: peak=$peakState after=$after")
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
