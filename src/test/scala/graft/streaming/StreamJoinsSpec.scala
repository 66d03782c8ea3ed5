package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The interval join must (1) match only inside the event-time bound,
  * and (2) keep state BOUNDED — watermark passage evicts old rows from
  * the join state store (the property that makes stream-stream joins
  * viable at all in long-running pipelines).
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1768284000000L + sec * 1000)

  test("impression-click attribution: in-window matches only; watermark evicts state") {
    val imp = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val clk = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val joined = StreamJoins.intervalJoin(
      imp.toDF().toDF("ad_id", "imp_ts"), clk.toDF().toDF("ad_id", "clk_ts"),
      "ad_id", "imp_ts", "clk_ts", lowerSec = 0, upperSec = 30,
      watermark = "0 seconds")
    val ckpt = Files.createTempDirectory("graft-ij").toString
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      imp.addData((1L, ts(0)), (2L, ts(0)))
      clk.addData(
        (1L, ts(10)),  // inside [imp, imp+30] -> match
        (1L, ts(60)),  // beyond +30 -> no match
        (2L, ts(-5)))  // before the impression (lower bound 0) -> no match
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select("ad_id", "clk_ts").as[(Long, java.sql.Timestamp)].collect().toSet
      assert(got == Set((1L, ts(10))))

      val peak = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(peak > 0, "join must keep state")
      // push both watermarks far past every buffered row's eviction
      // horizon; the next batches clean up the state store
      imp.addData((9L, ts(10000)))
      clk.addData((9L, ts(10000)))
      q.processAllAvailable()
      imp.addData((9L, ts(20000)))
      clk.addData((9L, ts(20000)))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < peak, s"state not evicted: peak=$peak after=$after")
    } finally q.stop()
  }

  test("left-outer interval join: unmatched rows emit null-extended once the window provably closed") {
    val imp = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val clk = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val joined = StreamJoins.intervalJoinLeftOuter(
      imp.toDF().toDF("ad_id", "imp_ts"), clk.toDF().toDF("ad_id", "clk_ts"),
      "ad_id", "imp_ts", "clk_ts", lowerSec = 0, upperSec = 30,
      watermark = "0 seconds")
    val ckpt = Files.createTempDirectory("graft-ijo").toString
    val q = joined.writeStream.format("memory").queryName("ijo_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      imp.addData((1L, ts(0)), (2L, ts(0))) // 1 converts, 2 never does
      clk.addData((1L, ts(10)))
      q.processAllAvailable()
      def rows() = spark.table("ijo_out")
        .select("ad_id", "clk_ts").as[(Long, Option[java.sql.Timestamp])]
        .collect().toSet
      // matched pair emits at trigger latency; ad 2's fate is UNDECIDABLE
      // until the right watermark passes ts(0)+30 — no row yet
      assert(rows() == Set((1L, Some(ts(10)))))

      // advance both watermarks past the horizon (two batches: one to
      // carry the new watermark, one for the eviction pass to emit)
      imp.addData((9L, ts(1000)))
      clk.addData((9L, ts(1000)))
      q.processAllAvailable()
      imp.addData((9L, ts(2000)))
      clk.addData((9L, ts(2000)))
      q.processAllAvailable()
      assert(rows().contains((2L, None)),
        s"unmatched impression must emit null-extended, got ${rows()}")
      // and exactly once — no duplicate outer emissions on later batches
      imp.addData((9L, ts(3000)))
      clk.addData((9L, ts(3000)))
      q.processAllAvailable()
      assert(rows().count(_._1 == 2L) == 1)
    } finally q.stop()
  }
}
