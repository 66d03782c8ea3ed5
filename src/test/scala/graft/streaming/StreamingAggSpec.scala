package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A1–A3 as true streaming aggregations (the reference's in-memory
  * monitoring counters restated as incremental state), plus an
  * event-time windowed aggregation with a watermark.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  test("monitoring counters run as a streaming aggregation (complete mode)") {
    val mem = MemoryStream[(String, String)](spark)
    val audit = mem.toDF().toDF("table_name", "status")
    val agg = Monitoring.globalCounters(audit)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("g_counters").start()
    mem.addData(("TB_BOOK", "SUCCESS"), ("TB_BOOK", "SUCCESS"), ("TB_BOOK", "TARGET_NOT_FOUND"))
    q.processAllAvailable()
    mem.addData(("TB_BOOK", "LOOP_BLOCKED"))
    q.processAllAvailable()
    val r = spark.table("g_counters").head()
    q.stop()
    assert(r.getAs[Long]("total_received") == 4)
    assert(r.getAs[Long]("total_success") == 2)
    assert(r.getAs[Double]("success_rate") == 50.0)
  }

  test("windowed event-time aggregation with watermark emits closed windows") {
    val mem = MemoryStream[(java.sql.Timestamp, Double)](spark)
    val ev = mem.toDF().toDF("ts", "value")
    val agg = ev.withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("h"), $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("windows").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:05:00"), 1.0), (t("2024-01-01 10:50:00"), 2.0))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window
    mem.addData((t("2024-01-01 13:00:00"), 3.0))
    q.processAllAvailable()
    val rows = spark.table("windows").collect()
    q.stop()
    assert(rows.exists(r => r.getAs[java.sql.Timestamp]("h") == t("2024-01-01 10:00:00")
      && r.getAs[Long]("n") == 2))
  }

  test("salted join equals the plain join, and the salt reaches the join keys") {
    val ev = graft.Tables.load(spark, sfSmoke, "events")
    val dim = ev.groupBy("user_id").agg(max("value").as("max_value"))
    val plain = ev.join(dim, Seq("user_id")).agg(sum("max_value")).head().getDouble(0)
    val saltedDf = graft.ops.Skew.saltedJoin(ev, dim, "user_id", 8, col("event_id"))
    val salted = saltedDf.agg(sum("max_value")).head().getDouble(0)
    assert(math.abs(plain - salted) < 1e-6)
    // the salt column must be part of the physical join keys (that's
    // what spreads the hot key across 8 shuffle partitions)
    assert(saltedDf.queryExecution.executedPlan.toString.contains("__salt"))
    // ...and a hot key's rows genuinely land on every salt value
    val spread = ev.withColumn("k", lit(1))
    val perSalt = graft.ops.Skew.saltedJoin(
        spread, spread.select("k").distinct(), "k", 8, col("event_id"))
      .groupBy(pmod(crc32(col("event_id").cast("string")), lit(8))).count().count()
    assert(perSalt == 8)
  }
}
