package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (id, user, ts, value)
  private lazy val clicks = Seq(
    (101L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    (102L, 1L, ts("2024-01-01 10:30:00"), 1.0),
    (103L, 2L, ts("2024-01-01 09:00:00"), 1.0),
    (104L, 3L, ts("2024-01-01 12:00:00"), 1.0))
    .toDF("click_id", "user_id", "click_ts", "v")
    .drop("v")

  private lazy val purchases = Seq(
    (201L, 1L, ts("2024-01-01 10:00:00"), 5.0),  // tie with click 101
    (202L, 1L, ts("2024-01-01 10:10:00"), 7.0),
    (203L, 2L, ts("2024-01-01 09:30:00"), 9.0))  // AFTER user 2's click
    .toDF("purchase_id", "user_id", "p_ts", "purchase_value")

  test("asOfJoin picks latest right row at-or-before, left-outer on misses") {
    val right = purchases.select(col("user_id"), col("p_ts"),
      col("purchase_id").as("p_tie"), col("purchase_id"), col("purchase_value"))
    val out = Temporal.asOfJoin(clicks, right, "user_id", "click_ts", "p_ts", "p_tie")
      .select("click_id", "purchase_id").as[(Long, Option[Long])].collect().toMap
    assert(out(101L).contains(201L)) // equal-ts purchase matches
    assert(out(102L).contains(202L)) // latest of the two priors
    assert(out(103L).isEmpty)        // purchase is after the click
    assert(out(104L).isEmpty)        // user has no purchases
  }

  test("asOfJoin breaks equal-(key,ts) right ties by greatest tie column") {
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "low"),
      (1L, ts("2024-01-01 09:00:00"), 2L, "high"))
      .toDF("user_id", "p_ts", "p_tie", "tag")
    val out = Temporal.asOfJoin(clicks.filter($"click_id" === 101L), right,
      "user_id", "click_ts", "p_ts", "p_tie")
      .select("tag").as[String].collect()
    assert(out.toSeq == Seq("high"))
  }

  test("sessionize splits on gaps > gapSec and indexes sessions per key") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:20:00")), // same session (gap 20m)
      (3L, 1L, ts("2024-01-01 11:30:00")), // new session (gap 70m)
      (4L, 2L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Temporal.sessionize(ev, "user_id", "ts", "event_id", gapSec = 1800L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 2L && out(4L) == 1L)
  }

  test("countInPrecedingRange matches a naive range join, including zeros") {
    val probe = purchases.select(col("purchase_id"), col("user_id"),
      col("p_ts").as("purchase_ts"))
    val build = clicks.select(col("user_id"), col("click_ts").as("ts"))
    val fast = Temporal.countInPrecedingRange(probe, "purchase_id", build,
      "user_id", "purchase_ts", "ts", windowSec = 3600L, outCol = "n")
      .select("purchase_id", "n").as[(Long, Long)].collect().toMap
    val naive = probe.join(build, Seq("user_id"), "left")
      .withColumn("hit", when(col("ts") <= col("purchase_ts") &&
        col("ts") > col("purchase_ts") - expr("INTERVAL 1 HOUR"), 1L).otherwise(0L))
      .groupBy("purchase_id").agg(sum("hit").as("n"))
      .select("purchase_id", "n").as[(Long, Long)].collect().toMap
    assert(fast == naive)
    assert(fast(203L) == 1L) // user 2's click at 09:00 is in the 09:30 window
    assert(fast(201L) == 1L) // equal-ts click of user 1 counts, 102 is later
  }

  test("countInPrecedingRange catches rows straddling a bucket boundary") {
    // click at 09:59:59, purchase at 10:59:58 -> different hour buckets,
    // still inside the window; the 2-bucket explode must find it
    val probe = Seq((1L, 9L, ts("2024-01-01 10:59:58")))
      .toDF("purchase_id", "user_id", "purchase_ts")
    val build = Seq((9L, ts("2024-01-01 09:59:59"))).toDF("user_id", "ts")
    val out = Temporal.countInPrecedingRange(probe, "purchase_id", build,
      "user_id", "purchase_ts", "ts", 3600L, "n")
      .select("n").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }
}
