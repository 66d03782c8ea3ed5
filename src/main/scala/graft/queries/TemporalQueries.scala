package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Temporal

/** Temporal operators over `events` — as-of join, sessionization,
  * bounded range join — wired into the driver contract with independent
  * DuckDB restatements (ASOF JOIN / window SQL / correlated count).
  */
object TemporalQueries extends QueryPack {

  // ---- AJ1: as-of join ---------------------------------------------------
  // For every click, the latest purchase by the same user at or before
  // the click (null payload when none): union + cumulative-last plan,
  // one shuffle. Oracle: DuckDB's native ASOF LEFT JOIN on a
  // tie-deduped purchase side — a genuinely different formulation.
  private def aj1AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_tie"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    Temporal.asOfJoin(clicks, purchases, "user_id", "click_ts", "p_ts", "p_tie")
      .orderBy(col("click_id"))
  }

  private val aj1Sql =
    """WITH ranked AS (
      |  SELECT user_id, ts, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase'),
      |p AS (
      |  SELECT user_id, ts AS p_ts, event_id AS purchase_id, value AS purchase_value
      |  FROM ranked WHERE rn = 1),
      |c AS (
      |  SELECT event_id AS click_id, user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.click_id, c.user_id, c.click_ts,
      |  p.purchase_id, p.p_ts AS purchase_ts, p.purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.click_ts >= p.p_ts
      |ORDER BY click_id""".stripMargin

  // ---- SS1: gap sessionization -------------------------------------------
  // 30-minute-gap sessions per user, then per-session rollup. The
  // running-sum session index and the groupBy share one hash exchange.
  private def ss1Sessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    Temporal.sessionize(ev, "user_id", "ts", "event_id", gapSec = 1800L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  private val ss1Sql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM o)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ---- RJ1: bounded range join -------------------------------------------
  // Clicks in the hour before each purchase, per user. Bucketized band
  // join (2 candidate buckets per probe row) vs the oracle's correlated
  // range count.
  private def rj1RangeCount(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    Temporal.countInPrecedingRange(purchases, "purchase_id", clicks,
        "user_id", "purchase_ts", "ts", windowSec = 3600L, outCol = "n_recent_clicks")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("n_recent_clicks"))
      .orderBy(col("purchase_id"))
  }

  private val rj1Sql =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.purchase_id, p.user_id, p.purchase_ts,
      |  CAST((SELECT COUNT(*) FROM c
      |        WHERE c.user_id = p.user_id
      |          AND c.ts <= p.purchase_ts
      |          AND c.ts > p.purchase_ts - INTERVAL 1 HOUR) AS BIGINT) AS n_recent_clicks
      |FROM p ORDER BY purchase_id""".stripMargin

  override def all: Seq[Q] = Seq(
    Q("aj1_asof_join", "as-of join: latest purchase at-or-before each click (union + cumulative-last, one shuffle)", aj1AsofJoin, Some(aj1Sql)),
    Q("ss1_sessionize", "gap sessionization: 30-min sessions per user + per-session rollup", ss1Sessionize, Some(ss1Sql)),
    Q("rj1_range_count", "bounded range join: clicks in the hour before each purchase (bucketized band join)", rj1RangeCount, Some(rj1Sql)))
}
