package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Reshaping operators: pivot, unpivot (melt), SCD type-2 history
  * derivation, CUBE grouping sets.
  *
  * Scale notes: pivot with an EXPLICIT value list is one partial-agg
  * shuffle (no distinct-values pre-pass — never let pivot infer its
  * columns at 100 TB); unpivot is a narrow generator (rows × measures,
  * no shuffle); SCD2 is one window pass over the key partitioning;
  * CUBE multiplies shuffle rows by the number of grouping sets — fine
  * for low-cardinality dimensions, which is the only place CUBE makes
  * sense anyway.
  */
object Reshape extends QueryPack {

  // ---- PV1: pivot --------------------------------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def pv1Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes) // explicit values: no inference scan
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes) // absent combos pivot to null; oracle FILTER counts give 0
      .orderBy(col("user_id"))

  private val pv1Sql =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- UN1: unpivot (melt) -----------------------------------------------
  private def un1Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity").cast("double"), col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total"))
      .orderBy(col("measure"))

  private val un1Sql =
    """SELECT measure, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM (
      |  SELECT l_orderkey, 'l_quantity' AS measure, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
      |GROUP BY measure ORDER BY measure""".stripMargin

  // ---- SCD1: type-2 history ----------------------------------------------
  // Treat each user's event stream as attribute changes: derive SCD2
  // validity intervals (valid_from, valid_to, is_current) with one
  // window pass — the standard dimension-history materialization.
  private def scd1Type2(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events")
      .filter(col("event_type").isin("signup", "purchase", "error"))
      .select(col("user_id"), col("event_id").as("version_id"),
        col("event_type").as("state"), col("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("valid_from"), col("version_id"))))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("user_id"), col("valid_from"), col("version_id"))
  }

  private val scd1Sql =
    """SELECT user_id, event_id AS version_id, event_type AS state,
      |  ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      |ORDER BY user_id, valid_from, version_id""".stripMargin

  // ---- CB1: CUBE ---------------------------------------------------------
  private def cb1Cube(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .cube(col("event_type"), date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("week").asc_nulls_first)

  private val cb1Sql =
    """SELECT event_type, date_trunc('week', ts) AS week, COUNT(*) AS n
      |FROM events
      |GROUP BY CUBE (event_type, date_trunc('week', ts))
      |ORDER BY event_type ASC NULLS FIRST, week ASC NULLS FIRST""".stripMargin

  // ---- RG1: trailing-window rolling aggregate ----------------------------
  // Daily revenue per user plus a trailing-7-day sum via an integer-day
  // RANGE frame — the frame is over VALUES (days), not rows, so sparse
  // activity windows are handled correctly.
  private def rg1Rolling(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("day_rev"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("rolling_7d", sum(col("day_rev")).over(w))
      .select(col("user_id"), col("day").cast("date").as("day"),
        col("day_rev").cast("decimal(18,2)").cast("double").as("day_rev"),
        col("rolling_7d").cast("decimal(18,2)").cast("double").as("rolling_7d"))
      .orderBy(col("user_id"), col("day"))
  }

  private val rg1Sql =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS day_rev,
      |    date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day_num
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id, date_trunc('day', ts))
      |SELECT user_id, CAST(day AS DATE) AS day,
      |  CAST(CAST(day_rev AS DECIMAL(18,2)) AS DOUBLE) AS day_rev,
      |  CAST(CAST(SUM(day_rev) OVER (PARTITION BY user_id ORDER BY day_num
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS rolling_7d
      |FROM daily ORDER BY user_id, day""".stripMargin

  // ---- NT1: ntile deciles ------------------------------------------------
  // Distributed exact NTILE (ops.Ranking): the naive
  // ntile(10).over(Window.orderBy(...)) would single-partition ALL
  // orders; Ranking range-partitions, ranks locally and bins by rank.
  private def nt1Ntile(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ranking.withNtile(
      Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      10, "decile", Seq(col("o_totalprice").asc, col("o_orderkey").asc))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("total"))
      .orderBy(col("decile"))

  private val nt1Sql =
    """SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM (SELECT o_totalprice,
      |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |      FROM orders)
      |GROUP BY decile ORDER BY decile""".stripMargin

  override def all: Seq[Q] = Seq(
    Q("rg1_rolling_7d", "trailing-7-day rolling revenue per user (integer-day RANGE frame)", rg1Rolling, Some(rg1Sql)),
    Q("nt1_ntile_deciles", "ntile decile stats over order totals", nt1Ntile, Some(nt1Sql)),
    Q("pv1_pivot", "pivot with explicit value list (single partial-agg shuffle, no inference scan)", pv1Pivot, Some(pv1Sql)),
    Q("un1_unpivot", "unpivot/melt of lineitem measures + per-measure rollup", un1Unpivot, Some(un1Sql)),
    Q("scd1_type2", "SCD type-2 validity intervals from an event stream (one window pass)", scd1Type2, Some(scd1Sql)),
    Q("cb1_cube", "CUBE grouping sets over event type x week", cb1Cube, Some(cb1Sql)))
}
