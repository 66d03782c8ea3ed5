package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics shapes over `events` plus fuzzy string matching:
  * funnel conversion, retention cohorts, edit-distance pairs.
  *
  * Scale: funnel and retention are per-user aggregations (one shuffle on
  * user_id, partial aggs) followed by tiny rollups; the edit-distance
  * pair scan bounds its quadratic core to an explicit id-range block —
  * the pattern for running an O(n²) verifier inside a blocking scheme.
  */
object Analytics extends QueryPack {

  // ---- FUN1: funnel conversion -------------------------------------------
  // signup -> later purchase, per user; one row of corpus-level funnel
  // stats. "Later" is strict: first purchase strictly after first
  // signup.
  private def fun1Funnel(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("first_signup").isNotNull, 1L).otherwise(0L)).as("n_signed_up"),
      sum(when(col("first_signup").isNotNull &&
        col("first_purchase") > col("first_signup"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("n_users"), col("n_signed_up"), col("n_converted"),
        graft.ops.TextAnalysis.round6(
          col("n_converted").cast("double") / col("n_signed_up")).as("conversion6"))
  }

  private val fun1Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
      |  CAST(SUM(CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  floor(CAST(SUM(CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
      |                 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END)
      |        * 1000000.0 + 0.5) / 1000000.0 AS conversion6
      |FROM u""".stripMargin

  // ---- RT1: retention cohorts --------------------------------------------
  // Cohort = week of a user's first event; cell = distinct users of that
  // cohort active in week_offset weeks after. Two shuffles (user rollup,
  // cohort-cell rollup), both with partial aggregation.
  private def rt1Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val rt1Sql =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('week', ts) AS week FROM events),
      |fw AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT ev.user_id) AS n_active
      |FROM ev JOIN fw ON ev.user_id = fw.user_id
      |GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  // ---- ED1: edit-distance pairs ------------------------------------------
  // Levenshtein over 32-char prefixes within an id-range block: the
  // bounded-block pattern for quadratic verifiers (both engines
  // implement the same unit-cost DP, so distances match exactly).
  private def ed1EditDistance(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), substring(col("text"), 1, 32).as("prefix"))
    val a = d.select(col("doc_id").as("id_a"), col("prefix").as("pa"))
    val b = d.select(col("doc_id").as("id_b"), col("prefix").as("pb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), levenshtein(col("pa"), col("pb")).as("dist"))
      .filter(col("dist") <= 10)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val ed1Sql =
    """WITH d AS (
      |  SELECT doc_id, substr(text, 1, 32) AS prefix FROM documents WHERE doc_id < 100)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  levenshtein(a.prefix, b.prefix) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.prefix, b.prefix) <= 10
      |ORDER BY id_a, id_b""".stripMargin

  // ---- RFM1: RFM segmentation --------------------------------------------
  // Recency/frequency/monetary quartiles per user (anchor = corpus max
  // ts so the result is re-runnable), combined into a 3-digit segment.
  // Global ntile windows are fine HERE because they run on the per-user
  // rollup (cardinality = users, not events); the event-level pass is
  // one partial-agg shuffle.
  private def rfm1Segments(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val anchor = ev.agg(max(col("ts")).as("amax"))
    val u = ev.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))).as("mon0"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        (unix_micros(col("amax")) - unix_micros(col("last_ts"))).as("rec_us"),
        col("freq"),
        coalesce(col("mon0"), lit(0).cast("decimal(18,2)")).as("mon"))
    import org.apache.spark.sql.expressions.Window
    val b = u.select(col("user_id"), col("mon"),
      ntile(4).over(Window.orderBy(col("rec_us"), col("user_id"))).as("r"),
      ntile(4).over(Window.orderBy(col("freq").desc, col("user_id"))).as("f"),
      ntile(4).over(Window.orderBy(col("mon").desc, col("user_id"))).as("m"))
    b.groupBy((col("r") * 100 + col("f") * 10 + col("m")).cast("long").as("segment"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("mon")).cast("decimal(18,2)").cast("double").as("total_monetary"))
      .orderBy(col("segment"))
  }

  private val rfm1Sql =
    """WITH anchor AS (SELECT MAX(ts) AS amax FROM events),
      |u AS (
      |  SELECT user_id,
      |    epoch_us((SELECT amax FROM anchor)) - epoch_us(MAX(ts)) AS rec_us,
      |    COUNT(*) AS freq,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(value AS DECIMAL(18,2)) END),
      |             CAST(0 AS DECIMAL(18,2))) AS mon
      |  FROM events GROUP BY user_id),
      |b AS (
      |  SELECT user_id, mon,
      |    ntile(4) OVER (ORDER BY rec_us, user_id) AS r,
      |    ntile(4) OVER (ORDER BY freq DESC, user_id) AS f,
      |    ntile(4) OVER (ORDER BY mon DESC, user_id) AS m
      |  FROM u)
      |SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment, COUNT(*) AS n_users,
      |  CAST(CAST(SUM(mon) AS DECIMAL(18,2)) AS DOUBLE) AS total_monetary
      |FROM b GROUP BY 1 ORDER BY segment""".stripMargin

  override def all: Seq[Q] = Seq(
    Q("rfm1_segments", "RFM quartile segmentation over the per-user rollup", rfm1Segments, Some(rfm1Sql)),
    Q("fun1_funnel", "signup->purchase funnel conversion stats", fun1Funnel, Some(fun1Sql)),
    Q("rt1_retention", "weekly retention cohorts (first-event week x offset)", rt1Retention, Some(rt1Sql)),
    Q("ed1_edit_distance", "Levenshtein near-pairs over prefixes in a bounded block", ed1EditDistance, Some(ed1Sql)))
}
