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

  // ---- FUN1/FUN2: funnel conversion --------------------------------------
  // fun1 is the fixed first-touch metric (UNCONDITIONAL first purchase
  // vs first signup — a user who purchased before signing up and again
  // after does NOT convert here); fun2 is the true N-step funnel via
  // ops.Analytics.funnelReached (chained strictly-later mins — that
  // same user DOES convert). Both semantics are real product metrics;
  // keeping both pins the distinction with oracles.
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
  // Through ops.Analytics.retentionCohorts (bucket = week). Two
  // shuffles (user rollup, cohort-cell rollup), both with partial
  // aggregation.
  private def rt1Retention(s: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.retentionCohorts(
      Tables.load(s, dir, "events"), "user_id", "ts", "week")
      .select(col("cohort").as("cohort_week"), col("offset").as("week_offset"),
        col("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))

  private def fun2Funnel3(s: SparkSession, dir: String): DataFrame =
    graft.ops.Analytics.funnelSummary(
      Tables.load(s, dir, "events"), "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))

  private val fun2Sql =
    """WITH u1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |u2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN u1 ON e.user_id = u1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY e.user_id),
      |u3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      |  JOIN u2 ON e.user_id = u2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY e.user_id)
      |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
      |  (SELECT COUNT(*) FROM u1) AS n_step1,
      |  (SELECT COUNT(*) FROM u2) AS n_step2,
      |  (SELECT COUNT(*) FROM u3) AS n_step3""".stripMargin

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

  // ---- ED1/ED2: blocked edit-distance pairs ------------------------------
  // Both run through ops.Dedup.editDistancePairs — the generalized
  // blocked fuzzy-match operator (block key + length band + threshold-
  // bounded DP). ed1 keeps the original single-block shape — plus ONE
  // planted near-pair (doc 0's prefix vs the same prefix shifted one
  // character, under id 1000000) so ed1 is self-sufficiently nonzero
  // at every SF rather than green-on-empty; ed2 plants the same trick
  // per-doc across 50 hash blocks, so it proves matching at volume.
  private def ed1EditDistance(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
    val planted = base.filter(col("doc_id") === 0)
      .select(lit(1000000L).as("doc_id"),
        substring(col("text"), 2, 32).as("text"))
    graft.ops.Dedup.editDistancePairs(
      base.select(col("doc_id"), col("text")).unionByName(planted),
      "doc_id", "text", blockCol = lit(0), maxLen = 32, maxDist = 10)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val ed1Sql =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |d AS (
      |  SELECT doc_id, substr(text, 1, 32) AS prefix FROM base
      |  UNION ALL
      |  SELECT 1000000 AS doc_id, substr(text, 2, 32) AS prefix
      |  FROM base WHERE doc_id = 0)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  levenshtein(a.prefix, b.prefix) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.prefix, b.prefix) <= 10
      |ORDER BY id_a, id_b""".stripMargin

  private def ed2NearStrings(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
    // planted near-pair per doc: prefix vs one-char-shifted prefix
    // (edit distance ≤ 2: delete the first char, append one) under id
    // + 1000000 — which lands in the same doc_id % 50 block
    val both = base.select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
      .unionByName(base.select((col("doc_id") + 1000000L).as("doc_id"),
        substring(col("text"), 2, 24).as("t")))
    graft.ops.Dedup.editDistancePairs(
      both, "doc_id", "t", blockCol = pmod(col("doc_id"), lit(50L)),
      maxLen = 24, maxDist = 3)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val ed2Sql =
    """WITH d AS (
      |  SELECT doc_id, substr(text, 1, 24) AS t FROM documents WHERE doc_id < 200
      |  UNION ALL
      |  SELECT doc_id + 1000000, substr(text, 2, 24) FROM documents WHERE doc_id < 200),
      |p AS (SELECT doc_id, doc_id % 50 AS blk, t FROM d)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
      |FROM p a JOIN p b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE abs(length(a.t) - length(b.t)) <= 3 AND levenshtein(a.t, b.t) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  // ---- SN1: sorted-neighborhood blocking ---------------------------------
  // Candidate pairs within a 5-record neighborhood of the corpus sorted
  // by a 12-char text prefix — the blocking scheme for fuzzy matching
  // without an equality key. The oracle restates it with a plain
  // ROW_NUMBER + inequality join (fine at oracle scale; the engine side
  // is the banded equi-join).
  private def sn1SortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.sortedNeighborhoodPairs(
      Tables.load(s, dir, "documents"), "doc_id",
      substring(col("text"), 1, 12), window = 5)
      .orderBy(col("id_a"), col("id_b"))

  private val sn1Sql =
    """WITH r AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY substr(text, 1, 12), doc_id) AS rk
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, b.rk - a.rk AS gap
      |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5
      |ORDER BY id_a, id_b""".stripMargin

  // ---- ER1: entity-resolution composition --------------------------------
  // The full fuzzy-match stack as ONE dataflow: sorted-neighborhood
  // blocking (distributed rank + banded equi-join) -> bounded-DP
  // Levenshtein verification on the candidates -> min-label connected
  // components as the canonical entity id. Every stage is an existing
  // operator (Dedup.sortedNeighborhoodPairs / levenshtein threshold /
  // Dedup.minLabelComponents) and the oracle restates each stage
  // independently — the composition proof, like cp1 for the curation
  // stack. Plan: one rank exchange + one bucket join + two id joins +
  // the label-prop iterations; nothing is O(n²).
  private def er1EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val recs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
    val cands = graft.ops.Dedup.sortedNeighborhoodPairs(
      recs, "doc_id", col("t"), window = 5)
    val ta = recs.select(col("doc_id").as("id_a"), col("t").as("ta"))
    val tb = recs.select(col("doc_id").as("id_b"), col("t").as("tb"))
    val pairs = cands.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .filter(abs(length(col("ta")) - length(col("tb"))) <= 5)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb"), 5).as("dist"))
      .filter(col("dist") >= 0) // threshold variant yields -1 above maxDist
    graft.ops.Dedup.minLabelComponents(pairs, recs, "doc_id")
      .orderBy(col("doc_id"))
  }

  private val er1Sql =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, substr(text, 1, 24) AS t FROM documents),
      |r AS (SELECT doc_id, t, ROW_NUMBER() OVER (ORDER BY t, doc_id) AS rk FROM d),
      |cands AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.t AS ta, b.t AS tb
      |  FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  WHERE abs(length(ta) - length(tb)) <= 5 AND levenshtein(ta, tb) <= 5),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
      |SELECT id AS doc_id, MIN(lbl) AS canonical_id
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  // ---- RFM1: RFM segmentation --------------------------------------------
  // Recency/frequency/monetary quartiles per user (anchor = corpus max
  // ts so the result is re-runnable), combined into a 3-digit segment.
  // The quartiles run on the per-user rollup (cardinality = users), but
  // at 100 TB "users" is billions of rows — so each quartile is a
  // distributed exact NTILE (ops.Ranking: range partition + local rank
  // + O(P) offset metadata), never a single-partition window.
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
    val b = graft.ops.Ranking.withNtile(
      graft.ops.Ranking.withNtile(
        graft.ops.Ranking.withNtile(
          u, 4, "r", Seq(col("rec_us").asc, col("user_id").asc)),
        4, "f", Seq(col("freq").desc, col("user_id").asc)),
      4, "m", Seq(col("mon").desc, col("user_id").asc))
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

  // ---- IA1: inter-arrival gaps via LAG (partitioned sequence window) -----
  // Time between consecutive events per user, rolled up per event type
  // of the LATER event — the LAG/sequence-delta window shape (§2.7
  // invariant: the window is user-partitioned, so partition size is
  // bounded by one user's history, never corpus-sized). Gap sums are
  // exact integer microseconds; the average divides two exactly-agreed
  // numbers, so no rounding step is needed.
  private def ia1InterArrival(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("event_type"), col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("gap_us")).cast("double") / count(lit(1)) / 1000000.0).as("avg_gap_s"),
        (max(col("gap_us")).cast("double") / 1000000.0).as("max_gap_s"))
      .orderBy(col("event_type"))
  }

  private val ia1Sql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_gaps,
      |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_gap_s,
      |  CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- LR1: per-group OLS trend (drift detection for monitoring) --------
  // Slope + Pearson correlation of event value vs time, per event
  // type. The six sufficient statistics are exact integer sums (days ×
  // fixed-point values) in ONE partial-aggregated shuffle; the closed
  // forms run in IEEE doubles over exactly-agreed operands, so the
  // oracle matches to the bit with no rounding step anywhere.
  private def lr1GroupTrend(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.groupRegression(Tables.load(s, dir, "events"),
        "event_type", "ts", "value")
      .orderBy(col("event_type"))

  private val lr1Sql =
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
      |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS y
      |  FROM events),
      |s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM q GROUP BY event_type)
      |SELECT event_type, n,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0 THEN 0.0
      |       ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |            / 1000.0 END AS slope_per_day,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
      |         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0.0 THEN 0.0
      |       ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |            / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS corr
      |FROM s ORDER BY event_type""".stripMargin

  // ---- PA1: top event paths (sequence mining) ---------------------------
  // Per-user time-ordered event TRIPLES via two LEADs over the bounded
  // user-partitioned window, rolled up globally — no self-joins, no
  // per-user collect. (ts, event_id) tie-break keeps the sequence
  // engine-deterministic under equal timestamps.
  private def pa1TopPaths(s: SparkSession, dir: String) =
    graft.ops.Analytics.topEventPaths(Tables.load(s, dir, "events"),
      "user_id", "event_type", "ts", "event_id", k = 15)

  private val pa1Sql =
    """WITH seq AS (
      |  SELECT event_type AS s1,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT s1 || '>' || s2 || '>' || s3 AS path, COUNT(*) AS n
      |FROM seq WHERE s3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin

  // ---- MK1: Markov event-transition matrix --------------------------------
  // One per-user lead window (data-sized, partitioned) onto the
  // |types|² transition table; normalization runs on the tiny table.
  private def mk1Markov(s: SparkSession, dir: String) =
    graft.ops.Analytics.markovTransitions(Tables.load(s, dir, "events"),
      "user_id", "event_type", "ts", "event_id")

  private val mk1Sql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |trans AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, SUM(n) AS row_n FROM trans GROUP BY 1)
      |SELECT trans.from_type, to_type, n,
      |  floor(CAST(n AS DOUBLE) / row_n * 1000000.0 + 0.5) / 1000000.0 AS p6
      |FROM trans JOIN tot ON trans.from_type = tot.from_type
      |ORDER BY trans.from_type, to_type""".stripMargin

  // ---- AT1: last-touch conversion attribution -----------------------------
  // Purchases attribute to the user's LAST click/view strictly before
  // them (30-day lookback; misses stay visible as '(none)'). One
  // user-partitioned window pass — never the conversion×touch
  // self-join. Value mass sums as exact integer cents.
  private def at1Attribution(s: SparkSession, dir: String) =
    graft.ops.Analytics.attribution(Tables.load(s, dir, "events"),
      "user_id", "event_type", "ts", "event_id", "value",
      touchTypes = Seq("click", "view"), convType = "purchase")

  private val at1Sql =
    """WITH w AS (
      |  SELECT event_type, ts, value,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |        THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
      |    last_value(CASE WHEN event_type IN ('click', 'view')
      |        THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
      |  FROM events),
      |c AS (
      |  SELECT CASE WHEN touch_us >= epoch_us(ts) - 2592000000000
      |           THEN touch_type ELSE NULL END AS picked, value
      |  FROM w WHERE event_type = 'purchase')
      |SELECT COALESCE(picked, '(none)') AS channel,
      |  COUNT(*) AS n_conversions,
      |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS attributed_value
      |FROM c GROUP BY 1 ORDER BY channel""".stripMargin

  // ---- CS1: chi-square independence screen -------------------------------
  // ONE data-sized groupBy builds the contingency cells; marginals,
  // totals, and dof all derive from the tiny cell table. Each term
  // quantizes to millionths BEFORE the sum, so the float statistic is
  // engine-exact.
  private def cs1ChiSquare(s: SparkSession, dir: String) =
    graft.ops.Stats.chiSquareIndependence(Tables.load(s, dir, "events"),
      col("event_type"), pmod(col("user_id"), lit(4)))

  private val cs1Sql =
    """WITH cells AS (
      |  SELECT event_type AS a, user_id % 4 AS b, COUNT(*) AS o
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY 1, 2),
      |rt AS (SELECT a, SUM(o) AS rt FROM cells GROUP BY a),
      |ct AS (SELECT b, SUM(o) AS ct FROM cells GROUP BY b),
      |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ra,
      |        COUNT(DISTINCT b) AS cb FROM cells),
      |filled AS (
      |  SELECT rt.a, ct.b, rt.rt, ct.ct, COALESCE(cells.o, 0) AS o
      |  FROM rt CROSS JOIN ct LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
      |terms AS (
      |  SELECT n, (ra - 1) * (cb - 1) AS dof,
      |    CAST(floor((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
      |      * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
      |      * 1000000.0 + 0.5) AS BIGINT) AS qterm
      |  FROM filled CROSS JOIN tot)
      |SELECT CAST(n AS BIGINT) AS n_rows, CAST(dof AS BIGINT) AS dof,
      |  CAST(SUM(qterm) AS DOUBLE) / 1000000.0 AS chi2
      |FROM terms GROUP BY n, dof""".stripMargin

  // ---- CUS1: CUSUM drift detection ---------------------------------------
  // Page's cumulative-sum change-point monitor per event type, the
  // recursion S_i = max(0, S_{i-1} + (x_i - k)) unrolled into two
  // ordered window passes (prefix sum − running prefix min) — see
  // ops.Stats.cusumDrift for why the arithmetic must be fixed-point
  // decimal(38,0) (Spark's sequential window accumulation vs DuckDB's segment
  // tree would hash-differ on a raw-double cumsum). k = mean + 25
  // (≈ σ/2), h = 250 (≈ 5σ) for the events value distribution.
  private def cus1Cusum(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cusumDrift(Tables.load(s, dir, "events"),
        "event_type", "value", Seq("ts", "event_id"),
        allowance = 25.0, h = 250.0)
      .orderBy(col("event_type"))

  private val cus1Sql =
    """WITH base AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS qv
      |  FROM events),
      |m AS (
      |  SELECT event_type,
      |    CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS mean_q
      |  FROM base GROUP BY 1),
      |d AS (
      |  SELECT base.event_type, ts, event_id, qv - mean_q - 25000000 AS dev
      |  FROM base JOIN m USING (event_type)),
      |cum AS (
      |  SELECT event_type, ts, event_id,
      |    SUM(dev) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS cv
      |  FROM d),
      |stat AS (
      |  SELECT event_type,
      |    cv - least(0, MIN(cv) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING)) AS sv
      |  FROM cum)
      |SELECT event_type, COUNT(*) AS n_points,
      |  COUNT(CASE WHEN sv > 250000000 THEN 1 END) AS n_alarms,
      |  CAST(MAX(sv) AS DOUBLE) / 1000000.0 AS max_s
      |FROM stat GROUP BY event_type ORDER BY event_type""".stripMargin

  override def all: Seq[Q] = Seq(
    Q("cus1_cusum_drift", "CUSUM change-point monitor per event type (fixed-point prefix-sum identity, alarm count + max statistic)", cus1Cusum, Some(cus1Sql)),
    Q("cs1_chi_square", "chi-square independence test over a contingency table (fixed-point exact terms)", cs1ChiSquare, Some(cs1Sql)),
    Q("pa1_event_paths", "top-k 3-step user event paths (sequence mining via bounded user windows)", pa1TopPaths, Some(pa1Sql)),
    Q("mk1_markov_transitions", "first-order Markov event-transition matrix with row-normalized probabilities", mk1Markov, Some(mk1Sql)),
    Q("at1_attribution", "last-touch conversion attribution with 30-day lookback; unattributed mass stays visible as (none)", at1Attribution, Some(at1Sql)),
    Q("lr1_group_trend", "per-group OLS slope + Pearson corr from exact integer moments", lr1GroupTrend, Some(lr1Sql)),
    Q("ia1_inter_arrival", "per-user LAG inter-arrival gaps rolled up by event type", ia1InterArrival, Some(ia1Sql)),
    Q("rfm1_segments", "RFM quartile segmentation over the per-user rollup", rfm1Segments, Some(rfm1Sql)),
    Q("fun1_funnel", "signup->purchase funnel conversion stats", fun1Funnel, Some(fun1Sql)),
    Q("fun2_funnel3", "3-step strict-order funnel (signup->click->purchase)", fun2Funnel3, Some(fun2Sql)),
    Q("rt1_retention", "weekly retention cohorts (first-event week x offset)", rt1Retention, Some(rt1Sql)),
    Q("ed1_edit_distance", "Levenshtein near-pairs over prefixes in a bounded block", ed1EditDistance, Some(ed1Sql)),
    Q("ed2_near_strings", "blocked fuzzy-match operator with planted near-pairs (nonzero matches)", ed2NearStrings, Some(ed2Sql)),
    Q("sn1_sorted_neighborhood", "sorted-neighborhood blocking pairs (banded rank join)", sn1SortedNeighborhood, Some(sn1Sql)),
    Q("er1_entity_resolution", "entity resolution: SN blocking -> bounded Levenshtein -> components", er1EntityResolution, Some(er1Sql)))
}
