package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query inventory — SURVEY.md §2.2–§2.7 re-expressed over the
  * driver's TPC-H-ish testdata.
  *
  * The reference's inspection/monitoring surface
  * (`poc/.../SimulatorController.java`, `CdcMonitoringService.java`) and the
  * PL/SQL worker predicates are all plain projections / filters / hash
  * aggregations / top-K / UNION ALL — everything here stays inside Spark
  * built-ins so Catalyst gets pushdown, pruning and whole-stage codegen.
  * At 100 TB the relevant plans are: aggregations use partial (map-side)
  * aggregation; top-K compiles to `TakeOrderedAndProject` (no full sort);
  * the one dimension join is a broadcast hash join.
  */
object Relational extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---- A1/A5-ish flagship aggregation (pricing summary, TPC-H Q1 shape) --
  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- multi-join aggregation (bench headline; exercises J-strategy) -----
  private def q3RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val nat = Tables.load(s, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val q3Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---- TPC-H Q5 shape: 6-table join with a co-location predicate ---------
  // Local-supplier volume: revenue per nation where the customer and
  // the line's supplier share a nation, restricted to one region and a
  // date year. The join-order / strategy workout: two broadcast dims
  // (nation, region), customer and supplier as build sides against the
  // fact chain, plus the c_nationkey = s_nationkey co-location filter
  // that only applies AFTER both sides are joined in.
  private def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---- TPC-H Q6 shape: pure filter + scalar aggregate --------------------
  // The pushdown workout: every predicate must reach the parquet scan
  // (shipdate range, discount band, quantity cap), leaving a map-side
  // partial sum and a 1-row exchange.
  private def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---- TPC-H Q14 shape: conditional aggregate over a fact-dim join -------
  private def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
    val part = Tables.load(s, dir, "part")
    val disc = dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), disc)
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("promo_revenue"),
        sum(disc).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        graft.ops.TextAnalysis.round6(
          col("promo_revenue") / col("total_revenue")).as("promo_share6"))
  }

  private val q14Sql =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      |  floor(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |      * 1000000.0 + 0.5) / 1000000.0 AS promo_share6
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'""".stripMargin

  // ---- FO1: full-outer snapshot reconciliation ---------------------------
  // The diff-two-snapshots shape (which keys exist only on one side,
  // which changed): customers with orders in two adjacent years, FULL
  // OUTER joined per customer, classified left-only / right-only /
  // both. One shuffle per side's rollup + the outer join's exchange.
  private def fo1FullOuterReconcile(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    def yearly(y: Int, n: String) = ord
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as(n))
    yearly(1995, "n_a").join(yearly(1996, "n_b"), Seq("o_custkey"), "full_outer")
      .select(when(col("n_a").isNotNull && col("n_b").isNotNull, "both")
        .when(col("n_a").isNotNull, "left_only").otherwise("right_only").as("presence"))
      .groupBy(col("presence")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("presence"))
  }

  private val fo1Sql =
    """WITH a AS (
      |  SELECT o_custkey, COUNT(*) AS n_a FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00' GROUP BY o_custkey),
      |b AS (
      |  SELECT o_custkey, COUNT(*) AS n_b FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00' GROUP BY o_custkey)
      |SELECT CASE WHEN n_a IS NOT NULL AND n_b IS NOT NULL THEN 'both'
      |            WHEN n_a IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS presence,
      |  COUNT(*) AS n_customers
      |FROM a FULL OUTER JOIN b USING (o_custkey)
      |GROUP BY 1 ORDER BY presence""".stripMargin

  // ---- WF1: ranking window-function family --------------------------------
  // dense_rank / percent_rank / cume_dist per status over order totals
  // (top 3 per status via row_number to bound output). All windows are
  // PARTITIONED (by status) — the ratio functions are int-ratio doubles
  // rounded through rule-7 so ranks hash-match across engines.
  private def wf1RankFunctions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        dense_rank().over(w).cast("long").as("drank"),
        graft.ops.TextAnalysis.round6(percent_rank().over(w)).as("prank6"),
        graft.ops.TextAnalysis.round6(cume_dist().over(w)).as("cdist6"))
      .filter(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("drank"), col("prank6"), col("cdist6"))
      .orderBy(col("o_orderstatus"), col("rn"))
  }

  private val wf1Sql =
    """SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey,
      |  CAST(drank AS BIGINT) AS drank,
      |  floor(prank * 1000000.0 + 0.5) / 1000000.0 AS prank6,
      |  floor(cdist * 1000000.0 + 0.5) / 1000000.0 AS cdist6
      |FROM (
      |  SELECT o_orderstatus, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS drank,
      |    PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS prank,
      |    CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS cdist
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin

  // ---- SO1: INTERSECT / EXCEPT set operators ------------------------------
  // The reference never uses set ops (SURVEY §2.6 notes UNION ALL only);
  // a complete engine still needs them. Set semantics = distinct — both
  // engines agree; the output is the three set-relation cardinalities
  // over adjacent-year customer key sets.
  private def so1SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    def keys(y: Int) = ord
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val a = keys(1995)
    val b = keys(1996)
    val rows = Seq(
      ("intersect", a.intersect(b)), ("a_except_b", a.except(b)),
      ("b_except_a", b.except(a)))
    rows.map { case (nm, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(nm).as("set_op"), col("n"))
    }.reduce(_ unionByName _).orderBy(col("set_op"))
  }

  private val so1Sql =
    """WITH a AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      |b AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      |SELECT 'intersect' AS set_op,
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS n
      |UNION ALL SELECT 'a_except_b',
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b))
      |UNION ALL SELECT 'b_except_a',
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a))
      |ORDER BY set_op""".stripMargin

  // ---- O1: ordered page (`ORDER BY pk FETCH FIRST 20`) -------------------
  // Ref: SimulatorController.java:92-96. Spark plans TakeOrderedAndProject.
  private def o1OrderedPage(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(20)

  private val o1Sql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders ORDER BY o_orderkey LIMIT 20""".stripMargin

  // ---- O2: reverse-chron top-K (`ORDER BY seq DESC FETCH FIRST 50`) ------
  // Ref: SimulatorController.java:133-137.
  private def o2RecentTopk(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(50)

  private val o2Sql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
      |FROM events ORDER BY ts DESC, event_id DESC LIMIT 50""".stripMargin

  // ---- O3: two-source merge + re-sort + cap (UNION ALL) ------------------
  // Ref: SimulatorController.java:214-246 (ASIS log ∪ TOBE log, re-sorted).
  private def o3UnionMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val asis = ev.filter(col("user_id") % 2 === 0).withColumn("source_db", lit("ASIS"))
    val tobe = ev.filter(col("user_id") % 2 === 1).withColumn("source_db", lit("TOBE"))
    asis.unionByName(tobe)
      .select(col("source_db"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts").desc_nulls_last, col("event_id").desc)
      .limit(50)
  }

  private val o3Sql =
    """SELECT source_db, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
      |  SELECT 'ASIS' AS source_db, event_id, ts, event_type FROM events WHERE user_id % 2 = 0
      |  UNION ALL
      |  SELECT 'TOBE' AS source_db, event_id, ts, event_type FROM events WHERE user_id % 2 = 1
      |) ORDER BY ts DESC NULLS LAST, event_id DESC LIMIT 50""".stripMargin

  // ---- A1/A2: global counters + derived success rate ---------------------
  // Ref: CdcMonitoringService.java:33-36,120-122 ('error' events = failures).
  private def a1GlobalCounters(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .agg(
        count(lit(1)).as("total_received"),
        count(when(col("event_type") =!= "error", 1)).as("total_success"),
        count(when(col("event_type") === "error", 1)).as("total_failed"))
      .withColumn("success_rate",
        when(col("total_received") > 0,
          round(col("total_success").cast("double") / col("total_received") * 100, 2))
          .otherwise(lit(0.0)))

  private val a1Sql =
    """SELECT COUNT(*) AS total_received,
      |  COUNT(CASE WHEN event_type <> 'error' THEN 1 END) AS total_success,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS total_failed,
      |  CASE WHEN COUNT(*) > 0
      |       THEN ROUND(CAST(COUNT(CASE WHEN event_type <> 'error' THEN 1 END) AS DOUBLE) / COUNT(*) * 100, 2)
      |       ELSE 0.0 END AS success_rate
      |FROM events""".stripMargin

  // ---- A3: per-topic group stats -----------------------------------------
  // Ref: CdcMonitoringService.java:39,155-157 (Map[topic → TableStats]).
  private def a3TopicStats(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("received"),
        count(when(col("value") >= 100, 1)).as("high_value"),
        max(col("ts")).as("last_event_ts"),
        min(col("ts")).as("first_event_ts"))
      .orderBy(col("event_type"))

  private val a3Sql =
    """SELECT event_type, COUNT(*) AS received,
      |  COUNT(CASE WHEN value >= 100 THEN 1 END) AS high_value,
      |  CAST(MAX(ts) AS TIMESTAMP) AS last_event_ts,
      |  CAST(MIN(ts) AS TIMESTAMP) AS first_event_ts
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- A5: status breakdown (GROUP BY + COUNT after LIKE filter) ---------
  // Ref: SimulatorController.java:269-288.
  private def a5StatusBreakdown(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus"))

  private val a5Sql =
    """SELECT o_orderstatus, COUNT(*) AS cnt
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- A6: MAX/MIN scalar lookups (PK autogen / update / delete targets) -
  // Ref: SimulatorController.java:337-340,420-425,498-510.
  private def a6MinmaxPk(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .agg(
        (coalesce(max(col("o_orderkey")), lit(0L)) + 1).as("next_pk"),
        min(col("o_orderkey")).as("min_pk"),
        max(when(col("o_orderkey") > 3, col("o_orderkey"))).as("delete_target_pk"))

  private val a6Sql =
    """SELECT COALESCE(MAX(o_orderkey), 0) + 1 AS next_pk,
      |  MIN(o_orderkey) AS min_pk,
      |  MAX(CASE WHEN o_orderkey > 3 THEN o_orderkey END) AS delete_target_pk
      |FROM orders""".stripMargin

  // ---- A7: dup-hash diagnostics (GROUP BY hash HAVING COUNT>1) -----------
  // Ref: docs/04-운영/04_트러블슈팅.md:330-335.
  private def a7DupHash(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(sha2(concat_ws("|", col("user_id").cast("string"), col("event_type")), 256).as("change_hash"))
      .groupBy(col("change_hash"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy(col("change_hash"))

  private val a7Sql =
    """SELECT change_hash, COUNT(*) AS cnt FROM (
      |  SELECT sha256(concat_ws('|', CAST(user_id AS VARCHAR), event_type)) AS change_hash FROM events
      |) GROUP BY change_hash HAVING COUNT(*) > 1 ORDER BY change_hash""".stripMargin

  // ---- A8: per-table count union (sample-data verification) --------------
  // Ref: asis-oracle/init/05_insert_sample_data.sql:38-44.
  private def a8CountUnion(s: SparkSession, dir: String): DataFrame = {
    val parts = Seq("orders", "lineitem", "customer", "events").map { n =>
      Tables.load(s, dir, n).agg(count(lit(1)).as("cnt")).withColumn("table_name", lit(n))
    }
    parts.reduce(_ unionByName _).select(col("table_name"), col("cnt")).orderBy(col("table_name"))
  }

  private val a8Sql =
    """SELECT table_name, cnt FROM (
      |  SELECT 'orders' AS table_name, COUNT(*) AS cnt FROM orders
      |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      |  UNION ALL SELECT 'customer', COUNT(*) FROM customer
      |  UNION ALL SELECT 'events', COUNT(*) FROM events
      |) ORDER BY table_name""".stripMargin

  // ---- P14: LIKE filter ---------------------------------------------------
  // Ref: SimulatorController.java:209-211 (`UPPER(col) LIKE '%x%'`).
  private def p14LikeFilter(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(upper(col("text")).like("%MERGE%"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val p14Sql =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE UPPER(text) LIKE '%MERGE%' ORDER BY doc_id""".stripMargin

  // ---- P15: time-window predicate (dedup lookback) ------------------------
  // Ref: asis…04_create_procedures.sql:37-42 (`> SYSTIMESTAMP - 5 min`);
  // anchored to max(ts) for determinism. The scalar max is a broadcast-able
  // single-row aggregate, not a driver-side collect.
  private def p15TimeWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts") > col("max_ts") - expr("INTERVAL 60 MINUTES"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  private val p15Sql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
      |FROM events
      |WHERE ts > (SELECT MAX(ts) FROM events) - INTERVAL 60 MINUTE
      |ORDER BY event_id""".stripMargin

  // ---- J1: code-map dimension lookup with pass-through fallback ----------
  // Ref: FN_CONVERT_CODE, asis…03_create_mapping_tables.sql:40-59. The dim
  // is broadcast (≤ 25 rows), fallback = COALESCE(target, source) exactly as
  // the PL/SQL NO_DATA_FOUND branch passes the source value through.
  private def j1CodeLookup(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation").filter(col("n_nationkey") < 20)
    cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("n_name"), col("c_nationkey").cast("string")).as("nation_name"))
      .orderBy(col("c_custkey"))
  }

  private val j1Sql =
    """SELECT c_custkey,
      |  COALESCE(n_name, CAST(c_nationkey AS VARCHAR)) AS nation_name
      |FROM customer
      |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
      |  ON c_nationkey = n_nationkey
      |ORDER BY c_custkey""".stripMargin

  // ---- J2: dedup anti-lookup (left-anti join vs processed state) ---------
  // Ref: FN_IS_LOOP, asis…04:31-44 — "not seen before" as an anti join.
  private def j2AntiLookup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val processed = ev
      .filter(col("event_type") === "signup" && col("ts") < lit("2024-01-03").cast("timestamp"))
      .select(col("user_id")).distinct()
    ev.join(processed, Seq("user_id"), "left_anti")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  private val j2Sql =
    """SELECT event_id, user_id, event_type FROM events e
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM events s
      |  WHERE s.event_type = 'signup' AND s.ts < TIMESTAMP '2024-01-03 00:00:00'
      |    AND s.user_id = e.user_id)
      |ORDER BY event_id""".stripMargin

  // ---- W1: recent-N ring buffer per key (A4 as a window function) --------
  // Ref: CdcMonitoringService.java:41-47,159-171 (newest-first bounded list).
  private def w1RingBuffer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("rn"), col("event_id"), col("ts"))
      .orderBy(col("event_type"), col("rn"))
  }

  private val w1Sql =
    """SELECT event_type, rn, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
      |  SELECT event_type, event_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin

  // ---- W2: last-write-wins conflict resolution per key -------------------
  // Ref: docs/02-설계/04_충돌_정책.md:16-24 (documented LWW policy).
  private def w2LastWriteWins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("ts").as("last_ts"))
      .orderBy(col("user_id"))
  }

  private val w2Sql =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  CAST(ts AS TIMESTAMP) AS last_ts FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- Q4 shape: EXISTS semi-join with a cross-table predicate -----------
  // Orders having at least one line shipped >60 days after the order
  // date, counted by priority — the TPC-H Q4 plan shape (fact⋈fact
  // LEFT SEMI on the key plus a non-key condition; Spark keeps the scan
  // pruned to the three columns the condition needs, and the semi join
  // stops probing an order on its first late line).
  private def q4LateSemi(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > date_add(o("o_orderdate"), 60),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- Q21 shape: semi + anti self-join chain over the fact --------------
  // Suppliers who were the SOLE returning supplier on a multi-supplier
  // order — TPC-H Q21's plan shape: a shuffled LEFT ANTI self-join on
  // the fact (no other supplier returned on the order) composed with a
  // LEFT SEMI against an aggregated derivation (order has >1 supplier),
  // then a broadcast dim join and a total-order top-K. The anti/semi
  // pair shuffles ONCE each on l_orderkey; nothing is O(n²).
  private def q21SoleReturns(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val multi = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .filter(col("n_supp") > 1).select(col("l_orderkey"))
    val sole = returned.as("a").join(returned.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"),
        "left_anti")
      .join(multi, Seq("l_orderkey"), "left_semi")
    sole.join(broadcast(Tables.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n_sole_return_orders"))
      .orderBy(col("n_sole_return_orders").desc, col("s_name"))
      .limit(20)
  }

  private val q21Sql =
    """WITH returned AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
      |multi AS (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING COUNT(DISTINCT l_suppkey) > 1),
      |sole AS (
      |  SELECT a.l_orderkey, a.l_suppkey FROM returned a
      |  WHERE NOT EXISTS (SELECT 1 FROM returned b
      |                    WHERE b.l_orderkey = a.l_orderkey
      |                      AND b.l_suppkey <> a.l_suppkey)
      |    AND EXISTS (SELECT 1 FROM multi m WHERE m.l_orderkey = a.l_orderkey))
      |SELECT s_name, COUNT(*) AS n_sole_return_orders
      |FROM sole JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY n_sole_return_orders DESC, s_name LIMIT 20""".stripMargin

  // ---- Q18 shape: large-order customers (join + HAVING + top-K) ----------
  private def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
    val cust = Tables.load(s, dir, "customer")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 150)
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty FROM (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150) big
      |JOIN orders   ON big.l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin

  // ---- distinct aggregation ---------------------------------------------
  private def cd1DistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  private val cd1Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- percentiles (exact, interpolated) ---------------------------------
  private def pc1ValuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy(col("event_type"))

  private val pc1Sql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- rollup ------------------------------------------------------------
  private def gs1Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val gs1Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- TPC-H Q7 shape: nation-pair volume shipping -----------------------
  // Revenue between two trading nations, by (supplier nation, customer
  // nation, ship year). Both nation dims come in pre-filtered to the
  // two partners and broadcast, so the fact chain carries ONE shuffle
  // per big join and the n1<->n2 pair predicate prunes at the dims —
  // the plan the classic query exists to exercise.
  private def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val partners = Seq("NATION_1", "NATION_2")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val ord = Tables.load(s, dir, "orders")
    val cust = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val n1 = Tables.load(s, dir, "nation").filter(col("n_name").isin(partners: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(s, dir, "nation").filter(col("n_name").isin(partners: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), cust("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      |    AND n2.n_name IN ('NATION_1', 'NATION_2')
      |    AND n1.n_name <> n2.n_name
      |    AND l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---- TPC-H Q10 shape: returned-item top customers ----------------------
  // Revenue lost to returns in one quarter, per customer, top 20. The
  // deterministic cut needs the c_custkey tiebreak in BOTH engines;
  // the rank itself is a TakeOrderedAndProject, not a window.
  private def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---- TPC-H Q13 shape: customer order-count distribution ----------------
  // LEFT join with an ON-clause filter (orders dropped by the predicate
  // must NOT drop the customer), two stacked aggregations. The join
  // keeps customers with zero orders — the semantics an inner join
  // silently gets wrong.
  private def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    val perCust = cust.join(ord,
        cust("c_custkey") === ord("o_custkey") &&
          ord("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- TPC-H Q19 shape: OR-of-ANDs bracket predicate ---------------------
  // Three (brand, size band, quantity band) brackets OR'd over the
  // part-lineitem join. The part side prunes to the three brands
  // BEFORE the join (the disjunction's common p_brand IN (...) factor
  // is pushed down), so the join build side is small and broadcast;
  // the residual bracket predicate evaluates post-join in codegen.
  private def q19BracketRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    val bracket =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(bracket)
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---- TPC-H Q17 shape: correlated scalar-subquery guard -----------------
  // Revenue from small-quantity orders of one brand, where "small" is
  // defined *per part* by a correlated scalar subquery (0.2 × that
  // part's average quantity). Deliberately written as SQL — the point
  // of this query is Catalyst's subquery decorrelation: the correlated
  // aggregate must rewrite to an aggregate + equi-join on l_partkey
  // (one extra shuffle over the fact), never a per-outer-row subquery
  // re-execution. PlanShapeSpec pins the executed plan subquery-free.
  // l_quantity is integer-valued in the testdata, so the double AVG is
  // order-independent (exact integer sums < 2^53) and the 0.2×avg
  // threshold is bit-identical in Spark and the DuckDB oracle.
  private val q17Sql =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1' AND p_size <= 15
      |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q17Sql)
  }

  // ---- TPC-H Q20 shape: nested semi over a correlated aggregate ----------
  // Suppliers (in a nation set) who shipped an outlier-quantity line of
  // a name-matched part, "outlier" again defined per part by a
  // correlated aggregate. Two nested IN-subqueries + one correlated
  // scalar: Catalyst must decorrelate the scalar into an aggregate
  // join and plan both INs as LeftSemi joins — the whole WHERE clause
  // becomes three keyed joins over one fact scan pair. PlanShapeSpec
  // pins semi joins present and subquery/nested-loop absent.
  private val q20Sql =
    """SELECT s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l1.l_suppkey FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l1.l_quantity > (SELECT 1.9 * AVG(l2.l_quantity)
      |                         FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
      |  AND s_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
      |ORDER BY s_name""".stripMargin

  private def q20PartSuppliers(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part", "supplier", "nation").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q20Sql)
  }

  // ---- TPC-H Q2 shape: minimum-cost supplier (correlated scalar MIN) -----
  // For a part slice, the supplier(s) offering the region-wide minimum
  // price, "minimum" defined per part by a correlated scalar subquery
  // over the same cost relation (lineitem aggregated to (part, supp)
  // stands in for partsupp, absent from the testdata). Written as SQL so
  // Catalyst's decorrelation runs: the correlated MIN must plan as an
  // aggregate + equi-join on p_partkey, re-using one cost-relation scan
  // pair — never a per-outer-row re-execution (PlanShapeSpec pins it).
  // MIN of a raw DOUBLE column involves no arithmetic, so the equality
  // against the subquery is engine-exact.
  private val q2Sql =
    """WITH cost AS (
      |  SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey, MIN(l_extendedprice) AS min_price
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_price
      |FROM part
      |JOIN cost ON p_partkey = c_partkey
      |JOIN supplier ON s_suppkey = c_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10
      |  AND min_price = (SELECT MIN(c2.min_price)
      |                   FROM cost c2
      |                   JOIN supplier s2 ON s2.s_suppkey = c2.c_suppkey
      |                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |                   WHERE r2.r_name = 'EUROPE' AND c2.c_partkey = p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  private def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part", "supplier", "nation", "region").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q2Sql)
  }

  // ---- TPC-H Q8 shape: national market share -------------------------------
  // Two-level conditional aggregation over the full 7-relation join:
  // one nation's share of regional order volume per order year. Both
  // dimension chains (customer→nation→region gate, supplier→nation
  // label) broadcast; the fact chain shuffles once on the join keys and
  // the share is a ratio of two decimal-exact sums per year group.
  private def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val prt = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val natC = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val reg = Tables.load(s, dir, "region").filter(col("r_name") === "AMERICA")
    val natS = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = dec2(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount")))
    li.join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(natC), cust("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("cn_region") === reg("r_regionkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(natS), sup("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", vol)
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("nation_volume"),
        sum(vol).cast("double").as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n2.n_name AS supp_nation,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---- TPC-H Q9 shape: product-type profit by nation and year -------------
  // Profit = discounted revenue minus a cost term (retail price × qty —
  // p_retailprice stands in for ps_supplycost). All arithmetic stays in
  // DECIMAL so the per-(nation, year) sums are exact; the part-name
  // LIKE filter prunes the fact through the broadcast part dim.
  private def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
    val sup = Tables.load(s, dir, "supplier")
    val prt = Tables.load(s, dir, "part").filter(col("p_name").like("%red%"))
    val nat = Tables.load(s, dir, "nation")
    val amount = dec2(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))) -
      dec2(col("p_retailprice")) * dec2(col("l_quantity"))
    li.join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  // ---- TPC-H Q11 shape: important stock (HAVING vs global scalar) ---------
  // Per-part value from one nation's suppliers, kept only where it
  // exceeds a fraction of the nation-wide total — the GROUP BY +
  // HAVING > uncorrelated-scalar-subquery shape. The scalar executes
  // once (not per group); both sides re-aggregate the same decimal-
  // exact sum so the threshold compare is deterministic.
  private val q11Sql =
    """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS part_value
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.001
      |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      |   WHERE n_name = 'NATION_3')
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  private def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "supplier", "nation").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q11Sql)
  }

  // ---- TPC-H Q12 shape: priority split by category --------------------------
  // Conditional counts over the order-line join with a cross-table
  // lateness predicate (shipped ≥ 30 days after the order date —
  // l_shipmode/commitdate don't exist in the testdata, l_returnflag
  // carries the category role). The predicate can't push below the
  // join — it references both sides — so the shape exercises
  // post-join filtering ahead of a small hash aggregate.
  private def q12PrioritySplit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val ord = Tables.load(s, dir, "orders")
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- TPC-H Q15 shape: top supplier (scalar MAX over an agg view) --------
  // A revenue view per supplier for one quarter, then the supplier(s)
  // whose revenue equals the view's MAX — the classic "view + scalar
  // subquery over the same view" shape. The view materializes once and
  // feeds both the join and the scalar; the equality is over the
  // identical decimal-exact sum, so it's engine-deterministic.
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "supplier").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q15Sql)
  }

  // ---- TPC-H Q16 shape: supplier count by part attrs, exclusion list ------
  // COUNT(DISTINCT supplier) per part attribute triple, after dropping
  // an exclusion list of suppliers (negative-balance stand-in for the
  // comment filter) via LEFT ANTI join — the relational NOT IN with
  // non-null keys. Part attribute filters ride the broadcast dim.
  private def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val prt = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    val excl = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") < 100).select(col("s_suppkey"))
    li.join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
      .join(excl, li("l_suppkey") === excl("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---- TPC-H Q22 shape: global-avg guard + NOT EXISTS anti ----------------
  // Idle high-balance customers: balance above the (uncorrelated
  // scalar) positive-balance average in a segment set, with no recent
  // orders (correlated NOT EXISTS — must plan as a LEFT ANTI join,
  // pinned). c_mktsegment carries Q22's country-code role. AVG is
  // decimal-exact SUM / COUNT so the guard threshold is deterministic.
  private val q22Sql =
    """SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('MACHINERY', 'HOUSEHOLD', 'BUILDING')
      |  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0
      |                     AND c_mktsegment IN ('MACHINERY', 'HOUSEHOLD', 'BUILDING'))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n))
    s.sql(q22Sql)
  }

  override val all: Seq[Q] = Seq(
    Q("q2_min_cost_supplier", "correlated scalar MIN over a cost relation, decorrelated (TPC-H Q2 shape)", q2MinCostSupplier, Some(q2Sql)),
    Q("q8_market_share", "national market share: conditional ratio over 7-relation join (TPC-H Q8 shape)", q8MarketShare, Some(q8Sql)),
    Q("q9_product_profit", "profit by nation and year, decimal-exact (TPC-H Q9 shape)", q9ProductProfit, Some(q9Sql)),
    Q("q11_important_stock", "GROUP BY + HAVING vs global scalar subquery (TPC-H Q11 shape)", q11ImportantStock, Some(q11Sql)),
    Q("q12_priority_split", "conditional counts with cross-table lateness predicate (TPC-H Q12 shape)", q12PrioritySplit, Some(q12Sql)),
    Q("q15_top_supplier", "agg view + scalar MAX equality (TPC-H Q15 shape)", q15TopSupplier, Some(q15Sql)),
    Q("q16_supplier_counts", "COUNT DISTINCT with anti-join exclusion list (TPC-H Q16 shape)", q16SupplierCounts, Some(q16Sql)),
    Q("q22_idle_customers", "scalar-avg guard + NOT EXISTS anti join (TPC-H Q22 shape)", q22IdleCustomers, Some(q22Sql)),
    Q("q17_small_quantity", "correlated scalar-subquery guard, decorrelated (TPC-H Q17 shape)", q17SmallQuantity, Some(q17Sql)),
    Q("q20_part_suppliers", "nested semi over correlated aggregate (TPC-H Q20 shape)", q20PartSuppliers, Some(q20Sql)),
    Q("q7_volume_shipping", "nation-pair volume shipping by ship year (TPC-H Q7 shape)", q7VolumeShipping, Some(q7Sql)),
    Q("q10_returned_items", "returned-item revenue top customers (TPC-H Q10 shape)", q10ReturnedItems, Some(q10Sql)),
    Q("q13_order_distribution", "left-join order-count distribution (TPC-H Q13 shape)", q13CustomerDistribution, Some(q13Sql)),
    Q("q19_bracket_revenue", "OR-of-ANDs bracket predicate revenue (TPC-H Q19 shape)", q19BracketRevenue, Some(q19Sql)),
    Q("q18_large_orders", "join + HAVING + top-K (large-order customers)", q18LargeOrders, Some(q18Sql)),
    Q("q4_late_orders", "EXISTS semi-join with cross-table predicate (TPC-H Q4 shape)", q4LateSemi, Some(q4Sql)),
    Q("q21_sole_supplier", "semi + anti self-join chain over the fact (TPC-H Q21 shape)", q21SoleReturns, Some(q21Sql)),
    Q("cd1_distinct_users", "distinct aggregation per group", cd1DistinctUsers, Some(cd1Sql)),
    Q("pc1_value_percentiles", "exact interpolated percentiles per group", pc1ValuePercentiles, Some(pc1Sql)),
    Q("gs1_rollup", "ROLLUP grouping sets with subtotals", gs1Rollup, Some(gs1Sql)),
    Q("q1_pricing_summary", "A1/A3 flagship hash aggregation (decimal-exact)", q1PricingSummary, Some(q1Sql)),
    Q("q3_revenue_by_nation", "multi-join aggregation, broadcast dim", q3RevenueByNation, Some(q3Sql)),
    Q("q5_local_supplier_volume", "6-table join with co-location predicate (TPC-H Q5 shape)", q5LocalSupplierVolume, Some(q5Sql)),
    Q("q6_forecast_revenue", "pure filter + scalar aggregate, full pushdown (TPC-H Q6 shape)", q6ForecastRevenue, Some(q6Sql)),
    Q("q14_promo_revenue", "conditional aggregate over broadcast fact-dim join (TPC-H Q14 shape)", q14PromoRevenue, Some(q14Sql)),
    Q("fo1_full_outer_reconcile", "full-outer snapshot reconciliation (left/right/both counts)", fo1FullOuterReconcile, Some(fo1Sql)),
    Q("wf1_rank_functions", "dense_rank/percent_rank/cume_dist per status (partitioned windows)", wf1RankFunctions, Some(wf1Sql)),
    Q("so1_set_ops", "INTERSECT/EXCEPT set-operator cardinalities", so1SetOps, Some(so1Sql)),
    Q("o1_ordered_page", "O1 ordered page / TakeOrderedAndProject", o1OrderedPage, Some(o1Sql)),
    Q("o2_recent_topk", "O2 reverse-chron top-K", o2RecentTopk, Some(o2Sql)),
    Q("o3_union_merge", "O3 UNION ALL + re-sort + cap", o3UnionMerge, Some(o3Sql)),
    Q("a1_global_counters", "A1+A2 counters and success rate", a1GlobalCounters, Some(a1Sql)),
    Q("a3_topic_stats", "A3 per-topic stats", a3TopicStats, Some(a3Sql)),
    Q("a5_status_breakdown", "A5 status GROUP BY COUNT", a5StatusBreakdown, Some(a5Sql)),
    Q("a6_minmax_pk", "A6 MAX/MIN scalar lookups", a6MinmaxPk, Some(a6Sql)),
    Q("a7_dup_hash", "A7 duplicate-hash diagnostics", a7DupHash, Some(a7Sql)),
    Q("a8_count_union", "A8 per-table count UNION ALL", a8CountUnion, Some(a8Sql)),
    Q("p14_like_filter", "P14 UPPER/LIKE filter", p14LikeFilter, Some(p14Sql)),
    Q("p15_time_window", "P15 time-window predicate", p15TimeWindow, Some(p15Sql)),
    Q("j1_code_lookup", "J1/T2 broadcast code-map lookup + fallback", j1CodeLookup, Some(j1Sql)),
    Q("j2_anti_lookup", "J2 left-anti join vs processed state", j2AntiLookup, Some(j2Sql)),
    Q("w1_ring_buffer", "A4 ring buffer via row_number window", w1RingBuffer, Some(w1Sql)),
    Q("w2_last_write_wins", "LWW conflict policy via window", w2LastWriteWins, Some(w2Sql)),
  )
}
