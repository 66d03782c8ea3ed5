package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S8: the five inspection endpoints run over a seeded store and
  * return exactly what the reference controller's SQL would
  * (`SimulatorController.java:66-297`): pk-ordered 20-row data page,
  * seq-descending CDC/staging pages, newest-50 merged sync log with
  * LIKE filter, and the status breakdown.
  */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  test("five inspection endpoints over the store match their SQL contracts") {
    val dir = Files.createTempDirectory("graft-dash").toString
    val store = new SnapshotStore(spark, dir)

    // seed a synced table snapshot (25 rows → data page caps at 20)
    store.commit("TB_BOOK", (1 to 25).map(i =>
      (i.toLong, s"title-$i", "a")).toDF("BOOK_ID", "TITLE", "AUTHOR_NAME"))

    // seed audit rows: 60 across two tables (sync-log page caps at 50)
    val t0 = 1768284000000L
    store.appendAudit((1 to 60).map { i =>
      ("ASIS_TO_TOBE", if (i % 3 == 0) "TB_MEMBER" else "TB_BOOK", "INSERT",
        i.toString, if (i % 5 == 0) "LOOP_BLOCKED" else "SUCCESS", false,
        null: String, s"h$i", new java.sql.Timestamp(t0 + i * 1000L))
    }.toDF("direction", "table_name", "operation", "pk_value", "status",
      "upsert_converted", "error_code", "change_hash", "log_time"))

    Dashboard.registerViews(spark, store, Seq("TB_BOOK"))
    // CDC / staging views over seeded change feeds
    (1 to 30).map(i => (i.toLong, "INSERT", s"payload-$i"))
      .toDF("CDC_SEQ", "OPERATION", "DATA").createOrReplaceTempView("CDC_BOOK")
    (1 to 5).map(i => (i.toLong, s"stage-$i"))
      .toDF("STAGING_SEQ", "DATA").createOrReplaceTempView("STG_BOOK")

    // 1. data: configured columns only, pk-ordered, 20-row page
    val data = Dashboard.data(spark, "TB_BOOK", "BOOK_ID", Seq("BOOK_ID", "TITLE")).collect()
    assert(data.length == 20)
    assert(data.head.getLong(0) == 1L && data.last.getLong(0) == 20L)
    assert(data.head.schema.fieldNames.toSeq == Seq("BOOK_ID", "TITLE"))

    // 2. cdc: newest first by CDC_SEQ, capped at 20
    val cdc = Dashboard.cdcData(spark, "CDC_BOOK").collect()
    assert(cdc.length == 20 && cdc.head.getLong(0) == 30L)

    // 3. staging: newest first by STAGING_SEQ, under the cap
    val stg = Dashboard.stagingData(spark, "STG_BOOK").collect()
    assert(stg.length == 5 && stg.head.getLong(0) == 5L)

    // 4. sync-log: newest 50 of 60; LIKE filter narrows to one table
    val log = Dashboard.syncLog(spark).collect()
    assert(log.length == 50)
    val times = log.map(_.getAs[java.sql.Timestamp]("log_time").getTime)
    assert(times.zip(times.tail).forall { case (a, b) => a >= b })
    val member = Dashboard.syncLog(spark, Some("member")).collect()
    assert(member.nonEmpty && member.forall(_.getAs[String]("table_name") == "TB_MEMBER"))

    // 5. stats: status breakdown (60 rows: every 5th LOOP_BLOCKED)
    val stats = Dashboard.stats(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("LOOP_BLOCKED" -> 12L, "SUCCESS" -> 48L))
    val statsF = Dashboard.stats(spark, Some("member")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statsF.values.sum == 20L)

    // the pages plan as TakeOrderedAndProject (bounded top-K, no full sort)
    val plan = Dashboard.syncLog(spark).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
