package graft.streaming

import graft.SparkSpec
import graft.cdc.{Direction, Registry, TableMapping}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** One streaming query carrying all six (mapping, direction) topics:
  * the consolidated topology must apply each topic's slice exactly like
  * the per-topic queries do — same target rows, same audit attribution,
  * same loop suppression — while idle topics ride triggers untouched.
  */
class MultiplexedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1768284000000L // 2026-01-13

  private def env(schema: String, table: String, op: String,
      img: String, tsMs: Long): String = {
    val (before, after) = if (op == "d") (img, "null") else ("null", img)
    s"""{"payload":{"op":"$op","before":$before,"after":$after,""" +
      s""""source":{"schema":"$schema","table":"$table"},"ts_ms":$tsMs}}"""
  }
  private def bookAsis(id: Int, title: String) =
    s"""{"BOOK_ID":"$id","BOOK_TITLE":"$title","AUTHOR":"a","CATEGORY":"01","STATUS":"Y","REG_DATE":$t0,"MOD_DATE":null}"""
  private def bookTobe(id: Int, title: String) =
    s"""{"BOOK_ID":"$id","TITLE":"$title","AUTHOR_NAME":"a","CATEGORY_CD":"SCI","IS_ACTIVE":"1","CREATED_AT":$t0,"UPDATED_AT":null,"CREATED_BY":"SYNC","UPDATED_BY":"SYNC"}"""
  private def memberAsis(id: Int, name: String) =
    s"""{"MEMBER_ID":"$id","MEMBER_NAME":"$name","EMAIL":"m@x","MEMBER_TYPE":"A","STATUS":"Y","REG_DATE":$t0}"""
  private def memberTobe(id: Int, name: String) =
    s"""{"MEMBER_ID":"$id","MEMBER_NAME":"$name","EMAIL_ADDR":"m@x","MEMBER_TYPE_CD":"USER","IS_ACTIVE":"1","CREATED_AT":$t0,"UPDATED_AT":null}"""
  private def legacyAsis(code: String, name: String) =
    s"""{"CODE_ID":"$code","CODE_NAME":"$name","USE_YN":"Y","REG_DATE":$t0}"""
  private def svcTobe(id: Int, name: String) =
    s"""{"SERVICE_ID":"$id","SERVICE_NAME":"$name","SERVICE_TYPE_CD":"STD","IS_ACTIVE":"1","CREATED_AT":$t0}"""

  test("all six topics through ONE query: applies, audit, loop block, idle topics") {
    val dir = Files.createTempDirectory("graft-mux").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val pairs: Seq[(TableMapping, Direction.Value)] =
      Registry.byTopic.values.toSeq.sortBy(p => p._1.entity + p._2)
    val pipeline = new MultiplexedSyncPipeline(spark, store,
      trigger = Trigger.ProcessingTime("0 seconds"))
    val mem = MemoryStream[(String, String)](spark)
    val source = mem.toDF().toDF("topic", "value")
    val q = pipeline.start(source, pairs, s"$dir/ckpt")
    def topic(m: TableMapping, d: Direction.Value) = Registry.topicFor(d, m)
    try {
      // ---- round 1: one insert per topic, one trigger for all six
      mem.addData(
        topic(Registry.book, Direction.AsisToTobe) ->
          env("ASIS_USER", "BOOK_INFO", "c", bookAsis(1, "b-one"), t0),
        topic(Registry.book, Direction.TobeToAsis) ->
          env("TOBE_USER", "TB_BOOK", "c", bookTobe(100, "b-hundred"), t0),
        topic(Registry.member, Direction.AsisToTobe) ->
          env("ASIS_USER", "MEMBER_INFO", "c", memberAsis(2, "alice"), t0),
        topic(Registry.member, Direction.TobeToAsis) ->
          env("TOBE_USER", "TB_MEMBER", "c", memberTobe(200, "bob"), t0),
        topic(Registry.legacyCode, Direction.AsisToTobe) ->
          env("ASIS_USER", "LEGACY_CODE", "c", legacyAsis("C1", "code-one"), t0),
        topic(Registry.newService, Direction.TobeToAsis) ->
          env("TOBE_USER", "TB_NEW_SERVICE", "c", svcTobe(300, "svc"), t0))
      q.processAllAvailable()

      // identical table states to ConcurrentPipelineSpec's round 1
      assert(store.snapshot("TB_BOOK", null).head().getAs[String]("TITLE") == "b-one")
      assert(store.snapshot("TB_BOOK", null).head().getAs[String]("CATEGORY_CD") == "LIT")
      assert(store.snapshot("BOOK_INFO", null).head().getAs[String]("CATEGORY") == "02")
      assert(store.snapshot("TB_MEMBER", null).head()
        .getAs[String]("MEMBER_TYPE_CD") == "ADMIN")
      assert(store.snapshot("MEMBER_INFO", null).head().getAs[String]("MEMBER_TYPE") == "B")
      assert(store.snapshot("TB_LEGACY_CODE", null).head()
        .getAs[String]("CODE_NAME") == "code-one")
      assert(store.snapshot("NEW_SERVICE_RECV", null).head().getAs[String]("USE_YN") == "Y")
      // timestamp columns survive the payload JSON round-trip intact
      assert(store.snapshot("TB_BOOK", null).head()
        .getAs[java.sql.Timestamp]("CREATED_AT").getTime == t0)

      // ---- round 2: updates on two topics; four topics idle in the
      // same trigger — their tables must be untouched
      val legacyMetaBefore = store.currentMeta("TB_LEGACY_CODE")
      mem.addData(
        topic(Registry.book, Direction.AsisToTobe) ->
          env("ASIS_USER", "BOOK_INFO", "u", bookAsis(1, "b-two"), t0 + 600000),
        topic(Registry.member, Direction.TobeToAsis) ->
          env("TOBE_USER", "TB_MEMBER", "u", memberTobe(200, "bob2"), t0 + 600000))
      q.processAllAvailable()
      assert(store.snapshot("TB_BOOK", null).head().getAs[String]("TITLE") == "b-two")
      assert(store.snapshot("MEMBER_INFO", null).head().getAs[String]("MEMBER_NAME") == "bob2")
      assert(store.currentMeta("TB_LEGACY_CODE") == legacyMetaBefore,
        "idle topics' epoch markers must not move")

      // ---- round 3: a same-hash echo within the loop window is
      // blocked by the SHARED state operator (keys embed the table, so
      // cross-topic isolation holds; suppression works as per-query)
      mem.addData(
        topic(Registry.book, Direction.AsisToTobe) ->
          env("ASIS_USER", "BOOK_INFO", "u", bookAsis(1, "b-two"), t0 + 660000))
      q.processAllAvailable()
      assert(store.snapshot("TB_BOOK", null).head().getAs[String]("TITLE") == "b-two")

      val audit = store.audit()
        .select($"direction", $"table_name", $"status")
        .as[(String, String, String)].collect()
      val byTable = audit.groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(_._3).sorted.toSeq).toMap
      assert(byTable(("ASIS_TO_TOBE", "TB_BOOK")) ==
        Seq("LOOP_BLOCKED", "SUCCESS", "SUCCESS"))
      assert(byTable(("TOBE_TO_ASIS", "BOOK_INFO")) == Seq("SUCCESS"))
      assert(byTable(("ASIS_TO_TOBE", "TB_MEMBER")) == Seq("SUCCESS"))
      assert(byTable(("TOBE_TO_ASIS", "MEMBER_INFO")) == Seq("SUCCESS", "SUCCESS"))
      assert(byTable(("ASIS_TO_TOBE", "TB_LEGACY_CODE")) == Seq("SUCCESS"))
      assert(byTable(("TOBE_TO_ASIS", "NEW_SERVICE_RECV")) == Seq("SUCCESS"))
      assert(audit.length == 9, s"no stray audit rows, got ${audit.toSeq}")
    } finally q.stop()
  }
}
