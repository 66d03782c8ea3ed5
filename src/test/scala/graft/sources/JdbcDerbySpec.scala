package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** S3/S4 integration against embedded Derby (`/opt/spark/jars` ships
  * the Derby jars for the Hive metastore, so a real MERGE-capable
  * database exists in-JVM with zero daemons). Covers the batch MERGE
  * round-trip, upsert conversion, delete-on-missing, the Spark JDBC
  * read-back, and the sink running inside a real `foreachBatch`
  * (`CdcSyncService.java:107-191`, `SimulatorController.java:92-96`).
  */
class JdbcDerbySpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties
  private val stagingTypes = "NAME VARCHAR(64), OPERATION VARCHAR(10)"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def ddl(sql: String*): Unit = withConn { c =>
    val st = c.createStatement()
    try sql.foreach(st.executeUpdate)
    finally st.close()
  }

  private def readTarget(table: String): Seq[(Long, String, Int)] =
    Jdbc.read(spark, url, table, props)
      .orderBy("ID").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq

  test("S3: MERGE batch applies update/delete/insert/upsert-conversion on Derby") {
    ddl(
      "CREATE TABLE TGT (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)",
      "INSERT INTO TGT VALUES (1, 'old', 10), (2, 'doomed', 20)")
    val batch = Seq(
      (1L, "updated", 11, "UPDATE", 10L),
      (2L, "x", 0, "DELETE", 11L),
      (3L, "inserted", 30, "INSERT", 12L),
      (4L, "upserted", 40, "UPDATE", 13L), // missing target → insert (ST6)
      (5L, "ghost", 50, "DELETE", 14L)) // delete of missing key → no-op
      .toDF("ID", "NAME", "AMT", "OPERATION", "SEQ")
    Jdbc.mergeBatch(batch, url, "TGT", "STG", "ID", Seq("NAME", "AMT"),
      seqCol = Some("SEQ"), stagingColumnTypes = Some(stagingTypes))
    assert(readTarget("TGT") ==
      Seq((1L, "updated", 11), (3L, "inserted", 30), (4L, "upserted", 40)))
  }

  test("S3: latest op per pk wins inside one batch (LWW collapse)") {
    ddl("CREATE TABLE TGT_LWW (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)")
    val batch = Seq(
      (1L, "first", 1, "INSERT", 1L),
      (1L, "second", 2, "UPDATE", 2L),
      (2L, "born", 3, "INSERT", 3L),
      (2L, "gone", 0, "DELETE", 4L))
      .toDF("ID", "NAME", "AMT", "OPERATION", "SEQ")
    Jdbc.mergeBatch(batch, url, "TGT_LWW", "STG_LWW", "ID", Seq("NAME", "AMT"),
      seqCol = Some("SEQ"), stagingColumnTypes = Some(stagingTypes))
    // pk 1: UPDATE wins, upsert-converted to insert; pk 2: DELETE wins → absent
    assert(readTarget("TGT_LWW") == Seq((1L, "second", 2)))
  }

  test("store → JDBC incremental sync: net changes only, watermarked in the target, replay-idempotent") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-jdbc-sync").toString
    val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
    def commit(rows: (Long, String, Long, String, Int)*): Int =
      store.commitDelta("SRC", rows.toDF("seq", "operation", "ID", "NAME", "AMT"),
        "ID", "seq", Seq("NAME", "AMT"))
    def sync(): Int = Jdbc.syncFromStore(store, "SRC", url, "SYNC_TGT",
      "SYNC_STG", stagingColumnTypes =
        Some("NAME VARCHAR(64), CHANGE_TYPE VARCHAR(10)"))
    def snapshotRows(): Seq[(Long, String, Int)] =
      store.snapshot("SRC", null).select("ID", "NAME", "AMT")
        .orderBy(col("ID")).as[(Long, String, Int)].collect().toSeq

    ddl("CREATE TABLE SYNC_TGT (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)")
    // v1-v2: inserts land; the target catches up to the snapshot
    commit((1L, "INSERT", 1, "a", 10), (2L, "INSERT", 2, "b", 20))
    commit((3L, "INSERT", 3, "c", 30))
    assert(sync() == 2)
    assert(readTarget("SYNC_TGT") == snapshotRows())

    // v3: update + delete + insert — only NET changes cross the wire
    commit((4L, "UPDATE", 1, "a2", 11), (5L, "DELETE", 2, "b", 0),
      (6L, "INSERT", 4, "d", 40))
    assert(sync() == 3)
    assert(readTarget("SYNC_TGT") == snapshotRows())
    assert(readTarget("SYNC_TGT") == Seq((1L, "a2", 11), (3L, "c", 30), (4L, "d", 40)))

    // caught up: sync is a version-check no-op
    assert(sync() == 3)
    assert(Jdbc.syncedVersion(url, "SYNC_TGT") == 3)

    // crash replay: roll the watermark back (exactly what a crash
    // between staging and the MERGE transaction leaves) and re-sync —
    // the duplicated MERGE must be value-idempotent
    ddl("UPDATE GRAFT_SYNC_STATE SET V = 2 WHERE TBL = 'SYNC_TGT'")
    assert(sync() == 3)
    assert(readTarget("SYNC_TGT") == snapshotRows())
  }

  test("store evolution flows through the sync: the target ALTERs before the MERGE") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-jdbc-evsync").toString
    val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
    ddl("CREATE TABLE EVS_TGT (ID BIGINT PRIMARY KEY, NAME VARCHAR(64))")
    store.commitDelta("ESRC",
      Seq((1L, "INSERT", 1L, "a"), (2L, "INSERT", 2L, "b"))
        .toDF("seq", "operation", "ID", "NAME"), "ID", "seq", Seq("NAME"))
    assert(Jdbc.syncFromStore(store, "ESRC", url, "EVS_TGT", "EVS_STG") == 1)
    // the store grows EMAIL (add-column evolution, compaction boundary)
    store.commitDelta("ESRC",
      Seq((3L, "INSERT", 3L, "c", "c@x.y"), (4L, "UPDATE", 1L, "a2", "a@x.y"))
        .toDF("seq", "operation", "ID", "NAME", "EMAIL"),
      "ID", "seq", Seq("NAME", "EMAIL"))
    // the sync must ALTER the target and merge through the new column
    assert(Jdbc.syncFromStore(store, "ESRC", url, "EVS_TGT", "EVS_STG") ==
      store.currentVersion("ESRC"))
    val rows = Jdbc.read(spark, url, "EVS_TGT", props).orderBy(col("ID"))
      .select("ID", "NAME", "EMAIL")
      .as[(Long, String, Option[String])].collect().toSeq
    // pre-evolution row 2 reads NULL; touched rows carry their values
    assert(rows == Seq((1L, "a2", Some("a@x.y")), (2L, "b", None),
      (3L, "c", Some("c@x.y"))))
  }

  test("sink schema evolution: new columns ALTER in as nullable, retypes refuse") {
    ddl("CREATE TABLE EVO_TGT (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)",
      "INSERT INTO EVO_TGT VALUES (1, 'pre', 10)")
    // a wider batch schema: EMAIL is new → ALTER TABLE ADD (nullable)
    val widened = Seq((2L, "new", 20, "a@b.c", "INSERT", 1L))
      .toDF("ID", "NAME", "AMT", "EMAIL", "OPERATION", "SEQ")
    assert(Jdbc.ensureColumns(url, "EVO_TGT", widened.drop("OPERATION", "SEQ").schema)
      == Seq("EMAIL"))
    // idempotent: a second call adds nothing
    assert(Jdbc.ensureColumns(url, "EVO_TGT", widened.drop("OPERATION", "SEQ").schema)
      .isEmpty)
    Jdbc.mergeBatch(widened, url, "EVO_TGT", "EVO_STG", "ID",
      Seq("NAME", "AMT", "EMAIL"), seqCol = Some("SEQ"))
    // pre-evolution rows read NULL in the new column; new rows carry it
    val rows = Jdbc.read(spark, url, "EVO_TGT", props).orderBy("ID")
      .select("ID", "EMAIL").as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some("a@b.c"))))
    // a KIND change refuses loudly (the store's retype contract)
    val retyped = Seq((1L, 99L)).toDF("ID", "NAME") // NAME now numeric
    val e = intercept[IllegalStateException] {
      Jdbc.ensureColumns(url, "EVO_TGT", retyped.schema)
    }
    assert(e.getMessage.contains("retypes are refused"))
  }

  test("S4: Spark JDBC read pushes a filter into the scan") {
    ddl(
      "CREATE TABLE TGT_RD (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)",
      "INSERT INTO TGT_RD VALUES (1, 'a', 1), (2, 'b', 2), (3, 'c', 3)")
    val df = Jdbc.read(spark, url, "TGT_RD", props).filter($"AMT" >= 2)
    assert(df.count() == 2)
    // the predicate must reach the JDBC scan node, not run post-scan
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("AMT"))
  }

  test("S3 streaming: foreachBatch drives the Derby MERGE sink across micro-batches") {
    ddl("CREATE TABLE TGT_ST (ID BIGINT PRIMARY KEY, NAME VARCHAR(64), AMT INT)")
    val mem = MemoryStream[(Long, String, Int, String, Long)](spark)
    val q = mem.toDF.toDF("ID", "NAME", "AMT", "OPERATION", "SEQ")
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("jdbc-sink-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Jdbc.mergeBatch(b, url, "TGT_ST", "STG_ST", "ID", Seq("NAME", "AMT"),
          seqCol = Some("SEQ"), stagingColumnTypes = Some(stagingTypes))
      }
      .start()
    try {
      mem.addData((1L, "a", 1, "INSERT", 1L), (2L, "b", 2, "INSERT", 2L))
      q.processAllAvailable()
      assert(readTarget("TGT_ST") == Seq((1L, "a", 1), (2L, "b", 2)))
      // second micro-batch: update 1, delete 2 — state carries across batches
      mem.addData((1L, "a2", 10, "UPDATE", 3L), (2L, "x", 0, "DELETE", 4L))
      q.processAllAvailable()
      assert(readTarget("TGT_ST") == Seq((1L, "a2", 10)))
    } finally q.stop()
  }
}
