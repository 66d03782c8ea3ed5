package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import java.nio.file.Files

/** The audit store is the system's only append-forever table; this
  * asserts its date partitioning actually prunes — a time-filtered
  * monitoring query must carry the predicate as a PARTITION filter on
  * the parquet scan and list only the matching day directories.
  */
class AuditPruneSpec extends SparkSpec {
  import spark.implicits._

  private def auditRows(day: String, n: Int) =
    (1 to n).map { i =>
      ("ASIS_TO_TOBE", "TB_BOOK", "INSERT", i.toString, "SUCCESS", false,
        null: String, s"hash$i", java.sql.Timestamp.valueOf(s"$day 10:00:0" + (i % 10)))
    }.toDF("direction", "table_name", "operation", "pk_value", "status",
      "upsert_converted", "error_code", "change_hash", "log_time")

  test("log_date-filtered audit query prunes to matching partitions") {
    val dir = Files.createTempDirectory("audit-prune").toString
    val store = new SnapshotStore(spark, dir)
    store.appendAudit(auditRows("2026-01-01", 7))
    store.appendAudit(auditRows("2026-01-02", 5))
    store.appendAudit(auditRows("2026-01-03", 3))

    val day1 = java.sql.Date.valueOf("2026-01-01")
    val filtered = store.audit().filter(col("log_date") === lit(day1))
    assert(filtered.count() == 7)

    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.orElse(filtered.queryExecution.sparkPlan.collectFirst {
      case f: FileSourceScanExec => f
    }).get
    assert(scan.partitionFilters.exists(_.toString.contains("log_date")),
      s"expected a log_date partition filter, got: ${scan.partitionFilters}")
    // only ONE of the three day directories is listed by the pruned scan
    val dirsScanned = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length
    assert(dirsScanned == 1, s"expected 1 pruned partition, scanned $dirsScanned")

    // the monitoring surface composes with the same pruning path
    val recent = Monitoring.recentSince(store.audit(), 3, day1)
    assert(recent.count() == 3)
  }
}
