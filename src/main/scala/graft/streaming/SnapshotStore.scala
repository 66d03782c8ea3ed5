package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, to_date}
import org.apache.spark.sql.types.StructType

/** Versioned parquet snapshot store — the engine's local stand-in for a
  * MERGE-capable sink (Delta / JDBC MERGE in production, SURVEY §2.8 ST5).
  *
  * Each apply writes a new `v<N>` directory and then atomically flips a
  * `_current` pointer file, so a snapshot read never races a write (the
  * same read-version/write-new-version/commit protocol Delta uses, minus
  * the transaction log). Audit rows append to `_audit` (CDC_SYNC_LOG).
  */
final class SnapshotStore(spark: SparkSession, basePath: String) {

  private def tableDir(table: String) = s"$basePath/$table"
  private def pointer(table: String) = Paths.get(tableDir(table), "_current")

  def currentVersion(table: String): Int =
    if (Files.exists(pointer(table)))
      new String(Files.readAllBytes(pointer(table))).trim.toInt
    else 0

  /** Current snapshot; empty DataFrame with the given schema at v0. */
  def snapshot(table: String, schema: StructType): DataFrame =
    snapshotAt(table, currentVersion(table), schema)

  /** Time travel: read any committed version (0 = empty). */
  def snapshotAt(table: String, version: Int, schema: StructType = null): DataFrame =
    if (version == 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(s"${tableDir(table)}/v$version")

  /** Write the next snapshot version and flip the pointer. */
  def commit(table: String, df: DataFrame): Int = {
    val next = currentVersion(table) + 1
    df.write.mode(SaveMode.Overwrite).parquet(s"${tableDir(table)}/v$next")
    Files.createDirectories(Paths.get(tableDir(table)))
    Files.write(pointer(table), next.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    next
  }

  /** Audit rows append partitioned by `log_date`: the audit table is
    * the one append-forever table in the system, so date partitioning
    * is what keeps `Monitoring.recent`/`statusBreakdown` scans pruned
    * when the log is 100× today's volume (`AuditPruneSpec` asserts the
    * partition filter reaches the scan).
    */
  def appendAudit(df: DataFrame): Unit =
    df.withColumn("log_date", to_date(col("log_time")))
      .write.mode(SaveMode.Append)
      .partitionBy("log_date").parquet(s"$basePath/_audit")

  def audit(): DataFrame = {
    val p = s"$basePath/_audit"
    if (Files.exists(Paths.get(p))) spark.read.parquet(p)
    else spark.emptyDataFrame
  }
}
