package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered CDC apply (SURVEY.md §2.8 ST5–ST8, O4).
  *
  * The reference applies events one at a time in `CDC_SEQ` order with:
  * INSERT (dup ⇒ converted to UPDATE — `asis…04:195-209`), UPDATE/DELETE
  * by pk (`SQL%ROWCOUNT=0` ⇒ TARGET_NOT_FOUND audit, row skipped —
  * `asis…04:165-191`), per-record error isolation (`asis…04:130-139`).
  *
  * Here the same per-key sequential semantics are computed declaratively
  * so Spark can execute them with ONE shuffle (hash partition by pk):
  * existence is a state machine where INSERT ⇒ exists, DELETE ⇒ gone and
  * UPDATE never changes existence, so "does the row exist when event i
  * runs" is a window expression over the preceding INSERT/DELETE ops
  * seeded by base membership — no driver-side loop, no per-row JDBC.
  * At 100 TB: base⋈changes is a shuffle hash join on pk, the window and
  * final dedup reuse the same hash partitioning (no extra exchange).
  */
object Apply {

  final case class ApplyResult(target: DataFrame, audit: DataFrame)

  /** Apply a batch of ordered change events to a base snapshot.
    *
    * @param base     current target-table snapshot: pk + dataCols
    * @param changes  events: `operation` (INSERT/UPDATE/DELETE), seqCol,
    *                 pk, dataCols
    * @param pk       primary-key column name
    * @param seqCol   arrival-order column (CDC_SEQ)
    * @param dataCols non-pk payload columns
    */
  def applyBatch(
      base: DataFrame,
      changes: DataFrame,
      pk: String,
      seqCol: String,
      dataCols: Seq[String]): ApplyResult = {

    val inBase = base.select(col(pk), lit(true).as("__in_base")).distinct()
    val ch = changes
      .join(inBase, Seq(pk), "left")
      .withColumn("__in_base", coalesce(col("__in_base"), lit(false)))

    val byKey = Window.partitionBy(col(pk)).orderBy(col(seqCol))
    // last INSERT/DELETE strictly before this event (null = none yet)
    val prevIdOp = last(
      when(col("operation") =!= "UPDATE", col("operation")), ignoreNulls = true)
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))

    val flagged = ch
      .withColumn("__exists_at",
        when(prevIdOp === "INSERT", lit(true))
          .when(prevIdOp === "DELETE", lit(false))
          .otherwise(col("__in_base")))
      .withColumn("__applied",
        col("operation") === "INSERT" ||
          (col("operation").isin("UPDATE", "DELETE") && col("__exists_at")))
      .withColumn("__upsert_converted",
        col("operation") === "INSERT" && col("__exists_at"))

    // audit: one row per event, exactly the reference's CDC_SYNC_LOG
    // statuses (02_create_cdc_tables.sql:117-128)
    val audit = flagged.select(
      col(seqCol).as("cdc_seq"),
      col(pk).cast("string").as("pk_value"),
      col("operation"),
      when(col("__applied"), "SUCCESS").otherwise("TARGET_NOT_FOUND").as("status"),
      col("__upsert_converted").as("upsert_converted"))

    // final per-key state — same partitioning AND sort as `byKey` so
    // Catalyst collapses window operators and reuses the sort
    val fullFrame = byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lastIdOp = max(
      when(col("operation") =!= "UPDATE", struct(col(seqCol), col("operation"))))
      .over(fullFrame)
    val lastAppliedSeq = max(when(col("__applied"), col(seqCol)))
      .over(fullFrame)

    val finals = flagged
      .withColumn("__final_exists",
        when(lastIdOp.getField("operation") === "INSERT", lit(true))
          .when(lastIdOp.getField("operation") === "DELETE", lit(false))
          .otherwise(col("__in_base")))
      .withColumn("__last_applied_seq", lastAppliedSeq)

    val survivors = finals
      .filter(col("__final_exists") && col(seqCol) === col("__last_applied_seq"))
      .select(col(pk) +: dataCols.map(col): _*)

    val untouched = base.join(ch.select(pk).distinct(), Seq(pk), "left_anti")
      .select(col(pk) +: dataCols.map(col): _*)

    // keys that survive only as their untouched base row (all events
    // skipped, e.g. lone UPDATE on a post-DELETE ghost) keep base values
    val keptBase = base
      .join(finals.filter(col("__final_exists") && col("__last_applied_seq").isNull)
        .select(pk).distinct(), Seq(pk), "left_semi")
      .select(col(pk) +: dataCols.map(col): _*)

    ApplyResult(untouched.unionByName(survivors).unionByName(keptBase), audit)
  }

  /** ST8 per-record error isolation: split a batch into (valid, dead
    * letter) on a validity predicate; the dead-letter side carries the
    * reason, mirroring `PROCESSED_YN='E'` + ERROR_MSG (`asis…04:130-139`).
    */
  def errorIsolate(df: DataFrame, valid: Column, reason: Column): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("__valid", valid)
    (tagged.filter(col("__valid")).drop("__valid"),
      tagged.filter(!col("__valid")).drop("__valid").withColumn("error_msg", reason))
  }
}
