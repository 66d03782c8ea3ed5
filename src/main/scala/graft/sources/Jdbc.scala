package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JDBC surface (SURVEY.md §2.1 S3/S4): batch read, the ANSI MERGE
  * builder, and the staging-table merge sink a `foreachBatch` runs per
  * micro-batch. Exercised end-to-end against embedded Derby (the only
  * database this sandbox has) in `JdbcDerbySpec`; the surface is the
  * standard Spark JDBC API, so any MERGE-capable target works the same.
  */
object Jdbc {

  /** S4: batch read with pushdown — Spark pushes filters/limits into
    * the dbtable subquery.
    */
  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** ANSI MERGE for the CDC upsert apply (ST5/ST6): INSERT new keys,
    * UPDATE existing, DELETE on the op flag — the statement a
    * `foreachBatch` JDBC sink executes per batch via a staging table.
    */
  def mergeSql(target: String, staging: String, pk: String,
      dataCols: Seq[String], opCol: String = "OPERATION"): String = {
    val sets = dataCols.map(c => s"t.$c = s.$c").mkString(", ")
    val insCols = (pk +: dataCols).mkString(", ")
    val insVals = (pk +: dataCols).map(c => s"s.$c").mkString(", ")
    s"""MERGE INTO $target t
       |USING $staging s ON t.$pk = s.$pk
       |WHEN MATCHED AND s.$opCol = 'DELETE' THEN DELETE
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED AND s.$opCol <> 'DELETE' THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin
  }

  /** S3: the JDBC merge sink one `foreachBatch` call runs — overwrite
    * the staging table with the micro-batch, then apply it to the
    * target with a single ANSI MERGE (`CdcSyncService.java:107-191`
    * semantics: UPDATE on missing key inserts — upsert conversion;
    * DELETE on missing key is a no-op).
    *
    * `seqCol` collapses the batch to the latest op per pk first: ANSI
    * MERGE rejects two source rows hitting one target row, and last
    * writer wins is the pipeline's ordering contract (ST10). The
    * collapse is a window over the pk hash partition — the same shuffle
    * key the staging write needs anyway.
    *
    * `stagingColumnTypes` feeds Spark's `createTableColumnTypes` so the
    * staging DDL matches the target's types (Derby, for one, maps
    * StringType to CLOB by default, which can't be MERGEd into VARCHAR).
    */
  def mergeBatch(batch: DataFrame, url: String, target: String,
      staging: String, pk: String, dataCols: Seq[String],
      opCol: String = "OPERATION", seqCol: Option[String] = None,
      stagingColumnTypes: Option[String] = None,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val collapsed = seqCol.fold(batch) { s =>
      batch.withColumn("__rn", row_number().over(
          Window.partitionBy(col(pk)).orderBy(col(s).desc)))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val w = collapsed.select((pk +: dataCols :+ opCol).map(col): _*)
      .write.mode("overwrite")
    stagingColumnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, staging, props)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(mergeSql(target, staging, pk, dataCols, opCol))
      finally st.close()
    } finally conn.close()
  }
}
