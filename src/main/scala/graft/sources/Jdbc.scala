package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC surface (SURVEY.md §2.1 S3/S4). No database is reachable in
  * this environment; the MERGE statement builder is pure and tested,
  * the read/write wrappers are the standard Spark JDBC surface.
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
}
