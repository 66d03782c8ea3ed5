package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange. The 100 TB
  * pattern for fact⋈fact joins that recur every pipeline run (e.g.
  * lineitem⋈orders on orderkey): pay the shuffle once, reuse forever.
  */
object Bucketing {

  /** Make `table` writable by CTAS: drop any catalog entry AND delete a
    * leftover warehouse location. A fresh session's in-memory catalog
    * doesn't know about directories a PREVIOUS JVM left in the
    * warehouse, so a bare Overwrite saveAsTable fails with
    * LOCATION_ALREADY_EXISTS on every re-run.
    */
  def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
    if (java.nio.file.Files.exists(loc))
      org.apache.commons.io.FileUtils.deleteQuietly(loc.toFile)
  }

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    resetTable(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their shared bucket key — planner
    * recognizes compatible `HashClusteredDistribution`s and elides both
    * exchanges (verify with `.explain`: no Exchange under the join).
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
