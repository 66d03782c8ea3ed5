package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange. The 100 TB
  * pattern for fact⋈fact joins that recur every pipeline run (e.g.
  * lineitem⋈orders on orderkey): pay the shuffle once, reuse forever.
  */
object Bucketing {

  /** Collision-safe table-name suffix for a dataset directory: 12 hex
    * chars of md5 (48 bits) — managed tables are global to the
    * warehouse, and the 32-bit `String.hashCode` this replaces made two
    * datasets silently share (and overwrite) one index table on a
    * collision.
    */
  def dirSuffix(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** Make `table` writable by CTAS: drop any catalog entry AND delete a
    * leftover location. A fresh session's in-memory catalog doesn't
    * know about directories a PREVIOUS JVM left in the warehouse, so a
    * bare Overwrite saveAsTable fails with LOCATION_ALREADY_EXISTS on
    * every re-run. The location is resolved through the catalog
    * (existing table metadata, else the default path for the parsed
    * identifier) and deleted via the Hadoop FileSystem — correct for
    * qualified names and non-local warehouses, where reconstructing
    * `warehouse.dir/<name>` would silently miss.
    */
  def resetTable(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc: java.net.URI =
      if (catalog.tableExists(ident)) catalog.getTableMetadata(ident).location
      else catalog.defaultTablePath(ident)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
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

  /** Append rows to an EXISTING bucketed table, inheriting its bucket
    * spec from the catalog (a hand-passed spec that drifted from the
    * table's would corrupt bucket pruning silently). The appended files
    * hash into the same buckets, so reads keep the exchange-free join
    * property; ingest batches pay one O(|batch|) bucketed write, never
    * a table rewrite — the index-append primitive
    * ([[AnnIndex]]/[[DedupIndex]] `append*`).
    */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table has no bucket spec to inherit"))
    val w = df.write.mode(SaveMode.Append)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    val sorted =
      if (spec.sortColumnNames.isEmpty) w
      else w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    sorted.format("parquet").saveAsTable(table)
    // a session that scanned the table BEFORE this append holds a
    // cached file listing; standard Spark semantics, but within the
    // writing session we can invalidate it ourselves
    spark.catalog.refreshTable(table)
  }

  /** Join two bucketed tables on their shared bucket key — planner
    * recognizes compatible `HashClusteredDistribution`s and elides both
    * exchanges (verify with `.explain`: no Exchange under the join).
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
