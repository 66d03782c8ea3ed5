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

  /** Spark's Derby dialect maps StringType → CLOB, which poisons the
    * merge-sink path twice: CLOB staging columns can't MERGE into
    * VARCHAR targets, and — subtler — `createTableColumnTypes` only
    * fixes the DDL, while the writer still calls
    * `setNull(Types.CLOB)` for NULL strings, which Derby refuses to
    * convert into a VARCHAR column (surfaces the first time a staged
    * net-change carries a NULL data column, i.e. every DELETE row).
    * A VARCHAR-first dialect registered ahead of the builtin fixes
    * both; non-string types fall through to the builtin mapping.
    */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(4000)", java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  private lazy val dialectRegistered: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

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
    dialectRegistered
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

  /** Incremental STORE → JDBC sync — the lakehouse-to-serving-database
    * catch-up the reference's whole pipeline exists for, driven from
    * the store's own change history: MERGE only the NET changes since
    * the last synced version ([[graft.streaming.SnapshotStore.netChanges]]
    * — per-pk INSERT/UPDATE/DELETE classification with the engine's
    * apply semantics, O(|changes|), never a full-table diff).
    *
    * Exactly-once without distributed transactions: the watermark (the
    * last synced store version) lives IN the target database
    * (`GRAFT_SYNC_STATE`), and the MERGE + watermark update commit in
    * ONE local transaction. Crash windows: after the staging overwrite
    * → no target state changed, replay re-stages; inside the
    * transaction → rolled back, replay re-runs. And even a duplicated
    * MERGE of the same net-change set is value-idempotent: re-INSERTs
    * hit MATCHED → same-value UPDATE, re-DELETEs of missing keys no-op
    * (the upsert-conversion semantics the reference's
    * `CdcSyncService` applies). Returns the store version the target
    * now reflects.
    */
  def syncFromStore(store: graft.streaming.SnapshotStore, table: String,
      url: String, target: String, staging: String,
      stagingColumnTypes: Option[String] = None,
      props: java.util.Properties = new java.util.Properties): Int = {
    dialectRegistered
    val toV = store.currentVersion(table)
    val fromV = syncedVersion(url, target, props)
    if (fromV == toV) return toV
    // UPPERCASE the staged columns: Spark creates JDBC columns
    // case-sensitively, and the MERGE's unquoted identifiers fold to
    // upper in ANSI databases — lowercase staging columns would be
    // unreferenceable (P11's normalization, applied at the sink)
    val net0 = store.netChanges(table, fromV, toV)
    val net = net0.toDF(net0.columns.map(_.toUpperCase): _*)
    val pk = net.columns(0)
    val dataCols = net.columns.drop(2).toSeq
    // compose with schema evolution: a store table that grew a column
    // (add-column at a compaction boundary) must keep syncing — the
    // target ALTERs the new column in (nullable) before the MERGE
    // references it; kind changes still refuse loudly inside
    ensureColumns(url, target, org.apache.spark.sql.types.StructType(
      net.schema.filterNot(_.name == "CHANGE_TYPE")), props)
    val w = net.select((pk +: dataCols :+ "CHANGE_TYPE").map(col): _*)
      .write.mode("overwrite")
    stagingColumnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, staging, props)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(mergeSql(target, staging, pk, dataCols, "CHANGE_TYPE"))
        if (st.executeUpdate(
            s"UPDATE GRAFT_SYNC_STATE SET V = $toV WHERE TBL = '$target'") == 0)
          st.executeUpdate(
            s"INSERT INTO GRAFT_SYNC_STATE VALUES ('$target', $toV)")
      } finally st.close()
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
    toV
  }

  /** Schema evolution at the JDBC sink, with the SAME contract the
    * store enforces ([[graft.streaming.SnapshotStore]] /
    * `SchemaEvolutionSpec`): NEW batch columns propagate as
    * `ALTER TABLE ADD COLUMN` (nullable — old rows read NULL, exactly
    * like the store's add-column-at-a-compaction-boundary), while
    * drops and retypes REFUSE loudly — a silently narrowed or
    * re-typed serving table is corruption, not evolution. Target
    * columns absent from the batch are fine (the sink writes a
    * subset). Types come from the registered dialect (VARCHAR-first
    * on Derby), widened to the JDBC defaults.
    */
  def ensureColumns(url: String, target: String,
      schema: org.apache.spark.sql.types.StructType,
      props: java.util.Properties = new java.util.Properties): Seq[String] = {
    dialectRegistered
    import org.apache.spark.sql.types._
    def ddlType(dt: DataType): String =
      org.apache.spark.sql.jdbc.JdbcDialects.get(url).getJDBCType(dt)
        .map(_.databaseTypeDefinition).getOrElse(dt match {
          case LongType => "BIGINT"
          case IntegerType => "INTEGER"
          case DoubleType => "DOUBLE"
          case FloatType => "REAL"
          case BooleanType => "BOOLEAN"
          case TimestampType => "TIMESTAMP"
          case DateType => "DATE"
          case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
          case StringType => "VARCHAR(4000)"
          case other => throw new IllegalArgumentException(
            s"ensureColumns: no JDBC mapping for $other")
        })
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val existing = scala.collection.mutable.LinkedHashMap[String, Int]()
      val rs = conn.getMetaData.getColumns(null, null, target.toUpperCase, null)
      try while (rs.next())
        existing += rs.getString("COLUMN_NAME").toUpperCase -> rs.getInt("DATA_TYPE")
      finally rs.close()
      require(existing.nonEmpty, s"ensureColumns: target $target does not exist")
      val added = Seq.newBuilder[String]
      schema.fields.foreach { f =>
        val name = f.name.toUpperCase
        existing.get(name) match {
          case None =>
            val st = conn.createStatement()
            try st.executeUpdate(
              s"ALTER TABLE $target ADD COLUMN $name ${ddlType(f.dataType)}")
            finally st.close()
            added += name
          case Some(sqlType) =>
            val batchIsString = f.dataType == StringType
            val targetIsString = sqlType == java.sql.Types.VARCHAR ||
              sqlType == java.sql.Types.CLOB || sqlType == java.sql.Types.CHAR
            val batchIsNumeric = f.dataType.isInstanceOf[NumericType]
            val targetIsNumeric = Set(java.sql.Types.BIGINT, java.sql.Types.INTEGER,
              java.sql.Types.SMALLINT, java.sql.Types.DOUBLE, java.sql.Types.FLOAT,
              java.sql.Types.REAL, java.sql.Types.DECIMAL, java.sql.Types.NUMERIC)
              .contains(sqlType)
            if ((batchIsString && targetIsNumeric) || (batchIsNumeric && targetIsString))
              throw new IllegalStateException(
                s"ensureColumns: column $name changed KIND (batch " +
                  s"${f.dataType.simpleString} vs target sql-type $sqlType) — " +
                  "retypes are refused; rebuild the target explicitly")
        }
      }
      added.result()
    } finally conn.close()
  }

  /** The target-side watermark: the store version `target` reflects
    * (0 = never synced). Creates the state table on first contact.
    */
  def syncedVersion(url: String, target: String,
      props: java.util.Properties = new java.util.Properties): Int = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        try st.executeUpdate(
          "CREATE TABLE GRAFT_SYNC_STATE (TBL VARCHAR(128) PRIMARY KEY, V INT)")
        catch { case _: java.sql.SQLException => () } // already exists
        val rs = st.executeQuery(
          s"SELECT V FROM GRAFT_SYNC_STATE WHERE TBL = '$target'")
        try { if (rs.next()) rs.getInt(1) else 0 } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }
}
