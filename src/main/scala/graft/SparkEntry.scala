package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, CdcQueries, Extras, PipelineQueries, Q, QueryPack, Relational, Reshape, SketchQueries, TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over `/root/testdata/sf*` parquet, with a DuckDB oracle SQL
  * where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(Relational, CdcQueries, PipelineQueries, Extras, TemporalQueries, TextQueries, SketchQueries, Reshape, Analytics)

  private lazy val registry: Seq[Q] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full CDC slice: Debezium envelope parse → config-driven
    * transform → ordered apply (see CdcQueries.cdc1_e2e_sync).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc1_e2e_sync")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
