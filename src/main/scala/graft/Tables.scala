package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All `SparkEntry.queries` take a scale-factor directory and read only the
  * tables they need — filters and column pruning reach the parquet scan
  * (verify with `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config every entry point must set. The testdata timestamps
    * are parquet `timestamp[us]` with isAdjustedToUTC=false, which
    * Spark 4 would otherwise infer as TIMESTAMP_NTZ — a type
    * `unix_millis`/`unix_micros` reject and whose CSV/JSON formatting
    * silently truncates to millis. Disabling NTZ inference reads the
    * raw micros as UTC-instant TimestampType — byte-identical to what
    * the DuckDB oracle sees in the same files. The nanos flag covers
    * the previous generator's TIMESTAMP(NANOS) `events.ts` encoding,
    * which `load` converts back to a timestamp.
    */
  val requiredConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // defensive: a caller-provided session (e.g. the driver harness) may
    // not carry the nanos flag; it is a runtime-settable SQL conf
    requiredConf.foreach { case (k, v) =>
      if (spark.conf.getOption(k).forall(_ != v)) spark.conf.set(k, v)
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // ns → µs; sub-µs components are zero in the generated data
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql-style queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
