package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet (SURVEY.md §2.1):
  * schema-explicit CSV and JSON (lines) readers/writers. JDBC (S3/S4)
  * has no reachable database in this environment; the apply path's JDBC
  * MERGE shape is documented in SyncPipeline — these cover the
  * file-based interchange formats a pipeline actually round-trips.
  *
  * Always pass an explicit schema: schema inference reads the data
  * twice and guesses types — at 100 TB both are unacceptable.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .option("mode", "PERMISSIVE")
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .option("mode", "PERMISSIVE")
      .json(path)

  /** ORC: the other columnar interchange format Spark ships natively
    * (zstd-compressed; predicate pushdown and column pruning work the
    * same as parquet — asserted in FormatsSpec). Avro is NOT offered:
    * this environment has avro core jars but no spark-avro connector,
    * so `format("avro")` cannot resolve (recorded in COVERAGE.md).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
