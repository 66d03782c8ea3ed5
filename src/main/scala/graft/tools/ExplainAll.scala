package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only: dump `explain("formatted")` for EVERY registered query to
  * `<outDir>/<name>_<suffix>.txt` in one session — the before/after
  * plan corpus the optimization rounds commit under `plans/`.
  * Usage: `runMain graft.tools.ExplainAll <outDir> <suffix> [sfDir]`.
  * Planning only (no execution), so the files show the static plan —
  * `AdaptiveSparkPlan isFinalPlan=false` — which is what plan-shape
  * diffs (Exchange count, join strategy, PushedFilters/ReadSchema)
  * read; AQE runtime rewrites are bench-side evidence, not plan-shape
  * evidence. Session config mirrors Bench (cpus, shuffle partitions,
  * AQE on) so the dumped shapes are the bench's shapes.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntryNames.sorted(spark).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      } catch {
        case e: Throwable =>
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
            s"PLANNING FAILED: ${e.getMessage}\n")
      }
    }
    spark.stop()
  }
}

private object SparkEntryNames {
  def sorted(spark: SparkSession)
      : Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
}
