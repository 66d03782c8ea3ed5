package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the lesson-46 measurement BEFORE the line gate's hash60
  * narrow-state candidate gets built — how much of the gate's
  * per-trigger state read is the STRING key column's decode, i.e. what
  * would storing hash60(line) (a long) instead of the line text
  * actually buy?
  *
  * Writes the same 20M-row count state twice in the chain's bucketed
  * base layout (64 hash-clustered sorted files, uncompressed like the
  * epoch writes): once keyed by the line TEXT (current layout, ~20-40
  * byte strings), once keyed by hash60(line) (one long). Then times
  * the gate's exact read shape — broadcast semi-join of a 12k-key
  * trigger probe into the raw scan, then the merge-on-read aggregate —
  * three draws each, alternating. The delta IS the decode floor the
  * narrow layout would remove; the collision trade it would buy is
  * p ≈ n²/2⁶¹ false line-merges (a merged count can strip a line
  * early).
  */
object LineStateLayout {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-linelayout").toString
    val base = spark.range(n).select(
      concat(lit("u"), col("id"), lit("x7 w"), pmod(col("id") * 31, lit(7000)))
        .as("line"),
      lit(1L).as("state_cnt"))
      .withColumn("__bkt", pmod(hash(col("line")), lit(64)).cast("int"))
    base.repartition(64, col("__bkt")).sortWithinPartitions(col("__bkt"))
      .write.mode("overwrite").option("compression", "none")
      .parquet(s"$dir/text")
    base.select(graft.ops.Dedup.hash60(col("line")).as("h60"),
        col("state_cnt"), col("__bkt"))
      .repartition(64, col("__bkt")).sortWithinPartitions(col("__bkt"))
      .write.mode("overwrite").option("compression", "none")
      .parquet(s"$dir/h60")
    // a 12k-line trigger probe (the gate's shape): keys that EXIST so
    // the semi-join's build side is honest
    val probeLines = spark.range(12000).select(
      concat(lit("u"), col("id") * 1000L, lit("x7 w"),
        pmod(col("id") * 1000L * 31, lit(7000))).as("line"))
      .localCheckpoint(true)
    val probeH60 = probeLines
      .select(graft.ops.Dedup.hash60(col("line")).as("h60"))
      .localCheckpoint(true)
    def timed(what: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"$what%s: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    (1 to 3).foreach { i =>
      timed(s"text-key scan+semijoin+agg [run $i]") {
        spark.read.parquet(s"$dir/text")
          .join(broadcast(probeLines), Seq("line"), "left_semi")
          .groupBy(col("line")).agg(sum(col("state_cnt")))
          .count()
      }
      timed(s"h60-key  scan+semijoin+agg [run $i]") {
        spark.read.parquet(s"$dir/h60")
          .join(broadcast(probeH60), Seq("h60"), "left_semi")
          .groupBy(col("h60")).agg(sum(col("state_cnt")))
          .count()
      }
    }
    // the pure decode floor, no probe: full-scan count over the key col
    (1 to 2).foreach { i =>
      timed(s"text-key full decode [run $i]") {
        spark.read.parquet(s"$dir/text")
          .filter(col("line") =!= "never").count()
      }
      timed(s"h60-key  full decode [run $i]") {
        spark.read.parquet(s"$dir/h60")
          .filter(col("h60") =!= -1L).count()
      }
    }
    spark.stop()
  }
}
