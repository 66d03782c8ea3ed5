package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure streaming ANN serve tail latency with and without the
  * pinned-snapshot index (catalog-resolve-per-batch vs cached frames)
  * — the evidence behind AnnServeStream's `pinSnapshot` default advice.
  */
object ServePinCompare {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (pin <- Seq(false, true, false, true)) {
      val (p50, p95) = graft.StreamBench.serveLatency(spark, pinSnapshot = pin)
      println(f"[serve] pinSnapshot=$pin p50=${p50}%.0f ms p95=${p95}%.0f ms")
    }
    spark.stop()
  }
}
