package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: just the multiplexed + concurrent probes (set
  * GRAFT_TRIGGER_TIMING=1 for per-phase trigger timing).
  */
object MuxProfile {
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
    // same warm-up ordering as the bench fragment: sync first
    val sync = graft.StreamBench.syncThroughput(spark)
    for (per <- Seq(500, 4000)) {
      val mux = graft.StreamBench.multiplexedThroughput(spark, per)
      val conc = graft.StreamBench.concurrentThroughput(spark, per)
      println(f"perBatch=$per sync=$sync%.0f mux=$mux%.0f conc=$conc%.0f events/s")
    }
    spark.stop()
  }
}
