package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run JUST the ANN serve-latency probe, so serve-path
  * changes get a p50/p95 read in ~30 s instead of the full bench.
  * `GRAFT_TRIGGER_TIMING=1` adds per-phase wall times from
  * [[graft.streaming.AnnServeStream.applyBatch]].
  */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_JOB_TRACE"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = starts.remove(j.jobId)
            System.err.println(f"[job ${j.jobId}%4d] ${(System.nanoTime() - t0) / 1e6}%6.0f ms")
          }
        })
    (1 to runs).foreach { i =>
      val (p50, p95) = graft.StreamBench.serveLatency(spark, pinSnapshot = true)
      println(f"serve[$i] p50 = $p50%.0f ms  p95 = $p95%.0f ms")
    }
    spark.stop()
  }
}
